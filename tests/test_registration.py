"""Registration: matching, RANSAC, end-to-end affine recovery."""

import numpy as np
import pytest

from conftest import disable_persistent_cache_fixture, isolated, \
    make_phantom

_no_persistent_cache = pytest.fixture(autouse=True, scope="module")(
    disable_persistent_cache_fixture)


@isolated
def test_ransac_synthetic_outliers():
    from sift3d_tpu.registration import ransac_affine
    rng = np.random.default_rng(0)
    src = rng.uniform(0, 64, (200, 3)).astype(np.float32)
    A = np.array([[0.98, -0.14, 0.0, 3.0],
                  [0.14, 0.98, 0.0, -2.0],
                  [0.0, 0.0, 1.0, 1.0]], np.float32)
    dst = src @ A[:, :3].T + A[:, 3]
    out = rng.choice(200, 80, replace=False)
    dst[out] += rng.uniform(-30, 30, (80, 3))
    A_est, mask = ransac_affine(src, dst, err_thresh=1.0, num_iter=500)
    assert mask.sum() == 120
    assert np.abs(A_est - A).max() < 1e-2


def test_ransac_too_few_points():
    """<4 correspondences return (None, all-False) — the same degraded
    convention as register()/register_batch(); no path raises."""
    from sift3d_tpu.registration import ransac_affine
    A, mask = ransac_affine(np.zeros((3, 3)), np.zeros((3, 3)))
    assert A is None
    assert mask.shape == (3,) and not mask.any()
    A, mask = ransac_affine(np.zeros((0, 3)), np.zeros((0, 3)))
    assert A is None and mask.shape == (0,)


@isolated
def test_register_unmatchable_legacy_path():
    """register() on a DIFFERENT-shape pair (the legacy per-stage path)
    with no real correspondences returns affine=None instead of raising
    from ransac_affine — one API, one failure mode."""
    from sift3d_tpu.registration import register

    rng = np.random.default_rng(3)
    fixed = make_phantom(32, nblobs=5, seed=1)
    moving = rng.normal(size=(24, 24, 24)).astype(np.float32)
    r = register(fixed, moving, num_iter=50)
    if r.num_matches < 4:
        assert r.affine is None and r.num_inliers == 0
        assert not r.inlier_mask.any()
    else:
        assert r.affine is None or np.isfinite(r.affine).all()


@isolated
def test_match_descriptors_identity():
    from sift3d_tpu.keypoints import Descriptors
    from sift3d_tpu.registration import match_descriptors
    rng = np.random.default_rng(1)
    d = rng.normal(size=(20, 768)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ds1 = Descriptors(xyz=np.zeros((20, 3), np.float32),
                      sd=np.ones(20, np.float32), data=d)
    # second set: same descriptors with tiny noise, shuffled
    perm = rng.permutation(20)
    d2 = d[perm] + rng.normal(0, 1e-3, (20, 768)).astype(np.float32)
    ds2 = Descriptors(xyz=np.zeros((20, 3), np.float32),
                      sd=np.ones(20, np.float32), data=d2)
    i1, i2 = match_descriptors(ds1, ds2, nn_thresh=0.8)
    assert len(i1) == 20
    assert np.array_equal(perm[i2], i1)


@isolated
def test_sample_distinct4():
    """RANSAC minimal samples must be 4 distinct in-range indices per
    hypothesis (a repeated index wastes the hypothesis on a singular
    system) and roughly uniform over the valid prefix."""
    import jax
    import jax.numpy as jnp
    from sift3d_tpu.registration import _sample_distinct4

    for n in (4, 5, 7, 23, 200):
        idx = np.asarray(_sample_distinct4(
            jax.random.PRNGKey(n), 2000, jnp.int32(n)))
        assert idx.shape == (2000, 4)
        assert idx.min() >= 0 and idx.max() < n
        # all rows distinct
        assert all(len(set(row)) == 4 for row in idx)
    # uniformity: each index of [0, 8) appears in ~4/8 of 4000 rows
    idx = np.asarray(_sample_distinct4(
        __import__("jax").random.PRNGKey(0), 4000, jnp.int32(8)))
    freq = np.bincount(idx.ravel(), minlength=8) / (4000 * 4)
    assert np.abs(freq - 1 / 8).max() < 0.02


def _match_bruteforce(d1, d2, nn_thresh=0.8):
    """Independent NumPy reimplementation of the Lowe-ratio matcher
    (cross-check for registration.match_descriptors): exhaustive pairwise
    Euclidean distances, nearest + second-nearest per row, ratio test."""
    out1, out2 = [], []
    for i in range(len(d1)):
        dist = np.sqrt(np.sum((d2 - d1[i]) ** 2, axis=1))
        order = np.argsort(dist)
        best, second = order[0], order[1]
        if dist[best] / max(dist[second], 1e-30) < nn_thresh:
            out1.append(i)
            out2.append(best)
    return np.asarray(out1, np.int64), np.asarray(out2, np.int64)


@isolated
def test_match_descriptors_vs_bruteforce():
    """The MXU-matmul matcher must produce the identical match set to an
    exhaustive NumPy matcher on a noisy fixture with distractors."""
    from sift3d_tpu.keypoints import Descriptors
    from sift3d_tpu.registration import match_descriptors

    rng = np.random.default_rng(5)
    base = rng.normal(size=(40, 768)).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    # set 2 = 25 perturbed copies (matchable) + 15 fresh rows (distractors)
    perm = rng.permutation(40)[:25]
    d2 = np.concatenate([
        base[perm] + rng.normal(0, 0.05, (25, 768)).astype(np.float32),
        rng.normal(size=(15, 768)).astype(np.float32)])
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)

    ds1 = Descriptors(xyz=np.zeros((40, 3), np.float32),
                      sd=np.ones(40, np.float32), data=base)
    ds2 = Descriptors(xyz=np.zeros((40, 3), np.float32),
                      sd=np.ones(40, np.float32), data=d2)
    i1, i2 = match_descriptors(ds1, ds2, nn_thresh=0.9)
    j1, j2 = _match_bruteforce(base, d2, nn_thresh=0.9)
    assert len(i1) > 10  # the fixture must actually exercise the test
    assert np.array_equal(i1, j1)
    assert np.array_equal(i2, j2)


@isolated
def test_ransac_vs_lstsq_clean():
    """On outlier-free correspondences RANSAC must keep every point and
    agree with a direct NumPy least-squares affine fit."""
    from sift3d_tpu.registration import ransac_affine

    rng = np.random.default_rng(3)
    src = rng.uniform(0, 64, (60, 3)).astype(np.float32)
    A = np.array([[1.02, -0.1, 0.03, 4.0],
                  [0.1, 0.97, -0.02, -1.0],
                  [-0.01, 0.04, 1.01, 2.5]], np.float32)
    dst = (src @ A[:, :3].T + A[:, 3]
           + rng.normal(0, 0.05, (60, 3))).astype(np.float32)
    A_est, mask = ransac_affine(src, dst, err_thresh=1.0, num_iter=200)
    assert mask.all()
    X = np.c_[src, np.ones(60)]
    A_np = np.linalg.lstsq(X, dst, rcond=None)[0].T    # [3, 4]
    np.testing.assert_allclose(A_est, A_np, atol=5e-3)


@isolated
def test_warp_identity():
    from sift3d_tpu.registration import warp_volume
    from sift3d_tpu.volume import Volume
    vol = Volume.from_array(make_phantom(16))
    ident = np.eye(3, 4, dtype=np.float32)
    out = warp_volume(vol, ident, (16, 16, 16))
    np.testing.assert_allclose(np.asarray(out.data),
                               np.asarray(vol.data), atol=1e-5)


@isolated
def test_register_end_to_end():
    """BASELINE config 4: recover a known rotation+translation between a
    volume pair via matching + RANSAC."""
    from sift3d_tpu.registration import register, warp_volume
    from sift3d_tpu.volume import Volume

    fixed = Volume.from_array(make_phantom(64, nblobs=60, seed=11))
    th = np.deg2rad(8.0)
    Rz = np.array([[np.cos(th), -np.sin(th), 0],
                   [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    c = np.array([31.5] * 3)
    t = np.array([2.0, -3.0, 1.5])
    A_true = np.zeros((3, 4), np.float32)
    A_true[:, :3] = Rz
    A_true[:, 3] = c - Rz @ c + t
    moving = warp_volume(fixed, A_true, (64, 64, 64))

    res = register(fixed, moving, num_iter=500)
    assert res.num_matches >= 20
    assert res.num_inliers >= 15

    A4 = np.eye(4)
    A4[:3, :] = A_true
    A_inv = np.linalg.inv(A4)[:3, :]
    pts = np.random.default_rng(0).uniform(16, 48, (100, 3))
    p_est = res.affine @ np.c_[pts, np.ones(100)].T
    p_true = A_inv @ np.c_[pts, np.ones(100)].T
    assert np.abs(p_est - p_true).max() < 2.5


@isolated
def test_register_recovery_subvoxel():
    """BASELINE config 4's accuracy bar, CPU CI mirror of the hardware
    bench metric (tools/bench_registration.py affine_err_vox): the
    recovered affine's mean corner displacement vs the known ground
    truth must be sub-voxel. Reference provenance: the TIP-2017 paper
    evaluates registration accuracy (README-OLD.md:62-67)."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent
                           / "tools"))
    from bench_registration import affine_corner_error
    from sift3d_tpu.registration import register, warp_volume
    from sift3d_tpu.volume import Volume

    n = 96
    fixed = Volume.from_array(make_phantom(n, nblobs=90, seed=5))
    th = np.deg2rad(7.0)
    Rz = np.array([[np.cos(th), -np.sin(th), 0],
                   [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    c = np.array([(n - 1) / 2.0] * 3)
    t = np.array([2.5, -1.5, 3.0])
    A_true = np.zeros((3, 4), np.float32)
    A_true[:, :3] = Rz
    A_true[:, 3] = c - Rz @ c + t
    M = np.eye(4)
    M[:3] = A_true
    A_inv = np.linalg.inv(M)[:3].astype(np.float32)
    moving = warp_volume(fixed, A_inv, (n, n, n))   # A_true: moving->fixed

    res = register(fixed, moving, num_iter=500)
    assert res.affine is not None and res.num_inliers >= 8
    err = affine_corner_error(res.affine, A_true, n)
    assert err < 1.0, f"affine recovery error {err:.3f} vox"


@isolated
def test_register_batch_matches_single():
    """register_batch (one batched detection program for all volumes) must
    agree with per-pair register()."""
    from sift3d_tpu.registration import register, register_batch, \
        warp_volume
    from sift3d_tpu.volume import Volume

    pairs = []
    for seed in (11, 23):
        fixed = Volume.from_array(make_phantom(48, nblobs=40, seed=seed))
        th = np.deg2rad(6.0)
        Rz = np.array([[np.cos(th), -np.sin(th), 0],
                       [np.sin(th), np.cos(th), 0], [0, 0, 1]])
        c = np.array([23.5] * 3)
        A = np.zeros((3, 4), np.float32)
        A[:, :3] = Rz
        A[:, 3] = c - Rz @ c + np.array([1.5, -2.0, 1.0])
        moving = warp_volume(fixed, A, (48, 48, 48))
        pairs.append((fixed, moving))

    fixed_b = np.stack([np.asarray(p[0].data) for p in pairs])
    moving_b = np.stack([np.asarray(p[1].data) for p in pairs])
    batch = register_batch(fixed_b, moving_b, num_iter=300)
    from sift3d_tpu.pipeline import SIFT3D
    for (fixed, moving), rb in zip(pairs, batch):
        # detectors=(a, b) pins the LEGACY per-volume + per-stage path
        # (same-shape register() without a detector pair routes through
        # register_batch itself, which would compare the path to itself).
        rs = register(fixed, moving, num_iter=300,
                      detectors=(SIFT3D(), SIFT3D()))
        assert rb.num_matches == rs.num_matches
        assert rb.num_inliers == rs.num_inliers
        np.testing.assert_allclose(rb.affine, rs.affine, atol=1e-4)


@isolated
def test_register_batch_unmatchable_pair():
    """A pair with (almost) no descriptor matches must come back as
    affine=None without crashing the fused batch path — the RANSAC
    sampler runs on a <4-correspondence prefix of zero padding there."""
    from sift3d_tpu.registration import register_batch

    rng = np.random.default_rng(0)
    fixed = make_phantom(32, nblobs=5, seed=1)
    moving = rng.normal(size=(32, 32, 32)).astype(np.float32)
    out = register_batch(fixed[None], moving[None], num_iter=50)
    assert len(out) == 1
    r = out[0]
    if r.num_matches < 4:
        assert r.affine is None and r.num_inliers == 0
    else:      # noise can produce spurious matches; just require sanity
        assert r.affine is None or np.isfinite(r.affine).all()
