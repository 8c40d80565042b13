"""Registration: matching, RANSAC, end-to-end affine recovery."""

import numpy as np
import pytest

from conftest import make_phantom


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
    from sift3d_tpu.registration import ransac_affine
    with pytest.raises(ValueError):
        ransac_affine(np.zeros((3, 3)), np.zeros((3, 3)))


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


def test_warp_identity():
    from sift3d_tpu.registration import warp_volume
    from sift3d_tpu.volume import Volume
    vol = Volume.from_array(make_phantom(16))
    ident = np.eye(3, 4, dtype=np.float32)
    out = warp_volume(vol, ident, (16, 16, 16))
    np.testing.assert_allclose(np.asarray(out.data),
                               np.asarray(vol.data), atol=1e-5)


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
