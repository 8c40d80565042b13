"""Extrema detection unit tests (no oracle)."""

import numpy as np
import pytest

import jax.numpy as jnp

from sift3d_tpu.detect import default_capacity, detect_extrema_level
from sift3d_tpu.params import DetectorParams


def _levels_with_peak(n=16, pos=(8, 8, 8), val=1.0):
    prev = np.zeros((n, n, n), np.float32)
    cur = np.zeros((n, n, n), np.float32)
    nxt = np.zeros((n, n, n), np.float32)
    cur[pos] = val
    return jnp.asarray(prev), jnp.asarray(cur), jnp.asarray(nxt)


def test_single_maximum():
    p = DetectorParams()
    prev, cur, nxt = _levels_with_peak()
    out = detect_extrema_level(prev, cur, nxt, p, 16)
    assert int(out.count) == 1
    assert tuple(np.asarray(out.coords)[0]) == (8, 8, 8)
    assert np.asarray(out.strength)[0] == pytest.approx(1.0)


def test_single_minimum():
    p = DetectorParams()
    prev, cur, nxt = _levels_with_peak(val=-1.0)
    # neighbors must be strictly greater -> a negative spike is a minimum
    out = detect_extrema_level(prev, cur, nxt, p, 16)
    assert int(out.count) == 1
    assert np.asarray(out.strength)[0] == pytest.approx(1.0)


def test_relative_threshold():
    """A secondary peak below peak_thresh * max|DoG| must be rejected."""
    p = DetectorParams(peak_thresh=0.5)
    prev, cur, nxt = _levels_with_peak()
    cur = cur.at[3, 3, 3].set(0.4)  # 0.4 < 0.5 * 1.0
    out = detect_extrema_level(prev, cur, nxt, p, 16)
    assert int(out.count) == 1


def test_boundary_excluded():
    p = DetectorParams()
    prev, cur, nxt = _levels_with_peak(pos=(0, 8, 8))
    out = detect_extrema_level(prev, cur, nxt, p, 16)
    assert int(out.count) == 0
    # x = 1 is interior (the loop range is [1, n-2])
    prev, cur, nxt = _levels_with_peak(pos=(1, 8, 8))
    assert int(detect_extrema_level(prev, cur, nxt, p, 16).count) == 1


def test_level_neighbors_block():
    """A larger center value in the prev level blocks the maximum."""
    p = DetectorParams()
    prev, cur, nxt = _levels_with_peak()
    prev = prev.at[8, 8, 8].set(2.0)
    out = detect_extrema_level(prev, cur, nxt, p, 16)
    assert int(out.count) == 0


def test_capacity_overflow_reported():
    p = DetectorParams(peak_thresh=1e-6)
    rng = np.random.default_rng(0)
    prev, cur, nxt = (jnp.asarray(rng.normal(size=(16,) * 3).astype(
        np.float32)) for _ in range(3))
    out = detect_extrema_level(prev, cur, nxt, p, 4)
    assert int(out.count) >= 4
    assert np.asarray(out.valid).sum() <= 4


def test_candidate_order_is_zyx():
    """Candidates must appear in the reference's scan order: z outer, y,
    then x fastest."""
    p = DetectorParams()
    prev = jnp.zeros((16,) * 3, jnp.float32)
    nxt = jnp.zeros((16,) * 3, jnp.float32)
    cur = jnp.zeros((16,) * 3, jnp.float32)
    for pos in [(2, 2, 10), (10, 2, 2), (2, 10, 2)]:
        cur = cur.at[pos].set(1.0)
    out = detect_extrema_level(prev, cur, nxt, p, 8)
    got = [tuple(c) for c in np.asarray(out.coords)[:3]]
    # sorted by (z, y, x)
    assert got == [(10, 2, 2), (2, 10, 2), (2, 2, 10)]


def test_cuboid_extrema_stricter():
    p_cube = DetectorParams(cuboid_extrema=True)
    prev, cur, nxt = _levels_with_peak()
    # diagonal neighbor ties block the cuboid (80-neighbor) test only
    cur = cur.at[7, 7, 7].set(1.0)
    assert int(detect_extrema_level(prev, cur, nxt, p_cube, 16).count) == 0
    p_face = DetectorParams()
    assert int(detect_extrema_level(prev, cur, nxt, p_face, 16).count) == 2


def test_default_capacity_bounds():
    assert default_capacity(8 ** 3) == 128
    assert default_capacity(64 ** 3) == 128
    assert default_capacity(256 ** 3) == 2048
    assert default_capacity(10 ** 9) == 2048


def test_detection_funnel_consistency():
    """The per-stage funnel must be internally consistent and account for
    every candidate: candidates - grad - ratio - corner == survivors, and
    survivors must sum to the keypoint count."""
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).parent))
    from conftest import make_phantom
    import sift3d_tpu as s3d
    from sift3d_tpu.profiling import detect_stats, format_funnel

    det = s3d.SIFT3D()
    kp = det.detect_keypoints(make_phantom(48))
    stats = detect_stats(det, kp)
    assert stats["funnel"], "funnel not collected"
    total = stats["funnel"]["total"]
    assert (total["candidates"] - total["reject_grad"]
            - total["reject_ratio"] - total["reject_corner"]
            == total["survivors"])
    assert total["survivors"] == len(kp)
    for name, f in stats["funnel"].items():
        assert (f["candidates"] - f["reject_grad"] - f["reject_ratio"]
                - f["reject_corner"] == f["survivors"]), name
    # renders without error
    assert "candidates" in format_funnel(stats)


def test_eigh3x3_matches_lapack():
    """The fixed-sweep Jacobi eigensolver must match LAPACK: eigenvalues
    ascending to f32 precision, eigenvectors (up to sign) wherever the
    spectrum is separated, orthonormal V, small residuals."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from sift3d_tpu.orientation import eigh3x3

    rng = np.random.default_rng(0)
    mats = [
        (lambda B: (B + B.T).astype(np.float32))(rng.normal(size=(3, 3)))
        for _ in range(500)]
    for lams in ([1, 1, 1], [1, 1, 2], [0, 0, 0], [1e-6, 1, 1e6],
                 [-3, -3, 5], [2, 2, 2 + 1e-6]):
        Q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        mats.append((Q @ np.diag(lams) @ Q.T).astype(np.float32))
    A = jnp.asarray(np.stack(mats))
    w, V = jax.jit(eigh3x3)(A)
    w, V = np.asarray(w, np.float64), np.asarray(V, np.float64)
    w_ref, V_ref = np.linalg.eigh(np.asarray(A, np.float64))

    scale = np.abs(w_ref).max(axis=1, keepdims=True) + 1e-30
    assert np.max(np.abs(w - w_ref) / scale) < 2e-6
    assert np.all(np.diff(w, axis=1) >= -1e-5 * scale)
    # orthonormality + eigen-residual
    I = np.einsum("bij,bik->bjk", V, V)
    assert np.abs(I - np.eye(3)).max() < 5e-6
    res = np.einsum("bij,bjk->bik", np.asarray(A, np.float64), V) \
        - w[:, None, :] * V
    assert np.max(np.abs(res) / scale[:, :, None]) < 5e-6
    # eigenvectors where the spectrum is separated
    gap = np.diff(w_ref, axis=1) / scale
    well = np.stack([gap[:, 0] > 1e-2,
                     (gap[:, 0] > 1e-2) & (gap[:, 1] > 1e-2),
                     gap[:, 1] > 1e-2], axis=1)
    cos = np.abs(np.einsum("bij,bij->bj", V, V_ref))
    assert cos[well].min() > 1 - 1e-5


def test_extrema_pallas_matches_xla():
    """The Pallas stencil path (interpret mode) must produce the exact
    candidate set, order, strengths and counts of the XLA path, for both
    the face-neighbor and cuboid stencils."""
    import numpy as np
    from sift3d_tpu.detect import (_detect_extrema_octave_pallas,
                                   detect_extrema_octave)
    from sift3d_tpu.params import DetectorParams
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(5)
    base = rng.normal(size=(5, 32, 40, 128)).astype(np.float32)
    for i in range(5):
        base[i] = gaussian_filter(base[i], 1.5)
    dog = jnp.asarray(base)
    for cuboid in (False, True):
        p = DetectorParams(cuboid_extrema=cuboid)
        a = detect_extrema_octave(dog, p, 512, use_pallas=False)
        b = _detect_extrema_octave_pallas(dog, p, 512, interpret=True)
        np.testing.assert_array_equal(np.asarray(a.valid),
                                      np.asarray(b.valid))
        np.testing.assert_array_equal(np.asarray(a.coords),
                                      np.asarray(b.coords))
        np.testing.assert_array_equal(np.asarray(a.level),
                                      np.asarray(b.level))
        np.testing.assert_array_equal(np.asarray(a.strength),
                                      np.asarray(b.strength))
        np.testing.assert_array_equal(np.asarray(a.counts),
                                      np.asarray(b.counts))


def test_extrema_pallas_fused_pipeline_integration():
    """Full detection (incl. the fused hinted second pass) through the
    Pallas extrema kernel in interpret mode must match the XLA stencil
    end-to-end: same keypoints, strengths, orientations, descriptors.
    Volume shaped so octave 0 passes the kernel's nz % 128 gate."""
    import numpy as np
    import sift3d_tpu as s3d
    from sift3d_tpu.params import DetectorParams
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(11)
    vol = gaussian_filter(
        rng.normal(size=(32, 40, 128)).astype(np.float32), 2.0)

    kps, descs = [], []
    for impl in ("xla", "interpret"):
        det = s3d.SIFT3D(DetectorParams(extrema_impl=impl))
        kp = det.detect_keypoints(vol)      # exact path
        kp2 = det.detect_keypoints(vol)     # fused hinted path
        assert len(kp) == len(kp2)
        np.testing.assert_array_equal(kp.coords, kp2.coords)
        kps.append(kp2)
        descs.append(det.extract_descriptors(kp2))

    a, b = kps
    assert len(a) == len(b) and len(a) > 0
    np.testing.assert_array_equal(a.coords, b.coords)
    np.testing.assert_array_equal(a.octave, b.octave)
    np.testing.assert_array_equal(a.level, b.level)
    np.testing.assert_allclose(a.strength, b.strength, rtol=0, atol=0)
    np.testing.assert_allclose(a.R, b.R, atol=1e-6)
    np.testing.assert_allclose(descs[0].data, descs[1].data, atol=2e-5)


def test_extrema_pallas_tile_vmem_budget():
    """The x-tile adapts to the 16 MB scoped-VMEM limit (512^2 lane planes
    overflowed the fixed TX=4 on hardware) and always divides nx."""
    from sift3d_tpu.ops.extrema_kernel import _pick_cfg

    # 256^3 fits the FUSED variant (all 5 level slabs per spatial tile,
    # each DoG voxel read once per tile instead of up to 3x)
    assert _pick_cfg(256, 256, 256, cuboid=False) == (8, 64, True, True)
    # 512^2 lane planes: whole-y forced TX=1 single-buffered in round 4
    # (28 ms); y-tiling restores a wide double-buffered tile
    tx, tyy, dbf, fused = _pick_cfg(512, 512, 512, cuboid=False)
    assert tyy < 512 and dbf and tx >= 4
    assert _pick_cfg(33, 40, 128, cuboid=False)[0] == 1  # odd nx
    from sift3d_tpu.ops.extrema_kernel import _YH
    for nx, ny, nz in ((256, 256, 256), (512, 512, 512), (384, 384, 384),
                       (96, 130, 200), (33, 40, 128)):
        for cuboid in (False, True):
            for db in (False, True):
                tx, tyy, dbf, fused = _pick_cfg(nx, ny, nz, cuboid,
                                                db=db)
                assert nx % tx == 0 and ny % tyy == 0
                assert db or not dbf
                assert not fused or dbf
                tys = tyy + 2 * _YH if tyy != ny else ny
                txc = tx + 2 if cuboid else tx
                slabs = (5 * (tx + 2) * tys if fused
                         else (tx + 2 + 2 * txc) * tys)
                el = slabs * (2 if dbf else 1) + tx * tys \
                    + 6 * tx * tyy + (3 if fused else 1) * tx * tyy // 2
                assert tx == 1 or el * nz * 4 <= 15 * 2 ** 20


def test_extrema_pallas_y_tiled_matches_xla():
    """The y-tiled stencil configuration (forced via cfg — small shapes
    pick whole-y slabs) produces the exact mask of the XLA stencil:
    tile-internal y halos carry real rows, edge-tile margins only touch
    volume-boundary centers the interior test masks."""
    from sift3d_tpu.ops.extrema_kernel import extrema_mask_pallas

    rng = np.random.default_rng(4)
    params = DetectorParams()
    Ld = params.num_dog_levels
    n = (24, 64, 128)
    dog = jnp.asarray(rng.normal(size=(Ld,) + n).astype(np.float32))
    cur = np.asarray(dog)[1:Ld - 1]
    thr = jnp.asarray(
        np.float32(params.peak_thresh) * np.max(np.abs(cur),
                                                axis=(1, 2, 3)))

    ref = np.asarray(extrema_mask_pallas(dog, thr, interpret=True,
                                         cfg=(4, 64, False)))
    for cfg in ((4, 16, False), (4, 16, True), (8, 32, True),
                (2, 8, True), (4, 16, True, True), (8, 32, True, True),
                (4, 64, True, True)):
        got = np.asarray(extrema_mask_pallas(dog, thr, interpret=True,
                                             cfg=cfg))
        assert np.array_equal(ref, got), cfg
    # and against the XLA stencil's candidate count
    from sift3d_tpu.detect import detect_extrema_octave
    a = detect_extrema_octave(dog, params, 512, use_pallas=False)
    idx = np.argwhere(ref.astype(bool))
    assert int(np.asarray(a.counts).sum()) == len(idx)
