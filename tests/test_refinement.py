"""Subvoxel refinement + Hessian edge rejection (opt-in extensions)."""

import numpy as np
import pytest

import jax.numpy as jnp

from conftest import isolated, make_phantom
from sift3d_tpu.params import DetectorParams
from sift3d_tpu.refinement import refine_candidates


def _quadratic_level(n, center, curv):
    """D(x) = 1 - sum_i curv[i] (x_i - center_i)^2: peak at `center`."""
    x, y, z = np.meshgrid(*([np.arange(n, dtype=np.float64)] * 3),
                          indexing="ij")
    d = 1.0 - (curv[0] * (x - center[0]) ** 2
               + curv[1] * (y - center[1]) ** 2
               + curv[2] * (z - center[2]) ** 2)
    return jnp.asarray(d.astype(np.float32))


def test_subvoxel_offset_recovers_true_peak():
    p = DetectorParams(refine_subvoxel=True)
    true = (8.3, 7.6, 8.1)
    cur = _quadratic_level(16, true, (0.05, 0.04, 0.06))
    prev = cur * 0.9
    next_ = cur * 0.9
    coords = jnp.asarray([[8, 8, 8]], jnp.int32)
    res = refine_candidates(prev, cur, next_, coords, jnp.asarray([True]), p)
    refined = np.asarray(coords, np.float64) + np.asarray(res.offset)
    np.testing.assert_allclose(refined[0], true, atol=1e-3)
    assert bool(res.edge_ok[0])


def test_scale_offset_sign():
    """If the next level responds more strongly, ds must be positive."""
    p = DetectorParams(refine_subvoxel=True)
    cur = _quadratic_level(16, (8, 8, 8), (0.05, 0.05, 0.05))
    res_up = refine_candidates(cur * 0.8, cur, cur * 0.95,
                               jnp.asarray([[8, 8, 8]], jnp.int32),
                               jnp.asarray([True]), p)
    res_dn = refine_candidates(cur * 0.95, cur, cur * 0.8,
                               jnp.asarray([[8, 8, 8]], jnp.int32),
                               jnp.asarray([True]), p)
    assert float(res_up.ds[0]) > 0 > float(res_dn.ds[0])


def test_edge_rejection_plate_vs_blob():
    p = DetectorParams(edge_thresh=4.0)
    # blob: isotropic curvature -> accepted
    blob = _quadratic_level(16, (8, 8, 8), (0.05, 0.05, 0.05))
    # plate: strongly anisotropic curvature -> rejected
    plate = _quadratic_level(16, (8, 8, 8), (0.05, 0.002, 0.002))
    coords = jnp.asarray([[8, 8, 8]], jnp.int32)
    v = jnp.asarray([True])
    ok_blob = refine_candidates(blob, blob, blob, coords, v, p).edge_ok
    ok_plate = refine_candidates(plate, plate, plate, coords, v, p).edge_ok
    assert bool(ok_blob[0]) and not bool(ok_plate[0])


@isolated
def test_pipeline_with_extensions():
    """BASELINE config 2: full refinement on a phantom — refined coordinates
    are fractional, scales move off the level grid, descriptors still
    extract."""
    import sift3d_tpu as s3d

    vol = make_phantom(48, nblobs=40, seed=11)
    det = s3d.SIFT3D(s3d.DetectorParams(refine_subvoxel=True,
                                        edge_thresh=10.0))
    kp = det.detect_keypoints(vol)
    assert len(kp) > 0
    # offsets are nontrivial but bounded
    frac = kp.coords - np.rint(kp.coords)
    assert np.any(frac != 0)
    assert np.all(np.abs(frac) <= 1.0)
    # refined scales moved off the level grid
    assert np.any(kp.sd != np.rint(kp.sd * 1e6) / 1e6) or len(kp) == 0
    desc = det.extract_descriptors(kp)
    assert desc.data.shape == (len(kp), 768)
    norms = np.linalg.norm(desc.data, axis=1)
    assert np.all((np.abs(norms - 1.0) < 1e-3) | (norms == 0.0))


@isolated
def test_refined_coords_near_integer_candidates():
    import sift3d_tpu as s3d
    vol = make_phantom(48, nblobs=40, seed=11)
    det = s3d.SIFT3D(s3d.DetectorParams(refine_subvoxel=True))
    kp = det.detect_keypoints(vol)
    assert len(kp) > 0
    # every refined coordinate sits within one voxel of its integer anchor
    frac = kp.coords - np.rint(kp.coords)
    assert np.all(np.abs(frac) <= 1.0)
