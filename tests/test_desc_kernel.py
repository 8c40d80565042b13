"""Pallas descriptor kernel vs the XLA reference path (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sift3d_tpu.params import DetectorParams
from sift3d_tpu.pyramid import make_plan


def test_kernel_matches_xla_path():
    from sift3d_tpu.descriptor import extract_descriptors, _extract_pallas, \
        _level_radius
    from sift3d_tpu.windows import window_extent

    p = DetectorParams()
    plan = make_plan((48, 48, 48), (1.0, 1.0, 1.0), p)
    rng = np.random.default_rng(0)
    level = jnp.asarray(rng.normal(size=(48, 48, 48)).astype(np.float32))
    K = 8
    coords = jnp.asarray(rng.integers(10, 38, (K, 3)), jnp.int32)
    # random orthonormal R per keypoint
    Rm = []
    for _ in range(K):
        q, _r = np.linalg.qr(rng.normal(size=(3, 3)))
        Rm.append(q.astype(np.float32))
    R = jnp.asarray(np.stack(Rm))
    valid = jnp.ones(K, bool)
    sd = plan.scales[0][1]

    ref = extract_descriptors(level, coords, R, valid, sd, 0,
                              (1.0, 1.0, 1.0), p, use_pallas=False)

    rad = _level_radius(sd, p)
    extents = tuple(window_extent(rad / 1.0, 48) for _ in range(3))
    sd_arr = jnp.full((K,), jnp.float32(sd))
    hists = _extract_pallas(level, coords, coords.astype(jnp.float32), R,
                            sd_arr, (1.0, 1.0, 1.0), extents, 8, p,
                            interpret=True)
    from sift3d_tpu.descriptor import _normalize
    desc = jax.vmap(lambda h: _normalize(h, p))(hists).reshape(K, -1)

    err = np.abs(np.asarray(desc) - ref.desc)
    assert err.max() < 1e-5, err.max()


def test_kernel_single_path_matches_packed():
    """K not a multiple of 8 takes the single-keypoint kernel; both paths
    must agree (same flags semantics, same histogram math)."""
    from sift3d_tpu.descriptor import _extract_pallas, _level_radius
    from sift3d_tpu.windows import window_extent

    p = DetectorParams()
    plan = make_plan((48, 48, 48), (1.0, 1.0, 1.0), p)
    rng = np.random.default_rng(1)
    level = jnp.asarray(rng.normal(size=(48, 48, 48)).astype(np.float32))
    coords8 = jnp.asarray(rng.integers(10, 38, (8, 3)), jnp.int32)
    Rm = []
    for _ in range(8):
        q, _r = np.linalg.qr(rng.normal(size=(3, 3)))
        Rm.append(q.astype(np.float32))
    R8 = jnp.asarray(np.stack(Rm))
    sd = plan.scales[0][1]
    rad = _level_radius(sd, p)
    extents = tuple(window_extent(rad / 1.0, 48) for _ in range(3))

    def run(K):
        sd_arr = jnp.full((K,), jnp.float32(sd))
        return _extract_pallas(level, coords8[:K], coords8[:K].astype(
            jnp.float32), R8[:K], sd_arr, (1.0, 1.0, 1.0), extents, 8, p,
            interpret=True)

    h8 = np.asarray(run(8))
    h3 = np.asarray(run(3))
    np.testing.assert_allclose(h3, h8[:3], rtol=1e-6, atol=1e-6)
