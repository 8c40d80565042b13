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


def test_face_geometry_dot_precision():
    """The face-geometry products (mt @ g) must never run as a plain MXU
    DEFAULT dot: their outputs feed the bary_eps hit tests and every
    barycentric weight, and a single bf16 pass put ~4e-3 relative noise on
    them — measured as a 0.4% median descriptor error floor vs the C
    oracle at 256^3 (>1% on edge-clipped windows), invisible in CPU tests.
    The kernel computes all 60 rows exactly on the VPU as broadcast FMAs
    (a [60, 3] dot would also waste 125/128 of the MXU's systolic depth);
    guard the jaxpr so no face-geometry dot_general sneaks back in at an
    unsafe precision."""
    from jax.lax import Precision
    from sift3d_tpu.ops.desc_kernel import desc_hist_pallas

    def walk(jaxpr, out):
        for eqn in jaxpr.eqns:
            if eqn.primitive.name == "dot_general":
                out.append((eqn.invars[0].aval.shape,
                            eqn.params.get("precision")))
            for v in eqn.params.values():
                for leaf in jax.tree_util.tree_leaves(
                        v, is_leaf=lambda x: hasattr(x, "eqns")):
                    if hasattr(leaf, "eqns"):
                        walk(leaf, out)
                    elif hasattr(leaf, "jaxpr"):
                        walk(leaf.jaxpr, out)
        return out

    ok = (Precision.HIGH, Precision.HIGHEST)
    for K in (8, 3):  # packed and single-keypoint kernels
        grot = jnp.zeros((K, 3, 8192), jnp.float32)
        vbins = jnp.zeros((K, 3, 8192), jnp.float32)
        jx = jax.make_jaxpr(lambda g, v: desc_hist_pallas(g, v))(grot, vbins)
        dots = walk(jx.jaxpr, [])
        for shape, prec in dots:
            if shape in ((60, 3), (20, 3), (40, 3), (40, 9)):
                # any face-geometry dot must be high-precision
                assert prec is not None and all(p in ok for p in prec), (
                    f"face-geometry dot {shape} at unsafe precision {prec}")


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


def test_mixed_level_sorted_packs_match_xla():
    """K > 8 mixed-level extraction level-sorts slots into same-level
    packs and skips invalid slots' windows wholesale; results must match
    the XLA path slot for slot (invalid slots zero)."""
    from sift3d_tpu.descriptor import extract_descriptors
    from sift3d_tpu.pyramid import make_plan

    p = DetectorParams()
    plan = make_plan((48, 48, 48), (1.0, 1.0, 1.0), p)
    rng = np.random.default_rng(3)
    L = 3
    levels = jnp.asarray(rng.normal(size=(L, 48, 48, 48)).astype(np.float32))
    K = 16
    coords = jnp.asarray(rng.integers(10, 38, (K, 3)), jnp.int32)
    Rm = []
    for _ in range(K):
        q, _r = np.linalg.qr(rng.normal(size=(3, 3)))
        Rm.append(q.astype(np.float32))
    R = jnp.asarray(np.stack(Rm))
    # interleaved levels + a scattering of invalid slots
    lvl = jnp.asarray(rng.integers(0, L, K), jnp.int32)
    valid = jnp.asarray(rng.uniform(size=K) < 0.7)
    scales = np.asarray([plan.scales[0][1 + s] for s in range(L)],
                        np.float32)
    sd = jnp.asarray(scales)[lvl]
    sd_max = float(scales.max())

    kw = dict(octave=0, units=(1.0, 1.0, 1.0), params=p, sd_max=sd_max,
              level_index=lvl, kp_chunk=K)
    ref = extract_descriptors(levels, coords, R, valid, sd, use_pallas=False,
                              **kw)

    from sift3d_tpu.descriptor import (_extract_pallas, _level_radius,
                                       _normalize)
    from sift3d_tpu.windows import window_extent
    rad = _level_radius(sd_max, p)
    extents = tuple(window_extent(rad / 1.0, 48) for _ in range(3))
    hists = _extract_pallas(levels, coords, coords.astype(jnp.float32), R,
                            sd, (1.0, 1.0, 1.0), extents, K, p,
                            interpret=True, level_index=lvl, valid=valid)
    desc = jax.vmap(lambda h: _normalize(h, p))(hists)
    desc = jnp.where(valid[:, None, None], desc, 0.0).reshape(K, -1)

    err = np.abs(np.asarray(desc) - np.asarray(ref.desc))
    assert err.max() < 1e-5, err.max()
    assert not np.asarray(desc)[~np.asarray(valid)].any()


def test_chunked_packs_k_gt_8_match_xla():
    """K=32 through kp_chunk=8 runs the PACKED kernel under lax.map with
    the skip-cond wrapper — the exact shape round 4's working notes
    flagged as returning ~3e-2-off values in interpret mode. That
    anomaly no longer reproduces (bisected round 5: direct call, under
    lax.map, under cond+lax.map, and this end-to-end path all match the
    XLA reference to f32 rounding — the round-4 p_s zero-init at c==0
    plausibly removed an uninitialized-scratch read). This regression
    test keeps the K > 8 chunked packed path under CPU CI."""
    from sift3d_tpu.descriptor import (_extract_pallas, _level_radius,
                                       _normalize, extract_descriptors)
    from sift3d_tpu.pyramid import make_plan
    from sift3d_tpu.windows import window_extent

    p = DetectorParams()
    plan = make_plan((48, 48, 48), (1.0, 1.0, 1.0), p)
    rng = np.random.default_rng(3)
    L = 3
    levels = jnp.asarray(
        rng.normal(size=(L, 48, 48, 48)).astype(np.float32))
    K = 32
    coords = jnp.asarray(rng.integers(10, 38, (K, 3)), jnp.int32)
    R = jnp.asarray(np.stack(
        [np.linalg.qr(rng.normal(size=(3, 3)))[0].astype(np.float32)
         for _ in range(K)]))
    lvl = jnp.asarray(rng.integers(0, L, K), jnp.int32)
    valid = jnp.asarray(rng.uniform(size=K) < 0.7)
    scales = np.asarray([plan.scales[0][1 + s] for s in range(L)],
                        np.float32)
    sd = jnp.asarray(scales)[lvl]
    sd_max = float(scales.max())

    ref = extract_descriptors(levels, coords, R, valid, sd,
                              use_pallas=False, octave=0,
                              units=(1.0, 1.0, 1.0), params=p,
                              sd_max=sd_max, level_index=lvl, kp_chunk=8)
    rad = _level_radius(sd_max, p)
    extents = tuple(window_extent(rad / 1.0, 48) for _ in range(3))
    hists = _extract_pallas(levels, coords, coords.astype(jnp.float32), R,
                            sd, (1.0, 1.0, 1.0), extents, 8, p,
                            interpret=True, level_index=lvl, valid=valid)
    desc = jax.vmap(lambda h: _normalize(h, p))(hists)
    desc = jnp.where(valid[:, None, None], desc, 0.0).reshape(K, -1)
    err = np.abs(np.asarray(desc) - np.asarray(ref.desc))
    assert err.max() < 1e-5, err.max()


def test_affine_vbins_matches_packed():
    """desc_vbins="affine" ships 12 affine coefficients per keypoint +
    one shared coordinate array instead of flattened [3, N] vbins; the
    kernel rebuilds vb per voxel (ops/desc_kernel._affine_vb). Masking
    decisions are still made in prep on the original formula, so the two
    layouts agree to ulp-level interpolation-weight noise — on the
    packed (K=8), single (K=3), and mixed-level chunked (K=16) paths."""
    from sift3d_tpu.descriptor import (_extract_pallas, _level_radius,
                                       _normalize, extract_descriptors)
    from sift3d_tpu.pyramid import make_plan
    from sift3d_tpu.windows import window_extent

    rng = np.random.default_rng(5)
    L = 3
    levels = jnp.asarray(
        rng.normal(size=(L, 48, 48, 48)).astype(np.float32))
    K = 16
    coords = jnp.asarray(rng.integers(10, 38, (K, 3)), jnp.int32)
    R = jnp.asarray(np.stack(
        [np.linalg.qr(rng.normal(size=(3, 3)))[0].astype(np.float32)
         for _ in range(K)]))
    lvl = jnp.asarray(rng.integers(0, L, K), jnp.int32)
    valid = jnp.asarray(rng.uniform(size=K) < 0.7)
    base = DetectorParams()
    plan = make_plan((48, 48, 48), (1.0, 1.0, 1.0), base)
    scales = np.asarray([plan.scales[0][1 + s] for s in range(L)],
                        np.float32)
    sd = jnp.asarray(scales)[lvl]
    sd_max = float(scales.max())
    rad = _level_radius(sd_max, base)
    extents = tuple(window_extent(rad / 1.0, 48) for _ in range(3))

    def run(p, k):
        return np.asarray(_extract_pallas(
            levels, coords[:k], coords[:k].astype(jnp.float32), R[:k],
            sd[:k], (1.0, 1.0, 1.0), extents, 8, p, interpret=True,
            level_index=lvl[:k], valid=valid[:k]))

    for k in (8, 3, 16):  # packed, single, chunked-mixed
        hp = run(DetectorParams(), k)
        ha = run(DetectorParams(desc_vbins="affine"), k)
        scale = np.abs(hp).max()
        assert np.abs(hp - ha).max() / scale < 1e-5, (
            k, np.abs(hp - ha).max() / scale)

    # and against the XLA reference end to end
    p = DetectorParams(desc_vbins="affine")
    ref = extract_descriptors(levels, coords, R, valid, sd,
                              use_pallas=False, octave=0,
                              units=(1.0, 1.0, 1.0), params=p,
                              sd_max=sd_max, level_index=lvl, kp_chunk=8)
    hists = _extract_pallas(levels, coords, coords.astype(jnp.float32), R,
                            sd, (1.0, 1.0, 1.0), extents, 8, p,
                            interpret=True, level_index=lvl, valid=valid)
    desc = jax.vmap(lambda h: _normalize(h, p))(hists)
    desc = jnp.where(valid[:, None, None], desc, 0.0).reshape(K, -1)
    err = np.abs(np.asarray(desc) - np.asarray(ref.desc))
    assert err.max() < 1e-5, err.max()


def test_aligned_flat_prep_matches_dense():
    """The tiling-preserving flatten (pad y to 8 / z to a 128-lane tile,
    reshape layout-free) must agree with the dense-repack flatten to f32
    accumulation-order noise — the padded dead lanes carry zero
    gradients, so their histogram contribution is exactly zero; only the
    MXU tile grouping (summation order) changes."""
    from sift3d_tpu.descriptor import _extract_pallas, _level_radius
    from sift3d_tpu.pyramid import make_plan
    from sift3d_tpu.windows import window_extent

    p = DetectorParams()
    rng = np.random.default_rng(3)
    level = jnp.asarray(rng.normal(size=(3, 48, 48, 48)).astype(np.float32))
    K = 8
    coords = jnp.asarray(rng.integers(10, 38, (K, 3)), jnp.int32)
    R = jnp.asarray(np.stack(
        [np.linalg.qr(rng.normal(size=(3, 3)))[0].astype(np.float32)
         for _ in range(K)]))
    lvl = jnp.asarray(rng.integers(0, 3, K), jnp.int32)
    valid = jnp.asarray(rng.uniform(size=K) < 0.8)
    plan = make_plan((48, 48, 48), (1.0, 1.0, 1.0), p)
    scales = np.asarray([plan.scales[0][1 + s] for s in range(3)],
                        np.float32)
    sd = jnp.asarray(scales)[lvl]
    rad = _level_radius(float(scales.max()), p)
    extents = tuple(window_extent(rad / 1.0, 48) for _ in range(3))
    kw = dict(interpret=True, level_index=lvl, valid=valid)
    h_dense = _extract_pallas(level, coords, coords.astype(jnp.float32),
                              R, sd, (1.0, 1.0, 1.0), extents, 8, p,
                              aligned_flat=False, **kw)
    h_al = _extract_pallas(level, coords, coords.astype(jnp.float32),
                           R, sd, (1.0, 1.0, 1.0), extents, 8, p,
                           aligned_flat=True, **kw)
    scale = np.abs(np.asarray(h_dense)).max()
    assert np.abs(np.asarray(h_dense) - np.asarray(h_al)).max() / scale \
        < 1e-5
