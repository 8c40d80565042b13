"""Unit tests for the pyramid plan and builders (no oracle needed)."""

import numpy as np
import pytest

import jax.numpy as jnp

from sift3d_tpu.params import DetectorParams
from sift3d_tpu.pyramid import (build_dog, build_gpyr, downsample_2x,
                                make_plan, scale_to_unit)


def test_plan_structure():
    p = DetectorParams()
    plan = make_plan((64, 64, 64), (1.0, 1.0, 1.0), p)
    assert plan.num_octaves == 4
    assert plan.octave_dims == ((64,) * 3, (32,) * 3, (16,) * 3, (8,) * 3)
    assert plan.num_gpyr_levels == 6
    # scale schedule sigma0 * 2^(o + s/3), s = stacked - 1
    assert plan.scales[0][1] == pytest.approx(1.6)
    assert plan.scales[1][1] == pytest.approx(3.2)
    assert plan.scales[0][0] == pytest.approx(1.6 * 2 ** (-1 / 3))
    # scale continuity at the downsample point
    assert plan.scales[0][plan.num_gpyr_levels - 3] == pytest.approx(
        plan.scales[1][0])


def test_plan_odd_dims():
    p = DetectorParams()
    plan = make_plan((100, 80, 72), (1.0, 1.0, 1.0), p)
    # octave count from min dim 72: floor(log2(72)) = 6 -> 4 octaves
    assert plan.num_octaves == 4
    assert plan.octave_dims[1] == (50, 40, 36)
    assert plan.octave_dims[2] == (25, 20, 18)
    assert plan.octave_dims[3] == (12, 10, 9)


def test_too_small_input():
    p = DetectorParams()
    with pytest.raises(ValueError):
        make_plan((7, 64, 64), (1.0, 1.0, 1.0), p)


def test_scale_to_unit():
    v = jnp.asarray(np.array([[-4.0, 2.0]]))
    out = np.asarray(scale_to_unit(v))
    assert out.min() == -1.0 and out.max() == 0.5
    z = jnp.zeros((2, 2))
    assert np.all(np.asarray(scale_to_unit(z)) == 0.0)


def test_downsample_2x():
    v = jnp.asarray(np.arange(5 * 6 * 7, dtype=np.float32).reshape(5, 6, 7))
    d = np.asarray(downsample_2x(v))
    assert d.shape == (2, 3, 3)
    assert d[1, 2, 2] == np.asarray(v)[2, 4, 4]


def test_downsample_2x_matmul_bit_exact():
    """The MXU selection-matmul downsample must be bit-identical to the
    strided slice (each output element is one picked input element)."""
    from sift3d_tpu.pyramid import downsample_2x_matmul
    rng = np.random.default_rng(3)
    v = jnp.asarray(rng.normal(size=(64, 32, 128)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(downsample_2x_matmul(v)),
                                  np.asarray(downsample_2x(v)))


def test_gpyr_matches_scipy_interior():
    """Octave-0 levels must match scipy gaussian_filter in the interior
    (the boundary rule differs from scipy's modes by design)."""
    from scipy.ndimage import gaussian_filter
    from sift3d_tpu.filters import incremental_sigma

    rng = np.random.default_rng(3)
    vol = rng.normal(size=(24, 24, 24)).astype(np.float32)
    p = DetectorParams()
    plan = make_plan(vol.shape, (1.0, 1.0, 1.0), p)
    x = scale_to_unit(jnp.asarray(vol))
    g = build_gpyr(x, plan)
    sig = incremental_sigma(p.sigma_n, plan.scales[0][0])
    ref = gaussian_filter(np.asarray(x), sig, truncate=3.0 / sig *
                          max(int(np.ceil(3 * sig)), 1), mode="mirror")
    got = np.asarray(g[0][0])
    m = 10  # stay away from both boundary handling differences
    assert np.allclose(ref[m:-m, m:-m, m:-m], got[m:-m, m:-m, m:-m],
                       atol=2e-3)


def test_dog():
    p = DetectorParams()
    plan = make_plan((16, 16, 16), (1.0, 1.0, 1.0), p)
    vol = jnp.asarray(np.random.default_rng(0).normal(
        size=(16, 16, 16)).astype(np.float32))
    g = build_gpyr(scale_to_unit(vol), plan)
    d = build_dog(g)
    assert len(d) == plan.num_octaves
    assert d[0].shape[0] == plan.num_dog_levels
    np.testing.assert_allclose(np.asarray(d[0][0]),
                               np.asarray(g[0][0] - g[0][1]), rtol=1e-6)


def test_gpyr_incremental_matches_sequential():
    """The diagonal-form incremental chain (gpyr_impl="incremental") must
    match the sequential banded-matmul chain to f32 rounding at every
    octave, including odd dims and anisotropic units (fractional tap
    spacing at deeper octaves)."""
    from sift3d_tpu.pyramid import build_gpyr_incremental, build_gpyr_sequential

    rng = np.random.default_rng(7)
    vol = rng.normal(size=(42, 36, 33)).astype(np.float32)
    p = DetectorParams()
    plan = make_plan(vol.shape, (1.0, 1.1, 0.9), p)
    x = scale_to_unit(jnp.asarray(vol))
    a = build_gpyr_sequential(x, plan)
    b = build_gpyr_incremental(x, plan)
    assert len(a) == len(b)
    for o, (xa, xb) in enumerate(zip(a, b)):
        xa, xb = np.asarray(xa), np.asarray(xb)
        scale = max(np.abs(xa).max(), 1e-30)
        assert np.abs(xa - xb).max() / scale < 5e-6, o


def test_gpyr_impl_param_dispatch():
    p = DetectorParams(gpyr_impl="incremental")
    plan = make_plan((16, 16, 16), (1.0, 1.0, 1.0), p)
    vol = scale_to_unit(jnp.asarray(np.random.default_rng(1).normal(
        size=(16, 16, 16)).astype(np.float32)))
    from sift3d_tpu.pyramid import build_gpyr_incremental
    a = build_gpyr(vol, plan)
    b = build_gpyr_incremental(vol, plan)
    for xa, xb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))
    with pytest.raises(ValueError):
        DetectorParams(gpyr_impl="banded")


def test_conv_exact_from_octave_policy():
    """Octaves >= conv_exact_from_octave must run every blur einsum at
    HIGHEST precision regardless of conv_precision (they cost ~8^-o of
    octave 0; exactness there removes bf16x3 flips of near-threshold
    extrema — the dense 256^3 bench's 849/850 keypoint gap vs the C
    oracle). Pin the composed-group policy and the jaxpr of the builder."""
    import jax
    from jax.lax import Precision
    from sift3d_tpu.pyramid import _composed_groups

    p = DetectorParams(conv_precision="high_xy", conv_exact_from_octave=2)
    # Policy level: octave >= 2 collapses to one all-HIGHEST group.
    assert _composed_groups(p, 2) == [
        (0, p.num_gpyr_levels, (Precision.HIGHEST, Precision.HIGHEST))]
    g01 = _composed_groups(p, 0)
    assert len(g01) == 3  # tail / kp / tail precision split retained
    assert _composed_groups(p, 1) == g01

    # Jaxpr level: a 64^3 build has octaves 0..3; every dot_general fed by
    # an octave >= 2 shape (<= 16^3 volumes) must be HIGHEST. Octave dims
    # identify the groups: einsum operands at octave o have extent 64/2^o.
    plan = make_plan((64, 64, 64), (1.0, 1.0, 1.0), p)
    jx = jax.make_jaxpr(lambda v: build_gpyr(v, plan))(
        jnp.zeros((64, 64, 64), jnp.float32))
    small_dots = [eqn for eqn in jx.jaxpr.eqns
                  if eqn.primitive.name == "dot_general"
                  and all(d <= 16 for v in eqn.invars
                          for d in v.aval.shape)]
    assert small_dots, "no small-octave dots found in the gpyr jaxpr"
    for eqn in small_dots:
        prec = eqn.params.get("precision")
        assert prec is not None and all(
            pr == Precision.HIGHEST for pr in prec), (
            f"small-octave dot at precision {prec}")
