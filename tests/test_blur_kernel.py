"""Pallas fused-blur kernel vs the diagonal-form XLA reference
(interpret mode on CPU)."""

import numpy as np

import jax.numpy as jnp

from sift3d_tpu.filters import (conv_diagonals, gauss_kernel,
                                incremental_sigma)
from sift3d_tpu.params import DetectorParams
from sift3d_tpu.pyramid import blur_diag, make_plan, scale_to_unit
from sift3d_tpu.ops.blur_kernel import blur3d_pallas


def _check(dims, taps, ufs=(1.0, 1.0, 1.0)):
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.normal(size=dims).astype(np.float32))
    diags = [conv_diagonals(dims[a], taps, ufs[a]) for a in range(3)]
    ref = np.asarray(blur_diag(vol, diags, DetectorParams()))
    out, dog = blur3d_pallas(vol, diags, interpret=True)
    scale = np.abs(ref).max()
    assert np.abs(ref - np.asarray(out)).max() / scale < 1e-6
    # dog rounding is relative to the (larger) unblurred input amplitudes
    assert np.abs((np.asarray(vol) - ref) - np.asarray(dog)).max() \
        / np.abs(np.asarray(vol)).max() < 1e-6


def test_blur_kernel_cube():
    taps = gauss_kernel(incremental_sigma(1.6, 2.02))
    _check((64, 64, 64), taps)


def test_blur_kernel_odd_dims_wide_band():
    # Widest incremental band (14 taps) + dims that exercise partial
    # final tiles on x and non-128 lanes on z.
    taps = gauss_kernel(incremental_sigma(2.54, 3.2))
    _check((100, 80, 72), taps)


def test_blur_kernel_fractional_units():
    # Deeper-octave fractional tap spacing (unit_factor < 1).
    taps = gauss_kernel(incremental_sigma(1.6, 2.02))
    _check((48, 40, 72), taps, ufs=(0.5, 0.5, 0.25))


def test_blur_kernel_level_chain_matches_sequential():
    """A two-level chain through the kernel matches build_gpyr_sequential's
    first octave levels."""
    from sift3d_tpu.pyramid import build_gpyr_sequential

    params = DetectorParams()
    dims = (40, 40, 40)
    plan = make_plan(dims, (1.0, 1.0, 1.0), params)
    rng = np.random.default_rng(1)
    vol = scale_to_unit(jnp.asarray(
        rng.normal(size=dims).astype(np.float32)))
    ref = np.asarray(build_gpyr_sequential(vol, plan)[0])
    lvl0, _ = blur3d_pallas(vol, plan.conv_diags(0, plan.first_taps),
                            interpret=True)
    lvl1, dog0 = blur3d_pallas(lvl0, plan.conv_diags(0, plan.level_taps[1]),
                               interpret=True)
    scale = np.abs(ref[0]).max()
    assert np.abs(np.asarray(lvl0) - ref[0]).max() / scale < 1e-6
    assert np.abs(np.asarray(lvl1) - ref[1]).max() / scale < 1e-6
    assert np.abs(np.asarray(dog0) - (ref[0] - ref[1])).max() / scale < 1e-6


def test_chain_octave_matches_sequential():
    """The chained aliased builder (interpret mode) matches the
    reference-order sequential builder to f32 rounding: gpyr levels AND
    the fused DoG outputs, octave 0 (blur-first) and octave 1 (copy-in
    downsample)."""
    from sift3d_tpu.ops.blur_kernel import chain_eligible, chain_octave
    from sift3d_tpu.pyramid import (build_dog, build_gpyr_incremental,
                                    downsample_2x_matmul)

    params = DetectorParams()
    dims = (256, 128, 128)   # octaves 0 and 1 eligible (nz 128)
    plan = make_plan(dims, (1.0, 1.0, 1.0), params)
    assert chain_eligible(plan, 0)
    rng = np.random.default_rng(3)
    vol = scale_to_unit(jnp.asarray(
        rng.normal(size=dims).astype(np.float32)))
    ref = build_gpyr_incremental(vol, plan)
    ref_dog = build_dog(ref)

    gp0, dog0 = chain_octave(vol, plan, 0, interpret=True)
    scale = float(np.abs(np.asarray(ref[0])).max())
    assert np.abs(np.asarray(gp0) - np.asarray(ref[0])).max() \
        / scale < 1e-6
    assert np.abs(np.asarray(dog0) - np.asarray(ref_dog[0])).max() \
        / scale < 1e-6

    if chain_eligible(plan, 1):
        L = plan.num_gpyr_levels
        src = downsample_2x_matmul(gp0[L - 3])
        gp1, dog1 = chain_octave(src, plan, 1, interpret=True)
        assert np.abs(np.asarray(gp1) - np.asarray(ref[1])).max() \
            / scale < 1e-6
        assert np.abs(np.asarray(dog1) - np.asarray(ref_dog[1])).max() \
            / scale < 1e-6


def test_build_gpyr_and_dog_chain_matches_composed():
    """gpyr_impl='chain' through build_gpyr_and_dog (interpret mode),
    including the exact-composed fallback octaves, matches the sequential
    reference within chain-accumulated f32 rounding."""
    from sift3d_tpu.pyramid import (build_dog, build_gpyr_incremental,
                                    build_gpyr_and_dog)

    params = DetectorParams(gpyr_impl="chain")
    dims = (128, 128, 128)
    plan = make_plan(dims, (1.0, 1.0, 1.0), params)
    rng = np.random.default_rng(4)
    vol = scale_to_unit(jnp.asarray(
        rng.normal(size=dims).astype(np.float32)))
    ref = build_gpyr_incremental(vol, plan)
    ref_dog = build_dog(ref)
    gp, dog = build_gpyr_and_dog(vol, plan, use_pallas=True, interpret=True)
    for o in range(plan.num_octaves):
        a, b = np.asarray(ref[o]), np.asarray(gp[o])
        scale = np.abs(a).max()
        assert np.abs(a - b).max() / scale < 2e-6, o
        a, b = np.asarray(ref_dog[o]), np.asarray(dog[o])
        assert np.abs(a - b).max() / scale < 2e-6, o


def test_build_gpyr_and_dog_pallas_matches_composed():
    """The pallas-fused builder (interpret mode) matches the composed
    builder's pyramid and DoG to f32 tolerance, including the composed
    fallback for small octaves."""
    from sift3d_tpu.pyramid import build_dog, build_gpyr, build_gpyr_and_dog

    params = DetectorParams(gpyr_impl="pallas")
    dims = (128, 128, 128)   # octave 0 pallas (nz=128), octave 1+ composed
    plan = make_plan(dims, (1.0, 1.0, 1.0), params)
    rng = np.random.default_rng(2)
    vol = scale_to_unit(jnp.asarray(
        rng.normal(size=dims).astype(np.float32)))
    ref_gp = build_gpyr(vol, plan)
    ref_dog = build_dog(ref_gp)
    gp, dog = build_gpyr_and_dog(vol, plan, use_pallas=True, interpret=True)
    assert len(gp) == len(ref_gp) and len(dog) == len(ref_dog)
    for o in range(len(gp)):
        # composed folds each level into one f64-composed operator while
        # the kernel chains f32 incremental blurs; rounding accumulates
        # along the chain.
        a, b = np.asarray(ref_gp[o]), np.asarray(gp[o])
        scale = np.abs(a).max()
        assert np.abs(a - b).max() / scale < 2e-5, o
        a, b = np.asarray(ref_dog[o]), np.asarray(dog[o])
        assert np.abs(a - b).max() / scale < 2e-5, o
