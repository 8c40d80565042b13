"""Chained Pallas gpyr builder vs the diagonal-form XLA reference
(interpret mode on CPU)."""

import numpy as np

import jax.numpy as jnp

from sift3d_tpu.params import DetectorParams
from sift3d_tpu.pyramid import make_plan, scale_to_unit


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

    gp0, dog0, dmx0 = chain_octave(vol, plan, 0, interpret=True)
    scale = float(np.abs(np.asarray(ref[0])).max())
    assert np.abs(np.asarray(gp0) - np.asarray(ref[0])).max() \
        / scale < 1e-6
    assert np.abs(np.asarray(dog0) - np.asarray(ref_dog[0])).max() \
        / scale < 1e-6
    # fused per-tile max output == the recomputed per-level max |DoG|
    # (bit-identical: max over the same f32 values, order-free)
    np.testing.assert_array_equal(
        np.asarray(dmx0), np.max(np.abs(np.asarray(dog0)), axis=(1, 2, 3)))

    if chain_eligible(plan, 1):
        L = plan.num_gpyr_levels
        src = downsample_2x_matmul(gp0[L - 3])
        gp1, dog1, _ = chain_octave(src, plan, 1, interpret=True)
        assert np.abs(np.asarray(gp1) - np.asarray(ref[1])).max() \
            / scale < 1e-6
        assert np.abs(np.asarray(dog1) - np.asarray(ref_dog[1])).max() \
            / scale < 1e-6


def test_chain_octave_anisotropic_units():
    """Anisotropic voxel units (fractional, linearly-interpolated tap
    positions — convolve_sep_gen's unit_factor path) through the chain
    kernel match the diagonal-form XLA reference."""
    from sift3d_tpu.ops.blur_kernel import chain_eligible, chain_octave
    from sift3d_tpu.pyramid import build_gpyr_incremental

    params = DetectorParams()
    dims = (96, 128, 128)     # nz a whole number of 128-lane tiles
    units = (1.0, 1.0, 2.5)   # thick-slice MRI
    plan = make_plan(dims, units, params)
    assert chain_eligible(plan, 0)
    rng = np.random.default_rng(5)
    vol = scale_to_unit(jnp.asarray(
        rng.normal(size=dims).astype(np.float32)))
    ref = build_gpyr_incremental(vol, plan)
    gp0, dog0, _ = chain_octave(vol, plan, 0, interpret=True)
    scale = float(np.abs(np.asarray(ref[0])).max())
    assert np.abs(np.asarray(gp0) - np.asarray(ref[0])).max() \
        / scale < 1e-6
    ref_dog0 = np.asarray(ref[0][:-1] - ref[0][1:])
    assert np.abs(np.asarray(dog0) - ref_dog0).max() / scale < 1e-6


def test_chain_octave_lane_padded_z():
    """A z extent that is not a whole number of 128-lane tiles (the 192^3
    registration size class) runs the chain on z-padded buffers; the
    sliced result must match the sequential reference to f32 rounding
    (the padded margin carries zero weight end to end)."""
    from sift3d_tpu.ops.blur_kernel import chain_eligible, chain_octave
    from sift3d_tpu.pyramid import build_gpyr_incremental

    params = DetectorParams()
    dims = (96, 128, 96)      # nz 96 -> padded 128
    plan = make_plan(dims, (1.0, 1.0, 1.0), params)
    assert chain_eligible(plan, 0)
    rng = np.random.default_rng(9)
    vol = scale_to_unit(jnp.asarray(
        rng.normal(size=dims).astype(np.float32)))
    ref = build_gpyr_incremental(vol, plan)
    gp0, dog0, dmx0 = chain_octave(vol, plan, 0, interpret=True)
    assert gp0.shape == (plan.num_gpyr_levels,) + dims
    np.testing.assert_array_equal(
        np.asarray(dmx0), np.max(np.abs(np.asarray(dog0)), axis=(1, 2, 3)))
    scale = float(np.abs(np.asarray(ref[0])).max())
    assert np.abs(np.asarray(gp0) - np.asarray(ref[0])).max() \
        / scale < 1e-6
    ref_dog0 = np.asarray(ref[0][:-1] - ref[0][1:])
    assert np.abs(np.asarray(dog0) - ref_dog0).max() / scale < 1e-6


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


def test_chain_tiles_budget():
    """Tile selection respects divisibility and the VMEM budget; wide
    halos take smaller tiles."""
    from sift3d_tpu.ops.blur_kernel import chain_tiles

    assert chain_tiles((256, 256, 256), 8) == (32, 32)
    tx, ty = chain_tiles((256, 256, 256), 16)   # wide band: smaller tile
    assert (tx, ty) != (32, 32)
    assert 256 % tx == 0 and 256 % ty == 0
    assert chain_tiles((150, 150, 256), 8) is None      # not tileable
    assert chain_tiles((32, 32, 256), 16) is None       # < 2 tiles/axis


def test_chain_tiles_never_smaller_than_halo():
    """A tile smaller than the halo makes interior-tile slab DMAs start
    before the volume (i*TX - HX < 0 at i=1) and read TX + 2HX past nx —
    silently wrong levels (measured 5e-2 rel err at 40x40x128 before the
    fix). 40 is divisible by 8 but by none of 16/24/32, so halo-16 bands
    must be rejected, and any returned tile must cover its halo."""
    from sift3d_tpu.ops.blur_kernel import chain_tiles

    assert chain_tiles((40, 40, 128), 16) is None
    assert chain_tiles((200, 200, 128), 24) is None     # 200 % 8 == 0 only
    for dims in [(40, 40, 128), (200, 200, 128), (256, 256, 256),
                 (96, 128, 128), (192, 192, 256)]:
        for halo in (8, 16, 24, 32):
            t = chain_tiles(dims, halo)
            if t is not None:
                assert t[0] >= halo and t[1] >= halo, (dims, halo, t)
