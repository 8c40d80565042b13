"""Pallas TPU kernels: the chained Gaussian-pyramid octave builder.

The scale-space blur is an exact banded linear map per axis
(filters.conv_diagonals): out[i] = sum_k Wd[i, k] * in[i + lo + k], with
every boundary quirk (int-truncation mirror, conv_eps upper-edge lerp,
fractional tap lerp — convolve_sep_gen, /root/reference/sift3d/imutil.c:
742-861) encoded in the per-row weights.

chain_octave builds ALL of one octave's levels (+ the DoG pyramid,
build_dog, sift.c:713-732) by threading two HBM buffers through a chain
of aliased pallas_calls: each level's kernel DMA-reads a halo slab of the
previous level straight from the buffer (volume edges handled in-kernel
with clamped copies and zeroed margins — out-of-range taps carry zero
weight by the conv_diagonals contract, so margins only need to be
finite), applies the x and y band passes on the VPU, the z pass as one
f32 MXU contraction against the dense banded operator, and writes the
level plus its DoG through blocked output specs into the aliased
buffers. Per level this costs one read + one write of the volume: no
jnp.stack of levels (measured +2.1 ms/octave at 256^3), no per-level
jnp.pad (a superseded stacked variant paid both and lost to the composed
matmuls, 10.3 vs 7.75 ms; the chain measures ~7.5 ms INCLUDING DoG while
being f32-exact in the reference's sequential program order — the
composed path needs conv_precision="highest", +2 ms, for that).

 - Wx [nx, Bx] / Wy [ny, By]: rows = absolute output coordinate; the z
   operator ships as a dense [nz, nz] matrix built from the band.
 - axis order x, y, z (apply_Sep_FIR_filter, imutil.c:1165-1188).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _halo(lo: int, band: int) -> int:
    """Halo width for one axis: the band's maximum reach from the
    diagonal (the mirror fold plus the conv_eps upper-edge lerp reach
    half_width + 1), rounded up to 8 so slab DMA starts stay
    sublane-aligned when tiles are multiples of 8."""
    reach = max(-lo, lo + band - 1, 1)
    return -(-reach // 8) * 8


# ---------------------------------------------------------------------------
# Chained octave builder: every gpyr level + DoG level of one octave written
# into two HBM buffers threaded through the level chain with
# input_output_aliases — no jnp.stack of levels (measured +2.1 ms/octave at
# 256^3: XLA materializes the concatenate) and no per-level jnp.pad of the
# input (the kernel handles volume edges itself with clamped slab DMAs and
# zeroed margins; out-of-range taps carry zero weight by the
# filters.conv_diagonals contract, so the margin value only has to be
# finite). Each level costs exactly one read + one write of the volume,
# and the DoG level rides along as a free second output
# (build_dog, /root/reference/sift3d/sift.c:713-732).
# ---------------------------------------------------------------------------


def _dma_slab(src, slab, sem, i, j, *, TX, TY, HX, HY, nz, gi, gj):
    """DMA the (TX + 2HX, TY + 2HY) halo slab for tile (i, j) from an
    UNPADDED source: the valid intersection is copied (one of 9 static
    shapes selected by the edge conditions) and the out-of-volume margins
    are zeroed. Requires gi >= 2 and gj >= 2 so at most one x and one y
    edge condition holds per tile."""
    bot_x, top_x = i == 0, i == gi - 1
    bot_y, top_y = j == 0, j == gj - 1
    int_x = jnp.logical_not(bot_x | top_x)
    int_y = jnp.logical_not(bot_y | top_y)

    @pl.when(bot_x)
    def _():
        slab[pl.ds(0, HX)] = jnp.zeros((HX, TY + 2 * HY, nz), jnp.float32)

    @pl.when(top_x)
    def _():
        slab[pl.ds(TX + HX, HX)] = jnp.zeros((HX, TY + 2 * HY, nz),
                                             jnp.float32)

    @pl.when(bot_y)
    def _():
        slab[:, pl.ds(0, HY)] = jnp.zeros((TX + 2 * HX, HY, nz),
                                          jnp.float32)

    @pl.when(top_y)
    def _():
        slab[:, pl.ds(TY + HY, HY)] = jnp.zeros((TX + 2 * HX, HY, nz),
                                                jnp.float32)

    # Dynamic HBM slice starts on the sublane (y) dim must be provably
    # 8-divisible for Mosaic; TY and HY are multiples of 8 by
    # construction, pl.multiple_of carries the proof.
    sx = i * TX - HX
    sy = pl.multiple_of(j * TY - HY, 8)
    cases_x = [(bot_x, jnp.int32(0), HX, TX + HX),
               (int_x, sx, 0, TX + 2 * HX),
               (top_x, sx, 0, TX + HX)]
    cases_y = [(bot_y, jnp.int32(0), HY, TY + HY),
               (int_y, sy, 0, TY + 2 * HY),
               (top_y, sy, 0, TY + HY)]
    for cx, sx, dx, szx in cases_x:
        for cy, sy, dy, szy in cases_y:
            @pl.when(cx & cy)
            def _(sx=sx, sy=sy, dx=dx, dy=dy, szx=szx, szy=szy):
                cp = pltpu.make_async_copy(
                    src.at[pl.ds(sx, szx), pl.ds(sy, szy)],
                    slab.at[pl.ds(dx, szx), pl.ds(dy, szy)], sem)
                cp.start()
                cp.wait()


def _chain_kernel(*args, TX, TY, nz, HX, HY, lox, loy, gi, gj,
                  src_idx, step, emit_dog):
    """One chained level: blur buf[src_idx] (or the external source) into
    the blocked output mapped to buf[dst], with dog[dst-1] = src - blurred
    as the free second output."""
    if step:
        (buf_hbm, dog_hbm, wx_ref, wy_ref, wz_ref,
         buf_out, dog_out, dmax_out, slab, tmp1, tmp2, sem) = args
        del dog_hbm  # aliased through to dog_out; never read
        src = buf_hbm.at[src_idx]
    else:
        (src, wx_ref, wy_ref, wz_ref,
         buf_out, dog_out, slab, tmp1, tmp2, sem) = args
        dmax_out = None
    i = pl.program_id(0)
    j = pl.program_id(1)

    _dma_slab(src, slab, sem, i, j, TX=TX, TY=TY, HX=HX, HY=HY, nz=nz,
              gi=gi, gj=gj)

    Bx = wx_ref.shape[1]
    By = wy_ref.shape[1]

    wx = wx_ref[pl.ds(i * TX, TX), :]                # [TX, Bx]
    for k in range(Bx):
        term = wx[:, k][:, None, None] * slab[pl.ds(HX + lox + k, TX)]
        if k == 0:
            tmp1[:] = term
        else:
            tmp1[:] += term

    wy = wy_ref[pl.ds(j * TY, TY), :]                # [TY, By]
    for k in range(By):
        term = wy[:, k][None, :, None] * tmp1[:, pl.ds(HY + loy + k, TY)]
        if k == 0:
            tmp2[:] = term
        else:
            tmp2[:] += term

    # z pass: one MXU contraction against the dense banded operator
    # (f32 via Precision.HIGHEST).
    out = jax.lax.dot_general(
        tmp2[:].reshape(TX * TY, nz), wz_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST).reshape(TX, TY, nz)
    buf_out[0] = out
    if emit_dog:
        dog = slab[pl.ds(HX, TX), pl.ds(HY, TY)] - out
        dog_out[0] = dog
        # Free per-tile max |DoG|: the extrema threshold pre-pass
        # (peak_thresh * level max |DoG|, sift.c:821-829) otherwise
        # re-reads the whole DoG the chain just wrote. One scalar per
        # grid step into the call's own full-shape SMEM row (small
        # vector blocks fail the Mosaic (8, 128) divisibility rule, and
        # a sub-shape SMEM block fails it on the level dim); entries
        # past gi*gj stay garbage — chain_octave slices exactly (z-pad
        # margins are zero, |0| never wins the max).
        dmax_out[0, i * gj + j] = jnp.max(jnp.abs(dog))


def _copy_kernel(src, buf_out, dog_out, sem, *, TX, TY):
    """Copy the external source into buf[dst] (octave > 0 level 0: the
    downsampled previous-octave level becomes the first level unblurred,
    build_gpyr, sift.c:694-707). dog_out is untouched (garbage until the
    dst=1 step overwrites dog[0])."""
    del dog_out
    i = pl.program_id(0)
    j = pl.program_id(1)
    cp = pltpu.make_async_copy(
        src.at[pl.ds(i * TX, TX), pl.ds(j * TY, TY)], buf_out.at[0], sem)
    cp.start()
    cp.wait()


def chain_tiles(dims, halo, vmem_budget=10 * 1024 * 1024):
    """(TX, TY) for one chained-kernel level at these octave dims and
    this level's halo, or None if ineligible (dims not tileable, fewer
    than 2 tiles per axis, or no tile fits the VMEM budget). The budget
    deliberately undershoots the 16 MB scoped-VMEM limit: Mosaic's FMA
    transients add ~40% on top of the scratch allocations (measured: the
    12 MB-estimated (32, 32) HX=16 configuration compiled to 16.16 MB)."""
    nx, ny, nz = dims
    HX = HY = halo
    for tx in (32, 24, 16, 8):
        # tx >= HX: an interior tile's slab DMA starts at i*TX - HX,
        # which must be >= 0 already at i == 1 (tiles smaller than the
        # halo read before the volume and past its end — measured
        # level-5 rel err 5e-2 at 40x40x128 in interpret mode).
        if nx % tx or nx // tx < 2 or nx < tx + 2 * HX or tx < HX:
            continue
        for ty in (32, 24, 16, 8):
            if ny % ty or ny // ty < 2 or ny < ty + 2 * HY or ty < HY:
                continue
            slab = (tx + 2 * HX) * (ty + 2 * HY) * nz * 4
            tmp1 = tx * (ty + 2 * HY) * nz * 4
            tmp2 = tx * ty * nz * 4
            # double-buffered output blocks (the dmax rows live in SMEM)
            outs = 2 * 2 * tx * ty * nz * 4
            if slab + tmp1 + tmp2 + outs + nz * nz * 4 <= vmem_budget:
                return tx, ty
    return None


def _dense_z(Wz, lo, nz, nzp=None):
    """Dense z-pass operator [nz(in), nz(out)] from the band; nzp embeds
    it into a zero-padded [nzp, nzp] (lane-tile-aligned buffers: padded
    rows/cols carry zero weight, so margin voxels stay exactly zero and
    the first nz outputs are bit-identical to the unpadded operator)."""
    dense = np.zeros((nz, nz), np.float32)
    rows = np.arange(nz)
    Wz = np.asarray(Wz)
    for k in range(Wz.shape[1]):
        cols = rows + lo + k
        m = (cols >= 0) & (cols < nz)
        dense[rows[m], cols[m]] += Wz[m, k]
    dense = dense.T                              # [nz(in), nz(out)]
    if nzp is not None and nzp != nz:
        dense = np.pad(dense, ((0, nzp - nz), (0, nzp - nz)))
    return dense


def _pad_lane(nz: int) -> int:
    """z extent rounded up to a whole number of 128-lane tiles (Mosaic
    requires the DMA'd slab's lane extent be tile-aligned)."""
    return -(-nz // 128) * 128


def _level_halo(diags) -> int:
    (Wx, lox), (Wy, loy), _ = diags
    return max(_halo(lox, np.asarray(Wx).shape[1]),
               _halo(loy, np.asarray(Wy).shape[1]))


def _chain_call(buf, dog, src_ext, diags, L, dims, dst,
                interpret=False, nz_logical=None):
    """One link of the chain. buf/dog None (with src_ext set) creates the
    buffers; diags None copies src_ext into buf[dst] unblurred. Tiles are
    sized per level from ITS band halo (wide-band levels take smaller
    tiles to fit VMEM). dims are the BUFFER dims (z lane-tile-padded);
    nz_logical is the volume's true z extent (z-operator rows/cols beyond
    it are zero, see _dense_z).

    Step calls (dst >= 1) return a third output: this call's per-tile
    max |DoG| as one SMEM scalar per grid step (flat i*gj + j) in a
    full-shape (1, gi*gj) row — NOT threaded through the aliasing (each
    call owns its row; chain_octave stacks them)."""
    nx, ny, nz = dims
    if nz_logical is None:
        nz_logical = nz
    tiles = chain_tiles(dims, 0 if diags is None else _level_halo(diags))
    assert tiles is not None, (dims, dst)
    TX, TY = tiles
    gi, gj = nx // TX, ny // TY
    first = buf is None
    out_shape = [jax.ShapeDtypeStruct((L,) + tuple(dims), jnp.float32),
                 jax.ShapeDtypeStruct((L - 1,) + tuple(dims), jnp.float32)]
    out_specs = [
        pl.BlockSpec((1, TX, TY, nz), lambda i, j: (dst, i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TX, TY, nz),
                     lambda i, j: (max(dst - 1, 0), i, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    if not first:
        out_shape.append(jax.ShapeDtypeStruct((1, gi * gj), jnp.float32))
        out_specs.append(pl.BlockSpec((1, gi * gj), lambda i, j: (0, 0),
                                      memory_space=pltpu.SMEM))
    if diags is None:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0, grid=(gi, gj),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=out_specs,
            scratch_shapes=[pltpu.SemaphoreType.DMA])
        return pl.pallas_call(
            functools.partial(_copy_kernel, TX=TX, TY=TY),
            grid_spec=grid_spec, out_shape=out_shape,
            interpret=interpret)(src_ext)

    (Wx, lox), (Wy, loy), (Wz, loz) = diags
    HX = _halo(lox, Wx.shape[1])
    HY = _halo(loy, Wy.shape[1])
    Wxd = jnp.asarray(np.asarray(Wx, np.float32))
    Wyd = jnp.asarray(np.asarray(Wy, np.float32))
    Wzd = jnp.asarray(_dense_z(Wz, loz, nz_logical, nz))
    kernel = functools.partial(
        _chain_kernel, TX=TX, TY=TY, nz=nz, HX=HX, HY=HY,
        lox=int(lox), loy=int(loy), gi=gi, gj=gj,
        src_idx=dst - 1, step=not first, emit_dog=not first)
    w_specs = [
        pl.BlockSpec(Wxd.shape, lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(Wyd.shape, lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(Wzd.shape, lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    scratch = [
        pltpu.VMEM((TX + 2 * HX, TY + 2 * HY, nz), jnp.float32),
        pltpu.VMEM((TX, TY + 2 * HY, nz), jnp.float32),
        pltpu.VMEM((TX, TY, nz), jnp.float32),
        pltpu.SemaphoreType.DMA,
    ]
    if first:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0, grid=(gi, gj),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + w_specs,
            out_specs=out_specs, scratch_shapes=scratch)
        return pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
            interpret=interpret)(src_ext, Wxd, Wyd, Wzd)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0, grid=(gi, gj),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)] + w_specs,
        out_specs=out_specs, scratch_shapes=scratch)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape,
        input_output_aliases={0: 0, 1: 1},
        interpret=interpret)(buf, dog, Wxd, Wyd, Wzd)


def chain_octave(src, plan, octave: int, interpret: bool = False):
    """All num_gpyr_levels levels + DoG of one octave as a chain of
    aliased Pallas calls. src: the [-1,1]-scaled input (octave 0, blurred
    sigma_n -> first level) or the downsampled previous-octave level
    (octave > 0, copied in unblurred). Returns (gpyr [L, nx, ny, nz],
    dog [L-1, nx, ny, nz], dogmax f32[L-1] per-level max |DoG| — the
    extrema threshold input, computed per tile inside the kernel so the
    threshold pre-pass never re-reads the DoG). Call chain_eligible
    first.

    A z extent that is not a whole number of 128-lane tiles (192^3) runs
    on z-padded buffers: the padded input margin is zero, the z operator
    carries zero weight into/out of the margin (_dense_z), so every
    level's margin stays exactly zero and the [:, :, :nz] slice of the
    padded chain is bit-identical to the unpadded program."""
    L = plan.num_gpyr_levels
    dims = plan.octave_dims[octave]
    assert chain_eligible(plan, octave), (dims,)
    nx, ny, nz = dims
    nzp = _pad_lane(nz)
    if nzp != nz:
        src = jnp.pad(src, ((0, 0), (0, 0), (0, nzp - nz)))
    pdims = (nx, ny, nzp)
    if octave == 0:
        diags0 = plan.conv_diags(0, plan.first_taps)
        buf, dog = _chain_call(None, None, src, diags0, L, pdims, 0,
                               interpret, nz_logical=nz)
    else:
        buf, dog = _chain_call(None, None, src, None, L, pdims, 0,
                               interpret, nz_logical=nz)
    dmax_rows = []
    for i in range(1, L):
        diags = plan.conv_diags(octave, plan.level_taps[i])
        buf, dog, dmx = _chain_call(buf, dog, None, diags, L, pdims, i,
                                    interpret, nz_logical=nz)
        dmax_rows.append(jnp.max(dmx))
    dogmax = jnp.stack(dmax_rows)
    if nzp != nz:
        return buf[:, :, :, :nz], dog[:, :, :, :nz], dogmax
    return buf, dog, dogmax


def chain_eligible(plan, octave: int) -> bool:
    """True if the chained builder supports this octave (every level's
    tiles exist); else the caller falls back to the composed builder.
    z extents below 64 are rejected: the lane-tile pad (z -> 128) would
    more than double the slab DMA traffic and the dense z-operator cost
    on an octave the composed fallback handles cheaply."""
    dims = plan.octave_dims[octave]
    nz = dims[2]
    nzp = _pad_lane(nz)
    if nz < 64 or nzp > 2 * nz:
        return False
    pdims = (dims[0], dims[1], nzp)
    L = plan.num_gpyr_levels
    diag_sets = [plan.conv_diags(octave, plan.level_taps[i])
                 for i in range(1, L)]
    if octave == 0:
        diag_sets.append(plan.conv_diags(0, plan.first_taps))
    return all(chain_tiles(pdims, _level_halo(d)) is not None
               for d in diag_sets)
