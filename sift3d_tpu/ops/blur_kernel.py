"""Pallas TPU kernel: fused 3-axis separable blur in diagonal (banded) form.

The scale-space blur is an exact banded linear map per axis
(filters.conv_diagonals): out[i] = sum_k Wd[i, k] * in[i + lo + k], with
every boundary quirk (int-truncation mirror, conv_eps upper-edge lerp,
fractional tap lerp — convolve_sep_gen, /root/reference/sift3d/imutil.c:
742-861) encoded in the per-row weights. The XLA formulations pay for it:
dense composed matmuls are MXU-compute-bound in the f32 multi-pass
decomposition, and shifted-slice FMA chains materialize per-shift
intermediates. This kernel reads each input tile once into VMEM, applies
all three axis passes in registers/VMEM (band widths 5-14 on the VPU),
and writes the level once — plus the DoG level as a free second output.

Contract:
 - input is the previous level ZERO-PADDED to
   [grid_i*TX + 2HX, grid_j*TY + 2HY, nz] with the real volume at offset
   (HX, HY, 0), where the per-axis halo covers the band's maximum reach
   (half_width + 1: mirror fold plus the conv_eps upper-edge lerp).
   Out-of-range taps have zero weight in the diagonal tables, so they
   read zeros harmlessly; the pad is never mirrored.
 - Wx [nxp, Bx] / Wy [nyp, By]: rows = absolute output coordinate, padded
   with zero rows up to grid*T; Wz ships transposed as [Bz, nz] so each
   tap's weights broadcast as a lane vector.
 - axis order x, y, z (apply_Sep_FIR_filter, imutil.c:1165-1188).
 - lane-axis (z) shifts use pltpu.roll: wrapped lanes only ever multiply
   zero-weight diagonal entries.
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


def _kernel(in_ref, wx_ref, wy_ref, wz_ref, out_ref, dog_ref,
            slab, tmp1, tmp2, sems, *, TX, TY, nz, HX, HY,
            lox, loy, loz, z_mode):
    """Accumulation goes through the scratch refs (store/load round trips)
    rather than SSA values: an unrolled value-form FMA chain left ~10
    slab-sized temporaries live at once and blew the 16 MB scoped-VMEM
    stack; ref accumulation bounds the live set to ~2 tile values."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    dma = pltpu.make_async_copy(
        in_ref.at[pl.ds(i * TX, TX + 2 * HX), pl.ds(j * TY, TY + 2 * HY)],
        slab, sems)
    dma.start()
    dma.wait()

    Bx = wx_ref.shape[1]
    By = wy_ref.shape[1]
    Bz = wz_ref.shape[0]

    # x pass: slab [TX+2HX, TY+2HY, nz] -> tmp1 [TX, TY+2HY, nz]. Weight
    # for output row r (absolute a = i*TX + r) and tap k sits at wx[a, k];
    # its read is slab row (r + HX) + lox + k.
    wx = wx_ref[pl.ds(i * TX, TX), :]            # [TX, Bx]
    for k in range(Bx):
        w = wx[:, k][:, None, None]
        term = w * slab[pl.ds(HX + lox + k, TX)]
        if k == 0:
            tmp1[:] = term
        else:
            tmp1[:] += term

    # y pass: tmp1 -> tmp2 [TX, TY, nz].
    wy = wy_ref[pl.ds(j * TY, TY), :]            # [TY, By]
    for k in range(By):
        w = wy[:, k][None, :, None]
        term = w * tmp1[:, pl.ds(HY + loy + k, TY)]
        if k == 0:
            tmp2[:] = term
        else:
            tmp2[:] += term

    # z pass. "roll": lane rolls — roll(x, s) moves lane l to l+s, so
    # reading in[l + d] is roll by -d; wrapped lanes carry zero weight.
    # "dot": one MXU contraction against the dense banded operator
    # (f32 via Precision.HIGHEST), cheaper than Bz lane-rotation passes.
    if z_mode == "dot":
        v2 = tmp2[:].reshape(TX * TY, nz)
        out = jax.lax.dot_general(
            v2, wz_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        out_ref[:] = out.reshape(TX, TY, nz)
    else:
        for k in range(Bz):
            d = loz + k
            w = wz_ref[k, :][None, None, :]      # lane vector [1, 1, nz]
            term = w * pltpu.roll(tmp2[:], (-d) % nz, 2)
            if k == 0:
                out_ref[:] = term
            else:
                out_ref[:] += term
    # DoG of the PREVIOUS level: dog = prev - cur (build_dog,
    # sift.c:713-732 subtracts adjacent levels; pyramid.build_dog returns
    # g[i] - g[i+1]). prev's tile is the slab's center region.
    dog_ref[:] = slab[pl.ds(HX, TX), pl.ds(HY, TY)] - out_ref[:]


def _pick_tile(n: int, target: int, mult: int) -> int:
    """Largest tile <= target that is a multiple of `mult` (grid ceils)."""
    t = max(mult, (min(target, n) // mult) * mult)
    return t


@functools.partial(jax.jit, static_argnames=("lox", "loy", "loz", "dims",
                                             "z_mode", "interpret"))
def _blur3d_call(vol, Wx, Wy, Wz, lox, loy, loz, dims, z_mode="roll",
                 interpret=False):
    nx, ny, nz = dims
    TX = _pick_tile(nx, 32, 8)
    TY = _pick_tile(ny, 32, 8)
    HX = _halo(lox, Wx.shape[1])
    HY = _halo(loy, Wy.shape[1])
    gi, gj = -(-nx // TX), -(-ny // TY)
    inx, iny = gi * TX + 2 * HX, gj * TY + 2 * HY

    volp = jnp.pad(vol, ((HX, inx - nx - HX), (HY, iny - ny - HY), (0, 0)))
    Wxp = jnp.pad(jnp.asarray(Wx), ((0, gi * TX - nx), (0, 0)))
    Wyp = jnp.pad(jnp.asarray(Wy), ((0, gj * TY - ny), (0, 0)))
    # "dot" mode ships the dense [nz(in), nz(out)] operator prebuilt on
    # the host (blur3d_pallas); "roll" ships the [Bz, nz] diagonal form.
    Wzt = jnp.asarray(Wz)

    kernel = functools.partial(
        _kernel, TX=TX, TY=TY, nz=nz, HX=HX, HY=HY,
        lox=int(lox), loy=int(loy), loz=int(loz), z_mode=z_mode)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(gi, gj),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),    # padded volume in HBM
            pl.BlockSpec((Wxp.shape[0], Wxp.shape[1]), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Wyp.shape[0], Wyp.shape[1]), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Wzt.shape[0], Wzt.shape[1]), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TX, TY, nz), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TX, TY, nz), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((TX + 2 * HX, TY + 2 * HY, nz), jnp.float32),
            pltpu.VMEM((TX, TY + 2 * HY, nz), jnp.float32),
            pltpu.VMEM((TX, TY, nz), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nx, ny, nz), jnp.float32),
                   jax.ShapeDtypeStruct((nx, ny, nz), jnp.float32)],
        interpret=interpret,
    )(volp, Wxp, Wyp, Wzt)


def blur3d_pallas(vol, diags, interpret: bool = False,
                  z_mode: str = "dot"):
    """Blur vol [nx, ny, nz] through per-axis (Wd, lo) diagonal operators.

    Returns (blurred, dog) where dog = vol - blurred (the DoG level whose
    minuend is the input level). Matches pyramid.blur_diag to f32 rounding.
    z_mode: "dot" (default) = MXU contraction against the dense banded
    z-operator at Precision.HIGHEST (measured faster: 1.16 vs 1.42 ms per
    256^3 level — the roll chain pays Bz lane-rotation passes, and its
    live temporaries blow the scoped-VMEM budget in multi-level chains);
    "roll" = lane-rotation FMA chain.
    """
    (Wx, lox), (Wy, loy), (Wz, loz) = diags
    Wz_np = np.asarray(Wz)
    nz = vol.shape[2]
    if z_mode == "dot":
        dense = np.zeros((nz, nz), np.float32)
        rows = np.arange(nz)
        for k in range(Wz_np.shape[1]):
            cols = rows + loz + k
            m = (cols >= 0) & (cols < nz)
            dense[rows[m], cols[m]] += Wz_np[m, k]
        Wz_ship = dense.T                        # [nz(in), nz(out)]
    else:
        Wz_ship = Wz_np.T                        # [Bz, nz]
    return _blur3d_call(vol, Wx, Wy, Wz_ship, lox, loy, loz,
                        tuple(vol.shape), z_mode=z_mode,
                        interpret=interpret)
