"""Pallas TPU kernel: orientation window moments.

The orientation stage reduces each keypoint's spherical window to nine
numbers: the Gaussian-weighted structure tensor A = sum w g g^T and the
weighted mean gradient vd = sum w g (assign_eig_ori,
/root/reference/sift3d/sift.c:963-989). The XLA formulation gathers a
window per keypoint with vmapped dynamic_slice and was measured
gather-latency bound (~7 us/keypoint, flat across formulations): every
window round-trips HBM through XLA's gather machinery before a tiny
reduction consumes it.

This kernel inverts that: the pyramid level stays in HBM; each grid step
DMAs the raw windows of G keypoints straight into VMEM (window starts and
per-keypoint center/scale ride in as scalar-prefetch arguments in SMEM —
the memories the DMA engine and scalar core can be indexed by), then
computes central-difference gradients (shifted slices, IM_GET_GRAD_ISO
sift.c:140-145), the reference's exact loop-bound + sphere masks
(IM_LOOP_SPHERE_START sift.c:86-109), Gaussian weights, and the nine
moment reductions entirely on-chip. The scalar results are written to an
SMEM output block (scalars cannot be stored to VMEM); per keypoint only
64 output bytes ever leave the core.

Windows span the FULL minor (z) axis: Mosaic DMA slices along the lane
dimension must be 128-aligned, so an arbitrary [z0, z0+Ez) range cannot
be copied — [Ex, Ey, nz] rows can, and the reference's own loop-bound
mask (computed from the keypoint center, not the window) already zeroes
everything outside the sphere. The sublane (y) axis carries an 8-tiling:
y extents round up to a multiple of 8 (+8 slack) and y starts align down
to 8 — the masks use absolute coordinates, so over-wide windows change
nothing. Levels are padded to (y % 8 == 0, z % 128 == 0) on entry. The
pack size G adapts to the VMEM budget (full-z windows of octave 0 at
256^3 are ~2 MB each).

Numerics match the XLA path (orientation._window_moments) up to f32
reduction order; the C reference accumulates in f64 (sift.c:978-983), and
both formulations sit within the same parity tolerance of it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_OUT_W = 16     # packed output row: A (9) + vd (3) + pad
# VMEM budget for the window scratch (leaves headroom for compute
# transients under the ~16 MB scoped limit).
_WIN_BYTES = 6 * 2 ** 20


def pack_size(ex: int, eyp: int, nz_pad: int) -> int:
    """Keypoints per grid step: largest divisor of 8 whose full-z windows
    fit the scratch budget."""
    per = ex * eyp * nz_pad * 4
    g = max(1, min(8, _WIN_BYTES // max(per, 1)))
    while 8 % g:
        g -= 1
    return g


def _kernel(idx_ref, fp_ref, lv_ref, out_ref, win_s, sems, *, G,
            extents, units, n_dims, nz_pad, ori_sig_fctr, ori_rad_fctr):
    """One grid step: G keypoints' windows DMA'd from HBM, moments out.

    idx_ref: scalar-prefetch i32[3, K] = (level, x0, y0) per keypoint.
    fp_ref:  scalar-prefetch f32[4, K] = (cx, cy, cz, sd) per keypoint.
    lv_ref:  the stacked [L, nx, ny, nz] pyramid levels, resident in HBM.
    out_ref: SMEM f32[16, K] = (A row-major 9, vd 3, pad) — the whole
             output, keypoints in the MINOR dim: SMEM arrays lane-pad the
             last dim to 128, so [K, 16] would cost K*128*4 bytes (512 kB
             at K=1024, over the SMEM budget with the two prefetch
             operands shaped the same way) while [16, K] costs 16*K*4.
    win_s:   VMEM f32[G, Ex, Ey, nz] window scratch.
    sems:    DMA semaphores, one per keypoint slot.
    """
    k = pl.program_id(0)
    Ex, Ey = extents[0], extents[1]
    nz = nz_pad
    ux, uy, uz = (np.float32(u) for u in units)
    inv_u = tuple(np.float32(1.0) / np.float32(u) for u in units)

    # Kick off all G window DMAs before any compute. idx[:, 2] holds the
    # y start in units of 8-row blocks: multiplying by 8 here lets Mosaic
    # PROVE the sublane slice start is tile-aligned (a raw dynamic start
    # fails its divisibility check).
    dmas = []
    for j in range(G):
        base = k * G + j
        dma = pltpu.make_async_copy(
            lv_ref.at[idx_ref[0, base],
                      pl.ds(idx_ref[1, base], Ex),
                      pl.ds(idx_ref[2, base] * 8, Ey)],
            win_s.at[j], sems.at[j])
        dma.start()
        dmas.append(dma)

    # Interior iotas; coordinates are start + 1 + iota for x/y (as the XLA
    # path) and slab-origin + index for z (full-axis window; the origin
    # row of idx_ref is 0 for a whole-volume level and the slab's global
    # z offset for a z_view shard slab).
    ishape = (Ex - 2, Ey - 2, nz - 2)
    iox = jax.lax.broadcasted_iota(jnp.int32, ishape, 0)
    ioy = jax.lax.broadcasted_iota(jnp.int32, ishape, 1)
    ioz = jax.lax.broadcasted_iota(jnp.int32, ishape, 2)

    for j in range(G):
        dmas[j].wait()
        base = k * G + j
        win = win_s[j]
        cx = fp_ref[0, base]
        cy = fp_ref[1, base]
        cz = fp_ref[2, base]
        sd = fp_ref[3, base]
        sigma = jnp.float32(ori_sig_fctr) * sd
        rad = sigma * jnp.float32(ori_rad_fctr)

        gx = 0.5 * (win[2:, 1:-1, 1:-1] - win[:-2, 1:-1, 1:-1]) * inv_u[0]
        gy = 0.5 * (win[1:-1, 2:, 1:-1] - win[1:-1, :-2, 1:-1]) * inv_u[1]
        gz = 0.5 * (win[1:-1, 1:-1, 2:] - win[1:-1, 1:-1, :-2]) * inv_u[2]

        X = idx_ref[1, base] + 1 + iox
        Y = idx_ref[2, base] * 8 + 1 + ioy
        Z = idx_ref[3, base] + 1 + ioz

        mask = None
        for c, u, I, n in zip((cx, cy, cz), (ux, uy, uz), (X, Y, Z), n_dims):
            lo = jnp.maximum(jnp.floor(c - rad / u), 1.0)
            hi = jnp.minimum(jnp.ceil(c + rad / u), jnp.float32(n - 2))
            m = (I >= lo.astype(jnp.int32)) & (I <= hi.astype(jnp.int32))
            mask = m if mask is None else (mask & m)

        dx = (X.astype(jnp.float32) - cx) * ux
        dy = (Y.astype(jnp.float32) - cy) * uy
        dz = (Z.astype(jnp.float32) - cz) * uz
        sq = dx * dx + dy * dy + dz * dz
        mask &= sq <= rad * rad
        w = jnp.where(mask, jnp.exp(-0.5 * sq / (sigma * sigma)), 0.0)

        wgx, wgy, wgz = w * gx, w * gy, w * gz
        a01 = jnp.sum(wgx * gy)
        a02 = jnp.sum(wgx * gz)
        a12 = jnp.sum(wgy * gz)
        out_ref[0, base] = jnp.sum(wgx * gx)
        out_ref[1, base] = a01
        out_ref[2, base] = a02
        out_ref[3, base] = a01
        out_ref[4, base] = jnp.sum(wgy * gy)
        out_ref[5, base] = a12
        out_ref[6, base] = a02
        out_ref[7, base] = a12
        out_ref[8, base] = jnp.sum(wgz * gz)
        out_ref[9, base] = jnp.sum(wgx)
        out_ref[10, base] = jnp.sum(wgy)
        out_ref[11, base] = jnp.sum(wgz)
        for t in (12, 13, 14, 15):
            out_ref[t, base] = 0.0


@functools.partial(
    jax.jit,
    static_argnames=("extents", "units", "params", "interpret",
                     "global_nz"))
def ori_moments_pallas(levels, lvl, coords, fp, extents, units, params,
                       interpret: bool = False, z_origin=None,
                       global_nz: int | None = None):
    """Window moments for K keypoints: A f32[K, 3, 3], vd f32[K, 3].

    levels: [L, nx, ny, nz] stacked same-shape pyramid levels (HBM).
    lvl:    i32[K] pyramid level per keypoint.
    coords: i32[K, 3] integer keypoint anchors.
    fp:     f32[K, 4] = (cx, cy, cz, sd) per keypoint.
    extents: the XLA path's window extents (Ex, Ey, Ez); y widens to the
            tiling, z is replaced by the full axis (module docstring).
    z_origin/global_nz: the z_view contract (windows.gather_window):
            `levels` is a LOCAL z-slab of a `global_nz`-deep volume whose
            slab index 0 sits at global z `z_origin` (traced scalar,
            possibly negative for halo margins); coords/centers are
            global, and loop bounds clip against global_nz. Lets the
            kernel run inside a shard_map body on halo-extended slabs.
    """
    K = coords.shape[0]
    n_dims = tuple(levels.shape[1:])
    nx, ny, nz = n_dims
    if global_nz is not None:
        n_dims = (nx, ny, global_nz)
    if z_origin is None:
        z_origin = jnp.int32(0)
    # Mosaic HBM slice tiling: the lane (z) dim must be a multiple of 128
    # even when unsliced and the sublane (y) slice a multiple of 8 — pad
    # the levels up (the loop-bound mask uses absolute bounds from the
    # ORIGINAL dims, so the pad region is weighted zero).
    ny_pad = -(-ny // 8) * 8
    nz_pad = -(-nz // 128) * 128
    if (ny_pad, nz_pad) != (ny, nz):
        levels = jnp.pad(levels, ((0, 0), (0, 0), (0, ny_pad - ny),
                                  (0, nz_pad - nz)))
    Ex = min(extents[0], nx)
    # y extent: +7 slack so aligning the start down to 8 still covers the
    # original [y0, y0+Ey) range, rounded up to the 8-tiling.
    Eyp = min(-(-(extents[1] + 7) // 8) * 8, ny_pad)

    # gather_window's clip rule per axis; y ships as an 8-row BLOCK index
    # (the kernel multiplies by 8 so Mosaic can prove tile alignment).
    # Keypoints ride the MINOR dim of both prefetch arrays and the output
    # (SMEM lane-pads the last dim to 128; see _kernel docstring).
    x0 = jnp.clip(coords[:, 0] - (extents[0] - 1) // 2, 0, nx - Ex)
    y0 = jnp.clip(coords[:, 1] - (extents[1] - 1) // 2, 0, ny_pad - Eyp)
    org = jnp.broadcast_to(jnp.asarray(z_origin, jnp.int32), (K,))
    idx = jnp.stack([lvl, x0, y0 // 8, org], axis=0).astype(jnp.int32)

    fp = fp.T                       # [4, K] for the SMEM layout
    G = pack_size(Ex, Eyp, nz_pad)
    assert K % G == 0, (K, G)
    Ey = Eyp
    kernel = functools.partial(
        _kernel, G=G, extents=(Ex, Eyp), units=tuple(units),
        n_dims=n_dims, nz_pad=nz_pad,
        ori_sig_fctr=params.ori_sig_fctr, ori_rad_fctr=params.ori_rad_fctr)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(K // G,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # levels stay off-chip
        ],
        out_specs=pl.BlockSpec((_OUT_W, K), lambda k, i, f: (0, 0),
                               memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((G, Ex, Ey, nz_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((G,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((_OUT_W, K), jnp.float32),
        interpret=interpret,
    )(idx, fp, levels)
    A = out[:9].T.reshape(K, 3, 3)
    vd = out[9:12].T
    return A, vd
