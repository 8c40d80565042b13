"""Pallas TPU kernel: icosahedral descriptor histogram accumulation.

The descriptor hot loop turns each window voxel's (rotated, weighted)
gradient and spatial bin coordinates into a 24-sparse contribution to the
[64 x 12] histogram. The XLA formulation materializes [N, 60]-shaped
intermediates in HBM per chunk; this kernel keeps everything in VMEM:

  inputs per voxel (transposed, lanes = voxels):
     grot  [3, N]   gradient rotated into the keypoint frame, Gaussian
                    weighted, zeroed where the voxel is masked out
     vbins [3, N]   spatial bin coordinates in [0, 4)
  constants:
     mt    [60, 3]  Moller-Trumbore face constants (geometry.MT_MATRIX^T)
     kc    [20, 1]  face k-constants
     fv    [20, 3]  vertex bin indices per face (float)
  output:
     hist  [16, 48] = [(cz,cy), (cx,v)] partial histogram

Grid: one keypoint per grid row x voxel tiles; the histogram accumulates in
a VMEM scratch across the voxel tiles and is written once at the end. The
per-face hit tests replicate descriptor.py's division-free semantics
exactly (first valid face in face order wins, sift.c:1254-1291).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import geometry
from ..params import ICOS_NVERT, NHIST_PER_DIM

NB = NHIST_PER_DIM


def _kernel(grot_ref, vbins_ref, mt_ref, kc_ref, fv_ref, out_ref, acc):
    c = pl.program_id(1)
    n_c = pl.num_programs(1)

    @pl.when(c == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    g = grot_ref[0]          # [3, T]
    vb = vbins_ref[0]        # [3, T]
    mt = mt_ref[:]           # [60, 3]
    kc = kc_ref[:]           # [20, 1]
    fv = fv_ref[:]           # [20, 3]
    T = g.shape[1]
    eps = jnp.float32(1.1920928955078125e-06)  # bary_eps (sift.c:40)

    # F[60, T] = mt @ g : 3-term broadcast sum (K=3 matmul wastes the MXU).
    F = (mt[:, 0:1] * g[0:1, :] + mt[:, 1:2] * g[1:2, :]
         + mt[:, 2:3] * g[2:3, :])
    dets, ynum, znum = F[:20], F[20:40], F[40:60]
    sgn = jnp.sign(dets)
    adet = dets * sgn
    neg_eps_adet = -eps * adet
    ysn = ynum * sgn
    zsn = znum * sgn
    validf = ((adet >= eps) & (ysn >= neg_eps_adet) & (zsn >= neg_eps_adet)
              & (adet - ysn - zsn >= neg_eps_adet) & (kc * sgn >= 0.0))

    iota20 = jax.lax.broadcasted_iota(jnp.int32, (20, T), 0)
    first = jnp.min(jnp.where(validf, iota20, 20), axis=0)       # [T]
    anyf = first < 20
    onehot = (iota20 == jnp.minimum(first, 19)[None, :])         # [20, T]

    det_s = jnp.sum(jnp.where(onehot, dets, 0.0), axis=0)
    yn_s = jnp.sum(jnp.where(onehot, ynum, 0.0), axis=0)
    zn_s = jnp.sum(jnp.where(onehot, znum, 0.0), axis=0)
    inv = jnp.where(det_s != 0.0, 1.0 / det_s, 0.0)
    ys = yn_s * inv
    zs = zn_s * inv
    xs = 1.0 - ys - zs

    gsq = g[0] * g[0] + g[1] * g[1] + g[2] * g[2]
    mag = jnp.where(anyf & (gsq >= eps), jnp.sqrt(gsq), 0.0)     # [T]

    # vertex bin index per bary slot (int32): [3, T]
    fvi = fv.astype(jnp.int32)
    vidx = jnp.stack([
        jnp.sum(jnp.where(onehot, fvi[:, j:j + 1], 0), axis=0)
        for j in range(3)])
    baryw = jnp.stack([xs, ys, zs]) * mag[None, :]               # [3, T]

    iota12 = jax.lax.broadcasted_iota(jnp.int32, (ICOS_NVERT, T), 0)
    B = (baryw[0:1] * (vidx[0:1] == iota12)
         + baryw[1:2] * (vidx[1:2] == iota12)
         + baryw[2:3] * (vidx[2:3] == iota12))                   # [12, T]

    iota4 = jax.lax.broadcasted_iota(jnp.int32, (NB, T), 0)

    def sparse4(v):                                              # [4, T]
        base = jnp.floor(v)
        fr = v - base
        base_i = base.astype(jnp.int32)[None, :]
        return (jnp.where(iota4 == base_i, 1.0 - fr[None, :], 0.0)
                + jnp.where(iota4 == base_i + 1, fr[None, :], 0.0))

    Sx = sparse4(vb[0])
    Sy = sparse4(vb[1])
    Sz = sparse4(vb[2])

    # ZY [16, T], P [48, T]; hist += ZY @ P^T on the MXU.
    ZY = (Sz[:, None, :] * Sy[None, :, :]).reshape(NB * NB, T)
    P = (Sx[:, None, :] * B[None, :, :]).reshape(NB * ICOS_NVERT, T)
    acc[:] += jax.lax.dot_general(
        ZY, P, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(c == n_c - 1)
    def _():
        out_ref[0] = acc[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def desc_hist_pallas(grot, vbins, interpret: bool = False):
    """Histograms [K, 16, 48] from grot/vbins [K, 3, N] (N % 512 == 0)."""
    K, _, N = grot.shape
    # Large tiles amortize the per-grid-step fixed cost (measured dominant
    # at TILE=2048: ~54 steps/keypoint cost ~140 us/kp; the VPU work itself
    # is ~10 us). VMEM per step stays modest ([60, TILE] f32 is the largest
    # intermediate).
    TILE = next(t for t in (8192, 4096, 2048, 512, 128) if N % t == 0)

    mt = jnp.asarray(geometry.MT_MATRIX.T)                  # [60, 3]
    kc = jnp.asarray(geometry.K_CONST[:, None])             # [20, 1]
    fv = jnp.asarray(geometry.FACE_IDX.astype(np.float32))  # [20, 3]

    grid = (K, N // TILE)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3, TILE), lambda k, c: (k, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, TILE), lambda k, c: (k, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((60, 3), lambda k, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((20, 1), lambda k, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((20, 3), lambda k, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, NB * NB, NB * ICOS_NVERT),
                               lambda k, c: (k, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, NB * NB, NB * ICOS_NVERT),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((NB * NB, NB * ICOS_NVERT), jnp.float32)],
        interpret=interpret,
    )(grot, vbins, mt, kc, fv)
