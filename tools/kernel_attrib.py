"""Attribute the Pallas descriptor kernel's per-keypoint cost: full kernel
vs no-final-dot vs no-face-selection variants, plus a batched-dot variant
(8 keypoints packed into one [128,T]x[T,384] MXU contraction).

Usage: python tools/kernel_attrib.py
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sift3d_tpu import geometry
from sift3d_tpu.params import ICOS_NVERT, NHIST_PER_DIM
from sift3d_tpu.ops.desc_kernel import desc_hist_pallas

NB = NHIST_PER_DIM


def _variant_kernel(grot_ref, vbins_ref, mt_ref, kc_ref, fv_ref, out_ref,
                    acc, *, mode):
    c = pl.program_id(1)
    n_c = pl.num_programs(1)

    @pl.when(c == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    g = grot_ref[0]
    vb = vbins_ref[0]
    mt = mt_ref[:]
    kc = kc_ref[:]
    fv = fv_ref[:]
    T = g.shape[1]
    eps = jnp.float32(1.1920928955078125e-06)

    if mode == "noface":
        mag = jnp.sqrt(g[0] * g[0] + g[1] * g[1] + g[2] * g[2])
        B = jnp.broadcast_to(mag[None, :] / 12.0, (ICOS_NVERT, T))
    else:
        F = (mt[:, 0:1] * g[0:1, :] + mt[:, 1:2] * g[1:2, :]
             + mt[:, 2:3] * g[2:3, :])
        dets, ynum, znum = F[:20], F[20:40], F[40:60]
        sgn = jnp.sign(dets)
        adet = dets * sgn
        neg_eps_adet = -eps * adet
        ysn = ynum * sgn
        zsn = znum * sgn
        validf = ((adet >= eps) & (ysn >= neg_eps_adet)
                  & (zsn >= neg_eps_adet)
                  & (adet - ysn - zsn >= neg_eps_adet) & (kc * sgn >= 0.0))
        iota20 = jax.lax.broadcasted_iota(jnp.int32, (20, T), 0)
        first = jnp.min(jnp.where(validf, iota20, 20), axis=0)
        anyf = first < 20
        onehot = (iota20 == jnp.minimum(first, 19)[None, :])
        det_s = jnp.sum(jnp.where(onehot, dets, 0.0), axis=0)
        yn_s = jnp.sum(jnp.where(onehot, ynum, 0.0), axis=0)
        zn_s = jnp.sum(jnp.where(onehot, znum, 0.0), axis=0)
        inv = jnp.where(det_s != 0.0, 1.0 / det_s, 0.0)
        ys = yn_s * inv
        zs = zn_s * inv
        xs = 1.0 - ys - zs
        gsq = g[0] * g[0] + g[1] * g[1] + g[2] * g[2]
        mag = jnp.where(anyf & (gsq >= eps), jnp.sqrt(gsq), 0.0)
        fvi = fv.astype(jnp.int32)
        vidx = jnp.stack([
            jnp.sum(jnp.where(onehot, fvi[:, j:j + 1], 0), axis=0)
            for j in range(3)])
        baryw = jnp.stack([xs, ys, zs]) * mag[None, :]
        iota12 = jax.lax.broadcasted_iota(jnp.int32, (ICOS_NVERT, T), 0)
        B = (baryw[0:1] * (vidx[0:1] == iota12)
             + baryw[1:2] * (vidx[1:2] == iota12)
             + baryw[2:3] * (vidx[2:3] == iota12))

    iota4 = jax.lax.broadcasted_iota(jnp.int32, (NB, T), 0)

    def sparse4(v):
        base = jnp.floor(v)
        fr = v - base
        base_i = base.astype(jnp.int32)[None, :]
        return (jnp.where(iota4 == base_i, 1.0 - fr[None, :], 0.0)
                + jnp.where(iota4 == base_i + 1, fr[None, :], 0.0))

    Sx = sparse4(vb[0])
    Sy = sparse4(vb[1])
    Sz = sparse4(vb[2])
    ZY = (Sz[:, None, :] * Sy[None, :, :]).reshape(NB * NB, T)
    P = (Sx[:, None, :] * B[None, :, :]).reshape(NB * ICOS_NVERT, T)
    if mode == "nodot":
        acc[:] += (jnp.sum(ZY, axis=1)[:, None]
                   + jnp.sum(P, axis=1)[None, :])
    else:
        acc[:] += jax.lax.dot_general(
            ZY, P, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(c == n_c - 1)
    def _():
        out_ref[0] = acc[:]


@functools.partial(jax.jit, static_argnames=("mode",))
def variant(grot, vbins, mode):
    K, _, N = grot.shape
    TILE = 2048
    mt = jnp.asarray(geometry.MT_MATRIX.T)
    kc = jnp.asarray(geometry.K_CONST[:, None])
    fv = jnp.asarray(geometry.FACE_IDX.astype(np.float32))
    grid = (K, N // TILE)
    kern = functools.partial(_variant_kernel, mode=mode)
    return pl.pallas_call(
        kern,
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
        scratch_shapes=[pltpu.VMEM((NB * NB, NB * ICOS_NVERT),
                                   jnp.float32)],
    )(grot, vbins, mt, kc, fv)


def timed(label, fn, *args, n=5, per=None):
    jax.device_get(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.device_get(fn(*args))
        ts.append(time.perf_counter() - t0)
    ms = min(ts) * 1e3
    extra = f"  ({ms / per * 1e3:.1f} us/kp)" if per else ""
    print(f"{label:<56}{ms:>9.2f} ms{extra}", flush=True)


def main():
    K, Mp = 64, 104448
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.normal(size=(K, 3, Mp)).astype(np.float32))
    v = jnp.asarray(rng.uniform(0, 4, size=(K, 3, Mp)).astype(np.float32))
    jax.device_get(jnp.sum(g) + jnp.sum(v))

    timed("RTT floor", jax.jit(lambda x: x[0, 0, 0] * 1.0), g)
    timed("full kernel", jax.jit(
        lambda a, b: jnp.sum(desc_hist_pallas(a, b))), g, v, per=K)
    for mode in ("full", "nodot", "noface"):
        timed(f"variant {mode}", jax.jit(
            lambda a, b, m=mode: jnp.sum(variant(a, b, m))), g, v, per=K)


if __name__ == "__main__":
    main()
