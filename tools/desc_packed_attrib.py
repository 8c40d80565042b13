"""Attribute the PACKED descriptor kernel's per-keypoint cost.

Variants ablate one stage of the per-voxel math each (same grid, same
scratch, same final contraction unless noted), on synthetic dense-K data
shaped like the 256^3 dense workload:

  full      the shipped kernel (desc_hist_pallas)
  nodot     skip the [128,T]x[T,384] accumulation contraction
  noface    face selection replaced by a flat B (keeps sparse4 + ZY/P + dot)
  nosparse  sparse4/ZY/P replaced by broadcasts (keeps face chain + dot)
  dotonly   per-voxel math skipped entirely (scratch garbage + dot): bounds
            the grid/DMA/MXU floor

Usage: python tools/desc_packed_attrib.py [--kp 1024] [--m 4096]
       [--tile 2048] [--density 0.5]
"""

import argparse
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
from sift3d_tpu.ops import desc_kernel as dk
from sift3d_tpu.ops.desc_kernel import (_face_hist, _paired_constants,
                                         desc_hist_pallas)

NB = NHIST_PER_DIM
_G = dk._G


def _variant_kernel(words_ref, grot_ref, vbins_ref, mt_ref, pri_ref, eb_ref,
                    out_ref, acc, zy_s, p_s, dirty, *, mode):
    k = pl.program_id(0)
    c = pl.program_id(1)
    n_c = pl.num_programs(1)

    @pl.when(c == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
        p_s[:] = jnp.zeros_like(p_s)
        for j in range(_G):
            dirty[j] = 1

    word = words_ref[k, c]

    @pl.when(word > 0)
    def _():
        mt = mt_ref[:]
        pri = pri_ref[:]
        eb = eb_ref[:]
        T = grot_ref.shape[2]
        for j in range(_G):
            f = (word >> j) & 1

            @pl.when(f > 0)
            def _(j=j):
                g = grot_ref[j]
                vb = vbins_ref[j]
                if mode == "dotonly":
                    return
                if mode == "noface":
                    mag = jnp.sqrt(g[0] * g[0] + g[1] * g[1] + g[2] * g[2])
                    B = jnp.broadcast_to(mag[None, :] / 12.0,
                                         (ICOS_NVERT, T))
                    iota4 = jax.lax.broadcasted_iota(jnp.int32, (NB, T), 0)

                    def sparse4(v):
                        base = jnp.floor(v)
                        fr = v - base
                        bi = base.astype(jnp.int32)[None, :]
                        return (jnp.where(iota4 == bi, 1.0 - fr[None, :],
                                          0.0)
                                + jnp.where(iota4 == bi + 1, fr[None, :],
                                            0.0))

                    Sx, Sy, Sz = sparse4(vb[0]), sparse4(vb[1]), sparse4(
                        vb[2])
                    ZY = (Sz[:, None, :] * Sy[None, :, :]).reshape(
                        NB * NB, T)
                    P = (Sx[:, None, :] * B[None, :, :]).reshape(
                        NB * ICOS_NVERT, T)
                elif mode == "nosparse":
                    ZY_full, P_full = _face_hist(g, vb, mt, pri, eb)
                    # keep only the face chain's outputs alive cheaply
                    ZY = jnp.broadcast_to(P_full[0:1, :], (NB * NB, T))
                    P = P_full
                else:
                    ZY, P = _face_hist(g, vb, mt, pri, eb)
                zy_s[j * NB * NB:(j + 1) * NB * NB, :] = ZY
                p_s[j * NB * ICOS_NVERT:(j + 1) * NB * ICOS_NVERT, :] = P
                dirty[j] = 1

            @pl.when((f == 0) & (dirty[j] == 1))
            def _(j=j):
                zy_s[j * NB * NB:(j + 1) * NB * NB, :] = jnp.zeros(
                    (NB * NB, zy_s.shape[1]), jnp.float32)
                dirty[j] = 0

        if mode != "nodot":
            acc[:] += jax.lax.dot_general(
                zy_s[:], p_s[:], dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

    @pl.when(c == n_c - 1)
    def _():
        for j in range(_G):
            out_ref[j] = acc[j * NB * NB:(j + 1) * NB * NB,
                             j * NB * ICOS_NVERT:(j + 1) * NB * ICOS_NVERT]


@functools.partial(jax.jit, static_argnames=("mode", "tile"))
def variant(grot, vbins, flags, mode="full", tile=2048):
    K, _, N = grot.shape
    TILE = tile
    mt, pri, eb = _paired_constants()
    words = jnp.sum(
        flags.reshape(K // _G, _G, -1)
        << jnp.arange(_G, dtype=jnp.int32)[None, :, None],
        axis=1, dtype=jnp.int32)
    grid = (K // _G, N // TILE)
    M_zy, M_p = _G * NB * NB, _G * NB * ICOS_NVERT
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_G, 3, TILE), lambda k, c, w: (k, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_G, 3, TILE), lambda k, c, w: (k, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((40, 3), lambda k, c, w: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((10, 3), lambda k, c, w: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((36, 20), lambda k, c, w: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_G, NB * NB, NB * ICOS_NVERT),
                               lambda k, c, w: (k, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((M_zy, M_p), jnp.float32),
            pltpu.VMEM((M_zy, TILE), jnp.float32),
            pltpu.VMEM((M_p, TILE), jnp.float32),
            pltpu.SMEM((_G,), jnp.int32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_variant_kernel, mode=mode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, NB * NB, NB * ICOS_NVERT),
                                       jnp.float32),
    )(words, grot, vbins, mt, pri, eb)


def timed(label, fn, n=5, per=None):
    out = fn()
    jax.device_get(jnp.sum(out * out))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        jax.device_get(jnp.sum(out * out))
        ts.append(time.perf_counter() - t0)
    ms = min(ts) * 1e3
    extra = f"  ({ms / per * 1e3:.1f} us/kp)" if per else ""
    print(f"{label:<44}{ms:>9.2f} ms{extra}", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kp", type=int, default=1024)
    ap.add_argument("--m", type=int, default=4096)
    ap.add_argument("--tile", type=int, default=2048)
    ap.add_argument("--density", type=float, default=0.5,
                    help="fraction of nonempty FLAG_TILE tiles")
    args = ap.parse_args()
    K, M = args.kp, args.m
    print(f"backend={jax.default_backend()} K={K} M={M} tile={args.tile} "
          f"density={args.density}", flush=True)

    rng = np.random.default_rng(0)
    grot = jnp.asarray(rng.normal(size=(K, 3, M)).astype(np.float32))
    vbins = jnp.asarray(
        rng.uniform(0, 3.999, size=(K, 3, M)).astype(np.float32))
    nflags = M // dk.FLAG_TILE
    flags = (rng.uniform(size=(K, nflags)) < args.density).astype(np.int32)
    flags[:, 0] = 1
    flags = jnp.asarray(flags)

    # RTT floor
    x = jnp.zeros((8, 128), jnp.float32)
    timed("RTT floor", lambda: x + 1.0)

    timed("shipped desc_hist_pallas",
          lambda: desc_hist_pallas(grot, vbins, flags,
                                   precision="default"), per=K)
    for mode in ("full", "nodot", "noface", "nosparse", "dotonly"):
        timed(f"variant {mode}",
              lambda m=mode: variant(grot, vbins, flags, mode=m,
                                     tile=args.tile), per=K)


if __name__ == "__main__":
    main()
