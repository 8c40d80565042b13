"""Descriptor-prep stage attribution at sparse mixed-level extents.

Prep (descriptor._prep_window) measured ~526 us/kp at octave-0 mixed
windows (75^3) — ~40x over its HBM floor. This splits the cost: window
gather, + gradients, + per-voxel elementwise math (mask/bins/rotation,
NO flatten), full prep (flatten + pad + stack included), and an
aligned-flatten variant that pads the two minor dims to tile alignment
(y -> 8k, z -> 128) BEFORE flattening so the reshape needs no relayout.

Usage: python -u tools/prep_micro.py [size] [K]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from device_time import device_time


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    from sift3d_tpu.descriptor import _prep_window, _level_radius
    from sift3d_tpu.params import DetectorParams
    from sift3d_tpu.pyramid import make_plan
    from sift3d_tpu.windows import gather_window, window_extent

    params = DetectorParams()
    plan = make_plan((n, n, n), (1.0, 1.0, 1.0), params)
    units = (1.0, 1.0, 1.0)
    sd_max = plan.scales[0][3]
    rad = _level_radius(sd_max, params)
    extents = tuple(window_extent(rad / units[a], n, 0) for a in range(3))
    ishape = tuple(e - 2 for e in extents)
    M = int(np.prod(ishape))
    tile = 8192
    print(f"extents={extents} ishape={ishape} M={M}", flush=True)

    rng = np.random.default_rng(0)
    level = jnp.asarray(rng.normal(size=(n, n, n)).astype(np.float32))
    coords = jnp.asarray(rng.integers(40, n - 40, (K, 3)), jnp.int32)
    centers = coords.astype(jnp.float32)
    R = jnp.tile(jnp.eye(3, dtype=jnp.float32), (K, 1, 1))
    sds = np.asarray([plan.scales[0][1 + (3 * i) // K] for i in range(K)],
                     np.float32)
    sd_arr = jnp.asarray(sds)
    jax.device_get(jnp.sum(level))

    def report(label, fn):
        t = device_time(jax.jit(fn), (level,), k1=1, k2=5)
        print(f"{label:<44}{t * 1e3:9.2f} ms ({t / K * 1e6:7.1f} us/kp)",
              flush=True)

    # 1. window gather only
    def gather_only(args):
        (le,) = args
        def one(co):
            w, _ = gather_window(le, co, extents)
            return jnp.sum(w)
        return jnp.sum(jax.vmap(one)(coords))
    report("gather only", gather_only)

    # 2. + gradients
    def grads(args):
        (le,) = args
        def one(co):
            w, _ = gather_window(le, co, extents)
            inv = 0.5
            gx = inv * (w[2:, 1:-1, 1:-1] - w[:-2, 1:-1, 1:-1])
            gy = inv * (w[1:-1, 2:, 1:-1] - w[1:-1, :-2, 1:-1])
            gz = inv * (w[1:-1, 1:-1, 2:] - w[1:-1, 1:-1, :-2])
            return jnp.sum(gx) + jnp.sum(gy) + jnp.sum(gz)
        return jnp.sum(jax.vmap(one)(coords))
    report("+ gradients", grads)

    # 3. full per-voxel math, NO flatten: reuse _prep_window but sum the
    # 3-D arrays before the flatten by calling the internals inline.
    from sift3d_tpu.descriptor import _SQRT2
    nb = 4

    def math_3d(args):
        (le,) = args
        def one(co, ce, Rk, sdk):
            sigma = sdk * jnp.float32(params.desc_sig_fctr)
            win_radius = jnp.float32(params.desc_rad_fctr) * sigma
            desc_half_width = win_radius / jnp.float32(_SQRT2)
            desc_bin_fctr = jnp.float32(1.0) / (
                jnp.float32(2.0) * desc_half_width / jnp.float32(nb))
            win, start = gather_window(le, co, extents)
            g3 = (0.5 * (win[2:, 1:-1, 1:-1] - win[:-2, 1:-1, 1:-1]),
                  0.5 * (win[1:-1, 2:, 1:-1] - win[1:-1, :-2, 1:-1]),
                  0.5 * (win[1:-1, 1:-1, 2:] - win[1:-1, 1:-1, :-2]))
            axes = [start[a] + 1
                    + jax.lax.broadcasted_iota(jnp.int32, ishape, a)
                    for a in range(3)]
            cx, cy, cz = ce[0], ce[1], ce[2]
            mask = jnp.ones(ishape, bool)
            for a, c in enumerate((cx, cy, cz)):
                lo = jnp.maximum(jnp.floor(c - win_radius), 1.0)
                hi = jnp.minimum(jnp.ceil(c + win_radius),
                                 jnp.float32(n - 2))
                mask &= ((axes[a] >= lo.astype(jnp.int32))
                         & (axes[a] <= hi.astype(jnp.int32)))
            d3 = tuple(axes[a].astype(jnp.float32) - c
                       for a, c in enumerate((cx, cy, cz)))
            sq = d3[0] * d3[0] + d3[1] * d3[1] + d3[2] * d3[2]
            mask &= sq <= win_radius * win_radius
            acc = jnp.float32(0.0)
            for j in range(3):
                vkp_j = (d3[0] * Rk[0, j] + d3[1] * Rk[1, j]
                         + d3[2] * Rk[2, j])
                vb_j = (vkp_j + desc_half_width) * desc_bin_fctr
                mask &= (vb_j >= 0.0) & (vb_j < float(nb))
                acc += jnp.sum(vb_j)
            w = jnp.where(mask, jnp.exp(-0.5 * sq / (sigma * sigma)), 0.0)
            for j in range(3):
                grot_j = (w * g3[0] * Rk[0, j] + w * g3[1] * Rk[1, j]
                          + w * g3[2] * Rk[2, j])
                acc += jnp.sum(grot_j)
            return acc
        return jnp.sum(jax.vmap(one)(coords, centers, R, sd_arr))
    report("+ all per-voxel math (3-D, no flatten)", math_3d)

    # 4. full prep as shipped (flatten + pad + stack + flags)
    def full(args):
        (le,) = args
        g, v, f = jax.vmap(
            lambda a, b, c, d: _prep_window(
                le, a, b, c, d, units, extents, tile, params))(
            coords, centers, R, sd_arr)
        return jnp.sum(g) + jnp.sum(v) + jnp.sum(f)
    report("full prep (row-major flatten)", full)

    # 5. flatten cost in isolation: aligned pad then flatten vs raw
    # reshape(-1) of a [73,73,73]-ish block, vmapped over K.
    blocks = jnp.asarray(
        rng.normal(size=(K,) + ishape).astype(np.float32))

    def flat_raw(args):
        (b,) = args
        Mp = -(-M // tile) * tile
        return jnp.sum(jax.vmap(
            lambda a: jnp.pad(a.reshape(-1), (0, Mp - M)) * 2.0)(b))
    t = device_time(jax.jit(flat_raw), (blocks,), k1=1, k2=5)
    print(f"{'flatten row-major (1 array)':<44}{t * 1e3:9.2f} ms "
          f"({t / K * 1e6:7.1f} us/kp)", flush=True)

    def flat_aligned(args):
        (b,) = args
        iy8 = -(-ishape[1] // 8) * 8
        iz128 = -(-ishape[2] // 128) * 128
        def one(a):
            a = jnp.pad(a, ((0, 0), (0, iy8 - ishape[1]),
                            (0, iz128 - ishape[2])))
            a = a.reshape(ishape[0] * iy8, iz128)
            rows = a.shape[0]
            rpad = -(-rows * iz128 // tile) * tile // iz128 - rows
            a = jnp.pad(a, ((0, rpad), (0, 0)))
            return a.reshape(-1) * 2.0
        return jnp.sum(jax.vmap(one)(b))
    t = device_time(jax.jit(flat_aligned), (blocks,), k1=1, k2=5)
    print(f"{'flatten aligned-pad (1 array)':<44}{t * 1e3:9.2f} ms "
          f"({t / K * 1e6:7.1f} us/kp)", flush=True)


if __name__ == "__main__":
    main()
