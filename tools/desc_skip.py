"""Experiment: descriptor-kernel tile skipping vs flag granularity and
voxel ordering, on realistic mixed-level windows.

The packed kernel skips a [G, 3, T] voxel tile when no keypoint of the
pack has a valid voxel in it. Mixed-level windows are sized for the
octave's max sd, so small-sd keypoints' valid voxels fill only a central
sphere (13-52% of the cube). Row-major flattening interleaves valid and
masked voxels, so few tiles are fully empty; this measures (a) finer
flag tiles and (b) a radius-sorted static voxel permutation, which makes
the valid set (a subset of) a prefix.

Usage: python tools/desc_skip.py [size]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


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
    return ms


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    K = 64
    from sift3d_tpu.descriptor import _prep_window, _level_radius
    from sift3d_tpu.ops.desc_kernel import desc_hist_pallas
    from sift3d_tpu.params import DetectorParams
    from sift3d_tpu.pyramid import make_plan
    from sift3d_tpu.windows import window_extent

    params = DetectorParams()
    plan = make_plan((n, n, n), (1.0, 1.0, 1.0), params)
    units = (1.0, 1.0, 1.0)
    # Mixed-level window: sized for the octave's max keypoint sd (level 3).
    sd_max = plan.scales[0][3]
    rad = _level_radius(sd_max, params)
    extents = tuple(window_extent(rad / units[a], n, 0) for a in range(3))
    ishape = tuple(e - 2 for e in extents)
    M = ishape[0] * ishape[1] * ishape[2]
    tile = 8192
    Mp = -(-M // tile) * tile
    print(f"extents={extents} M={M} Mp={Mp}", flush=True)

    rng = np.random.default_rng(0)
    level = jnp.asarray(rng.normal(size=(n, n, n)).astype(np.float32))
    coords = jnp.asarray(rng.integers(40, n - 40, (K, 3)), jnp.int32)
    centers = coords.astype(jnp.float32)
    R = jnp.tile(jnp.eye(3, dtype=jnp.float32), (K, 1, 1))

    # Level mix as the candidate stores see it: level-sorted, roughly equal
    # thirds of levels 1..3 (sd 1.6, 2.02, 2.54).
    sds = np.asarray([plan.scales[0][1 + (3 * i) // K] for i in range(K)],
                     np.float32)
    sd_arr = jnp.asarray(sds)
    jax.device_get(jnp.sum(level))

    prep = jax.jit(lambda co, ce, Rk, sdk: jax.vmap(
        lambda a, b, c, d: _prep_window(
            level, a, b, c, d, units, extents, tile, params))(
        co, ce, Rk, sdk))
    grot, vbins, _ = jax.device_get(prep(coords, centers, R, sd_arr))
    any_valid = np.any(grot != 0.0, axis=1)          # [K, Mp]

    # Radius-sorted permutation about the window's geometric center.
    ctr = [(s - 1) / 2 for s in ishape]
    ax = [np.arange(s, dtype=np.float64) - c for s, c in zip(ishape, ctr)]
    d2 = (ax[0][:, None, None] ** 2 + ax[1][None, :, None] ** 2
          + ax[2][None, None, :] ** 2).reshape(-1)
    perm = np.argsort(np.pad(d2, (0, Mp - M), constant_values=np.inf),
                      kind="stable")

    def flags_of(av, T):
        return jnp.asarray(
            av.reshape(K, -1, T).any(axis=2).astype(np.int32))

    from device_time import device_time
    g_dev = jnp.asarray(grot)
    v_dev = jnp.asarray(vbins)
    gp_dev = jnp.asarray(grot[:, :, perm])
    vp_dev = jnp.asarray(vbins[:, :, perm])
    avp = any_valid[:, perm]

    for label, g, v, av in (("row-major", g_dev, v_dev, any_valid),
                            ("radial-sorted", gp_dev, vp_dev, avp)):
        for T in (512, 1024, 2048):
            fl = flags_of(av, T)
            frac = float(np.asarray(fl).mean())
            t = device_time(
                lambda gv, ff=fl, TT=T: jnp.sum(desc_hist_pallas(
                    gv[0], gv[1], ff, tile=TT)), (g, v))
            print(f"{label:>14} T={T:<5} nonempty={frac:5.1%} "
                  f"kernel {t * 1e3:8.2f} ms ({t / K * 1e6:6.1f} us/kp)",
                  flush=True)

    # Prep-side cost of applying the permutation on device.
    permd = jnp.asarray(perm)

    def prep_perm(co, ce, Rk, sdk):
        g, v, f = prep(co, ce, Rk, sdk)
        return jnp.sum(g[:, :, permd]) + jnp.sum(v[:, :, permd])

    def prep_plain(co, ce, Rk, sdk):
        g, v, f = prep(co, ce, Rk, sdk)
        return jnp.sum(g) + jnp.sum(v)

    timed(f"prep plain ({K} kp)", jax.jit(prep_plain),
          coords, centers, R, sd_arr, per=K)
    timed(f"prep + device gather perm ({K} kp)", jax.jit(prep_perm),
          coords, centers, R, sd_arr, per=K)


if __name__ == "__main__":
    main()
