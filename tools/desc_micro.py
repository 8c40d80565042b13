"""Microbench: split the per-keypoint descriptor cost into window prep (XLA)
vs histogram kernel (Pallas), and sweep chunk sizes.

Usage: python tools/desc_micro.py [size] [--kp 1024]
"""

import argparse
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
    ap = argparse.ArgumentParser()
    ap.add_argument("size", type=int, nargs="?", default=256)
    ap.add_argument("--kp", type=int, default=1024)
    args = ap.parse_args()
    n, K = args.size, args.kp

    from bench import make_bench_volume
    from sift3d_tpu.descriptor import _prep_window, _level_radius
    from sift3d_tpu.ops.desc_kernel import desc_hist_pallas
    from sift3d_tpu.params import DetectorParams
    from sift3d_tpu.pyramid import make_plan
    from sift3d_tpu.windows import window_extent

    params = DetectorParams()
    plan = make_plan((n, n, n), (1.0, 1.0, 1.0), params)
    sd = plan.scales[0][1]
    units = (1.0, 1.0, 1.0)
    rad = _level_radius(sd, params)
    extents = tuple(window_extent(rad / units[a], n, 0) for a in range(3))
    M = (extents[0] - 2) * (extents[1] - 2) * (extents[2] - 2)
    print(f"extents={extents} M={M}", flush=True)

    rng = np.random.default_rng(0)
    level = jnp.asarray(rng.normal(size=(n, n, n)).astype(np.float32))
    coords = jnp.asarray(rng.integers(24, n - 24, (K, 3)), jnp.int32)
    centers = coords.astype(jnp.float32)
    R = jnp.tile(jnp.eye(3, dtype=jnp.float32), (K, 1, 1))
    sd_arr = jnp.full((K,), jnp.float32(sd))
    jax.device_get(jnp.sum(level))

    timed("RTT floor", jax.jit(lambda v: v[0, 0, 0] * 1.0), level)

    for tile in (2048, 8192):
        Mp = -(-M // tile) * tile

        def prep_only(level_, coords_, centers_, R_, sd_):
            g, vb, fl = jax.vmap(lambda co, ce, Rk, sdk: _prep_window(
                level_, co, ce, Rk, sdk, units, extents, tile, params))(
                coords_, centers_, R_, sd_)
            return jnp.sum(g) + jnp.sum(vb) + jnp.sum(fl)
        timed(f"prep only, all {K} kp at once (tile {tile})",
              jax.jit(prep_only), level, coords, centers, R, sd_arr,
              per=K)

        # kernel only on resident data, RTT-immune loop timing
        from device_time import device_time
        g1 = jnp.asarray(rng.normal(size=(64, 3, Mp)).astype(np.float32))
        v1 = jnp.asarray(
            rng.uniform(0, 4, size=(64, 3, Mp)).astype(np.float32))
        jax.device_get(jnp.sum(g1) + jnp.sum(v1))

        for ktile in (2048, 4096):
            if Mp % ktile:
                continue
            t = device_time(
                lambda g, kt=ktile: desc_hist_pallas(g, v1, tile=kt), g1,
                k1=1, k2=5)
            print(f"kernel only, 64 kp resident (pad {tile}, ktile "
                  f"{ktile}): {t * 1e3:8.2f} ms ({t / 64 * 1e6:.1f} us/kp)",
                  flush=True)

        t = device_time(
            lambda le: jax.vmap(lambda co, ce, Rk, sdk: _prep_window(
                le, co, ce, Rk, sdk, units, extents, tile, params))(
                coords, centers, R, sd_arr)[0], level, k1=1, k2=5)
        print(f"prep only (loop-timed, tile {tile}): {t * 1e3:8.2f} ms "
              f"({t / K * 1e6:.1f} us/kp)", flush=True)

    # full path chunk sweep
    from sift3d_tpu.descriptor import extract_descriptors as ext
    for kp_chunk in (8, 16, 32, 64):
        def full(level_, coords_, R_):
            d = ext(level_, coords_, R_, jnp.ones(K, bool), sd, 0, units,
                    params, kp_chunk=kp_chunk)
            return jnp.sum(d.desc)
        timed(f"full path kp_chunk={kp_chunk}", jax.jit(full),
              level, coords, R, per=K)


if __name__ == "__main__":
    main()
