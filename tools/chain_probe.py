"""Chained Pallas blur probe: where does the fused-kernel gpyr lose time?

Isolated, the fused blur3d kernel beats a composed level (1.14 ms
blur+dog vs ~1.5 at 256^3), and chaining does NOT degrade it
(~1.04-1.14 ms/level for 1..5 chained levels). The original full
build_gpyr_and_dog(pallas) measurement of 36.8 ms predates the
matmul downsample — the inter-octave strided slice is a lane-dim
gather. This probe times each structural ingredient plus the full
builders A/B, and checks DoG parity between them.

Usage: python -u tools/chain_probe.py [size]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp
import numpy as np

from device_time import device_time


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    from sift3d_tpu.params import DetectorParams
    from sift3d_tpu.pyramid import (build_gpyr_and_dog, downsample_2x,
                                    downsample_2x_matmul, make_plan)
    from sift3d_tpu.ops.blur_kernel import blur3d_pallas

    params = DetectorParams()
    plan = make_plan((n, n, n), (1.0, 1.0, 1.0), params)
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.normal(size=(n, n, n)).astype(np.float32))
    jax.device_get(jnp.sum(vol))

    def chain(k, stack=False, ds=None):
        def fn(args):
            (v,) = args
            levels = [v]
            dogs = []
            for i in range(1, k + 1):
                nxt, dg = blur3d_pallas(
                    levels[-1], plan.conv_diags(0, plan.level_taps[min(i, 5)]))
                levels.append(nxt)
                dogs.append(dg)
            if stack == "set":
                # functional in-place stacking: XLA should lower the
                # dynamic-update-slices in place (no full-pyramid copy)
                gbuf = jnp.zeros((k + 1,) + v.shape, v.dtype)
                dbuf = jnp.zeros((k,) + v.shape, v.dtype)
                for i, lv in enumerate(levels):
                    gbuf = gbuf.at[i].set(lv)
                for i, dg in enumerate(dogs):
                    dbuf = dbuf.at[i].set(dg)
                out = (gbuf, dbuf)
            elif stack:
                out = (jnp.stack(levels), jnp.stack(dogs))
            else:
                out = tuple(levels) + tuple(dogs)
            if ds is not None:
                return out + (ds(levels[-1]),)
            return out
        return fn

    for k in (1, 3, 5):
        t = device_time(jax.jit(chain(k)), (vol,), k1=1, k2=5)
        print(f"chain {k} levels:        {t*1e3:8.2f} ms "
              f"({t*1e3/k:.2f}/level)", flush=True)
    t = device_time(jax.jit(chain(5, stack=True)), (vol,), k1=1, k2=5)
    print(f"chain 5 + stack:       {t*1e3:8.2f} ms", flush=True)
    t = device_time(jax.jit(chain(5, stack="set")), (vol,), k1=1, k2=5)
    print(f"chain 5 + set-stack:   {t*1e3:8.2f} ms", flush=True)
    t = device_time(jax.jit(chain(5, stack="set", ds=downsample_2x_matmul)),
                    (vol,), k1=1, k2=5)
    print(f"  + matmul downsample: {t*1e3:8.2f} ms", flush=True)
    t = device_time(jax.jit(chain(5, stack=True, ds=downsample_2x)),
                    (vol,), k1=1, k2=5)
    print(f"  + slice downsample:  {t*1e3:8.2f} ms", flush=True)
    t = device_time(jax.jit(chain(5, stack=True, ds=downsample_2x_matmul)),
                    (vol,), k1=1, k2=5)
    print(f"  + matmul downsample: {t*1e3:8.2f} ms", flush=True)

    def full(use_pallas):
        def fn(args):
            (v,) = args
            gps, dogs = build_gpyr_and_dog(v, plan, use_pallas=use_pallas)
            return tuple(gps) + tuple(dogs)
        return fn

    t_c = device_time(jax.jit(full(False)), (vol,), k1=1, k2=5)
    print(f"full composed:         {t_c*1e3:8.2f} ms", flush=True)
    t_p = device_time(jax.jit(full(True)), (vol,), k1=1, k2=5)
    print(f"full pallas:           {t_p*1e3:8.2f} ms", flush=True)

    # parity: max |dog_pallas - dog_composed| per octave
    gc = jax.jit(full(False))((vol,))
    gp = jax.jit(full(True))((vol,))
    no = plan.num_octaves
    for o in range(no):
        dc, dp = gc[no + o], gp[no + o]
        err = float(jax.device_get(jnp.max(jnp.abs(dc - dp))))
        sc = float(jax.device_get(jnp.max(jnp.abs(dc))))
        print(f"octave {o} dog max|diff| = {err:.3e} (scale {sc:.3e})",
              flush=True)


if __name__ == "__main__":
    main()
