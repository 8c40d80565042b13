"""Device-time A/B of the gpyr+DoG builders at bench scale: composed
(gpyr_impl="composed") vs the chained aliased builder ("chain").
Also checks DoG parity chain vs composed.

Usage: python -u tools/chain_full.py [size]
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
    from sift3d_tpu.pyramid import build_gpyr_and_dog, make_plan

    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.normal(size=(n, n, n)).astype(np.float32))
    jax.device_get(jnp.sum(vol))

    def full(impl):
        params = DetectorParams(gpyr_impl=impl)
        plan = make_plan((n, n, n), (1.0, 1.0, 1.0), params)

        def fn(args):
            (v,) = args
            gps, dogs = build_gpyr_and_dog(v, plan)
            return tuple(gps) + tuple(dogs)
        return fn, plan

    outs = {}
    for impl in ("composed", "chain"):
        fn, plan = full(impl)
        t = device_time(jax.jit(fn), (vol,), k1=1, k2=5)
        print(f"gpyr+dog {impl:10s}: {t*1e3:8.2f} ms", flush=True)
        outs[impl] = jax.jit(fn)((vol,))

    no = len(outs["composed"]) // 2 + (len(outs["composed"]) % 2)
    plan = full("chain")[1]
    no = plan.num_octaves
    for o in range(no):
        dc, dp = outs["composed"][no + o], outs["chain"][no + o]
        err = float(jax.device_get(jnp.max(jnp.abs(dc - dp))))
        sc = float(jax.device_get(jnp.max(jnp.abs(dc))))
        print(f"octave {o} dog chain-vs-composed max|diff| = {err:.3e} "
              f"(scale {sc:.3e})", flush=True)


if __name__ == "__main__":
    main()
