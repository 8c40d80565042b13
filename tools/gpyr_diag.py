"""A/B the gpyr implementations on the TPU at bench scale: composed
per-octave MXU matmul operators (current default) vs the diagonal-form
incremental VPU chain (band-sparse shifted FMAs).

Usage: python -u tools/gpyr_diag.py [size]
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
    from sift3d_tpu.params import DetectorParams
    from sift3d_tpu.pyramid import (build_gpyr, build_gpyr_incremental,
                                    build_dog, make_plan, scale_to_unit)

    params = DetectorParams()
    plan = make_plan((n, n, n), (1.0, 1.0, 1.0), params)
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.normal(size=(n, n, n)).astype(np.float32))
    jax.device_get(jnp.sum(vol))

    def composed(args):
        (v,) = args
        return tuple(build_gpyr(scale_to_unit(v), plan))

    def incremental(args):
        (v,) = args
        return tuple(build_gpyr_incremental(scale_to_unit(v), plan))

    def composed_dog(args):
        (v,) = args
        gp = build_gpyr(scale_to_unit(v), plan)
        return tuple(gp) + tuple(build_dog(gp))

    def incremental_dog(args):
        (v,) = args
        gp = build_gpyr_incremental(scale_to_unit(v), plan)
        return tuple(gp) + tuple(build_dog(gp))

    for label, fn in (("composed (matmul)", composed),
                      ("incremental (diag VPU)", incremental),
                      ("composed + DoG", composed_dog),
                      ("incremental + DoG", incremental_dog)):
        t = device_time(jax.jit(fn), (vol,), k1=1, k2=9)
        print(f"{label:<28}{t * 1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
