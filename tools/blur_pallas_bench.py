"""Time the fused Pallas blur kernel vs the composed-matmul gpyr at 256^3.

Usage: python -u tools/blur_pallas_bench.py [size]
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
    from sift3d_tpu.pyramid import (build_gpyr, build_dog, make_plan,
                                    scale_to_unit, blur_diag)
    from sift3d_tpu.ops.blur_kernel import blur3d_pallas

    params = DetectorParams()
    plan = make_plan((n, n, n), (1.0, 1.0, 1.0), params)
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.normal(size=(n, n, n)).astype(np.float32))
    jax.device_get(jnp.sum(vol))

    diags = plan.conv_diags(0, plan.level_taps[1])

    # Single-level correctness on hardware.
    ref = jax.jit(lambda v: blur_diag(v, diags, params))(vol)
    out, dog = jax.jit(lambda v: blur3d_pallas(v, diags))(vol)
    ref_n, out_n, dog_n = jax.device_get((ref, out, dog))
    vol_n = np.asarray(vol)
    print("single level: blur err",
          np.abs(ref_n - out_n).max() / np.abs(ref_n).max(),
          "dog err", np.abs((vol_n - ref_n) - dog_n).max(), flush=True)

    def one_level(args):
        (v,) = args
        return blur3d_pallas(v, diags)

    t = device_time(jax.jit(one_level), (vol,), k1=2, k2=12)
    print(f"pallas one level (blur+dog): {t * 1e3:8.2f} ms", flush=True)

    from sift3d_tpu.pyramid import build_gpyr_and_dog

    def gpyr_pallas(args):
        (v,) = args
        gp, dog = build_gpyr_and_dog(scale_to_unit(v), plan,
                                     use_pallas=True)
        return tuple(gp) + tuple(dog)

    def gpyr_composed(args):
        (v,) = args
        gp = build_gpyr(scale_to_unit(v), plan)
        return tuple(gp) + tuple(build_dog(gp))

    t = device_time(jax.jit(gpyr_pallas), (vol,), k1=1, k2=6)
    print(f"pallas full gpyr+dog:        {t * 1e3:8.2f} ms", flush=True)
    t = device_time(jax.jit(gpyr_composed), (vol,), k1=1, k2=6)
    print(f"composed full gpyr+dog:      {t * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
