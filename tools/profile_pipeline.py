"""Stage-level timing of the detection pipeline on the current backend.

Usage: python tools/profile_pipeline.py [size]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timed(label, fn, *args, n=3):
    out = jax.block_until_ready(fn(*args))  # compile + warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{label:<40}{min(ts)*1e3:>10.2f} ms")
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from bench import make_bench_volume
    from sift3d_tpu.params import DetectorParams
    from sift3d_tpu.pyramid import (build_dog, build_gpyr, make_plan,
                                    scale_to_unit)
    from sift3d_tpu.detect import detect_extrema_level
    import sift3d_tpu as s3d

    vol = jnp.asarray(make_bench_volume(n))
    params = DetectorParams()
    plan = make_plan((n, n, n), (1.0, 1.0, 1.0), params)

    timed("scale_to_unit", jax.jit(scale_to_unit), vol)
    gpyr_fn = jax.jit(lambda v: build_gpyr(scale_to_unit(v), plan))
    gpyr = timed("gpyr (scale+blur chain)", gpyr_fn, vol)
    dog_fn = jax.jit(lambda g: build_dog(g))
    dog = timed("dog", dog_fn, gpyr)

    def extrema_all(dog):
        out = []
        for o in range(plan.num_octaves):
            for i in range(1, params.num_dog_levels - 1):
                out.append(detect_extrema_level(
                    dog[o][i - 1], dog[o][i], dog[o][i + 1], params, 16384))
        return out
    timed("extrema (all levels)", jax.jit(extrema_all), dog)

    det = s3d.SIFT3D()
    kp = det.detect_keypoints(np.asarray(vol))  # warm all stages

    t0 = time.perf_counter()
    kp = det.detect_keypoints(np.asarray(vol))
    print(f"{'detect_keypoints e2e':<40}{(time.perf_counter()-t0)*1e3:>10.2f}"
          f" ms   ({len(kp)} keypoints)")

    det.extract_descriptors(kp)
    t0 = time.perf_counter()
    desc = det.extract_descriptors(kp)
    print(f"{'extract_descriptors e2e':<40}"
          f"{(time.perf_counter()-t0)*1e3:>10.2f} ms   ({len(desc)} desc)")


if __name__ == "__main__":
    main()
