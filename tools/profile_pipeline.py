"""Stage-level timing of the detection pipeline on the current backend.

Timing note: on remote/tunneled backends `block_until_ready` may return
before execution completes, so every stage is timed through a dependent
scalar `jax.device_get` (the reduction forces the full computation).

Usage: python tools/profile_pipeline.py [size]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timed_scalar(label, fn, *args, n=3):
    """fn must return a scalar; timed via device_get."""
    jax.device_get(fn(*args))  # compile + warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.device_get(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{label:<44}{min(ts)*1e3:>10.2f} ms")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    from bench import make_bench_volume
    from sift3d_tpu.params import DetectorParams
    from sift3d_tpu.pyramid import build_gpyr, make_plan, scale_to_unit
    from sift3d_tpu.detect import detect_extrema_octave
    import sift3d_tpu as s3d
    from sift3d_tpu.volume import Volume

    vol = Volume.from_array(make_bench_volume(n))
    jax.device_get(jnp.sum(vol.data))  # force upload
    params = DetectorParams()
    plan = make_plan((n, n, n), (1.0, 1.0, 1.0), params)

    timed_scalar("RTT floor (trivial jit)",
                 jax.jit(lambda v: v[0, 0, 0] * 1.0), vol.data)
    timed_scalar("scale_to_unit",
                 jax.jit(lambda v: scale_to_unit(v)[0, 0, 0]), vol.data)
    timed_scalar(
        "gpyr (composed matmuls, all octaves)",
        jax.jit(lambda v: sum(jnp.sum(g)
                              for g in build_gpyr(scale_to_unit(v), plan))),
        vol.data)

    def full_detect(v):
        g = build_gpyr(scale_to_unit(v), plan)
        acc = jnp.float32(0)
        for o in range(plan.num_octaves):
            dog = g[o][:-1] - g[o][1:]
            c = detect_extrema_octave(dog, params, 4096)
            acc += jnp.sum(c.counts) + jnp.sum(c.strength)
        return acc
    timed_scalar("full detect jit (incl. compaction)",
                 jax.jit(full_detect), vol.data)

    det = s3d.SIFT3D()
    kp = det.detect_keypoints(vol)
    det.extract_descriptors(kp)  # warm
    for _ in range(3):
        t0 = time.perf_counter()
        kp = det.detect_keypoints(vol)
        t1 = time.perf_counter()
        desc = det.extract_descriptors(kp)
        t2 = time.perf_counter()
        print(f"{'detect_keypoints e2e':<44}{(t1-t0)*1e3:>10.2f} ms "
              f"({len(kp)} keypoints)")
        print(f"{'extract_descriptors e2e':<44}{(t2-t1)*1e3:>10.2f} ms")

    from sift3d_tpu.profiling import detect_stats, format_funnel
    print("\ndetection funnel (candidates -> rejections -> survivors):")
    print(format_funnel(detect_stats(det, kp)))


if __name__ == "__main__":
    main()
