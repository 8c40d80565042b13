"""Fine-grained TPU stage budget for the 256^3 detect jit.

Times each pipeline piece through a dependent scalar jax.device_get (the
tunneled backend does not block on block_until_ready), prints a stage table
and MFU estimates, and measures the bf16 (conv_precision="default") blur
variant head-to-head.

Usage: python tools/perf_probe.py [size] [--kp 1024]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timed(label, fn, *args, n=5, flops=None):
    jax.device_get(fn(*args))  # compile + warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.device_get(fn(*args))
        ts.append(time.perf_counter() - t0)
    ms = min(ts) * 1e3
    extra = ""
    if flops:
        extra = f"  ({flops / (ms * 1e-3) / 1e12:.1f} TFLOP/s)"
    print(f"{label:<52}{ms:>9.2f} ms{extra}", flush=True)
    return ms


def gpyr_flops(plan):
    total = 0
    L = plan.num_gpyr_levels
    for o in range(plan.num_octaves):
        nx, ny, nz = plan.octave_dims[o]
        nl = L if o == 0 else L - 1
        # three axis matmuls per level: 2*n^2*(rest) each
        total += nl * 2 * (nx * nx * ny * nz + ny * ny * nx * nz
                           + nz * nz * nx * ny)
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("size", type=int, nargs="?", default=256)
    ap.add_argument("--kp", type=int, default=1024)
    args = ap.parse_args()
    n = args.size

    from bench import make_bench_volume
    from sift3d_tpu.detect import compact_flat, detect_extrema_octave
    from sift3d_tpu.params import DetectorParams
    from sift3d_tpu.pyramid import build_gpyr, make_plan, scale_to_unit
    import sift3d_tpu as s3d
    from sift3d_tpu.volume import Volume

    print(f"devices: {jax.devices()}", flush=True)
    vol = Volume.from_array(make_bench_volume(n))
    t0 = time.perf_counter()
    jax.device_get(jnp.sum(vol.data))
    print(f"upload+first sync: {time.perf_counter() - t0:.1f} s", flush=True)

    params = DetectorParams()
    plan = make_plan((n, n, n), (1.0, 1.0, 1.0), params)

    rtt = timed("RTT floor (trivial jit)",
                jax.jit(lambda v: v[0, 0, 0] * 1.0), vol.data)

    fl = gpyr_flops(plan)
    timed("gpyr f32 HIGHEST (all octaves)",
          jax.jit(lambda v: sum(jnp.sum(g)
                                for g in build_gpyr(scale_to_unit(v), plan))),
          vol.data, flops=fl)

    params_bf = DetectorParams(conv_precision="default")
    plan_bf = make_plan((n, n, n), (1.0, 1.0, 1.0), params_bf)
    timed("gpyr bf16 DEFAULT (all octaves)",
          jax.jit(lambda v: sum(jnp.sum(g)
                                for g in build_gpyr(scale_to_unit(v),
                                                    plan_bf))),
          vol.data, flops=fl)

    # extrema WITHOUT compaction (mask+counts only)
    def extrema_only(v):
        g = build_gpyr(scale_to_unit(v), plan)
        acc = jnp.int32(0)
        for o in range(plan.num_octaves):
            dog = g[o][:-1] - g[o][1:]
            cur = dog[1:-1]
            dogmax = jnp.max(jnp.abs(cur), axis=(1, 2, 3))
            acc += jnp.sum((jnp.abs(cur)
                            > 0.1 * dogmax[:, None, None, None]))
        return acc
    timed("gpyr + extrema mask (no compaction)", jax.jit(extrema_only),
          vol.data)

    for cap in (1536, 4096, 12288):
        def full(v, cap=cap):
            g = build_gpyr(scale_to_unit(v), plan)
            acc = jnp.float32(0)
            for o in range(plan.num_octaves):
                dog = g[o][:-1] - g[o][1:]
                c = detect_extrema_octave(dog, params, cap)
                acc += jnp.sum(c.counts) + jnp.sum(c.strength)
            return acc
        timed(f"full detect jit (capacity {cap}/octave)", jax.jit(full),
              vol.data)

    # real pipeline end-to-end
    det = s3d.SIFT3D()
    kp = det.detect_keypoints(vol)
    det.extract_descriptors(kp)
    for _ in range(3):
        t0 = time.perf_counter()
        kp = det.detect_keypoints(vol)
        t1 = time.perf_counter()
        desc = det.extract_descriptors(kp)
        t2 = time.perf_counter()
        print(f"{'detect_keypoints e2e':<52}{(t1 - t0) * 1e3:>9.2f} ms "
              f"({len(kp)} keypoints)", flush=True)
        print(f"{'extract_descriptors e2e':<52}{(t2 - t1) * 1e3:>9.2f} ms",
              flush=True)

    # descriptor throughput at dense keypoint population: synthesize K
    # keypoints on octave 0 level 1
    from sift3d_tpu.descriptor import extract_descriptors as ext_desc
    K = args.kp
    rng = np.random.default_rng(0)
    coords = jnp.asarray(rng.integers(16, n - 16, (K, 3)), jnp.int32)
    R = jnp.tile(jnp.eye(3, dtype=jnp.float32), (K, 1, 1))
    level = det._gpyr[0][1]
    sd = plan.scales[0][1]

    def desc_k(level_, coords_, R_):
        d = ext_desc(level_, coords_, R_, jnp.ones(K, bool), sd, 0,
                     (1.0, 1.0, 1.0), params)
        return jnp.sum(d.desc)
    ms = timed(f"descriptors {K} kp (octave 0, sd={sd:.2f})",
               jax.jit(desc_k), level, coords, R)
    print(f"{'  -> per keypoint':<52}{ms / K * 1e3:>9.2f} us", flush=True)

    from sift3d_tpu.profiling import detect_stats, format_funnel
    print("\nfunnel:")
    print(format_funnel(detect_stats(det, kp)), flush=True)


if __name__ == "__main__":
    main()
