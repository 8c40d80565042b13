"""RTT-immune per-stage device-time budget at 256^3 (see device_time.py).

Usage: python tools/stage_budget.py [size] [--kp 256]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from device_time import device_time


def report(label, seconds, per=None):
    extra = f"  ({seconds / per * 1e6:.1f} us/kp)" if per else ""
    print(f"{label:<56}{seconds * 1e3:>9.2f} ms{extra}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("size", type=int, nargs="?", default=256)
    ap.add_argument("--kp", type=int, default=256)
    args = ap.parse_args()
    n, K = args.size, args.kp

    from bench import make_bench_volume
    from sift3d_tpu.detect import detect_extrema_octave
    from sift3d_tpu.descriptor import extract_descriptors as ext_desc
    from sift3d_tpu.orientation import assign_orientations
    from sift3d_tpu.params import DetectorParams
    from sift3d_tpu.pyramid import build_gpyr, make_plan, scale_to_unit

    params = DetectorParams()
    plan = make_plan((n, n, n), (1.0, 1.0, 1.0), params)
    vol = jnp.asarray(make_bench_volume(n))
    jax.device_get(jnp.sum(vol))
    rng = np.random.default_rng(0)

    report("scale_to_unit",
           device_time(lambda v: scale_to_unit(v), vol))

    def gpyr_fn(v):
        return sum(jnp.sum(g) for g in build_gpyr(v, plan))
    report("gpyr (all octaves)", device_time(gpyr_fn, vol))

    caps = {o: 3 * 2048 for o in range(plan.num_octaves)}

    def detect_fn(v):
        g = build_gpyr(v, plan)
        acc = jnp.float32(0)
        for o in range(plan.num_octaves):
            dog = g[o][:-1] - g[o][1:]
            c = detect_extrema_octave(dog, params, caps[o])
            acc += jnp.sum(c.counts) + jnp.sum(c.strength)
        return acc
    t_detect = device_time(detect_fn, vol)
    report("detect jit (gpyr+extrema+compaction)", t_detect)

    # orientation on K slots, octave 0 mixed levels
    gp0 = jax.jit(lambda v: build_gpyr(v, plan)[0])(vol)
    jax.device_get(jnp.sum(gp0))
    coords = jnp.asarray(rng.integers(16, n - 16, (K, 3)), jnp.int32)
    lvls = jnp.asarray(rng.integers(0, 3, (K,)), jnp.int32)
    scales = np.asarray([plan.scales[0][1 + i] for i in range(3)],
                        np.float32)
    sd_max = float(scales.max())

    def ori_fn(gp):
        o = assign_orientations(
            gp[1:4], coords, jnp.ones(K, bool),
            jnp.asarray(scales)[lvls], (1.0, 1.0, 1.0), params,
            sd_max=sd_max, level_index=lvls, fractional_centers=False)
        return jnp.sum(o.R) + jnp.sum(o.accepted)
    t_ori = device_time(ori_fn, gp0)
    report(f"orientation ({K} mixed-level slots, octave 0)", t_ori, per=K)

    R = jnp.tile(jnp.eye(3, dtype=jnp.float32), (K, 1, 1))
    sd = plan.scales[0][1]

    def desc_fn(gp):
        d = ext_desc(gp[1], coords, R, jnp.ones(K, bool), sd, 0,
                     (1.0, 1.0, 1.0), params)
        return jnp.sum(d.desc)
    t_desc = device_time(desc_fn, gp0, k1=1, k2=4)
    report(f"descriptors ({K} kp, octave 0 level 1)", t_desc, per=K)


if __name__ == "__main__":
    main()
