"""BASELINE configs 4-5: pair registration latency and batched throughput.

Usage:
  python tools/bench_registration.py [--size 192] [--batch 4]

Prints per-stage timings and a registration throughput estimate. The batch
mode runs several pair registrations back to back (detector compilations are
shared), approximating the batched-throughput configuration on one chip;
on a pod slice the same pipeline shards the batch over ICI (see
sift3d_tpu.parallel).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=192)
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()

    from bench import make_bench_volume
    from sift3d_tpu.registration import register, warp_volume
    from sift3d_tpu.volume import Volume

    n = args.size
    rng = np.random.default_rng(3)

    def make_pair(seed):
        base = make_bench_volume(n)
        th = np.deg2rad(rng.uniform(-10, 10))
        Rz = np.array([[np.cos(th), -np.sin(th), 0],
                       [np.sin(th), np.cos(th), 0], [0, 0, 1]])
        c = np.array([(n - 1) / 2.0] * 3)
        t = rng.uniform(-4, 4, 3)
        A = np.zeros((3, 4), np.float32)
        A[:, :3] = Rz
        A[:, 3] = c - Rz @ c + t
        fixed = Volume.from_array(base)
        moving = warp_volume(fixed, A, (n, n, n))
        return fixed, moving

    fixed, moving = make_pair(0)
    t0 = time.perf_counter()
    res = register(fixed, moving)
    print(f"pair registration (cold, incl. compile): "
          f"{time.perf_counter() - t0:.2f} s  "
          f"matches={res.num_matches} inliers={res.num_inliers}")

    times = []
    for b in range(args.batch):
        t0 = time.perf_counter()
        res = register(fixed, moving)
        times.append(time.perf_counter() - t0)
    ms = min(times) * 1e3
    print(f"pair registration (warm): {ms:.1f} ms -> "
          f"{1e3 / ms:.2f} pairs/s single chip")


if __name__ == "__main__":
    main()
