"""gpyr-impl parity at bench scale: full detect+extract with the composed
matmul pyramid vs the chained aliased Pallas builder on the same volume; reports
keypoint set agreement, descriptor rel-L2, and latency.

Usage: python tools/gpyr_parity.py [size]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def run(det, vol, repeats=3):
    kp = det.detect_keypoints(vol)
    desc = det.extract_descriptors(kp)
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        kp = det.detect_keypoints(vol)
        desc = det.extract_descriptors(kp)
        ts.append(time.perf_counter() - t0)
    return kp, desc, min(ts) * 1e3


def key_set(kp):
    return {tuple(c) + (o,) for c, o in zip(
        kp.coords.astype(int).tolist(), kp.octave.tolist())}


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    from bench import make_bench_volume
    import sift3d_tpu as s3d
    from sift3d_tpu.volume import Volume

    vol = Volume.from_array(make_bench_volume(n))
    jax.device_get(jnp.sum(vol.data))

    kp_a, ds_a, ms_a = run(s3d.SIFT3D(s3d.DetectorParams(
        gpyr_impl="composed")), vol)
    kp_b, ds_b, ms_b = run(s3d.SIFT3D(s3d.DetectorParams(
        gpyr_impl="chain")), vol)

    print(f"composed: {ms_a:.2f} ms, {len(kp_a)} keypoints", flush=True)
    print(f"pallas:   {ms_b:.2f} ms, {len(kp_b)} keypoints", flush=True)

    set_a, set_b = key_set(kp_a), key_set(kp_b)
    inter = len(set_a & set_b)
    print(f"keypoint set agreement: {inter}/{len(set_a)} "
          f"({100.0 * inter / max(len(set_a), 1):.1f}%)  "
          f"extra in pallas: {len(set_b - set_a)}", flush=True)

    if inter:
        idx_a = {k: i for i, k in enumerate(
            tuple(c) + (o,) for c, o in zip(
                kp_a.coords.astype(int).tolist(), kp_a.octave.tolist()))}
        idx_b = {k: i for i, k in enumerate(
            tuple(c) + (o,) for c, o in zip(
                kp_b.coords.astype(int).tolist(), kp_b.octave.tolist()))}
        common = sorted(set_a & set_b)
        a = ds_a.data[[idx_a[k] for k in common]]
        b = ds_b.data[[idx_b[k] for k in common]]
        rel = (np.linalg.norm(a - b, axis=1)
               / (np.linalg.norm(a, axis=1) + 1e-30))
        print(f"descriptor rel-L2 on common keypoints: "
              f"median {np.median(rel):.2e}, max {rel.max():.2e}, "
              f"{100.0 * np.mean(rel < 0.01):.1f}% within 1%", flush=True)


if __name__ == "__main__":
    main()
