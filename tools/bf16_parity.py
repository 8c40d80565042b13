"""bf16-blur parity at bench scale: run the full detect+extract pipeline at
conv_precision="highest" (parity-grade f32) and "default" (fastest MXU path)
on the same volume and report keypoint/descriptor agreement + latency.

Usage: python tools/bf16_parity.py [size]
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


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    from bench import make_bench_volume
    import sift3d_tpu as s3d
    from sift3d_tpu.volume import Volume

    vol = Volume.from_array(make_bench_volume(n))
    jax.device_get(jnp.sum(vol.data))

    kp_hi, ds_hi, ms_hi = run(s3d.SIFT3D(s3d.DetectorParams(
        conv_precision="highest")), vol)
    mode = sys.argv[2] if len(sys.argv) > 2 else "default"
    kp_lo, ds_lo, ms_lo = run(s3d.SIFT3D(s3d.DetectorParams(
        conv_precision=mode)), vol)

    print(f"highest: {ms_hi:.2f} ms, {len(kp_hi)} keypoints")
    print(f"{mode}: {ms_lo:.2f} ms, {len(kp_lo)} keypoints")

    set_hi = {tuple(c) + (o,) for c, o in zip(
        kp_hi.coords.astype(int).tolist(), kp_hi.octave.tolist())}
    set_lo = {tuple(c) + (o,) for c, o in zip(
        kp_lo.coords.astype(int).tolist(), kp_lo.octave.tolist())}
    inter = len(set_hi & set_lo)
    print(f"keypoint set agreement: {inter}/{len(set_hi)} "
          f"({100.0 * inter / max(len(set_hi), 1):.1f}%)  "
          f"extra in bf16: {len(set_lo - set_hi)}")

    if inter:
        # match descriptors of common keypoints by coordinate
        import collections
        idx_hi = {k: i for i, k in enumerate(
            tuple(c) + (o,) for c, o in zip(
                kp_hi.coords.astype(int).tolist(), kp_hi.octave.tolist()))}
        idx_lo = {k: i for i, k in enumerate(
            tuple(c) + (o,) for c, o in zip(
                kp_lo.coords.astype(int).tolist(), kp_lo.octave.tolist()))}
        common = sorted(set_hi & set_lo)
        a = ds_hi.data[[idx_hi[k] for k in common]]
        b = ds_lo.data[[idx_lo[k] for k in common]]
        num = np.linalg.norm(a - b, axis=1)
        den = np.linalg.norm(a, axis=1) + 1e-30
        rel = num / den
        print(f"descriptor rel-L2 on common keypoints: "
              f"median {np.median(rel):.2e}, max {rel.max():.2e}, "
              f"{100.0 * np.mean(rel < 0.01):.1f}% within 1%")


if __name__ == "__main__":
    main()
