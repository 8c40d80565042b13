"""bf16 descriptor-contraction: kernel speed + full-pipeline parity.

Part 1: RTT-immune kernel timing, f32 vs bf16 contraction, on synthetic
prep buffers. Part 2: detect+extract at desc_precision="highest" vs
"default" on the bench phantom; reports keypoint set equality and
descriptor agreement (keypoints do not depend on descriptors, so sets must
be identical; descriptors must agree within the bf16 rounding budget).

Usage: python -u tools/desc_bf16.py [size]
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
    from sift3d_tpu.ops.desc_kernel import desc_hist_pallas

    rng = np.random.default_rng(0)
    Mp = 106496  # level-1 window at 256^3, padded
    g1 = jnp.asarray(rng.normal(size=(64, 3, Mp)).astype(np.float32))
    v1 = jnp.asarray(
        rng.uniform(0, 4, size=(64, 3, Mp)).astype(np.float32))
    jax.device_get(jnp.sum(g1) + jnp.sum(v1))

    for prec in ("highest", "default"):
        t = device_time(
            lambda g, p=prec: desc_hist_pallas(g, v1, precision=p), g1,
            k1=1, k2=5)
        print(f"kernel 64 kp, precision={prec}: {t * 1e3:8.2f} ms "
              f"({t / 64 * 1e6:.1f} us/kp)", flush=True)

    h32, h16 = jax.device_get(
        (desc_hist_pallas(g1, v1, precision="highest"),
         desc_hist_pallas(g1, v1, precision="default")))
    num = np.linalg.norm((h16 - h32).reshape(64, -1), axis=1)
    den = np.linalg.norm(h32.reshape(64, -1), axis=1)
    print(f"kernel hist rel-L2 vs f32: max {np.max(num / den):.2e}",
          flush=True)

    # full pipeline parity
    from bench import make_bench_volume
    import sift3d_tpu as s3d
    from sift3d_tpu.volume import Volume

    vol = Volume.from_array(make_bench_volume(n))
    jax.device_get(jnp.sum(vol.data))

    def run(params):
        det = s3d.SIFT3D(params)
        kp = det.detect_keypoints(vol)
        return kp, det.extract_descriptors(kp)

    kp32, d32 = run(s3d.DetectorParams())
    kp16, d16 = run(s3d.DetectorParams(desc_precision="default"))
    same_kp = np.array_equal(np.asarray(kp32.coords),
                             np.asarray(kp16.coords))
    rel = (np.linalg.norm(d16.data - d32.data, axis=1)
           / (np.linalg.norm(d32.data, axis=1) + 1e-12))
    print(f"keypoints identical: {same_kp} ({len(kp32)} kp)", flush=True)
    print(f"descriptor rel-L2 vs f32: max {rel.max():.2e} "
          f"mean {rel.mean():.2e}  within 1%: "
          f"{np.mean(rel < 0.01) * 100:.1f}%", flush=True)


if __name__ == "__main__":
    main()
