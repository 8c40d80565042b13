"""Per-axis precision split experiment: composed gpyr with x/y einsums at
HIGH (bf16x3) and z at HIGHEST for the keypoint-level group. The all-axes
HIGH mode kept 100% keypoint-set parity at 256^3 but descriptors were
98.8% within 1% rel-L2 (bar: >= 99); halving the reduced-precision passes
may cross the bar while cutting ~1.5 ms of MXU time.

Usage: python tools/prec_split.py [size]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    from bench import make_bench_volume
    import sift3d_tpu as s3d
    from sift3d_tpu import pyramid
    from sift3d_tpu.volume import Volume
    from gpyr_parity import run, key_set

    vol = Volume.from_array(make_bench_volume(n))
    jax.device_get(jnp.sum(vol.data))

    kp_a, ds_a, ms_a = run(s3d.SIFT3D(s3d.DetectorParams()), vol)
    print(f"highest:  {ms_a:.2f} ms, {len(kp_a)} keypoints", flush=True)

    # Monkeypatch: x/y at HIGH for the keypoint-level group, z HIGHEST.
    orig = pyramid._build_octave_composed

    def split(src, plan, o, groups):
        Px, Py, Pz = (jnp.asarray(P)
                      for P in pyramid._composed_matrices(plan, o))
        hi = jax.lax.Precision.HIGHEST
        h = jax.lax.Precision.HIGH
        parts = []
        for a, b, p in groups:
            pxy = h if p == hi else p     # only weaken the f32 groups
            lv = jnp.einsum("lab,byz->layz", Px[a:b], src, precision=pxy)
            lv = jnp.einsum("lab,lxbz->lxaz", Py[a:b], lv, precision=pxy)
            lv = jnp.einsum("lab,lxyb->lxya", Pz[a:b], lv, precision=p)
            parts.append(lv)
        return parts[0] if len(parts) == 1 else jnp.concatenate(
            parts, axis=0)

    pyramid._build_octave_composed = split
    try:
        # gpyr_impl="composed" behaves identically to the default "auto"
        # but hashes differently, forcing a fresh trace under the patch.
        kp_b, ds_b, ms_b = run(s3d.SIFT3D(s3d.DetectorParams(
            gpyr_impl="composed")), vol)
    finally:
        pyramid._build_octave_composed = orig
    print(f"xy-high:  {ms_b:.2f} ms, {len(kp_b)} keypoints", flush=True)

    set_a, set_b = key_set(kp_a), key_set(kp_b)
    inter = len(set_a & set_b)
    print(f"keypoint set agreement: {inter}/{len(set_a)} "
          f"({100.0 * inter / max(len(set_a), 1):.1f}%)  "
          f"extra: {len(set_b - set_a)}", flush=True)
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
        print(f"descriptor rel-L2: median {np.median(rel):.2e}, "
              f"max {rel.max():.2e}, "
              f"{100.0 * np.mean(rel < 0.01):.1f}% within 1%", flush=True)


if __name__ == "__main__":
    main()
