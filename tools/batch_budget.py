"""Where does the batched (vmapped) fused detect program spend its time?

Device-times (RTT-immune, tools/device_time.py) the single-volume fused
hinted program vs the vmapped batched variant at B=1 and B=4, per volume.
The batched variant forfeits the Pallas extrema + orientation kernels
(no/unsafe vmap batching rules) — this quantifies what that and the vmap
program structure cost, to size the payoff of a batch-native program
(concat keypoint stages across volumes, shared kernel launches).

Usage: python -u tools/batch_budget.py [size] [B]
"""

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))

import jax
import jax.numpy as jnp

from device_time import device_time


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    from bench import make_bench_volume
    import sift3d_tpu as s3d
    from sift3d_tpu.volume import Volume
    from sift3d_tpu.pipeline import _detect_full_fn, _hint_cfg
    from sift3d_tpu.pyramid import make_plan

    vol = make_bench_volume(size)
    det = s3d.SIFT3D()
    v = Volume.from_array(vol)
    det.detect_keypoints(v)   # learn hint
    det.detect_keypoints(v)   # compile + confirm fused path
    plan = make_plan(vol.shape, (1.0, 1.0, 1.0), det.params)
    cfg = _hint_cfg(plan, det._hint, det.params)
    print(f"hint cfg: {cfg}", flush=True)

    x1 = jnp.asarray(vol)
    run1 = _detect_full_fn(plan, cfg)

    t1 = device_time(run1, x1)
    print(f"single fused program: {t1 * 1e3:.2f} ms/vol", flush=True)

    vb1 = jnp.asarray(vol)[None]
    tb1 = device_time(_detect_full_fn(plan, cfg, batch=1), vb1)
    print(f"unrolled batch B=1: {tb1 * 1e3:.2f} ms/vol", flush=True)

    volb = np.stack([vol * (1.0 + 0.01 * i) for i in range(B)])
    xb = jnp.asarray(volb)
    tb = device_time(_detect_full_fn(plan, cfg, batch=B), xb)
    print(f"unrolled batch B={B}: {tb * 1e3 / B:.2f} ms/vol "
          f"({tb * 1e3:.1f} ms/batch)", flush=True)


if __name__ == "__main__":
    main()
