"""Split the hinted detect+extract wall time into dispatch / transfer /
host phases on the real device.

Usage: python -u tools/e2e_split.py [size]
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
    from sift3d_tpu.volume import Volume
    from sift3d_tpu.pipeline import _detect_full_fn, _hint_cfg
    from sift3d_tpu.pyramid import make_plan

    vol = Volume.from_array(make_bench_volume(n))
    jax.device_get(jnp.sum(vol.data))

    det = s3d.SIFT3D()
    kp = det.detect_keypoints(vol)       # learn hint
    det.extract_descriptors(kp)
    kp = det.detect_keypoints(vol)       # compile fused program
    det.extract_descriptors(kp)

    plan = make_plan(vol.shape, vol.units, det.params)
    hint = det._hint
    cfg = _hint_cfg(plan, hint, det.params)
    print(f"cfg (cap, ori_slots, desc_slots) per octave: {list(cfg)}",
          flush=True)
    run = _detect_full_fn(plan, cfg)

    # payload size estimate
    for _ in range(5):
        t0 = time.perf_counter()
        gpyr, cands, counts_dev, octs = run(vol.data)
        t1 = time.perf_counter()
        counts, octs_host = jax.device_get((counts_dev, octs))
        t2 = time.perf_counter()
        print(f"dispatch {1e3 * (t1 - t0):7.2f} ms   "
              f"get {1e3 * (t2 - t1):7.2f} ms", flush=True)

    nbytes = sum(np.asarray(x).nbytes
                 for x in jax.tree_util.tree_leaves((counts, octs_host)))
    print(f"payload: {nbytes / 1e3:.0f} kB", flush=True)

    # full pipeline wall, for reference
    for _ in range(3):
        t0 = time.perf_counter()
        kp = det.detect_keypoints(vol)
        t1 = time.perf_counter()
        det.extract_descriptors(kp)
        t2 = time.perf_counter()
        print(f"detect {1e3 * (t1 - t0):7.2f} ms   "
              f"extract {1e3 * (t2 - t1):7.2f} ms  ({len(kp)} kp)",
              flush=True)


if __name__ == "__main__":
    main()
