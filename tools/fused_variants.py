"""Device-time attribution inside the fused hinted program: measures the
full program and ablations (no descriptors / no orientation / detect only)
with RTT-immune loop timing, at the bench hint configuration, using the
REAL pipeline body (_detect_core/_detect_full_body — no tool-local copy
to drift).

Usage: python -u tools/fused_variants.py [size] [--dense] [--mixed-desc]
  --mixed-desc: disable the sparse per-level descriptor window split
  (params sparse_desc_groups=False) for A/B.
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
    dense = "--dense" in sys.argv
    from bench import make_bench_volume, make_dense_volume
    import sift3d_tpu as s3d
    from sift3d_tpu import pipeline
    from sift3d_tpu.detect import detect_extrema_octave
    from sift3d_tpu.pipeline import (_detect_core, _detect_full_body,
                                     _desc_jobs, _chunk_plan, _hint_cfg)
    from sift3d_tpu.pyramid import build_gpyr_and_dog, make_plan, \
        scale_to_unit
    from sift3d_tpu.volume import Volume

    vol = Volume.from_array(
        make_dense_volume(n) if dense else make_bench_volume(n))
    jax.device_get(jnp.sum(vol.data))

    from sift3d_tpu.params import DetectorParams
    det_params = DetectorParams(sparse_desc_groups="--mixed-desc"
                                not in sys.argv)
    det = s3d.SIFT3D(det_params)
    for _ in range(4):         # learn hint, reach the tight-slot config
        det.detect_keypoints(vol)
    plan = make_plan(vol.shape, vol.units, det.params)
    cfg = _hint_cfg(plan, det._hint, det.params,
                    tight=det._hint_streak >= 2)
    params = det.params
    print(f"cfg: {list(cfg)}", flush=True)
    jobs = _desc_jobs(plan, cfg)
    chunks = _chunk_plan(jobs, params.split_desc_chunks,
                         params.min_chunk_cost)
    print("desc jobs (octave, levels, slots, Mvox):", flush=True)
    for j in jobs:
        print(f"  o{j.octave} s[{j.lv_lo},{j.lv_hi}) slots={j.slots:4d} "
              f"cost={j.cost / 1e6:7.1f}", flush=True)
    print(f"chunk plan ({len(chunks)}):", flush=True)
    for c, spans in enumerate(chunks):
        cost = sum((hi - lo) * jobs[ji].cost / max(jobs[ji].slots, 1)
                   for ji, lo, hi in spans)
        print(f"  chunk {c}: {spans}  cost={cost / 1e6:7.1f}", flush=True)

    def sum_tree(t):
        return sum((jnp.sum(l.astype(jnp.float32))
                    for l in jax.tree.leaves(t)), jnp.float32(0.0))

    def run_detect(data):
        x = scale_to_unit(data)
        gpyr, dogs = build_gpyr_and_dog(x, plan)
        acc = jnp.float32(0)
        for o, (cap, ospec, dslots) in enumerate(cfg):
            cand = detect_extrema_octave(dogs[o], params, cap)
            acc += jnp.sum(cand.counts) + jnp.sum(cand.strength)
        return acc

    core = _detect_core(plan, cfg, vmapped=False)

    def run_ori(data):
        gpyr, cands, counts, octs, dargs = core(data)
        return sum_tree(octs) + jnp.sum(counts.astype(jnp.float32))

    body = _detect_full_body(plan, cfg, vmapped=False)

    def run_all(data):
        gpyr, cands, counts, octs = body(data)
        return sum_tree(octs) + jnp.sum(counts.astype(jnp.float32))

    t_det = device_time(run_detect, vol.data, k1=1, k2=5)
    print(f"detect only:        {t_det * 1e3:8.2f} ms", flush=True)
    t_ori = device_time(run_ori, vol.data, k1=1, k2=5)
    print(f"detect+ori:         {t_ori * 1e3:8.2f} ms  "
          f"(ori {1e3 * (t_ori - t_det):.2f})", flush=True)
    t_all = device_time(run_all, vol.data, k1=1, k2=5)
    print(f"detect+ori+desc:    {t_all * 1e3:8.2f} ms  "
          f"(desc {1e3 * (t_all - t_ori):.2f})", flush=True)


if __name__ == "__main__":
    main()
