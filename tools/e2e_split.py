"""Split the hinted detect+extract wall time into RTT / dispatch /
transfer / host phases on the real device, using the SPLIT hinted
pipeline (program A + chunked descriptor programs — the shipping path).
Shows when each descriptor chunk's bytes land relative to the keypoint
payload, i.e. how much of the descriptor device time the kp transfer
hides.

Usage: python -u tools/e2e_split.py [size] [--fused]
  --fused: measure the round-3 single fused program instead (A/B).
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
    fused = "--fused" in sys.argv
    from bench import make_bench_volume
    import sift3d_tpu as s3d
    from sift3d_tpu.volume import Volume
    from sift3d_tpu.pipeline import (_detect_full_packed_fn,
                                     _detect_split_packed_fn,
                                     _fill_desc, _fill_desc_chunks,
                                     _hint_cfg, _unpack_kp_payload,
                                     _unpack_payload)
    from sift3d_tpu.pyramid import make_plan

    vol = Volume.from_array(make_bench_volume(n))
    jax.device_get(jnp.sum(vol.data))

    # RTT floor: dependent scalar of a cached trivial program.
    tiny = jax.jit(lambda x: jnp.sum(x[:2, :2, :2]) * 1.0000001)
    jax.device_get(tiny(vol.data))
    rtts = []
    for _ in range(7):
        t0 = time.perf_counter()
        jax.device_get(tiny(vol.data))
        rtts.append((time.perf_counter() - t0) * 1e3)
    print(f"RTT floor (scalar get): min {min(rtts):.2f} "
          f"median {sorted(rtts)[3]:.2f} ms", flush=True)

    det = s3d.SIFT3D()
    kp = det.detect_keypoints(vol)       # learn hint
    det.extract_descriptors(kp)
    for _ in range(3):                   # reach the tight-slot program
        kp = det.detect_keypoints(vol)
        det.extract_descriptors(kp)

    plan = make_plan(vol.shape, vol.units, det.params)
    cfg = _hint_cfg(plan, det._hint, det.params,
                    tight=det._hint_streak >= 2)
    print(f"tight={det._hint_streak >= 2}  cfg (cap, ori, desc) per "
          f"octave: {list(cfg)}", flush=True)

    if fused:
        run, meta = _detect_full_packed_fn(plan, cfg)
        for _ in range(5):
            t0 = time.perf_counter()
            gpyr, cands, counts_dev, kp_buf, desc_buf = run(vol.data)
            t1 = time.perf_counter()
            counts_dev.copy_to_host_async()
            kp_buf.copy_to_host_async()
            desc_buf.copy_to_host_async()
            counts, kb = jax.device_get((counts_dev, kp_buf))
            t2 = time.perf_counter()
            octs_host = _unpack_payload(kb, meta)
            t3 = time.perf_counter()
            db = np.asarray(desc_buf)
            t4 = time.perf_counter()
            _fill_desc(octs_host, db, meta)
            t5 = time.perf_counter()
            print(f"dispatch {1e3 * (t1 - t0):6.2f} ms   "
                  f"kp get {1e3 * (t2 - t1):6.2f} ms   "
                  f"unpack {1e3 * (t3 - t2):6.2f} ms   "
                  f"desc get {1e3 * (t4 - t3):6.2f} ms   "
                  f"fill {1e3 * (t5 - t4):6.2f} ms", flush=True)
        print(f"payload: kp {kb.nbytes / 1e3:.0f} kB + desc "
              f"{db.nbytes / 1e3:.0f} kB", flush=True)
    else:
        run_a, chunk_fns, meta, jobs, chunks = \
            _detect_split_packed_fn(plan, cfg)
        print(f"desc chunks: {chunks}", flush=True)
        for _ in range(5):
            t0 = time.perf_counter()
            gpyr, cands, counts_dev, kp_buf, dargs = run_a(vol.data)
            desc_bufs = [fn(gpyr, dargs) for fn in chunk_fns]
            t1 = time.perf_counter()
            counts_dev.copy_to_host_async()
            kp_buf.copy_to_host_async()
            for db in desc_bufs:
                db.copy_to_host_async()
            counts, kb = jax.device_get((counts_dev, kp_buf))
            t2 = time.perf_counter()
            octs_host = _unpack_kp_payload(kb, meta)
            t3 = time.perf_counter()
            bufs, tc = [], []
            for db in desc_bufs:
                bufs.append(np.asarray(db))
                tc.append(time.perf_counter())
            _fill_desc_chunks(octs_host, bufs, jobs, chunks)
            t5 = time.perf_counter()
            arr = "  ".join(f"+{1e3 * (t - t2):5.2f}" for t in tc)
            print(f"dispatch {1e3 * (t1 - t0):6.2f} ms   "
                  f"kp get {1e3 * (t2 - t1):6.2f} ms   "
                  f"unpack {1e3 * (t3 - t2):6.2f} ms   "
                  f"chunk arrivals after kp [{arr}] ms   "
                  f"fill {1e3 * (t5 - tc[-1]):6.2f} ms", flush=True)
        print(f"payload: kp {kb.nbytes / 1e3:.0f} kB + desc "
              f"{sum(b.nbytes for b in bufs) / 1e3:.0f} kB in "
              f"{len(bufs)} chunks", flush=True)

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
