"""BASELINE configs 4-5: pair registration latency and batched throughput.

Usage:
  python tools/bench_registration.py [--size 192] [--batch 4]
      [--batch-size 256] [--mesh]

Emits one JSON line per configuration:
  {"metric": "<size>^3 pair registration latency", "value": <ms>, ...}
  {"metric": "<bsize>^3 batched pair registration throughput",
   "value": <pairs/s>, ...}

Accuracy is reported as the mean voxel displacement error of the estimated
affine vs the ground-truth warp over the volume's corner points. The
reference fork removed matching/RANSAC because "its performance was really
bad" (/root/reference/CHANGES.md:101-103); these numbers document the
rebuilt TPU-native path.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_pair(n, rng):
    """A phantom and a rigidly rotated/translated copy, plus the true
    affine (moving -> fixed voxel coords)."""
    from bench import make_bench_volume
    from sift3d_tpu.registration import warp_volume
    from sift3d_tpu.volume import Volume

    base = make_bench_volume(n)
    th = np.deg2rad(rng.uniform(6, 10))
    Rz = np.array([[np.cos(th), -np.sin(th), 0],
                   [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    c = np.array([(n - 1) / 2.0] * 3)
    t = rng.uniform(-4, 4, 3)
    A = np.zeros((3, 4), np.float32)
    A[:, :3] = Rz
    A[:, 3] = c - Rz @ c + t
    fixed = Volume.from_array(base)
    # moving = fixed warped by A^-1 so that A maps moving -> fixed
    M = np.eye(4)
    M[:3] = A
    A_inv = np.linalg.inv(M)[:3].astype(np.float32)
    moving = warp_volume(fixed, A_inv, (n, n, n))
    return fixed, moving, A


def affine_corner_error(A_est, A_true, n):
    """Mean displacement (voxels) between the two affines over the volume
    corners."""
    if A_est is None:
        return float("inf")
    corners = np.array([[x, y, z, 1.0] for x in (0, n - 1)
                        for y in (0, n - 1) for z in (0, n - 1)])
    d = corners @ (np.asarray(A_est, np.float64)
                   - np.asarray(A_true, np.float64)).T
    return float(np.linalg.norm(d, axis=1).mean())


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=192)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--batch-size", type=int, default=256,
                    help="volume size for the batched-throughput config")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--mesh", action="store_true",
                    help="shard the batched config over all local devices")
    ap.add_argument("--skip-batch", action="store_true")
    ap.add_argument("--skip-single", action="store_true")
    args = ap.parse_args(argv)

    from sift3d_tpu.pipeline import SIFT3D
    from sift3d_tpu.registration import register, register_batch

    n = args.size
    rng = np.random.default_rng(3)
    fixed, moving, A_true = make_pair(n, rng)

    # --- config 4: single-pair latency ---------------------------------
    # Steady-state model: a long-lived service keeps its detectors, so
    # repeat calls run the fused hinted detection program.
    if not args.skip_single:
        # one shared detector: register() then runs the pair as a B=1
        # batch — both detections in one unrolled dispatch, match+RANSAC
        # in one more
        dets = SIFT3D()
        t0 = time.perf_counter()
        res = register(fixed, moving, detectors=dets)
        cold_s = time.perf_counter() - t0
        print(f"# pair registration (cold, incl. compile): {cold_s:.2f} s",
              file=sys.stderr)
        times = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            res = register(fixed, moving, detectors=dets)
            times.append(time.perf_counter() - t0)
        ms = min(times) * 1e3
        err = affine_corner_error(res.affine, A_true, n)
        # BASELINE config 4's bar: sub-voxel affine recovery. The CPU CI
        # path asserts the same bound (test_registration.py::
        # test_register_recovery_subvoxel); here it is recorded, not
        # raised, so a noisy run cannot sink the whole bench record.
        if not err < 1.0:
            print(f"# WARNING: affine recovery error {err:.3f} vox >= 1.0",
                  file=sys.stderr)
        print(json.dumps({
            "metric": f"{n}^3 pair registration latency",
            "value": round(ms, 2), "unit": "ms",
            "affine_err_vox": round(err, 3),
            "accuracy_ok": bool(err < 1.0),
            "matches": res.num_matches, "inliers": res.num_inliers,
        }))

        # Accuracy configuration: subvoxel-refined keypoints (the
        # standard SIFT accuracy setup; the TIP-2017 reference paper's
        # registration evaluation). Integer-coordinate keypoints bound
        # the default config's affine at ~1.7 voxels even with
        # octave-precision-weighted refits; fractional coordinates
        # recover sub-voxel affines. Reported separately because the
        # refined path runs the per-stage (non-speculative) pipeline.
        from sift3d_tpu.params import DetectorParams
        pr = DetectorParams(refine_subvoxel=True)
        dets_r = (SIFT3D(pr), SIFT3D(pr))
        t0 = time.perf_counter()
        res_r = register(fixed, moving, num_iter=500, detectors=dets_r)
        cold_r = time.perf_counter() - t0
        t0 = time.perf_counter()
        res_r = register(fixed, moving, num_iter=500, detectors=dets_r)
        ms_r = (time.perf_counter() - t0) * 1e3
        print(f"# subvoxel config cold {cold_r:.1f} s", file=sys.stderr)
        err_r = affine_corner_error(res_r.affine, A_true, n)
        if not err_r < 1.0:
            print(f"# WARNING: subvoxel affine recovery error "
                  f"{err_r:.3f} vox >= 1.0", file=sys.stderr)
        print(json.dumps({
            "metric": f"{n}^3 pair registration accuracy "
                      f"(subvoxel refine)",
            "value": round(err_r, 3), "unit": "vox",
            "accuracy_ok": bool(err_r < 1.0),
            "latency_ms": round(ms_r, 2),
            "matches": res_r.num_matches,
            "inliers": res_r.num_inliers,
        }))

    if args.skip_batch:
        return

    # --- config 5: batched pair throughput -----------------------------
    B = args.batch
    bn = args.batch_size
    pairs = [make_pair(bn, rng) for _ in range(B)]
    fixed_b = np.stack([np.asarray(p[0].data) for p in pairs])
    moving_b = np.stack([np.asarray(p[1].data) for p in pairs])
    if not args.mesh:
        # Device-resident inputs: the throughput config measures compute,
        # not this harness's tunnel upload (bench.py reports the upload
        # separately; on real hardware PCIe moves a volume in <1 ms).
        import jax
        fixed_b = jax.device_put(fixed_b)
        moving_b = jax.device_put(moving_b)
    if args.mesh:
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P
        from sift3d_tpu.parallel import make_mesh
        ndev = len(jax.devices())
        nb = ndev
        while B % nb:
            nb -= 1
        mesh = make_mesh({"b": nb}, jax.devices()[:nb])
        sh = NamedSharding(mesh, P("b"))
        # both halves of the concatenated [2B] batch shard evenly
        fixed_b = jax.device_put(jnp.asarray(fixed_b), sh)
        moving_b = jax.device_put(jnp.asarray(moving_b), sh)

    det = SIFT3D()
    results = register_batch(fixed_b, moving_b, det=det)  # warm/compile
    times = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        results = register_batch(fixed_b, moving_b, det=det)
        times.append(time.perf_counter() - t0)
    s = min(times)
    errs = [affine_corner_error(r.affine, p[2], bn)
            for r, p in zip(results, pairs) if r.affine is not None]
    print(json.dumps({
        "metric": f"{bn}^3 batched pair registration throughput",
        "value": round(B / s, 3), "unit": "pairs/s",
        "batch": B, "mesh": bool(args.mesh),
        "registered": len(errs),
        "affine_err_vox_mean": (round(float(np.mean(errs)), 3)
                                if errs else None),
        "inliers": [r.num_inliers for r in results],
    }))


if __name__ == "__main__":
    main()
