"""Headline benchmark: 256^3 keypoints + descriptors latency on one chip.

Prints one JSON line:
  {"metric": ..., "value": <ms>, "unit": "ms", "vs_baseline": <speedup>}

vs_baseline is the speedup over the C reference (OpenMP, this host's CPU)
running the identical workload via the parity oracle; if the oracle cannot be
built, it falls back to the driver's 50 ms north-star target as denominator.

Usage: python bench.py [--size 256] [--repeats 3] [--json-only]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent


def make_bench_volume(n: int) -> np.ndarray:
    """MRI-like phantom with enough anatomy-scale structure to yield a
    realistic keypoint population (~85 keypoints at 256^3), so the
    descriptor stage is exercised meaningfully.

    Each blob is an axis-aligned Gaussian, so it factorizes into an outer
    product of three 1-D exponentials (the naive per-voxel formulation cost
    ~20 host-minutes at 256^3 and dominated the bench wall time). The RNG
    draw order matches the original formulation, so the phantom is
    unchanged up to f64 rounding. Volumes are cached under .bench_cache/.
    """
    return _make_phantom(n, 42)


def _make_phantom(n: int, seed: int) -> np.ndarray:
    cache = REPO / ".bench_cache" / (
        f"phantom_{n}.npy" if seed == 42 else f"phantom_{n}_s{seed}.npy")
    if cache.exists():
        return np.load(cache)
    rng = np.random.default_rng(seed)
    ax = np.arange(n, dtype=np.float64)
    vol = np.zeros((n, n, n), dtype=np.float32)
    for _ in range(150):
        c = rng.uniform(0.08 * n, 0.92 * n, 3)
        s = rng.uniform(0.01 * n, 0.06 * n, 3)
        amp = rng.uniform(0.2, 1.0) * rng.choice([-1, 1])
        ex = np.exp(-(((ax - c[0]) / s[0]) ** 2))
        eyz = np.multiply.outer(np.exp(-(((ax - c[1]) / s[1]) ** 2)),
                                np.exp(-(((ax - c[2]) / s[2]) ** 2)))
        vol += (amp * np.multiply.outer(ex, eyz)).astype(np.float32)
    try:
        cache.parent.mkdir(exist_ok=True)
        np.save(cache, vol)
    except OSError:
        pass
    return vol


def make_dense_volume(n: int) -> np.ndarray:
    """High-detail phantom yielding a dense keypoint population (~1000
    keypoints at 256^3) — exercises the descriptor stage at realistic MRI
    density (--dense)."""
    cache = REPO / ".bench_cache" / f"dense_{n}.npy"
    if cache.exists():
        return np.load(cache)
    rng = np.random.default_rng(7)
    ax = np.arange(n, dtype=np.float64)
    vol = np.zeros((n, n, n), dtype=np.float32)
    for _ in range(2500):
        c = rng.uniform(0.04 * n, 0.96 * n, 3)
        s = rng.uniform(0.006 * n, 0.02 * n, 3)
        amp = rng.uniform(0.2, 1.0) * rng.choice([-1, 1])
        ex = np.exp(-(((ax - c[0]) / s[0]) ** 2))
        eyz = np.multiply.outer(np.exp(-(((ax - c[1]) / s[1]) ** 2)),
                                np.exp(-(((ax - c[2]) / s[2]) ** 2)))
        vol += (amp * np.multiply.outer(ex, eyz)).astype(np.float32)
    try:
        cache.parent.mkdir(exist_ok=True)
        np.save(cache, vol)
    except OSError:
        pass
    return vol


def bench_tpu(vol: np.ndarray, repeats: int, overrides=None):
    import jax
    import sift3d_tpu as s3d
    from sift3d_tpu.params import DetectorParams
    from sift3d_tpu.volume import Volume

    det = s3d.SIFT3D(DetectorParams(**(overrides or {})))
    vol_dev = Volume.from_array(vol)  # resident on device
    jax.block_until_ready(vol_dev.data)

    def run(v):
        kp = det.detect_keypoints(v)
        desc = det.extract_descriptors(kp)
        return kp, desc

    # Warmup (compiles): the first detection learns the hint capacities;
    # the second compiles the fused hinted program those capacities shape.
    # Both must happen before timing starts.
    run(vol_dev)
    kp, desc = run(vol_dev)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        kp, desc = run(vol_dev)
        times.append((time.perf_counter() - t0) * 1e3)

    # End-to-end including the host->device input transfer (through this
    # harness's network tunnel the upload dominates; on a real v5e host the
    # PCIe transfer of a 256^3 f32 volume is <1 ms).
    t0 = time.perf_counter()
    run(vol)
    e2e_ms = (time.perf_counter() - t0) * 1e3
    print(f"# e2e including host->device upload: {e2e_ms:.2f} ms",
          file=sys.stderr)
    return min(times), len(kp), len(desc)


def bench_varied(n: int, repeats: int, overrides=None, nvols: int = 4):
    """Steady-state latency for a stream of DIFFERENT same-shape volumes
    (the production workload the same-volume headline cannot show): one
    detector cycles nvols distinct phantoms; the hint envelope
    (params.hint_history) sizes one compiled configuration to the
    stream's recent peak. Returns (mean_ms, min_ms, misses, detections,
    per-volume keypoint counts) over the timed cycles."""
    import jax
    import sift3d_tpu as s3d
    from sift3d_tpu.params import DetectorParams
    from sift3d_tpu.volume import Volume

    det = s3d.SIFT3D(DetectorParams(**(overrides or {})))
    vols = [Volume.from_array(_make_phantom(n, 42 + i))
            for i in range(nvols)]
    for v in vols:
        jax.block_until_ready(v.data)

    def run(v):
        kp = det.detect_keypoints(v)
        return kp, det.extract_descriptors(kp)

    kps = []
    for _ in range(3):       # learn the envelope; compile hinted + tight
        kps = [len(run(v)[0]) for v in vols]
    m0 = det._hint_misses
    times = []
    for _ in range(repeats):
        for v in vols:
            t0 = time.perf_counter()
            run(v)
            times.append((time.perf_counter() - t0) * 1e3)
    return (float(np.mean(times)), float(np.min(times)),
            det._hint_misses - m0, len(times), kps)


def bench_oracle(vol: np.ndarray, tag: str = ""):
    """Wall time of the C reference on the same workload (detect + extract
    on all keypoints), or None if unavailable. The measurement is cached on
    disk (keyed by workload tag + volume shape): the C run costs minutes at
    256^3 and its wall time is stable across runs on this host, so repeat
    bench invocations should not re-pay it."""
    cache = REPO / ".bench_cache" / f"oracle_ms_{tag}{vol.shape[0]}.json"
    if cache.exists():
        try:
            return json.loads(cache.read_text())["ms"]
        except (OSError, ValueError, KeyError):
            pass
    sys.path.insert(0, str(REPO / "tests"))
    try:
        from oracle import build_oracle, run_oracle
    except ImportError:
        return None
    if build_oracle() is None:
        return None
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        t0 = time.perf_counter()
        run_oracle(vol, Path(td) / "bench")
        ms = (time.perf_counter() - t0) * 1e3
    try:
        cache.parent.mkdir(exist_ok=True)
        cache.write_text(json.dumps({"ms": ms}))
    except OSError:
        pass
    return ms


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    # The tunneled device's RTT varies +-50% between runs; the metric is a
    # latency floor, so take min over enough repeats to see through the
    # network noise (each repeat costs ~0.1 s).
    ap.add_argument("--repeats", type=int, default=15)
    ap.add_argument("--dense", action="store_true",
                    help="dense phantom (~1000 keypoints at 256^3)")
    ap.add_argument("--skip-oracle", action="store_true")
    ap.add_argument("--registration", action="store_true",
                    help="additionally emit registration benchmark JSON "
                         "lines (BASELINE configs 4-5)")
    ap.add_argument("--varied", action="store_true",
                    help="additionally emit the varied-volume steady-state "
                         "JSON line (4 distinct phantoms, one detector)")
    ap.add_argument("--param", action="append", default=[],
                    metavar="K=V", help="DetectorParams override (A/B "
                    "experiments), e.g. --param conv_precision=highest")
    args = ap.parse_args(argv)
    overrides = {}
    for kv in args.param:
        k, v = kv.split("=", 1)
        overrides[k] = int(v) if v.lstrip("-").isdigit() else v

    # Compiles through the tunneled backend are expensive; the persistent
    # cache makes warm runs (and driver re-runs in this checkout) instant.
    import os
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          str(REPO / ".jax_cache"))

    vol = (make_dense_volume(args.size) if args.dense
           else make_bench_volume(args.size))

    ms, n_kp, n_desc = bench_tpu(vol, args.repeats, overrides)
    print(f"# tpu: {ms:.2f} ms  keypoints={n_kp} descriptors={n_desc}",
          file=sys.stderr)

    ref_ms = None
    if not args.skip_oracle:
        try:
            ref_ms = bench_oracle(vol, tag="dense_" if args.dense else "")
        except Exception as e:  # oracle failures must not sink the bench
            print(f"# oracle bench failed: {e}", file=sys.stderr)
    if ref_ms is not None:
        print(f"# C reference: {ref_ms:.2f} ms", file=sys.stderr)
        vs = ref_ms / ms
    else:
        vs = 50.0 / ms  # north-star target as denominator

    dense_tag = " (dense)" if args.dense else ""
    print(json.dumps({
        "metric": f"{args.size}^3 keypoints+descriptors latency{dense_tag}",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(vs, 3),
    }))

    if args.varied:
        mean_ms, min_ms, misses, dets, kps = bench_varied(
            args.size, max(args.repeats // 3, 3), overrides)
        print(f"# varied stream: mean {mean_ms:.2f} ms  min {min_ms:.2f} "
              f"ms  hint misses {misses}/{dets}  keypoints={kps}",
              file=sys.stderr)
        print(json.dumps({
            "metric": f"{args.size}^3 varied-stream latency (4 volumes)",
            "value": round(mean_ms, 3),
            "unit": "ms",
            "vs_baseline": round((ref_ms or 50.0) / mean_ms, 3),
        }))

    if args.registration:
        # BASELINE configs 4-5 (extra JSON lines, opt-in so the default
        # driver contract of exactly one line holds).
        sys.path.insert(0, str(REPO / "tools"))
        import bench_registration
        bench_registration.main(["--size", "192", "--batch-size", "256"])
    return 0


def _oracle_budget_s(argv) -> int:
    """Extra watchdog seconds for a COLD C-oracle run at the requested
    size (0 when the oracle timing is already cached or skipped). The C
    reference scales ~n^3: measured 1.3 s at 64^3, ~100-130 s at 256^3,
    ~216 s dense 256^3, ~801 s at 512^3 on this host."""
    args = list(argv)
    if "--skip-oracle" in args:
        return 0
    size, dense = 256, False
    for i, a in enumerate(args):
        if a == "--size" and i + 1 < len(args):
            size = int(args[i + 1])
        elif a.startswith("--size="):
            size = int(a.split("=", 1)[1])
        elif a == "--dense":
            dense = True
    tag = "dense_" if dense else ""
    if (REPO / ".bench_cache" / f"oracle_ms_{tag}{size}.json").exists():
        return 0
    # ~3x the measured wall at each size, floored for tiny volumes.
    return max(120, int(2400 * (size / 512.0) ** 3) * (2 if dense else 1))


def _watchdog(argv) -> int:
    """Re-exec the bench in a child process with a hard timeout and retry.

    The tunneled TPU backend intermittently hangs mid-transfer (observed:
    a device_get that never returns); a hung bench run records nothing for
    the round. A fresh process re-establishes the tunnel, so the recovery
    is kill + retry. The attempt timeout leaves room for cold compiles
    plus (when uncached) the C oracle run, which scales with --size.
    Disable with S3D_BENCH_NO_WATCHDOG=1.
    """
    import os
    import signal
    import subprocess

    env = dict(os.environ)
    env["_S3D_BENCH_CHILD"] = "1"
    cmd = [sys.executable, os.path.abspath(__file__)] + list(argv)
    rc = 1
    attempts = 2
    for attempt in range(attempts):
        # Re-check the oracle cache each attempt: a first attempt killed
        # AFTER run_oracle cached its timing leaves the retry cheap.
        tmo = 900 + _oracle_budget_s(argv)
        if "--varied" in argv:
            # 4 phantom builds + uploads + 3 learning cycles + timed
            # cycles (measured: 900 s is not enough on a slow window)
            tmo += 900
        last = attempt + 1 == attempts
        verdict = "giving up" if last else "retrying in a fresh process"
        # New session so a timeout can kill the whole process group —
        # a killed child's helpers would otherwise hold the stderr pipe
        # open and block a plain communicate() forever.
        proc = subprocess.Popen(cmd, env=env, text=True,
                                stdout=subprocess.PIPE,
                                stderr=subprocess.PIPE,
                                start_new_session=True)
        try:
            out, err = proc.communicate(timeout=tmo)
        except subprocess.TimeoutExpired:
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except (ProcessLookupError, PermissionError):
                proc.kill()
            try:
                out, err = proc.communicate(timeout=30)
            except subprocess.TimeoutExpired:
                out, err = "", ""
            print(f"# bench attempt {attempt + 1} timed out after {tmo}s "
                  f"(tunnel hang?); {verdict}", file=sys.stderr)
            # Forward the partial streams: the '# tpu:'/'# C reference:'
            # progress lines say where the hang occurred.
            sys.stderr.write(err or "")
            sys.stderr.write(out or "")
            continue
        sys.stderr.write(err)
        rc = proc.returncode
        if rc == 0 and any(ln.startswith("{") for ln in out.splitlines()):
            # Forward stdout only for the accepted attempt, so the driver
            # contract (exactly one JSON line per metric) holds even if an
            # earlier attempt died after printing.
            sys.stdout.write(out)
            sys.stdout.flush()
            return 0
        sys.stderr.write(out)
        print(f"# bench attempt {attempt + 1} failed rc={rc}; {verdict}",
              file=sys.stderr)
    return rc or 1


if __name__ == "__main__":
    import os
    if (os.environ.get("_S3D_BENCH_CHILD") == "1"
            or os.environ.get("S3D_BENCH_NO_WATCHDOG") == "1"
            or {"-h", "--help"} & set(sys.argv[1:])):
        sys.exit(main())
    sys.exit(_watchdog(sys.argv[1:]))
