"""Tracing / profiling utilities.

The reference has no instrumentation at all (its only observability is an
error-print macro, /root/reference/sift3d/immacros.h:26-32). This module
provides the TPU build's equivalents:

 - `stage(name)`: a context manager that both times the stage on the host
   (block_until_ready on exit) and emits a jax.profiler TraceAnnotation so
   the stage shows up in TPU profiler traces;
 - `StageTimes`: accumulated per-stage wall times;
 - `detect_stats`: per-stage funnel counters (candidates per level,
   rejection rates) — the numbers needed to debug parity.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax



class StageTimes:
    """Accumulates wall-clock time per named stage."""

    def __init__(self):
        self.times = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        """Time a stage; `sync` (optional pytree) is block_until_ready'd
        before the clock stops so device work is attributed correctly."""
        with jax.profiler.TraceAnnotation(name):
            t0 = time.perf_counter()
            try:
                yield
            finally:
                if sync is not None:
                    jax.block_until_ready(sync)
                self.times[name] += time.perf_counter() - t0
                self.counts[name] += 1

    def report(self) -> str:
        total = sum(self.times.values())
        lines = [f"{'stage':<28}{'ms':>10}{'calls':>8}{'%':>7}"]
        for name, t in sorted(self.times.items(), key=lambda kv: -kv[1]):
            pct = 100.0 * t / total if total else 0.0
            lines.append(
                f"{name:<28}{t * 1e3:>10.2f}{self.counts[name]:>8}"
                f"{pct:>6.1f}%")
        lines.append(f"{'total':<28}{total * 1e3:>10.2f}")
        return "\n".join(lines)


def detect_stats(detector, kp) -> dict:
    """Per-level detection funnel for a completed detect_keypoints call:
    candidates -> grad-reject -> ratio-reject -> corner-reject -> survivors
    per (octave, level), in the reference's short-circuit rejection order
    (assign_eig_ori, sift.c:996-1102). These are the numbers needed to
    localize a parity break to a specific filter stage."""
    out = {"num_keypoints": len(kp), "per_level": {}, "funnel": {}}
    oct_lvl = list(zip(kp.octave.tolist(), kp.level.tolist()))
    for o, s in sorted(set(oct_lvl)):
        out["per_level"][f"o{o}s{s}"] = oct_lvl.count((o, s))
    funnel = getattr(detector, "_funnel", None) or {}
    total = {"candidates": 0, "reject_grad": 0, "reject_ratio": 0,
             "reject_corner": 0, "survivors": 0}
    for (o, s), f in sorted(funnel.items()):
        out["funnel"][f"o{o}s{s}"] = dict(f)
        for k in total:
            total[k] += f[k]
    if funnel:
        out["funnel"]["total"] = total
    return out


def format_funnel(stats: dict) -> str:
    """Render detect_stats() as an aligned funnel table."""
    cols = ["candidates", "reject_grad", "reject_ratio", "reject_corner",
            "survivors"]
    lines = [f"{'level':<8}" + "".join(f"{c:>14}" for c in cols)]
    for name, f in stats.get("funnel", {}).items():
        lines.append(f"{name:<8}" + "".join(f"{f[c]:>14}" for c in cols))
    return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a TPU profiler trace of the enclosed block (view with
    tensorboard or xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
