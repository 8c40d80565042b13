"""TPU-hardware parity vs the C oracle at bench scale, with the CURRENT
defaults (Pallas extrema stencil, split-precision gpyr, Pallas orientation
+ descriptor kernels, hinted fused program).

Runs the C reference once on the bench phantom (outputs cached under
.bench_cache/ — the CPU run costs minutes), runs detection + descriptors
twice on the device (second pass = the fused hinted program, the one the
bench times), and reports:
  - keypoint coordinate/octave/level set parity (exact match expected)
  - R matrix max error
  - descriptor agreement (fraction within 1% relative L2)
for BOTH passes, so the speculative path is held to the same bar as the
exact path.

Usage: python -u tools/tpu_parity.py [size] [--dense] [--platform=cpu]
                                     [--<param>=<value> ...]

Any --key=value whose key names a DetectorParams field becomes a param
override (e.g. --gpyr_impl=composed --conv_precision=highest), which makes
this the bisection tool for hardware-precision parity gaps. --platform
pins the JAX backend (cpu = pure-f32 logic check of the same workload).
"""

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def oracle_cached(vol: np.ndarray, tag: str, units=(1.0, 1.0, 1.0)):
    """Oracle keypoints/descriptors for vol, cached on disk."""
    cache = REPO / ".bench_cache" / f"oracle_out_{tag}{vol.shape[0]}.npz"
    if cache.exists():
        z = np.load(cache)
        return z["keys"], z["desc"]
    from oracle import run_oracle
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        res = run_oracle(vol, Path(td) / "par", units=units)
        keys, desc = res.keypoints, res.descriptors
    cache.parent.mkdir(exist_ok=True)
    np.savez_compressed(cache, keys=keys, desc=desc)
    return keys, desc


def compare(tag, kp, desc, okeys, odesc, verbose_rows: int = 10):
    """Row-wise comparison in reference order — the same convention as
    tests/test_parity.py::test_keypoint_parity (oracle rows are
    [strength x y z o s sd R9] with octave-local integer coords)."""
    exact = (len(kp) == len(okeys)
             and np.array_equal(kp.coords, okeys[:, 1:4])
             and np.array_equal(kp.octave, okeys[:, 4].astype(np.int32)))
    print(f"[{tag}] keypoints: ours {len(kp)} oracle {len(okeys)} "
          f"rows {'EXACT' if exact else 'MISMATCH'}", flush=True)
    if not exact:
        # Diagnose by (x, y, z, octave, level) key sets.
        ours = {(int(x), int(y), int(z), int(o), int(s)): i
                for i, ((x, y, z), o, s) in enumerate(
                    zip(kp.coords, kp.octave, kp.level))}
        theirs = {(int(r[1]), int(r[2]), int(r[3]), int(r[4]), int(r[5])): i
                  for i, r in enumerate(okeys)}
        for k in sorted(set(theirs) - set(ours)):
            print(f"[{tag}]   MISSING (oracle only) {k} "
                  f"strength={okeys[theirs[k], 0]:.6g}", flush=True)
        for k in sorted(set(ours) - set(theirs)):
            print(f"[{tag}]   EXTRA (ours only)     {k} "
                  f"strength={kp.strength[ours[k]]:.6g}", flush=True)
    if exact:
        rerr = float(np.max(np.abs(kp.R.reshape(-1, 9) - okeys[:, 7:16])))
        serr = float(np.max(np.abs(kp.strength - okeys[:, 0])))
        print(f"[{tag}] R max|err| = {rerr:.2e}, strength max|err| = "
              f"{serr:.2e}", flush=True)
        exact &= rerr < 1e-3

    # descriptors: oracle rows [x y z sd el0..767], ours in the same order
    # when exact; otherwise align by rounded (x, y, z, sd) so one dropped
    # keypoint doesn't shift every subsequent row.
    if exact:
        a, b = desc.data, odesc[:, 4:]
        idx = list(range(len(desc)))
    else:
        dmap = {tuple(np.round(r[:4], 3)): r[4:] for r in odesc}
        rows = [(i, desc.data[i], dmap[key]) for i in range(len(desc))
                if (key := tuple(np.round(
                    np.concatenate([desc.xyz[i], desc.sd[i:i + 1]]), 3)))
                in dmap]
        idx = [r[0] for r in rows]
        a = np.array([r[1] for r in rows])
        b = np.array([r[2] for r in rows])
    n = len(a)
    if n:
        rel = (np.linalg.norm(a - b, axis=1)
               / np.maximum(np.linalg.norm(b, axis=1), 1e-30))
        frac = float(np.mean(rel <= 0.01))
    else:
        rel, frac = np.zeros(1), 0.0
    print(f"[{tag}] descriptors: {n} aligned rows, {100 * frac:.2f}% "
          f"within 1% rel-L2 (worst {rel.max():.2e})", flush=True)
    bad = np.flatnonzero(rel > 0.01) if n else np.array([], int)
    if len(bad):
        # Which (octave, level) do the bad rows live in? (desc rows follow
        # kp order, so idx indexes kp directly.)
        from collections import Counter
        ol = Counter((int(kp.octave[idx[j]]), int(kp.level[idx[j]]))
                     for j in bad)
        print(f"[{tag}]   bad rows by (octave, level): {dict(ol)}",
              flush=True)
        for j in bad[np.argsort(-rel[bad])][:verbose_rows]:
            i = idx[j]
            print(f"[{tag}]   rel={rel[j]:.3e} kp#{i} "
                  f"xyz={np.asarray(desc.xyz[i]).round(2)} "
                  f"o={int(kp.octave[i])} l={int(kp.level[i])} "
                  f"|ours|={np.linalg.norm(a[j]):.4g} "
                  f"|ref|={np.linalg.norm(b[j]):.4g}", flush=True)
    return exact and frac >= 0.99 and len(desc) == len(odesc)


def main():
    size = 256
    dense = "--dense" in sys.argv
    kw = {}
    platform = None
    for a in sys.argv[1:]:
        if a.isdigit():
            size = int(a)
        elif a.startswith("--") and "=" in a:
            k, v = a[2:].split("=", 1)
            if k == "platform":
                platform = v
            elif k == "conv":  # legacy spellings
                kw["conv_precision"] = v
            elif k == "desc":
                kw["desc_precision"] = v
            else:
                kw[k] = int(v) if v.lstrip("-").isdigit() else v
    if platform:
        import jax
        jax.config.update("jax_platforms", platform)
    from bench import make_bench_volume, make_dense_volume
    import sift3d_tpu as s3d
    from sift3d_tpu.volume import Volume

    aniso = "--aniso" in sys.argv
    # 2.5 mm slices on 1 mm in-plane voxels: the common clinical MRI
    # anisotropy; exercises unit-resampled fractional taps + real-world
    # window radii at hardware precision (imutil.c:754-757).
    units = (1.0, 1.0, 2.5) if aniso else (1.0, 1.0, 1.0)
    vol = make_dense_volume(size) if dense else make_bench_volume(size)
    tag = ("dense_" if dense else "") + ("aniso_" if aniso else "")
    okeys, odesc = oracle_cached(vol, tag, units)
    print(f"oracle: {len(okeys)} keypoints (units {units})", flush=True)

    from sift3d_tpu.params import DetectorParams
    import jax
    print(f"params overrides: {kw}  backend: {jax.default_backend()}",
          flush=True)
    det = s3d.SIFT3D(DetectorParams(**kw))
    v = Volume.from_array(vol, units=units)
    ok = True
    for pass_tag in ("exact path", "hinted fused path"):
        kp = det.detect_keypoints(v)
        desc = det.extract_descriptors(kp)
        ok &= compare(pass_tag, kp, desc, okeys, odesc)
    print("PARITY OK" if ok else "PARITY MISMATCH", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
