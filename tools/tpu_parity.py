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

Usage: python -u tools/tpu_parity.py [size] [--dense]
"""

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def oracle_cached(vol: np.ndarray, tag: str):
    """Oracle keypoints/descriptors for vol, cached on disk."""
    cache = REPO / ".bench_cache" / f"oracle_out_{tag}{vol.shape[0]}.npz"
    if cache.exists():
        z = np.load(cache)
        return z["keys"], z["desc"]
    from oracle import run_oracle
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        res = run_oracle(vol, Path(td) / "par")
        keys, desc = res.keypoints, res.descriptors
    cache.parent.mkdir(exist_ok=True)
    np.savez_compressed(cache, keys=keys, desc=desc)
    return keys, desc


def compare(tag, kp, desc, okeys, odesc):
    ours = {(int(x), int(y), int(z), int(o), int(s))
            for (x, y, z), o, s in zip(kp.coords, kp.octave, kp.level)}
    # oracle: strength x y z o s sd R9; coords are base-octave scaled
    theirs = set()
    for row in okeys:
        o = int(row[4])
        theirs.add((int(row[1] / 2 ** o), int(row[2] / 2 ** o),
                    int(row[3] / 2 ** o), o, int(row[5])))
    both = ours & theirs
    print(f"[{tag}] keypoints: ours {len(ours)} oracle {len(theirs)} "
          f"common {len(both)}", flush=True)
    exact = len(both) == len(ours) == len(theirs)

    # R parity: align by coordinate key
    order = {(int(x), int(y), int(z), int(o), int(s)): i
             for i, ((x, y, z), o, s) in enumerate(
                 zip(kp.coords, kp.octave, kp.level))}
    rerr = 0.0
    for row in okeys:
        o = int(row[4])
        key = (int(row[1] / 2 ** o), int(row[2] / 2 ** o),
               int(row[3] / 2 ** o), o, int(row[5]))
        if key in order:
            rerr = max(rerr, float(np.abs(
                kp.R[order[key]] - row[7:16].reshape(3, 3)).max()))
    print(f"[{tag}] R max|err| = {rerr:.2e}", flush=True)

    # descriptors: oracle rows are [x y z sd el0..]; ours desc.data rows
    # follow kp order with xyz in desc.xyz
    dmap = {}
    for row in odesc:
        dmap[(round(float(row[0]), 3), round(float(row[1]), 3),
              round(float(row[2]), 3), round(float(row[3]), 3))] = row[4:]
    n_match = n_tot = 0
    worst = 0.0
    for i in range(len(desc)):
        key = (round(float(desc.xyz[i, 0]), 3),
               round(float(desc.xyz[i, 1]), 3),
               round(float(desc.xyz[i, 2]), 3),
               round(float(desc.sd[i]), 3))
        ref = dmap.get(key)
        if ref is None:
            continue
        n_tot += 1
        num = float(np.linalg.norm(desc.data[i] - ref))
        den = float(np.linalg.norm(ref)) or 1.0
        rel = num / den
        worst = max(worst, rel)
        if rel <= 0.01:
            n_match += 1
    frac = n_match / max(n_tot, 1)
    print(f"[{tag}] descriptors: {n_tot} aligned, {100 * frac:.2f}% "
          f"within 1% rel-L2 (worst {worst:.2e})", flush=True)
    return exact and frac >= 0.99


def main():
    size = 256
    dense = "--dense" in sys.argv
    for a in sys.argv[1:]:
        if a.isdigit():
            size = int(a)
    from bench import make_bench_volume, make_dense_volume
    import sift3d_tpu as s3d
    from sift3d_tpu.volume import Volume

    vol = make_dense_volume(size) if dense else make_bench_volume(size)
    tag = "dense_" if dense else ""
    okeys, odesc = oracle_cached(vol, tag)
    print(f"oracle: {len(okeys)} keypoints", flush=True)

    det = s3d.SIFT3D()
    v = Volume.from_array(vol)
    ok = True
    for pass_tag in ("exact path", "hinted fused path"):
        kp = det.detect_keypoints(v)
        desc = det.extract_descriptors(kp)
        ok &= compare(pass_tag, kp, desc, okeys, odesc)
    print("PARITY OK" if ok else "PARITY MISMATCH", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
