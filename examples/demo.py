"""End-to-end demo: synthesize a volume pair, detect + describe + register.

Run: python examples/demo.py
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import sift3d_tpu as s3d
from sift3d_tpu.io import read_volume, write_volume
from sift3d_tpu.registration import register, warp_volume
from sift3d_tpu.volume import Volume


def make_volume(n=64, nblobs=60, seed=11):
    rng = np.random.default_rng(seed)
    x, y, z = np.meshgrid(*([np.arange(n)] * 3), indexing="ij")
    vol = np.zeros((n, n, n), np.float32)
    for _ in range(nblobs):
        c = rng.uniform(0.1 * n, 0.9 * n, 3)
        s = rng.uniform(0.02 * n, 0.12 * n, 3)
        vol += (rng.uniform(0.3, 1.0) * rng.choice([-1, 1]) * np.exp(
            -(((x - c[0]) / s[0]) ** 2 + ((y - c[1]) / s[1]) ** 2
              + ((z - c[2]) / s[2]) ** 2))).astype(np.float32)
    return vol


def main():
    out = Path("/tmp/sift3d_demo")
    out.mkdir(exist_ok=True)

    # --- write + read NIfTI, like a real workflow -------------------------
    vol = make_volume()
    write_volume(out / "fixed.nii.gz", vol)
    fixed = read_volume(out / "fixed.nii.gz")

    # --- keypoints + descriptors ------------------------------------------
    det = s3d.SIFT3D()
    kp = det.detect_keypoints(fixed)
    print(f"detected {len(kp)} keypoints "
          f"(octaves {sorted(set(kp.octave.tolist()))})")
    top = kp.sort_by_strength(limit=100)
    desc = det.extract_descriptors(top)
    top.save(out / "keys.csv")
    desc.save(out / "desc.csv.gz")
    print(f"saved {len(desc)} descriptors -> {out}/desc.csv.gz")

    # --- registration: recover a known transform --------------------------
    th = np.deg2rad(7.0)
    Rz = np.array([[np.cos(th), -np.sin(th), 0],
                   [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    c = np.array([31.5] * 3)
    A_true = np.zeros((3, 4), np.float32)
    A_true[:, :3] = Rz
    A_true[:, 3] = c - Rz @ c + (2.0, -1.5, 1.0)
    moving = warp_volume(fixed, A_true, fixed.shape)

    res = register(fixed, moving)
    print(f"registration: {res.num_matches} matches, "
          f"{res.num_inliers} inliers")
    np.set_printoptions(precision=4, suppress=True)
    print("estimated affine (moving -> fixed):")
    print(res.affine)
    warped = warp_volume(moving, res.affine, fixed.shape)
    err = np.abs(np.asarray(warped.data) - np.asarray(fixed.data))
    print(f"warped-back max |err| in interior: "
          f"{err[8:-8, 8:-8, 8:-8].max():.4f}")
    write_volume(out / "registered.nii.gz", warped)


if __name__ == "__main__":
    main()
