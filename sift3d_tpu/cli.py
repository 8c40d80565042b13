"""Command-line tools.

``kpsift3d`` mirrors the reference CLI (/root/reference/cli/kpSift3D.c):
``--keys`` / ``--desc`` outputs (at least one required), one input image,
keypoints sorted by strength and truncated to the top 100 before saving
(kpSift3D.c:122).

``regsift3d`` exposes the registration pipeline (descriptor matching +
RANSAC affine), the capability the upstream SIFT3D paper defines.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def _force_platform(name: str | None) -> None:
    """Pin the JAX platform before first device use. An exported
    JAX_PLATFORMS env var overrides os.environ changes made at runtime,
    so --platform goes through jax.config (which wins)."""
    if name:
        import jax
        jax.config.update("jax_platforms", name)

_HELP = """Detect 3D SIFT keypoints and extract their descriptors.

Supported input formats: NIfTI-1 (.nii, .nii.gz)
Supported output formats: .csv, .csv.gz
"""


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="kpsift3d", description=_HELP)
    parser.add_argument("--keys", metavar="PATH",
                        help="keypoint output file (.csv/.csv.gz)")
    parser.add_argument("--desc", metavar="PATH",
                        help="descriptor output file (.csv/.csv.gz)")
    parser.add_argument("--limit", type=int, default=100,
                        help="keep the strongest N keypoints (0 = all; "
                             "default 100, as the reference CLI)")
    parser.add_argument("--peak-thresh", type=float, default=None)
    parser.add_argument("--corner-thresh", type=float, default=None)
    parser.add_argument("--num-kp-levels", type=int, default=None)
    parser.add_argument("--sigma-n", type=float, default=None)
    parser.add_argument("--sigma0", type=float, default=None)
    parser.add_argument("--platform", metavar="NAME",
                        help="JAX platform to run on (e.g. cpu, tpu); "
                             "default: the environment's backend")
    parser.add_argument("image", help="input volume (.nii/.nii.gz)")
    args = parser.parse_args(argv)

    if args.keys is None and args.desc is None:
        print("No outputs specified.", file=sys.stderr)
        return 1
    _force_platform(args.platform)

    from . import DetectorParams, SIFT3D
    from .io import read_volume

    overrides = {}
    for name, val in [("peak_thresh", args.peak_thresh),
                      ("corner_thresh", args.corner_thresh),
                      ("num_kp_levels", args.num_kp_levels),
                      ("sigma_n", args.sigma_n),
                      ("sigma0", args.sigma0)]:
        if val is not None:
            overrides[name] = val
    params = DetectorParams(**overrides)

    try:
        vol = read_volume(args.image)
    except (OSError, ValueError) as e:
        print(f"Could not read image: {e}", file=sys.stderr)
        return 1

    det = SIFT3D(params)
    kp = det.detect_keypoints(vol)
    kp = kp.sort_by_strength(args.limit)

    if args.keys:
        kp.save(args.keys)
    if args.desc:
        desc = det.extract_descriptors(kp)
        desc.save(args.desc)
    return 0


def register_main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="regsift3d",
        description="Register a moving volume to a fixed volume with SIFT3D "
                    "keypoint matching + RANSAC affine estimation.")
    parser.add_argument("fixed", help="fixed (reference) volume")
    parser.add_argument("moving", help="moving volume")
    parser.add_argument("--matrix", metavar="PATH",
                        help="output affine matrix (.csv)")
    parser.add_argument("--warped", metavar="PATH",
                        help="output resampled moving volume (.nii/.nii.gz)")
    parser.add_argument("--nn-thresh", type=float, default=0.8,
                        help="matching nearest-neighbor ratio threshold")
    parser.add_argument("--err-thresh", type=float, default=5.0,
                        help="RANSAC inlier error threshold (voxels)")
    parser.add_argument("--num-iter", type=int, default=500,
                        help="RANSAC iterations")
    parser.add_argument("--platform", metavar="NAME",
                        help="JAX platform to run on (e.g. cpu, tpu); "
                             "default: the environment's backend")
    args = parser.parse_args(argv)
    _force_platform(args.platform)

    from .io import read_volume, write_volume
    from .registration import register

    fixed = read_volume(args.fixed)
    moving = read_volume(args.moving)
    result = register(fixed, moving, nn_thresh=args.nn_thresh,
                      err_thresh=args.err_thresh, num_iter=args.num_iter)
    print(f"matches: {result.num_matches}  inliers: {result.num_inliers}")
    if result.affine is None:
        print(f"Registration failed: only {result.num_matches} "
              "descriptor matches (need at least 4 to fit an affine). "
              "Try raising --nn-thresh or using richer volumes.",
              file=sys.stderr)
        return 1
    np.set_printoptions(precision=6, suppress=True)
    print("affine (moving -> fixed):")
    print(result.affine)
    if args.matrix:
        from .keypoints import _write_csv
        _write_csv(args.matrix, result.affine)
    if args.warped:
        from .registration import warp_volume
        warped = warp_volume(moving, result.affine, fixed.shape)
        write_volume(args.warped, warped)
    return 0


if __name__ == "__main__":
    sys.exit(main())
