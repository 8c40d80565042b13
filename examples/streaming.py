"""Streaming demo: detect keypoints over a directory of NIfTI volumes with
the prefetching batch loader (host IO overlaps device compute).

Run: python examples/streaming.py [directory-of-nii-files]
Without an argument it synthesizes a small dataset in a temp directory.
"""

import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import sift3d_tpu as s3d
from sift3d_tpu.io import BatchVolumeLoader, group_by_shape, write_volume


def synthesize(td: Path, n=48, count=6):
    rng = np.random.default_rng(5)
    ax = np.arange(n, dtype=np.float32)
    for i in range(count):
        vol = np.zeros((n, n, n), np.float32)
        for _ in range(10):
            c = rng.uniform(0.15 * n, 0.85 * n, 3)
            s = rng.uniform(0.03 * n, 0.08 * n)
            vol += np.float32(rng.uniform(0.3, 1.0)) * np.exp(
                -((ax[:, None, None] - c[0]) ** 2
                  + (ax[None, :, None] - c[1]) ** 2
                  + (ax[None, None, :] - c[2]) ** 2) / s ** 2)
        write_volume(td / f"scan_{i:03d}.nii.gz", vol)
    return sorted(td.glob("*.nii.gz"))


def main():
    if len(sys.argv) > 1:
        paths = sorted(
            p for p in Path(sys.argv[1]).iterdir()
            if p.name.endswith((".nii", ".nii.gz", ".hdr", ".img")))
    else:
        td = Path(tempfile.mkdtemp(prefix="s3d_stream_"))
        print(f"synthesizing demo dataset in {td}")
        paths = synthesize(td)

    det = s3d.SIFT3D()
    done = 0
    for (shape, nc), group in group_by_shape(paths).items():
        print(f"shape {shape}: {len(group)} volumes")
        for vols, units in BatchVolumeLoader(group, batch_size=4):
            kps = det.detect_keypoints_batch(vols, units)
            descs = det.extract_descriptors_batch(kps)
            for kp, ds in zip(kps, descs):
                print(f"  {paths[done].name}: {len(kp)} keypoints, "
                      f"{len(ds)} descriptors")
                done += 1


if __name__ == "__main__":
    main()
