"""Batch-loader throughput: native threaded reads vs Python reader, and
the overlapped loader -> batched-detection pipeline.

Writes a temporary dataset of gzipped NIfTI volumes, then measures
 (a) loader-only volumes/s (native batch reader vs pure-Python fallback);
 (b) end-to-end volumes/s through SIFT3D.detect_keypoints_batch with the
     loader prefetching in the background (the production streaming path).

Usage: python -u tools/bench_loader.py [n_side] [n_volumes] [batch]
"""

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    nvol = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from sift3d_tpu.io import write_nifti, iter_volume_batches
    from sift3d_tpu.io import loader as loader_mod
    from sift3d_tpu import native
    import sift3d_tpu as s3d

    rng = np.random.default_rng(0)
    ax = np.arange(n, dtype=np.float32)
    td = tempfile.mkdtemp(prefix="s3d_loader_")
    paths = []
    for i in range(nvol):
        vol = np.zeros((n, n, n), np.float32)
        for _ in range(20):
            c = rng.uniform(0.1 * n, 0.9 * n, 3)
            s = rng.uniform(0.02 * n, 0.05 * n)
            vol += np.float32(rng.uniform(0.3, 1.0)) * (
                np.exp(-((ax[:, None, None] - c[0]) ** 2
                         + (ax[None, :, None] - c[1]) ** 2
                         + (ax[None, None, :] - c[2]) ** 2) / s ** 2))
        p = Path(td) / f"v{i}.nii.gz"
        write_nifti(p, vol)
        paths.append(p)
    sz = sum(p.stat().st_size for p in paths) / 1e6
    print(f"dataset: {nvol} x {n}^3 .nii.gz ({sz:.0f} MB)", flush=True)

    def timed_loader(label, use_native):
        saved = native.nifti_read_batch
        if not use_native:
            loader_mod.native.nifti_read_batch = lambda *a, **k: None
        try:
            t0 = time.perf_counter()
            total = 0
            for vols, units in iter_volume_batches(paths, batch):
                total += vols.shape[0]
            dt = time.perf_counter() - t0
        finally:
            loader_mod.native.nifti_read_batch = saved
        print(f"{label:<40}{total / dt:8.1f} vol/s "
              f"({dt / total * 1e3:.1f} ms/vol)", flush=True)
        return dt

    timed_loader("loader, python fallback reader:", False)
    timed_loader("loader, native threaded reader:", True)
    timed_loader("loader, native threaded reader (warm):", True)

    # end-to-end streaming detection; device_put=True moves the
    # host->device upload into the producer thread so batch i+1's
    # transfer overlaps batch i's detection
    det = s3d.SIFT3D()
    for vols, units in iter_volume_batches(paths, batch):
        det.detect_keypoints_batch(vols, units)   # warm the program
    for dp in (False, True):
        t0 = time.perf_counter()
        total = 0
        nkp = 0
        for vols, units in iter_volume_batches(paths, batch,
                                               device_put=dp):
            kps = det.detect_keypoints_batch(vols, units)
            total += vols.shape[0]
            nkp += sum(len(k) for k in kps)
        dt = time.perf_counter() - t0
        tag = "device_put overlap" if dp else "host arrays"
        print(f"{'loader -> detect batch (' + tag + '):':<46}"
              f"{total / dt:6.1f} vol/s ({dt / total * 1e3:.1f} ms/vol, "
              f"{nkp} keypoints)", flush=True)


if __name__ == "__main__":
    main()
