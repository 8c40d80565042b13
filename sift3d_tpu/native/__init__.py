"""On-demand build + ctypes bindings for the native IO runtime.

The shared library is compiled once per environment with g++ (-O3, linked
against zlib) into this package directory. Every entry point has a pure-
Python fallback, so the package works without a toolchain; `available()`
reports which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_DIR = Path(__file__).resolve().parent
_SO = _DIR / "_fastio.so"
_SRC = _DIR / "fastio.cc"

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", str(_SRC), "-o", str(_SO),
           "-lz"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        return False


def get_lib():
    """The loaded native library, or None when unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        stale = (_SO.exists() and _SRC.exists()
                 and _SRC.stat().st_mtime > _SO.stat().st_mtime)
        if not _SO.exists() or stale:
            if not _SRC.exists() or not _build():
                if not _SO.exists():
                    return None
        try:
            lib = ctypes.CDLL(str(_SO))
        except OSError:
            return None
        lib.s3d_read_all.restype = ctypes.c_longlong
        lib.s3d_read_all.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                     ctypes.c_longlong]
        lib.s3d_cast_to_f32.restype = ctypes.c_int
        lib.s3d_cast_to_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_longlong,
            ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_int]
        lib.s3d_csv_write.restype = ctypes.c_int
        lib.s3d_csv_write.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_longlong,
            ctypes.c_longlong, ctypes.c_int]
        if hasattr(lib, "s3d_nifti_read_f32"):
            lib.s3d_nifti_read_f32.restype = ctypes.c_int
            lib.s3d_nifti_read_f32.argtypes = [
                ctypes.c_char_p, ctypes.c_void_p, ctypes.c_longlong,
                ctypes.c_void_p, ctypes.c_void_p]
            lib.s3d_nifti_read_batch.restype = None
            lib.s3d_nifti_read_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.c_void_p, ctypes.c_longlong, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def read_file_bytes(path, expected_size: int | None = None) -> bytes | None:
    """Read a possibly-gzipped file fully via the native path; None if the
    native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    cap = expected_size if expected_size else (
        os.path.getsize(path) * 8 + (1 << 20))
    buf = (ctypes.c_char * cap)()
    n = lib.s3d_read_all(str(path).encode(), buf, cap)
    if n < 0:
        return None
    if expected_size is None and n == cap:
        # buffer may have been too small; retry larger
        return read_file_bytes(path, cap * 4)
    return bytes(buf[:n])


def cast_to_f32(raw: bytes, dtype_code: int, count: int, slope: float,
                inter: float, apply_scaling: bool) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty(count, np.float32)
    rc = lib.s3d_cast_to_f32(
        raw, out.ctypes.data_as(ctypes.c_void_p), count, dtype_code,
        slope, inter, 1 if apply_scaling else 0)
    return out if rc == 0 else None


def csv_write(path, mat: np.ndarray) -> bool:
    """Native CSV write in the reference's exact format; False on
    fallback-needed."""
    lib = get_lib()
    if lib is None:
        return False
    mat = np.ascontiguousarray(mat, np.float64)
    rows, cols = mat.shape
    rc = lib.s3d_csv_write(
        str(path).encode(), mat.ctypes.data_as(ctypes.c_void_p), rows, cols,
        1 if str(path).endswith(".gz") else 0)
    return rc == 0


def nifti_read_batch(paths, count_per_vol: int, nthreads: int = 0):
    """Read a batch of single-file NIfTI-1 volumes (.nii/.nii.gz) into one
    [B, count_per_vol] float32 buffer with the native threaded reader —
    one GIL-free ctypes call for the whole batch.

    Returns (flat f32[B, count], dims i64[B, 4], units f32[B, 3],
    rc i32[B]) or None when the native library is unavailable. rc[i] != 0
    marks volumes the native path does not handle (.hdr/.img pairs,
    big-endian files, read errors); callers fall back to the Python
    reader for those.
    """
    lib = get_lib()
    if lib is None or not hasattr(lib, "s3d_nifti_read_batch"):
        return None
    n = len(paths)
    out = np.empty((n, count_per_vol), np.float32)
    dims = np.zeros((n, 4), np.int64)
    units = np.zeros((n, 3), np.float32)
    rc = np.zeros(n, np.int32)
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    if nthreads <= 0:
        nthreads = min(n, os.cpu_count() or 1)
    lib.s3d_nifti_read_batch(
        arr, n, out.ctypes.data_as(ctypes.c_void_p), count_per_vol,
        dims.ctypes.data_as(ctypes.c_void_p),
        units.ctypes.data_as(ctypes.c_void_p),
        rc.ctypes.data_as(ctypes.c_void_p), nthreads)
    return out, dims, units, rc
