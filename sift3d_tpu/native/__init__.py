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
        if not _SO.exists():
            if not _SRC.exists() or not _build():
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
