"""Build and run the C reference as a parity oracle.

The reference sources stay in /root/reference (read-only); we compile them
out-of-tree into .oracle/ (gitignored) and drive them with our own harness
(tests/oracle/oracle_main.c). Tests that need the oracle call
``oracle_available()`` and skip if the toolchain is missing.
"""

from __future__ import annotations

import os
import subprocess
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference")
ORACLE_DIR = REPO / ".oracle"
ORACLE_BIN = ORACLE_DIR / "oracle"
_LAPACK = "/lib/x86_64-linux-gnu/liblapack.so.3"


def build_oracle() -> Path | None:
    """Compile the reference library + driver. Returns the binary path or
    None if the toolchain/deps are unavailable."""
    if ORACLE_BIN.exists():
        return ORACLE_BIN
    if not (REF / "sift3d" / "sift.c").exists() or not os.path.exists(_LAPACK):
        return None
    ORACLE_DIR.mkdir(exist_ok=True)
    src = [str(REF / "sift3d" / f) for f in ("sift.c", "imutil.c", "nifti.c")]
    cmd = [
        "gcc", "-O2", "-fopenmp", "-I", str(REF / "sift3d"),
        str(REPO / "tests" / "oracle" / "oracle_main.c"), *src,
        "-o", str(ORACLE_BIN), "-lm", "-lz", _LAPACK,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None
    return ORACLE_BIN


def oracle_available() -> bool:
    return build_oracle() is not None


class OracleResult:
    def __init__(self, outdir: Path, dims, num_octaves: int, num_levels: int):
        self.outdir = Path(outdir)
        self.dims = dims
        self.num_octaves = num_octaves
        self.num_levels = num_levels

    def _level(self, kind: str, o: int, i: int, shape) -> np.ndarray:
        raw = np.fromfile(self.outdir / f"{kind}_o{o}_l{i}.bin",
                          dtype=np.float32)
        # x-fastest (column-major) on disk -> [nx, ny, nz] array
        return raw.reshape(shape[::-1]).transpose(2, 1, 0)

    def gpyr_level(self, o: int, i: int, shape) -> np.ndarray:
        return self._level("gpyr", o, i, shape)

    def dog_level(self, o: int, i: int, shape) -> np.ndarray:
        return self._level("dog", o, i, shape)

    @property
    def keypoints(self) -> np.ndarray:
        """[n, 16] float64: strength x y z o s sd R(row-major 9)."""
        with open(self.outdir / "keys.bin", "rb") as f:
            n = np.fromfile(f, dtype=np.int64, count=1)[0]
            return np.fromfile(f, dtype=np.float64).reshape(n, 16)

    @property
    def descriptors(self) -> np.ndarray:
        """[n, 772] float32: x y z sd el0..el767."""
        path = self.outdir / "desc.bin"
        if not path.exists():
            return np.zeros((0, 772), dtype=np.float32)
        with open(path, "rb") as f:
            n = np.fromfile(f, dtype=np.int64, count=1)[0]
            return np.fromfile(f, dtype=np.float32).reshape(n, 772)


def run_oracle(vol: np.ndarray, outdir: Path, units=(1.0, 1.0, 1.0),
               peak=None, corner=None, kp_levels=None, sigma_n=None,
               sigma0=None) -> OracleResult:
    """Run the oracle on vol[nx,ny,nz] float32."""
    binary = build_oracle()
    assert binary is not None, "oracle unavailable"
    outdir = Path(outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    vol = np.ascontiguousarray(vol, dtype=np.float32)
    raw = outdir / "vol.raw"
    # x-fastest on disk
    vol.transpose(2, 1, 0).tofile(raw)
    nx, ny, nz = vol.shape
    args = [str(binary), str(raw), str(nx), str(ny), str(nz),
            str(units[0]), str(units[1]), str(units[2]), str(outdir)]
    extra = [peak, corner, kp_levels, sigma_n, sigma0]
    defaults = [0.1, 0.4, 3, 1.15, 1.6]
    vals = [d if e is None else e for e, d in zip(extra, defaults)]
    args += [str(v) for v in vals]
    subprocess.run(args, check=True, capture_output=True)

    import math
    num_octaves = int(math.log2(min(nx, ny, nz))) - 3 + 1
    num_levels = int(vals[2]) + 3
    return OracleResult(outdir, (nx, ny, nz), num_octaves, num_levels)
