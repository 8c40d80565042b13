"""A/B the descriptor prep flatten: dense repack (relayout through HBM)
vs the tiling-preserving aligned flatten (free reshape, dead lanes fed to
the kernel). Measures prep+kernel end-to-end per slot at several window
extents, on the real chip.

Usage: python -u tools/prep_flat_ab.py [n]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from device_time import device_time


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    from sift3d_tpu.descriptor import _extract_pallas
    from sift3d_tpu.params import DetectorParams

    p = DetectorParams()
    rng = np.random.default_rng(0)
    level = jnp.asarray(rng.normal(size=(3, n, n, n)).astype(np.float32))
    jax.device_get(jnp.sum(level))
    K = 64
    coords = jnp.asarray(
        rng.integers(40, n - 40, (K, 3)), jnp.int32)
    R = jnp.asarray(np.stack(
        [np.linalg.qr(rng.normal(size=(3, 3)))[0].astype(np.float32)
         for _ in range(K)]))
    lvl = jnp.asarray(rng.integers(0, 3, K), jnp.int32)
    valid = jnp.ones((K,), bool)

    # representative per-level window extents at 256^3 octave 0
    for extents, sd in (((59, 59, 59), 2.0159),
                        ((67, 67, 67), 2.304),   # wait: recompute below
                        ((75, 75, 75), 2.5398)):
        sd_arr = jnp.full((K,), jnp.float32(sd))
        for name, al in (("dense ", False), ("aligned", True)):
            fn = lambda args, al=al, ex=extents, sa=sd_arr: _extract_pallas(
                args[0], coords, coords.astype(jnp.float32), R, sa,
                (1.0, 1.0, 1.0), ex, 16, p, level_index=lvl,
                valid=valid, aligned_flat=al)
            t = device_time(fn, (level,))
            print(f"E={extents[0]:3d} {name} {t * 1e6 / K:7.1f} us/slot",
                  flush=True)


if __name__ == "__main__":
    main()
