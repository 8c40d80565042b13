"""A/B the extrema stencil kernel: single-buffered slab DMAs vs the
double-buffered prefetching variant (ops/extrema_kernel._kernel_db).
Checks bit-identical masks, then device-times both.

Usage: python -u tools/extrema_ab.py [size]
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
    from scipy.ndimage import gaussian_filter

    from sift3d_tpu.ops.extrema_kernel import _pick_cfg, extrema_mask_pallas
    from sift3d_tpu.params import DetectorParams

    params = DetectorParams()
    Ld = params.num_dog_levels
    rng = np.random.default_rng(0)
    base = rng.normal(size=(Ld, n, n, n)).astype(np.float32)
    for i in range(Ld):
        base[i] = gaussian_filter(base[i], 2.0)
    dog = jnp.asarray(base)
    cur = base[1:Ld - 1]
    thr = jnp.asarray(0.1 * np.max(np.abs(cur), axis=(1, 2, 3)),
                      jnp.float32)
    jax.device_get(jnp.sum(dog))

    print(f"pick_cfg single: {_pick_cfg(n, n, n, False, db=False)}  "
          f"db: {_pick_cfg(n, n, n, False)}", flush=True)

    m_single = np.asarray(jax.device_get(
        extrema_mask_pallas(dog, thr, db=False)))
    m_db = np.asarray(jax.device_get(
        extrema_mask_pallas(dog, thr, db=True)))
    same = np.array_equal(m_single, m_db)
    print(f"masks identical: {same}  candidates: {int(m_single.sum())}",
          flush=True)
    assert same

    for name, dbf in (("single", False), ("double", True)):
        t = device_time(
            lambda args, dbf=dbf: extrema_mask_pallas(
                args[0], thr, db=dbf).astype(jnp.float32),
            (dog,))
        print(f"{name:8s} {t * 1e3:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
