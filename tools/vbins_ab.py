"""A/B: packed vs affine vbins in the Pallas descriptor extract stage.

Measures _extract_pallas (prep + kernel) end-to-end with RTT-immune
device timing at the sparse bench's three biggest window classes, and
checks hardware agreement between the two layouts (they differ only by
~ulp interpolation-weight noise — see descriptor._prep_window /
ops/desc_kernel._affine_vb).

Usage: python -u tools/vbins_ab.py [size] [--kp 32]
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
    K = 32
    for i, a in enumerate(sys.argv):
        if a == "--kp":
            K = int(sys.argv[i + 1])
    from sift3d_tpu.descriptor import _extract_pallas, _level_radius
    from sift3d_tpu.params import DetectorParams
    from sift3d_tpu.pyramid import make_plan
    from sift3d_tpu.windows import window_extent

    units = (1.0, 1.0, 1.0)
    base = DetectorParams()
    plan = make_plan((n, n, n), units, base)
    rng = np.random.default_rng(0)
    level = jnp.asarray(rng.normal(size=(n, n, n)).astype(np.float32))
    jax.device_get(jnp.sum(level))

    print(f"backend: {jax.default_backend()}  K={K}", flush=True)
    # The sparse bench's per-level window classes at octave 0 (levels
    # 1..3 scale sd): each job's extents are sized by its own sd.
    for lv in (1, 2, 3):
        sd = plan.scales[0][lv]
        rad = _level_radius(sd, base)
        extents = tuple(window_extent(rad / units[a], n, 0)
                        for a in range(3))
        coords = jnp.asarray(rng.integers(40, n - 40, (K, 3)), jnp.int32)
        centers = coords.astype(jnp.float32)
        R = jnp.asarray(np.stack(
            [np.linalg.qr(rng.normal(size=(3, 3)))[0].astype(np.float32)
             for _ in range(K)]))
        sd_arr = jnp.full((K,), jnp.float32(sd))
        x = (level, coords, centers, R, sd_arr)

        outs = {}
        for tag in ("packed", "affine"):
            params = DetectorParams(desc_vbins=tag)

            def fn(x, params=params):
                le, co, ce, Rk, sdk = x
                h = _extract_pallas(le, co, ce, Rk, sdk, units, extents,
                                    16, params)
                return jnp.sum(h * h)

            def raw(x, params=params):
                le, co, ce, Rk, sdk = x
                return _extract_pallas(le, co, ce, Rk, sdk, units,
                                       extents, 16, params)

            outs[tag] = np.asarray(jax.device_get(jax.jit(raw)(x)))
            t = device_time(fn, x, k1=1, k2=5)
            print(f"  lv{lv} extents={extents}  {tag:<7} "
                  f"{t * 1e3:8.2f} ms  ({t / K * 1e6:6.1f} us/kp)",
                  flush=True)
        scale = np.abs(outs["packed"]).max()
        d = np.abs(outs["packed"] - outs["affine"]).max() / scale
        print(f"  lv{lv} rel max|diff| = {d:.2e}", flush=True)


if __name__ == "__main__":
    main()
