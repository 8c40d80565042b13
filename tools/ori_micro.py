"""Orientation stage microbench: where do the ~7 us/slot go?

Splits per-keypoint cost into window gather, gather+weights, and full
moments (+eigh), RTT-immune. Usage: python -u tools/ori_micro.py [size]
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
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    from sift3d_tpu.orientation import assign_orientations, _window_moments
    from sift3d_tpu.params import DetectorParams
    from sift3d_tpu.pyramid import make_plan
    from sift3d_tpu.windows import gather_window, window_extent

    params = DetectorParams()
    plan = make_plan((n, n, n), (1.0, 1.0, 1.0), params)
    sd = float(plan.scales[0][3])  # worst-case level scale at octave 0
    units = (1.0, 1.0, 1.0)
    rad = params.ori_sig_fctr * sd * params.ori_rad_fctr
    extents = tuple(window_extent(rad / 1.0, n) for _ in range(3))
    print(f"sd={sd:.2f} extents={extents} "
          f"({np.prod(extents)} voxels/window), K={K}", flush=True)

    rng = np.random.default_rng(0)
    level = jnp.asarray(rng.normal(size=(n, n, n)).astype(np.float32))
    coords = jnp.asarray(rng.integers(20, n - 20, (K, 3)), jnp.int32)
    jax.device_get(jnp.sum(level))

    def gather_only(le):
        def one(co):
            w, _ = gather_window(le, co, extents)
            return jnp.sum(w)
        return jnp.sum(jax.vmap(one)(coords))

    t = device_time(gather_only, level, k1=1, k2=5)
    print(f"gather only:   {t * 1e3:8.2f} ms ({t / K * 1e6:6.2f} us/kp)",
          flush=True)

    def moments(le):
        def one(co):
            A, vd = _window_moments(
                le, co, co.astype(jnp.float32), jnp.float32(sd), units,
                extents, params)
            return jnp.sum(A) + jnp.sum(vd)
        return jnp.sum(jax.vmap(one)(coords))

    t = device_time(moments, level, k1=1, k2=5)
    print(f"full moments:  {t * 1e3:8.2f} ms ({t / K * 1e6:6.2f} us/kp)",
          flush=True)

    def full(le):
        ori = assign_orientations(le, coords, jnp.ones(K, bool),
                                  sd, units, params)
        return jnp.sum(ori.R)

    t = device_time(full, level, k1=1, k2=5)
    print(f"full (+eigh):  {t * 1e3:8.2f} ms ({t / K * 1e6:6.2f} us/kp)",
          flush=True)


if __name__ == "__main__":
    main()
