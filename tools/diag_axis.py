"""Per-axis cost of the diagonal-form blur pass at 256^3: which axis's
shifted reads defeat XLA fusion (x = untiled major, y = sublane, z = lane)?

Usage: python -u tools/diag_axis.py [size]
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
    from sift3d_tpu.filters import conv_diagonals, gauss_kernel, \
        incremental_sigma
    from sift3d_tpu.pyramid import _diag_pass

    taps = gauss_kernel(incremental_sigma(2.54, 3.2))  # widest: band 14
    Wd_np, lo = conv_diagonals(n, taps, 1.0)
    Wd = jnp.asarray(Wd_np)
    B = Wd_np.shape[1]
    print(f"band {B} lo {lo}", flush=True)

    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.normal(size=(n, n, n)).astype(np.float32))
    jax.device_get(jnp.sum(vol))

    def baseline(args):
        (v,) = args
        return v * 2.0

    def axis_fn(axis):
        def fn(args):
            (v,) = args
            return _diag_pass(v, Wd, lo, axis)
        return fn

    # Same FLOPs without any shifts: B scaled copies of the SAME view.
    def noshift(args):
        (v,) = args
        out = None
        for k in range(B):
            term = Wd[:, k].reshape(n, 1, 1) * v
            out = term if out is None else out + term
        return out

    # Shifts along z implemented as a banded MXU matmul instead.
    Wfull = jnp.asarray(
        np.asarray(__import__("sift3d_tpu.filters", fromlist=["conv_matrix"])
                   .conv_matrix(n, taps, 1.0)))

    def z_matmul(args):
        (v,) = args
        return jnp.einsum("ab,xyb->xya", Wfull, v,
                          precision=jax.lax.Precision.HIGHEST)

    for label, fn in (("elementwise baseline (R+W)", baseline),
                      ("no-shift B-term FMA", noshift),
                      ("diag axis 0 (x, major)", axis_fn(0)),
                      ("diag axis 1 (y, sublane)", axis_fn(1)),
                      ("diag axis 2 (z, lane)", axis_fn(2)),
                      ("z as HIGHEST matmul", z_matmul)):
        t = device_time(jax.jit(fn), (vol,), k1=2, k2=32)
        print(f"{label:<30}{t * 1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
