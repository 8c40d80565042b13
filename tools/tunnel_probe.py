"""Characterize the tunnel link: RTT floor, bandwidth, and PER-LEAF
overhead of a multi-leaf device_get (the fused detection payload has ~56
leaves; if each costs fixed per-message time, packing them into one
buffer on device is a direct wall-time win).

Usage: python -u tools/tunnel_probe.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, reps=7):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) * 1e3)
    return min(ts), float(np.median(ts))


def main():
    print(f"backend: {jax.default_backend()}", flush=True)

    @jax.jit
    def make(x):
        big = jnp.broadcast_to(x, (210 * 1024 // 4,)) + 1.0  # 210 kB f32
        leaves56 = [big[i * 938:(i + 1) * 938] + i for i in range(56)]
        scalar = jnp.sum(big[:8])
        return scalar, big, leaves56

    x = jax.device_put(jnp.float32(1.0))
    scalar, big, leaves56 = make(x)
    jax.device_get(scalar)

    mn, md = timeit(lambda: jax.device_get(jnp.add(scalar, 0.0)))
    print(f"scalar get (RTT floor + tiny dispatch): min {mn:.2f} "
          f"median {md:.2f} ms", flush=True)

    # Pre-existing buffers (no dispatch): pure transfer cost.
    mn, md = timeit(lambda: jax.device_get(scalar))
    print(f"scalar get (no dispatch):               min {mn:.2f} "
          f"median {md:.2f} ms", flush=True)
    mn, md = timeit(lambda: jax.device_get(big))
    print(f"one 210 kB leaf:                        min {mn:.2f} "
          f"median {md:.2f} ms", flush=True)
    mn, md = timeit(lambda: jax.device_get(leaves56))
    print(f"56 leaves x 3.75 kB (210 kB total):     min {mn:.2f} "
          f"median {md:.2f} ms", flush=True)
    mn, md = timeit(lambda: jax.device_get((scalar, leaves56[:20])))
    print(f"20 leaves (75 kB):                      min {mn:.2f} "
          f"median {md:.2f} ms", flush=True)

    big4 = jax.jit(lambda b: jnp.concatenate([b, b, b, b]))(big)
    mn, md = timeit(lambda: jax.device_get(big4))
    print(f"one 840 kB leaf:                        min {mn:.2f} "
          f"median {md:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
