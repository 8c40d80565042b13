"""Tunnel health probe: upload a tiny array, run a trivial jit, time RTTs.

Usage: timeout 300 python -u tools/tpu_probe.py
Prints one line per step so a hang is visible immediately.
"""

import time

import jax
import jax.numpy as jnp

t0 = time.perf_counter()
print(f"devices: {jax.devices()}  (+{time.perf_counter() - t0:.1f}s)",
      flush=True)

x = jnp.ones((128, 128), jnp.float32)
f = jax.jit(lambda a: (a * 2.0).sum())
print(f"dispatch compile  (+{time.perf_counter() - t0:.1f}s)", flush=True)
v = jax.device_get(f(x))
print(f"first sync: {v}  (+{time.perf_counter() - t0:.1f}s)", flush=True)
for i in range(5):
    t1 = time.perf_counter()
    jax.device_get(f(x))
    print(f"rtt[{i}] = {(time.perf_counter() - t1) * 1e3:.1f} ms", flush=True)
