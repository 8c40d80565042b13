"""RTT-immune device timing for the tunneled TPU.

The tunnel's RTT drifts by tens of ms between host-side measurements, so
single-dispatch timings are mush. `device_time(fn, arg)` times a jitted
fori_loop that applies `fn` k times with a data dependency between
iterations (a tiny input perturbation prevents CSE), for two values of k;
the slope (t_k2 - t_k1) / (k2 - k1) is pure device time per application,
independent of RTT and dispatch overhead.
"""

import time

import jax
import jax.numpy as jnp


def _consume(out):
    """Nonlinear reduction of fn's output pytree. A plain sum would let
    XLA's algebraic simplifier collapse linear graphs through the
    consumer — sum(W @ x) folds into (colsum W) @ x, sum(pad(reshape(x)))
    into sum(x), and a pure elementwise chain can vanish entirely. The
    square blocks distribution, so the full graph must execute. (Costs
    one extra read pass over the output, identical across variants.)"""
    parts = [jnp.sum(jnp.square(a.astype(jnp.float32)))
             for a in jax.tree.leaves(out)]
    return sum(parts, jnp.float32(0.0))


def _looped(fn, k):
    @jax.jit
    def run(x):
        def body(i, carry):
            x_, acc = carry
            eps = acc * jnp.float32(1e-30)
            perturbed = jax.tree.map(lambda a: a + eps.astype(a.dtype), x_)
            out = fn(perturbed)
            return (x_, acc + _consume(out) * jnp.float32(1e-30)
                    + jnp.float32(1.0))
        _, acc = jax.lax.fori_loop(0, k, body, (x, jnp.float32(0.0)))
        return acc
    return run


def device_time(fn, x, k1=2, k2=12, repeats=3):
    """Seconds of device time per application of fn(x).

    fn must map an array (or pytree of arrays — pass ALL large operands
    through x: closed-over device arrays are baked into the program as
    constants, which the tunneled remote-compile endpoint rejects above
    ~100 MB) to an array or scalar whose sum is cheap.
    """
    r1, r2 = _looped(fn, k1), _looped(fn, k2)
    jax.device_get(r1(x))
    jax.device_get(r2(x))
    t1 = min(_clock(r1, x) for _ in range(repeats))
    t2 = min(_clock(r2, x) for _ in range(repeats))
    return max(t2 - t1, 0.0) / (k2 - k1)


def _clock(run, x):
    t0 = time.perf_counter()
    jax.device_get(run(x))
    return time.perf_counter() - t0
