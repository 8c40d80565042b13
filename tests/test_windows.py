"""chunked_vmap edge cases (windows.py)."""

import numpy as np

import jax.numpy as jnp

from sift3d_tpu.windows import chunked_vmap


def test_chunked_vmap_non_divisible_lead():
    """A lead that is not a multiple of the chunk (sharded per-shard slot
    counts like 264 with chunk 256) pads internally and slices back —
    exact equality with the plain vmap."""
    rng = np.random.default_rng(0)
    for lead in (264, 300, 511, 512, 768, 100):
        x = jnp.asarray(rng.normal(size=(lead, 5)).astype(np.float32))
        y = jnp.asarray(rng.normal(size=(lead,)).astype(np.float32))
        fn = lambda t: t[0].sum() * t[1]
        got = chunked_vmap(fn, (x, y), 256)
        want = jnp.asarray([float(x[i].sum()) * float(y[i])
                            for i in range(lead)])
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5)
