"""Halo-exchange spatial sharding for the banded-matmul blur.

A per-axis blur pass is ``out = W @ signal`` with W banded (bandwidth h =
kernel half-width + 1 for the interpolation lerp; boundary rows reach at most
h columns past their diagonal because the mirror rule reflects back inward).
Under z-sharding each shard therefore needs only h slabs of halo from each
neighbor:

    ext      = [halo_from_left | local | halo_from_right]
    out_local = W_pad[rows_of_shard, shard_offset : shard_offset + local+2h]
                @ ext

where W_pad is W zero-padded by h columns on both sides. Zero columns make
the wrap-around halos received by the edge shards (ppermute is a ring)
harmless: their W entries are structurally zero. One ppermute pair per pass,
riding the ICI ring; the matmul itself stays a local MXU op.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def band_halo(W: np.ndarray) -> int:
    """Max reach of any row of W beyond its diagonal."""
    rows, cols = np.nonzero(np.asarray(W) != 0.0)
    if len(rows) == 0:
        return 0
    return int(np.max(np.abs(cols - rows)))


def sharded_blur_z(vol, W: np.ndarray, mesh: Mesh, axis: str = "z",
                   lead_names: tuple = None,
                   precision=jax.lax.Precision.HIGHEST):
    """Blur along the last axis of vol[..., n] with conv matrix W[n, n],
    the last axis sharded over mesh axis `axis`. `lead_names` optionally
    names the mesh axes sharding the leading dims (None entries =
    replicated), e.g. ("b", None, None) for a batch of volumes."""
    n = vol.shape[-1]
    ndev = mesh.shape[axis]
    if n % ndev != 0:
        raise ValueError(f"axis size {n} not divisible by {ndev} shards")
    local = n // ndev
    h = band_halo(W)
    if h > local:
        raise ValueError(
            f"halo {h} exceeds shard size {local}; use fewer shards")

    W_pad = jnp.asarray(np.pad(np.asarray(W, np.float32), ((0, 0), (h, h))))
    fwd = [(j, (j + 1) % ndev) for j in range(ndev)]
    bwd = [(j, (j - 1) % ndev) for j in range(ndev)]

    nbatch = vol.ndim - 1
    if lead_names is None:
        lead_names = (None,) * nbatch
    spec = P(*lead_names, axis)

    def f(v):
        i = jax.lax.axis_index(axis)
        # halo exchange over the ICI ring
        from_left = jax.lax.ppermute(v[..., -h:], axis, fwd)
        from_right = jax.lax.ppermute(v[..., :h], axis, bwd)
        ext = jnp.concatenate([from_left, v, from_right], axis=-1)
        Wblk = jax.lax.dynamic_slice(
            W_pad, (i * local, i * local), (local, local + 2 * h))
        return jnp.einsum("ab,...b->...a", Wblk, ext, precision=precision)

    return shard_map(f, mesh=mesh, in_specs=spec, out_specs=spec,
                     check_vma=False)(vol)
