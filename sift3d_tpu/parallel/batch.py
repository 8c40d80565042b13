"""Batch data-parallel detection over a device mesh.

A batch of volumes is sharded over the mesh's batch axis; the per-volume
pipeline (scale, pyramid matmuls, DoG, extrema) vmaps over the local batch
and XLA runs each shard's volumes independently — BASELINE config 5's
structure (batched volumes over ICI).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..detect import detect_extrema_level

from ..pyramid import PyramidPlan, build_dog, build_gpyr, scale_to_unit


@functools.lru_cache(maxsize=16)
def _batch_fn(plan: PyramidPlan, capacity: int):
    params = plan.params

    def one(vol):
        x = scale_to_unit(vol)
        gpyr = build_gpyr(x, plan)
        dog = build_dog(gpyr)
        counts = []
        for o in range(plan.num_octaves):
            for i in range(1, params.num_dog_levels - 1):
                cand = detect_extrema_level(
                    dog[o][i - 1], dog[o][i], dog[o][i + 1], params, capacity)
                counts.append(cand.count)
        return jnp.stack(counts)

    return one


def detect_batch_counts(vols, plan: PyramidPlan, mesh: Mesh,
                        batch_axis: str = "b", capacity: int = 1024):
    """Per-level extrema counts for a sharded batch of volumes [B, nx,ny,nz].

    Returns [B, num_levels] i32, batch sharded over `batch_axis`.
    """
    sharding = NamedSharding(mesh, P(batch_axis))
    vols = jax.device_put(vols, sharding)
    fn = jax.jit(jax.vmap(_batch_fn(plan, capacity)),
                 in_shardings=sharding,
                 out_shardings=NamedSharding(mesh, P(batch_axis)))
    return fn(vols)
