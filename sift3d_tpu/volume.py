"""Volume: a float32 3-D image with real-world voxel units.

TPU-native replacement for the reference's sift3d_image
(/root/reference/sift3d/imtypes_private.h:73-81): the dense array lives on
device as a jnp array; units are static metadata (they parameterize filter
tap spacing and window radii at trace time, so they are pytree aux data, not
traced values). Only single-channel volumes are supported by the detector,
matching sift3d_detect_keypoints (sift.c:1220-1226).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Volume:
    data: Any                                   # f32[nx, ny, nz]
    units: tuple[float, float, float] = (1.0, 1.0, 1.0)

    @property
    def shape(self) -> tuple[int, int, int]:
        return tuple(self.data.shape)

    def tree_flatten(self):
        return (self.data,), self.units

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux)

    @classmethod
    def from_array(cls, arr, units=(1.0, 1.0, 1.0)) -> "Volume":
        a = jnp.asarray(arr, dtype=jnp.float32)
        if a.ndim != 3:
            raise ValueError(f"expected a 3-D volume, got shape {a.shape}")
        return cls(a, tuple(float(u) for u in units))


def as_volume(vol) -> Volume:
    if isinstance(vol, Volume):
        return vol
    return Volume.from_array(np.asarray(vol))
