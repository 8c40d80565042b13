"""Mesh construction helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(axes: dict[str, int] | None = None,
              devices=None) -> Mesh:
    """Create a Mesh. `axes` maps axis name -> size; sizes must multiply to
    the device count. Default: all devices on one 'b' (batch) axis."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if axes is None:
        axes = {"b": n}
    sizes = list(axes.values())
    if int(np.prod(sizes)) != n:
        raise ValueError(f"mesh axes {axes} do not multiply to {n} devices")
    arr = np.asarray(devices).reshape(sizes)
    return Mesh(arr, tuple(axes.keys()))
