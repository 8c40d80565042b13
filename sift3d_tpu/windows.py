"""Fixed-size window gathering around keypoints.

The reference iterates spherical regions in real-world units around each
keypoint (IM_LOOP_SPHERE_START, /root/reference/sift3d/sift.c:86-109); the
per-axis voxel loop bounds are [max(floor(c - rad/u), 1), min(ceil(c + rad/u),
n - 2)]. On TPU we gather a static-size cube per keypoint (the radius in
voxels depends only on the level index s and the axis units, both static) and
reproduce the exact loop bounds and sphere test as masks. Windows are gathered
with one voxel of slack so central-difference gradients stay inside the
gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def window_extent(radius_vox: float, n: int, margin: int = 0) -> int:
    """Gather size along one axis: window diameter + 1-voxel gradient border
    (+ extra margin for fractional centers), clipped to the level size."""
    import math
    return min(2 * math.ceil(radius_vox) + 3 + margin, n)


def gather_window(level: jnp.ndarray, coord: jnp.ndarray,
                  extents: tuple[int, int, int], z_view=None):
    """Gather one [Gx, Gy, Gz] window centered (as much as possible) on
    coord from level [nx, ny, nz]. Returns (window, start i32[3]).

    The window is positioned so that the reference's loop range (clipped to
    [1, n-2]) plus the 1-voxel gradient border always lies inside it; near
    edges the window shifts instead of shrinking (shapes stay static).

    z_view=(origin, global_nz): `level` is a LOCAL z-slab of a larger
    volume — slab index 0 sits at global z `origin` (possibly negative
    for halo margins) and window placement clips against global_nz.
    Coordinates and the returned start stay global (the spatial-sharding
    halo-exchange descriptor path, parallel/spatial.py)."""
    starts, slice_starts = [], []
    for a in range(3):
        n, G = level.shape[a], extents[a]
        origin = 0
        if a == 2 and z_view is not None:
            origin, n = z_view
        half = (G - 1) // 2
        s = jnp.clip(coord[a] - half, 0, n - G)
        starts.append(s)
        slice_starts.append(s - origin)
    start = jnp.stack(starts)
    win = jax.lax.dynamic_slice(level, tuple(slice_starts), extents)
    return win, start


def gather_window_leveled(levels: jnp.ndarray, lvl: jnp.ndarray,
                          coord: jnp.ndarray, extents, z_view=None):
    """As gather_window, but from a stacked [L, nx, ny, nz] array at the
    per-candidate level index lvl."""
    starts, slice_starts = [], []
    for a in range(3):
        n, G = levels.shape[1 + a], extents[a]
        origin = 0
        if a == 2 and z_view is not None:
            origin, n = z_view
        half = (G - 1) // 2
        s = jnp.clip(coord[a] - half, 0, n - G)
        starts.append(s)
        slice_starts.append(s - origin)
    start = jnp.stack(starts)
    win = jax.lax.dynamic_slice(
        levels, (lvl, slice_starts[0], slice_starts[1], slice_starts[2]),
        (1,) + tuple(extents))
    return win[0], start


def chunked_vmap(fn, xs, chunk: int):
    """vmap fn over the leading axis of xs (a pytree), processing `chunk`
    rows at a time with lax.map to bound memory. A lead that is not a
    multiple of `chunk` is padded by repeating row 0 (fn is pure and
    per-row, so pad rows compute discarded-but-in-range garbage) and the
    output sliced back — sharded per-shard slot counts need not align to
    the chunk."""
    lead = jax.tree_util.tree_leaves(xs)[0].shape[0]
    if lead <= chunk:
        return jax.vmap(fn)(xs)
    if lead % chunk:
        pad = chunk - lead % chunk
        xs_p = jax.tree_util.tree_map(
            lambda x: jnp.concatenate(
                [x, jnp.broadcast_to(x[:1], (pad,) + x.shape[1:])]), xs)
        out = chunked_vmap(fn, xs_p, chunk)
        return jax.tree_util.tree_map(lambda x: x[:lead], out)
    xs_c = jax.tree_util.tree_map(
        lambda x: x.reshape((lead // chunk, chunk) + x.shape[1:]), xs)
    out = jax.lax.map(lambda c: jax.vmap(fn)(c), xs_c)
    return jax.tree_util.tree_map(
        lambda x: x.reshape((lead,) + x.shape[2:]), out)
