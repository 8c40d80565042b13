"""DoG extrema detection.

Reference semantics (detect_extrema, /root/reference/sift3d/sift.c:735-871):
for each DoG level triple (prev, cur, next) the level's own max |DoG| scales
the relative peak threshold (sift.c:821-829); a voxel in the interior
[1, n-2]^3 is a candidate iff |value| clears the threshold and the value is
strictly greater (or strictly less) than every compared neighbor. The default
comparison set is the 6 face neighbors in cur plus the center voxel of prev
and next (sift.c:797-810); the compile-time CUBOID_EXTREMA variant compares
the full 3x3x3 cube in all three levels (80 neighbors, sift.c:761-796).
Candidates carry integer voxel coordinates at octave resolution, sd = the
level's absolute scale, and strength = |DoG| (sift.c:851-864).

TPU formulation: the neighbor tests are shifted-slice comparisons fused by
XLA into one stencil pass; the dynamic-size candidate list becomes a
fixed-capacity store filled by a cumsum-scatter compaction, keeping every
shape static under jit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .params import DetectorParams


class LevelCandidates(NamedTuple):
    """Fixed-capacity extrema candidates for one (octave, level)."""
    coords: jnp.ndarray     # i32[capacity, 3] voxel coords at octave res
    strength: jnp.ndarray   # f32[capacity]
    valid: jnp.ndarray      # bool[capacity]
    count: jnp.ndarray      # i32[] true number found (may exceed capacity)


def default_capacity(nvox: int) -> int:
    """Auto candidate capacity per level. Extrema are sparse (well under
    0.1% of voxels on real data); slot-resolution work in the compaction is
    proportional to the capacity, so keep it tight — overflow is detected
    and reported, and DetectorParams.kp_per_level overrides."""
    return int(min(4096, max(128, nvox // 512)))


def _shift(a: jnp.ndarray, dx: int, dy: int, dz: int) -> jnp.ndarray:
    """View of `a` shifted so index [i,j,k] reads a[1+i+dx, 1+j+dy, 1+k+dz];
    output covers the interior of the level."""
    nx, ny, nz = a.shape
    return a[1 + dx: nx - 1 + dx, 1 + dy: ny - 1 + dy, 1 + dz: nz - 1 + dz]


_FACE_OFFSETS = [(1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0),
                 (0, 0, -1), (0, 0, 1)]
_CUBE_OFFSETS = [(dx, dy, dz)
                 for dz in (-1, 0, 1) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]


def detect_extrema_level(prev: jnp.ndarray, cur: jnp.ndarray,
                         next_: jnp.ndarray, params: DetectorParams,
                         capacity: int) -> LevelCandidates:
    """Find extrema candidates in one DoG level triple."""
    nx, ny, nz = cur.shape
    dogmax = jnp.max(jnp.abs(cur))
    peak = jnp.float32(params.peak_thresh) * dogmax

    pcur = _shift(cur, 0, 0, 0)

    if params.cuboid_extrema:
        cur_nbrs = [_shift(cur, *off) for off in _CUBE_OFFSETS
                    if off != (0, 0, 0)]
        prev_nbrs = [_shift(prev, *off) for off in _CUBE_OFFSETS]
        next_nbrs = [_shift(next_, *off) for off in _CUBE_OFFSETS]
    else:
        cur_nbrs = [_shift(cur, *off) for off in _FACE_OFFSETS]
        prev_nbrs = [_shift(prev, 0, 0, 0)]
        next_nbrs = [_shift(next_, 0, 0, 0)]

    nbrs = cur_nbrs + prev_nbrs + next_nbrs
    is_max = jnp.ones_like(pcur, dtype=bool)
    is_min = jnp.ones_like(pcur, dtype=bool)
    for nb in nbrs:
        is_max &= pcur > nb
        is_min &= pcur < nb

    mask = ((pcur > peak) | (pcur < -peak)) & (is_max | is_min)

    return compact_candidates(mask, pcur, capacity)


def compact_candidates(mask: jnp.ndarray, pcur: jnp.ndarray,
                       capacity: int) -> LevelCandidates:
    """Compact an interior candidate mask to a fixed-capacity store in the
    reference's candidate order (z outer, y middle, x fastest —
    SIFT3D_IM_LOOP_LIMITED_START, immacros.h:78-82); downstream stages depend
    on this order to replicate the reference's post-compaction strength
    assignment. `mask`/`pcur` cover the interior grid (coordinate c maps to
    voxel c+1).

    TPU formulation: candidates are sparse, so a full-volume cumsum+scatter
    is waste (XLA's prefix scan is O(n log n) passes and TPU scatter is
    slow). Instead: one reduction pass computes per-block candidate counts;
    block offsets locate the j-th candidate's block by batched binary search
    (searchsorted); only the selected blocks (O(capacity) data) are gathered
    and rank-resolved. Everything after the single full pass costs
    O(capacity * block).
    """
    C = 128  # block length, one vector lane
    flat_mask = mask.transpose(2, 1, 0).ravel()
    m = flat_mask.shape[0]
    B = -(-m // C)
    pad = B * C - m
    blocks = jnp.pad(flat_mask, (0, pad)).reshape(B, C)
    bc = jnp.sum(blocks, axis=1, dtype=jnp.int32)      # [B] block counts
    boff = jnp.cumsum(bc)                              # [B] inclusive
    count = boff[-1]

    j = jnp.arange(capacity, dtype=jnp.int32)
    blk = jnp.searchsorted(boff, j, side="right").astype(jnp.int32)
    blk_c = jnp.minimum(blk, B - 1)
    prev = boff[blk_c] - bc[blk_c]                     # candidates before blk
    rank = j - prev                                    # rank within block
    rows = blocks[blk_c]                               # [capacity, C]
    rcum = jnp.cumsum(rows.astype(jnp.int32), axis=1)
    within = jnp.argmax(rows & (rcum == rank[:, None] + 1),
                        axis=1).astype(jnp.int32)
    flat_idx = blk_c * C + within                      # index in (z,y,x) flat

    mx, my, mz = pcur.shape
    zz = flat_idx // (my * mx)
    rem = flat_idx - zz * (my * mx)
    yy = rem // mx
    xx = rem - yy * mx
    valid = j < jnp.minimum(count, capacity)
    coords = jnp.where(valid[:, None],
                       jnp.stack([xx + 1, yy + 1, zz + 1], axis=-1), 0)
    strength = jnp.where(
        valid, jnp.abs(pcur)[xx, yy, zz], 0.0).astype(jnp.float32)
    return LevelCandidates(coords, strength, valid, count)
