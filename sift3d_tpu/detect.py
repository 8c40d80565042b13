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
    proportional to the capacity, so keep it tight — overflow auto-retries
    the octave with an enlarged store (pipeline._redetect_octave_fn), so a
    low default costs one extra dispatch on dense data rather than dropped
    candidates. DetectorParams.kp_per_level overrides."""
    return int(min(2048, max(128, nvox // 2048)))


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
    flat_idx, valid, count = compact_flat(mask.transpose(2, 1, 0).ravel(),
                                          capacity)
    mx, my, mz = pcur.shape
    zz = flat_idx // (my * mx)
    rem = flat_idx - zz * (my * mx)
    yy = rem // mx
    xx = rem - yy * mx
    coords = jnp.where(valid[:, None],
                       jnp.stack([xx + 1, yy + 1, zz + 1], axis=-1), 0)
    strength = jnp.where(
        valid, jnp.abs(pcur)[xx, yy, zz], 0.0).astype(jnp.float32)
    return LevelCandidates(coords, strength, valid, count)


def compact_flat(flat_mask: jnp.ndarray, capacity: int,
                 bc: jnp.ndarray | None = None):
    """Indices of the first `capacity` set bits of flat_mask, in order.
    Returns (flat_idx i32[capacity], valid bool[capacity], count i32[]).

    bc: optional precomputed per-128-block counts (i32[ceil(m/128)]),
    letting the caller share the full-mask reduction pass with its own
    count outputs."""
    C = 128  # block length, one vector lane
    m = flat_mask.shape[0]
    B = -(-m // C)
    pad = B * C - m
    blocks = jnp.pad(flat_mask, (0, pad)).reshape(B, C)
    if bc is None:
        bc = jnp.sum(blocks, axis=1, dtype=jnp.int32)  # [B] block counts
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
    flat_idx = blk_c * C + within
    valid = j < jnp.minimum(count, capacity)
    return flat_idx, valid, count


class OctaveCandidates(NamedTuple):
    """Fixed-capacity extrema candidates for one octave (all keypoint levels
    jointly). Candidate order is (level s, then z, y, x) — exactly the
    reference's per-octave scan order (PYR_LOOP s inner, sift.c:814)."""
    coords: jnp.ndarray      # i32[capacity, 3]
    level: jnp.ndarray       # i32[capacity] raw level s
    strength: jnp.ndarray    # f32[capacity]
    valid: jnp.ndarray       # bool[capacity]
    counts: jnp.ndarray      # i32[num_kp_levels] true count per level


def detect_extrema_octave(dog_oct: jnp.ndarray, params: DetectorParams,
                          capacity: int,
                          use_pallas: bool | None = None,
                          dogmax: jnp.ndarray | None = None
                          ) -> OctaveCandidates:
    """Extrema for all keypoint levels of one octave in one fused pass.

    dog_oct: [num_dog_levels, nx, ny, nz]. Equivalent to running
    detect_extrema_level per level triple; the stacked formulation runs the
    stencil, the per-level max reductions, and one joint compaction instead
    of 3x the kernels. On TPU the stencil runs as a Pallas kernel over
    full-dims tiles (the XLA shifted-slice formulation materializes its
    comparison operands, ~7x the bandwidth floor); pass use_pallas=False
    from vmapped callers.

    dogmax (optional f32[num_dog_levels]): per-DoG-level max |DoG| as
    produced by the chain builder's fused per-tile max output — skips
    the threshold pre-pass's full re-read of the DoG. Bit-identical to
    the recompute (max of the same f32 values; order-free).
    """
    Ld = dog_oct.shape[0]
    nl = Ld - 2                      # keypoint levels
    nx, ny, nz = dog_oct.shape[1:]

    interpret = False
    shape_ok = nz % 128 == 0 and nx % 8 == 0
    if use_pallas is None:
        impl = params.extrema_impl
        if impl == "auto":
            use_pallas = jax.default_backend() == "tpu" and shape_ok
        elif impl == "xla":
            use_pallas = False
        else:                        # "pallas" / "interpret"
            use_pallas = shape_ok
            interpret = impl == "interpret"
    if use_pallas:
        return _detect_extrema_octave_pallas(dog_oct, params, capacity,
                                             interpret=interpret,
                                             dogmax=dogmax)

    cur = dog_oct[1:Ld - 1]          # [nl, ...]
    if dogmax is None:
        dmax_l = jnp.max(jnp.abs(cur), axis=(1, 2, 3))
    else:
        dmax_l = dogmax[1:Ld - 1]
    peak = (jnp.float32(params.peak_thresh) * dmax_l)[:, None, None, None]

    def sh(a, dx, dy, dz):
        return a[:, 1 + dx: nx - 1 + dx, 1 + dy: ny - 1 + dy,
                 1 + dz: nz - 1 + dz]

    pcur = sh(cur, 0, 0, 0)
    prev = dog_oct[0:Ld - 2]
    nxt = dog_oct[2:Ld]
    if params.cuboid_extrema:
        cur_n = [sh(cur, *off) for off in _CUBE_OFFSETS if off != (0, 0, 0)]
        prev_n = [sh(prev, *off) for off in _CUBE_OFFSETS]
        next_n = [sh(nxt, *off) for off in _CUBE_OFFSETS]
    else:
        cur_n = [sh(cur, *off) for off in _FACE_OFFSETS]
        prev_n = [sh(prev, 0, 0, 0)]
        next_n = [sh(nxt, 0, 0, 0)]
    is_max = jnp.ones_like(pcur, bool)
    is_min = jnp.ones_like(pcur, bool)
    for nb in cur_n + prev_n + next_n:
        is_max &= pcur > nb
        is_min &= pcur < nb
    mask = ((pcur > peak) | (pcur < -peak)) & (is_max | is_min)

    counts = jnp.sum(mask, axis=(1, 2, 3), dtype=jnp.int32)      # [nl]

    # Compact in the mask's natural (l, x, y, z) memory order — a device
    # transpose of the full [nl, nx, ny, nz] mask into scan order was
    # measured to dominate the detect jit — then restore the reference's
    # (level, z, y, x) candidate order by sorting the <= capacity kept
    # candidates by their scan key. The kept SET equals the full candidate
    # set whenever counts <= capacity (the overflow path re-detects with an
    # enlarged store, so truncated results are never used), making the
    # post-sort order exactly the reference's.
    mx, my, mz = nx - 2, ny - 2, nz - 2
    flat_idx, valid, _ = compact_flat(mask.ravel(), capacity)
    lvl = flat_idx // (mx * my * mz)
    rem = flat_idx - lvl * (mx * my * mz)
    xx = rem // (my * mz)
    rem = rem - xx * (my * mz)
    yy = rem // mz
    zz = rem - yy * mz

    key = ((lvl * mz + zz) * my + yy) * mx + xx     # (l, z, y, x) rank
    big = jnp.int32(2 ** 31 - 1)
    order = jnp.argsort(jnp.where(valid, key, big))
    lvl, xx, yy, zz, valid = (a[order] for a in (lvl, xx, yy, zz, valid))

    strength = jnp.where(
        valid, jnp.abs(pcur)[lvl, xx, yy, zz], 0.0).astype(jnp.float32)
    coords = jnp.where(valid[:, None],
                       jnp.stack([xx + 1, yy + 1, zz + 1], axis=-1), 0)
    lvl = jnp.where(valid, lvl, 0).astype(jnp.int32)
    return OctaveCandidates(coords, lvl, strength, valid, counts)


def _detect_extrema_octave_pallas(dog_oct: jnp.ndarray,
                                  params: DetectorParams,
                                  capacity: int,
                                  interpret: bool = False,
                                  dogmax: jnp.ndarray | None = None
                                  ) -> OctaveCandidates:
    """Pallas-stencil variant of detect_extrema_octave: identical
    candidate set and order. The kernel emits a full-dims int8 mask with
    zeroed boundary, so the flat (l, x, y, z) ravel feeding compact_flat
    is layout-free (nz % 128 == 0) and coordinates decode with full-dims
    strides (no interior offset)."""
    from .ops.extrema_kernel import extrema_mask_pallas

    Ld = dog_oct.shape[0]
    nx, ny, nz = dog_oct.shape[1:]
    cur = dog_oct[1:Ld - 1]
    dmax_l = (jnp.max(jnp.abs(cur), axis=(1, 2, 3)) if dogmax is None
              else dogmax[1:Ld - 1])
    thr = (jnp.float32(params.peak_thresh) * dmax_l).astype(jnp.float32)

    mask = extrema_mask_pallas(dog_oct, thr, cuboid=params.cuboid_extrema,
                               interpret=interpret)
    # One full-mask reduction pass: per-128-block counts feed both the
    # per-level counts and the compaction's block offsets (nz % 128 == 0,
    # so the raveled blocks never straddle levels).
    flat = mask.ravel()
    bc = jnp.sum(flat.reshape(-1, 128), axis=1, dtype=jnp.int32)
    counts = jnp.sum(bc.reshape(mask.shape[0], -1), axis=1)

    flat_idx, valid, _ = compact_flat(flat != 0, capacity, bc=bc)
    lvl = flat_idx // (nx * ny * nz)
    rem = flat_idx - lvl * (nx * ny * nz)
    xx = rem // (ny * nz)
    rem = rem - xx * (ny * nz)
    yy = rem // nz
    zz = rem - yy * nz

    key = ((lvl * nz + zz) * ny + yy) * nx + xx     # (l, z, y, x) rank
    big = jnp.int32(2 ** 31 - 1)
    order = jnp.argsort(jnp.where(valid, key, big))
    lvl, xx, yy, zz, valid = (a[order] for a in (lvl, xx, yy, zz, valid))

    strength = jnp.where(
        valid, jnp.abs(cur)[lvl, xx, yy, zz], 0.0).astype(jnp.float32)
    coords = jnp.where(valid[:, None],
                       jnp.stack([xx, yy, zz], axis=-1), 0)
    lvl = jnp.where(valid, lvl, 0).astype(jnp.int32)
    return OctaveCandidates(coords, lvl, strength, valid, counts)
