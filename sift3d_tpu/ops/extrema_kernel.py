"""Pallas TPU kernel: DoG extrema stencil mask.

Reference semantics (detect_extrema, /root/reference/sift3d/sift.c:735-871):
a voxel in the interior [1, n-2]^3 of keypoint level l is a candidate iff
|DoG| clears the level's relative threshold and the value is strictly
greater (or strictly less) than every compared neighbor — 6 face
neighbors in the current level plus the center voxel of the previous and
next levels (sift.c:797-810), or the full 80-neighbor cuboid under
CUBOID_EXTREMA (sift.c:761-796).

The XLA formulation materializes the shifted-slice comparison operands
(measured 3.7 ms at 256^3 vs a ~0.5 ms bandwidth floor). This kernel
reads each DoG tile once into VMEM, forms neighbors with sublane/lane
rolls (wrapped values are masked off by the interior test), and writes
the mask as int8 over the FULL level dims — boundary zeroed — so the
downstream compaction's ravel/reshape is layout-free when nz % 128 == 0.

Outputs mask int8[nl, nx, ny, nz] in (l, x, y, z) order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _neighbor(tile, xnb, dx, dy, dz, c0, TX):
    """Value of the slab shifted by (dx, dy, dz) relative to the center
    rows [c0, c0+TX).

    c0 is 1 except at the volume's x edges, where the slab DMA was
    clamped (c0 = 0 left, 2 right) and the x-shifted slice start c0+dx
    can fall outside [0, 2]. Those cases repair the slice with a static
    axis-0 roll through the xnb scratch — the repaired rows are volume
    boundary rows, masked off by the interior test. y/z shifts are rolls
    (wrap likewise masked)."""
    if dx == 0:
        v = tile[pl.ds(c0, TX)]
    else:
        start = c0 + dx

        @pl.when(start < 0)
        def _():
            # left edge: rows must shift down one; row 0 is garbage
            xnb[:] = pltpu.roll(tile[pl.ds(0, TX)], 1, 0)

        @pl.when((start >= 0) & (start <= 2))
        def _():
            xnb[:] = tile[pl.ds(jnp.clip(start, 0, 2), TX)]

        @pl.when(start > 2)
        def _():
            # right edge: rows must shift up one; last row is garbage
            xnb[:] = pltpu.roll(tile[pl.ds(2, TX)], TX - 1, 0)

        v = xnb[:]
    if dy:
        v = pltpu.roll(v, (-dy) % v.shape[1], 1)
    if dz:
        v = pltpu.roll(v, (-dz) % v.shape[2], 2)
    return v


def _stencil_compute(thr_ref, l, x0, c0, cur_s, prev_s, next_s, xnb_s,
                     out_ref, *, TX, nx, ny, nz, cuboid):
    """Shared stencil body: compares + threshold + interior mask, from
    slab refs already resident in VMEM."""
    center = cur_s[pl.ds(c0, TX)]
    is_max = None
    is_min = None

    def cmp(nb):
        nonlocal is_max, is_min
        gt = center > nb
        lt = center < nb
        is_max = gt if is_max is None else (is_max & gt)
        is_min = lt if is_min is None else (is_min & lt)

    if cuboid:
        offs = [(dx, dy, dz) for dz in (-1, 0, 1) for dy in (-1, 0, 1)
                for dx in (-1, 0, 1)]
        for off in offs:
            if off != (0, 0, 0):
                cmp(_neighbor(cur_s, xnb_s, *off, c0, TX))
        for off in offs:
            cmp(_neighbor(prev_s, xnb_s, *off, c0, TX))
            cmp(_neighbor(next_s, xnb_s, *off, c0, TX))
    else:
        for off in ((1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0),
                    (0, 0, -1), (0, 0, 1)):
            cmp(_neighbor(cur_s, xnb_s, *off, c0, TX))
        cmp(prev_s[:])
        cmp(next_s[:])

    thr = thr_ref[l]
    m = ((center > thr) | (center < -thr)) & (is_max | is_min)

    # Interior-only (sift.c:832-837): absolute x in [1, nx-2], same for
    # y and z — this also voids the clamped/wrapped neighbor reads. The
    # bounds tests live on per-axis broadcast vectors, NOT full
    # [TX, ny, nz] iotas: three full-size i32 iotas kept ~3 tile planes
    # live through the compare chain and blew the 16 MB scoped-VMEM
    # stack at 512^2 lane planes.
    ax = x0 + jax.lax.broadcasted_iota(jnp.int32, (TX, 1, 1), 0)
    ay = jax.lax.broadcasted_iota(jnp.int32, (1, ny, 1), 1)
    az = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nz), 2)
    m &= ((ax >= 1) & (ax <= nx - 2)) & ((ay >= 1) & (ay <= ny - 2)) \
        & ((az >= 1) & (az <= nz - 2))
    out_ref[0] = m.astype(jnp.int8)


def _slab_dmas(dog_ref, cur_v, prev_v, next_v, sem_v, l, i,
               *, TX, nx, cuboid):
    """The three slab copies for tile (l, i): cur (level l+1, +-1 x halo,
    DMA start clamped into the level), prev/next (levels l/l+2; full
    slabs only under cuboid — the face test reads just their centers)."""
    x0 = i * TX
    SX = TX + 2
    d0 = jnp.clip(x0 - 1, 0, nx - SX)
    return [
        pltpu.make_async_copy(
            dog_ref.at[l + 1, pl.ds(d0, SX)], cur_v, sem_v.at[0]),
        pltpu.make_async_copy(
            dog_ref.at[l, pl.ds(d0 if cuboid else x0,
                                SX if cuboid else TX)],
            prev_v, sem_v.at[1]),
        pltpu.make_async_copy(
            dog_ref.at[l + 2, pl.ds(d0 if cuboid else x0,
                                    SX if cuboid else TX)],
            next_v, sem_v.at[2]),
    ]


def _kernel(thr_ref, dog_ref, out_ref, cur_s, prev_s, next_s, xnb_s, sems,
            *, TX, nx, ny, nz, cuboid):
    """Single-buffered variant: DMA the slabs, wait, compute (the 512^2
    fallback — the double-buffered slabs don't fit scoped VMEM there)."""
    l = pl.program_id(0)
    i = pl.program_id(1)
    x0 = i * TX
    d0 = jnp.clip(x0 - 1, 0, nx - (TX + 2))
    c0 = x0 - d0                       # slab row of the first center row
    dmas = _slab_dmas(dog_ref, cur_s, prev_s, next_s, sems, l, i,
                      TX=TX, nx=nx, cuboid=cuboid)
    for d in dmas:
        d.start()
    for d in dmas:
        d.wait()
    _stencil_compute(thr_ref, l, x0, c0, cur_s, prev_s, next_s, xnb_s,
                     out_ref, TX=TX, nx=nx, ny=ny, nz=nz, cuboid=cuboid)


def _kernel_db(thr_ref, dog_ref, out_ref, cur_s, prev_s, next_s, xnb_s,
               sems, *, TX, nx, ny, nz, cuboid, gi):
    """Double-buffered variant: each step prefetches the NEXT tile's
    slabs into the other buffer before waiting on its own, so the HBM
    reads ride behind the compare chain instead of serializing with it
    (measured 3.45 -> ~1.3 ms for the 256^3 octave-0 mask). Slab
    scratches carry a leading [2] slot dim; grid iterates i fastest, so
    step = l * gi + i is sequential."""
    l = pl.program_id(0)
    i = pl.program_id(1)
    step = l * gi + i
    slot = jax.lax.rem(step, 2)
    nl = pl.num_programs(0)

    def dmas(l_, i_, s):
        return _slab_dmas(dog_ref, cur_s.at[s], prev_s.at[s],
                          next_s.at[s], sems.at[s], l_, i_,
                          TX=TX, nx=nx, cuboid=cuboid)

    @pl.when(step == 0)
    def _():
        for d in dmas(l, i, slot):
            d.start()

    @pl.when(step < nl * gi - 1)
    def _():
        wrap = i == gi - 1
        ni = jnp.where(wrap, 0, i + 1)
        nl_ = jnp.where(wrap, l + 1, l)
        for d in dmas(nl_, ni, 1 - slot):
            d.start()

    for d in dmas(l, i, slot):
        d.wait()

    x0 = i * TX
    d0 = jnp.clip(x0 - 1, 0, nx - (TX + 2))
    c0 = x0 - d0
    _stencil_compute(thr_ref, l, x0, c0, cur_s.at[slot], prev_s.at[slot],
                     next_s.at[slot], xnb_s, out_ref,
                     TX=TX, nx=nx, ny=ny, nz=nz, cuboid=cuboid)


def _pick_tx(nx: int, ny: int, nz: int, cuboid: bool,
             db: bool = False) -> tuple[int, bool]:
    """(TX, double_buffer) adapted to the 16 MB scoped-VMEM limit.

    Footprint per grid step, in [TX, ny, nz] f32 planes: scratch slabs
    4*TX + 2 (cur SX=TX+2, prev, next, xnb; +4 more under cuboid) PLUS
    ~5*TX of compare-chain liveness (center, is_max, is_min, the neighbor
    in flight, the threshold mask) — measured: at 512^2 lane planes TX=4
    and TX=2 both overflow (18.0 / 20.75 MB against the 16 MB limit)
    while TX=1 fits; 256^2 fits TX=4 with room. Double buffering doubles
    the slab planes (not liveness/xnb). TX must also divide nx (odd nx
    degrades to TX=1)."""
    def planes(tx, dbf):
        slabs = (3 * (tx + 2) if cuboid else tx + 2 + 2 * tx)
        return slabs * (2 if dbf else 1) + 6 * tx + (4 if cuboid else 2)

    budget = 15 * 2 ** 20 / (ny * nz * 4)
    # TX-major: a wider tile (fewer grid steps, less halo re-read) beats
    # double buffering at the same footprint; within a TX, prefer db.
    for TX in (4, 2, 1):
        if nx % TX:
            continue
        for dbf in ([True, False] if db else [False]):
            if planes(TX, dbf) <= budget:
                return TX, dbf
    return 1, False


@functools.partial(jax.jit,
                   static_argnames=("cuboid", "interpret", "db"))
def extrema_mask_pallas(dog_oct, thresholds, cuboid: bool = False,
                        interpret: bool = False,
                        db: bool | None = None):
    """Candidate mask int8[nl, nx, ny, nz] for one octave's DoG stack.

    dog_oct: f32[num_dog_levels, nx, ny, nz]; thresholds: f32[nl] peak
    thresholds (peak_thresh * per-level max |DoG|, sift.c:821-829).
    db: None = double-buffer the slab DMAs when they fit scoped VMEM;
    True/False force (A/B tooling — bit-identical either way).
    """
    Ld, nx, ny, nz = dog_oct.shape
    nl = Ld - 2
    TX, db = _pick_tx(nx, ny, nz, cuboid,
                      db=True if db is None else db)
    assert nx % TX == 0, (nx, TX)
    SX = TX + 2
    gi = nx // TX

    slab_lead = (2,) if db else ()
    kern = functools.partial(_kernel_db, gi=gi) if db else _kernel
    kernel = functools.partial(kern, TX=TX, nx=nx, ny=ny, nz=nz,
                               cuboid=cuboid)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nl, gi),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, TX, ny, nz), lambda l, i, t: (l, i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM(slab_lead + (SX, ny, nz), jnp.float32),
            pltpu.VMEM(slab_lead + (SX if cuboid else TX, ny, nz),
                       jnp.float32),
            pltpu.VMEM(slab_lead + (SX if cuboid else TX, ny, nz),
                       jnp.float32),
            pltpu.VMEM((TX, ny, nz), jnp.float32),
            pltpu.SemaphoreType.DMA(slab_lead + (3,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nl, nx, ny, nz), jnp.int8),
        interpret=interpret,
    )(thresholds, dog_oct)
