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


def _kernel(thr_ref, dog_ref, out_ref, cur_s, prev_s, next_s, xnb_s, sems,
            *, TX, nx, ny, nz, cuboid):
    l = pl.program_id(0)
    i = pl.program_id(1)

    x0 = i * TX
    # cur needs a +-1 x halo; clamp the DMA start into the level.
    SX = TX + 2
    d0 = jnp.clip(x0 - 1, 0, nx - SX)
    c0 = x0 - d0                       # slab row of the first center row
    dmas = [
        pltpu.make_async_copy(
            dog_ref.at[l + 1, pl.ds(d0, SX)], cur_s, sems.at[0]),
        pltpu.make_async_copy(
            dog_ref.at[l, pl.ds(d0 if cuboid else x0,
                                SX if cuboid else TX)],
            prev_s, sems.at[1]),
        pltpu.make_async_copy(
            dog_ref.at[l + 2, pl.ds(d0 if cuboid else x0,
                                    SX if cuboid else TX)],
            next_s, sems.at[2]),
    ]
    for d in dmas:
        d.start()
    for d in dmas:
        d.wait()

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


def _pick_tx(nx: int, ny: int, nz: int, cuboid: bool) -> int:
    """x-tile size, adapted to the 16 MB scoped-VMEM limit.

    Footprint per grid step, in [TX, ny, nz] f32 planes: scratch slabs
    4*TX + 2 (cur SX=TX+2, prev, next, xnb; +4 more under cuboid) PLUS
    ~5*TX of compare-chain liveness (center, is_max, is_min, the neighbor
    in flight, the threshold mask) — measured: at 512^2 lane planes TX=4
    and TX=2 both overflow (18.0 / 20.75 MB against the 16 MB limit)
    while TX=1 fits; 256^2 fits TX=4 with room. TX must also divide nx
    (odd nx degrades to TX=1)."""
    TX = 4
    while TX > 1 and (9 * TX + (6 if cuboid else 2)) * ny * nz * 4 \
            > 15 * 2 ** 20:
        TX //= 2
    while nx % TX:
        TX //= 2
    return TX


@functools.partial(jax.jit, static_argnames=("cuboid", "interpret"))
def extrema_mask_pallas(dog_oct, thresholds, cuboid: bool = False,
                        interpret: bool = False):
    """Candidate mask int8[nl, nx, ny, nz] for one octave's DoG stack.

    dog_oct: f32[num_dog_levels, nx, ny, nz]; thresholds: f32[nl] peak
    thresholds (peak_thresh * per-level max |DoG|, sift.c:821-829).
    """
    Ld, nx, ny, nz = dog_oct.shape
    nl = Ld - 2
    TX = _pick_tx(nx, ny, nz, cuboid)
    assert nx % TX == 0, (nx, TX)
    SX = TX + 2

    kernel = functools.partial(_kernel, TX=TX, nx=nx, ny=ny, nz=nz,
                               cuboid=cuboid)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nl, nx // TX),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, TX, ny, nz), lambda l, i, t: (l, i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((SX, ny, nz), jnp.float32),
            pltpu.VMEM((SX if cuboid else TX, ny, nz), jnp.float32),
            pltpu.VMEM((SX if cuboid else TX, ny, nz), jnp.float32),
            pltpu.VMEM((TX, ny, nz), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nl, nx, ny, nz), jnp.int8),
        interpret=interpret,
    )(thresholds, dog_oct)
