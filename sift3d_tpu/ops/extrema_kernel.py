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
reads each DoG tile once into VMEM, forms neighbors with static slices /
sublane/lane rolls (wrapped or repaired values are masked off by the
interior test), and writes the mask as int8 over the FULL level dims —
boundary zeroed — so the downstream compaction's ravel/reshape is
layout-free when nz % 128 == 0.

Tiling: x in TX-row slabs with a +-1 halo (DMA start clamped into the
level); y optionally in TYY-row tiles with an 8-row-aligned halo band
(512^2 lane planes don't fit whole-y slabs in scoped VMEM — the round-4
fallback degraded to TX=1 single-buffered, 28 ms at 512^3; y-tiling
restores wide double-buffered tiles). The double-buffered variant
prefetches the next grid step's slabs before waiting on its own, hiding
the HBM reads behind the compare chain (3.02 -> 2.05 ms at 256^3).

Outputs mask int8[nl, nx, ny, nz] in (l, x, y, z) order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_YH = 8     # y halo rows when y is tiled (8-aligned DMA starts; only
            # +-1 is consumed, the rest is alignment slack)


def _neighbor(tile, xnb, dx, dy, dz, c0, TX, YH, TYY):
    """Value of the slab shifted by (dx, dy, dz) relative to the center
    block rows [c0, c0+TX) x [YH, YH+TYY).

    c0 is 1 except at the volume's x edges, where the slab DMA was
    clamped (c0 = 0 left, 2 right) and the x-shifted slice start c0+dx
    can fall outside [0, 2]. Those cases repair the slice with a static
    axis-0 roll through the xnb scratch — the repaired rows are volume
    boundary rows, masked off by the interior test.

    y shifts: with a y halo (YH > 0) they are STATIC slices into the
    halo band (edge tiles carry garbage margin rows, consumed only at
    volume-boundary centers the interior test masks); without one
    (whole-y slabs) they are sublane rolls with the wrap masked the
    same way. z shifts are lane rolls (wrap likewise masked)."""
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
    if YH:
        v = v[:, YH + dy:YH + dy + TYY]
    elif dy:
        v = pltpu.roll(v, (-dy) % v.shape[1], 1)
    if dz:
        v = pltpu.roll(v, (-dz) % v.shape[2], 2)
    return v


def _stencil_compute(thr_ref, l, x0, c0, y0, cur_s, prev_s, next_s,
                     xnb_s, out_ref, *, TX, TYY, YH, nx, ny, nz, cuboid,
                     out_l=0, pn_halo=False):
    """Shared stencil body: compares + threshold + interior mask, from
    slab refs already resident in VMEM.

    pn_halo: prev/next slabs carry the same +-1 x halo as cur (the
    FUSED variant shares one slab per level across all center levels),
    so their face-mode center reads slice at c0; out_l selects the
    output block's level row."""
    center = cur_s[pl.ds(c0, TX), YH:YH + TYY] if YH \
        else cur_s[pl.ds(c0, TX)]
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
                cmp(_neighbor(cur_s, xnb_s, *off, c0, TX, YH, TYY))
        for off in offs:
            cmp(_neighbor(prev_s, xnb_s, *off, c0, TX, YH, TYY))
            cmp(_neighbor(next_s, xnb_s, *off, c0, TX, YH, TYY))
    else:
        for off in ((1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0),
                    (0, 0, -1), (0, 0, 1)):
            cmp(_neighbor(cur_s, xnb_s, *off, c0, TX, YH, TYY))
        if pn_halo:
            cmp(prev_s[pl.ds(c0, TX), YH:YH + TYY] if YH
                else prev_s[pl.ds(c0, TX)])
            cmp(next_s[pl.ds(c0, TX), YH:YH + TYY] if YH
                else next_s[pl.ds(c0, TX)])
        else:
            cmp(prev_s[:, YH:YH + TYY] if YH else prev_s[:])
            cmp(next_s[:, YH:YH + TYY] if YH else next_s[:])

    thr = thr_ref[l]
    m = ((center > thr) | (center < -thr)) & (is_max | is_min)

    # Interior-only (sift.c:832-837): absolute x in [1, nx-2], same for
    # y and z — this also voids the clamped/wrapped neighbor reads and
    # the y-margin garbage. The bounds tests live on per-axis broadcast
    # vectors, NOT full [TX, TYY, nz] iotas: three full-size i32 iotas
    # kept ~3 tile planes live through the compare chain and blew the
    # 16 MB scoped-VMEM stack at 512^2 lane planes.
    ax = x0 + jax.lax.broadcasted_iota(jnp.int32, (TX, 1, 1), 0)
    ay = y0 + jax.lax.broadcasted_iota(jnp.int32, (1, TYY, 1), 1)
    az = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nz), 2)
    m &= ((ax >= 1) & (ax <= nx - 2)) & ((ay >= 1) & (ay <= ny - 2)) \
        & ((az >= 1) & (az <= nz - 2))
    out_ref[out_l] = m.astype(jnp.int8)


def _copy_slab(src, dst, sem, xs, XL, ty, gj, act, *, TYY, YH, ny):
    """Start or wait ('act') the copy of x rows [xs, xs+XL) of one level
    into dst, with the y halo band at a FIXED center offset YH. Whole-y
    (gj == 1): one full copy. Tiled: the interior tile copies
    [ty*TYY - YH, ty*TYY + TYY + YH); the volume-edge tiles copy only
    the in-volume rows to the same static center offset, leaving their
    out-of-volume margin rows garbage — consumed only at the
    volume-boundary centers the interior test masks. start and wait
    must walk identical pl.when cases (the semaphore counts bytes of
    the case that actually ran)."""
    def go(cp):
        cp.start() if act == "start" else cp.wait()

    if gj == 1:
        go(pltpu.make_async_copy(src.at[pl.ds(xs, XL)], dst, sem))
        return
    TYS = TYY + 2 * YH
    bot, top = ty == 0, ty == gj - 1
    interior = jnp.logical_not(bot | top)

    @pl.when(bot)
    def _():
        go(pltpu.make_async_copy(
            src.at[pl.ds(xs, XL), pl.ds(0, TYS - YH)],
            dst.at[:, pl.ds(YH, TYS - YH)], sem))

    @pl.when(interior)
    def _():
        ys = pl.multiple_of(ty * TYY - YH, 8)
        go(pltpu.make_async_copy(
            src.at[pl.ds(xs, XL), pl.ds(ys, TYS)], dst, sem))

    @pl.when(top)
    def _():
        go(pltpu.make_async_copy(
            src.at[pl.ds(xs, XL), pl.ds(ny - (TYS - YH), TYS - YH)],
            dst.at[:, pl.ds(0, TYS - YH)], sem))


def _slab_dmas(dog_ref, cur_v, prev_v, next_v, sem_v, l, i, ty, act,
               *, TX, TYY, YH, nx, ny, gj, cuboid):
    """Start or wait the three slab copies for tile (l, i, ty): cur
    (level l+1, +-1 x halo, DMA start clamped into the level),
    prev/next (levels l/l+2; full x slabs only under cuboid — the face
    test reads just their centers)."""
    x0 = i * TX
    SX = TX + 2
    d0 = jnp.clip(x0 - 1, 0, nx - SX)
    xp = d0 if cuboid else x0
    XL = SX if cuboid else TX
    _copy_slab(dog_ref.at[l + 1], cur_v, sem_v.at[0], d0, SX, ty, gj,
               act, TYY=TYY, YH=YH, ny=ny)
    _copy_slab(dog_ref.at[l], prev_v, sem_v.at[1], xp, XL, ty, gj,
               act, TYY=TYY, YH=YH, ny=ny)
    _copy_slab(dog_ref.at[l + 2], next_v, sem_v.at[2], xp, XL, ty, gj,
               act, TYY=TYY, YH=YH, ny=ny)


def _tile_origin(i, ty, *, TX, TYY, nx):
    """(x0, c0, y0) of tile (i, ty): absolute origins plus the slab row
    of the first center x row (the x slab DMA start is clamped into the
    level; the y center offset is the constant YH by construction)."""
    x0 = i * TX
    d0 = jnp.clip(x0 - 1, 0, nx - (TX + 2))
    c0 = x0 - d0
    y0 = ty * TYY
    return x0, c0, y0


def _kernel(thr_ref, dog_ref, out_ref, cur_s, prev_s, next_s, xnb_s, sems,
            *, TX, TYY, YH, nx, ny, nz, gj, cuboid):
    """Single-buffered variant: DMA the slabs, wait, compute."""
    l = pl.program_id(0)
    i = pl.program_id(1)
    ty = pl.program_id(2)
    for act in ("start", "wait"):
        _slab_dmas(dog_ref, cur_s, prev_s, next_s, sems, l, i, ty, act,
                   TX=TX, TYY=TYY, YH=YH, nx=nx, ny=ny, gj=gj,
                   cuboid=cuboid)
    x0, c0, y0 = _tile_origin(i, ty, TX=TX, TYY=TYY, nx=nx)
    _stencil_compute(thr_ref, l, x0, c0, y0, cur_s, prev_s, next_s,
                     xnb_s, out_ref, TX=TX, TYY=TYY,
                     YH=(YH if gj > 1 else 0),
                     nx=nx, ny=ny, nz=nz, cuboid=cuboid)


def _kernel_db(thr_ref, dog_ref, out_ref, cur_s, prev_s, next_s, xnb_s,
               sems, *, TX, TYY, YH, nx, ny, nz, gi, gj, cuboid):
    """Double-buffered variant: each step prefetches the NEXT tile's
    slabs into the other buffer before waiting on its own, so the HBM
    reads ride behind the compare chain instead of serializing with it.
    Slab scratches carry a leading [2] slot dim; the grid iterates
    (l, i, ty) with ty fastest, so step = (l*gi + i)*gj + ty is
    sequential."""
    l = pl.program_id(0)
    i = pl.program_id(1)
    ty = pl.program_id(2)
    nl = pl.num_programs(0)
    step = (l * gi + i) * gj + ty
    slot = jax.lax.rem(step, 2)

    def dmas(l_, i_, t_, s, act):
        _slab_dmas(dog_ref, cur_s.at[s], prev_s.at[s], next_s.at[s],
                   sems.at[s], l_, i_, t_, act,
                   TX=TX, TYY=TYY, YH=YH, nx=nx, ny=ny, gj=gj,
                   cuboid=cuboid)

    @pl.when(step == 0)
    def _():
        dmas(l, i, ty, slot, "start")

    @pl.when(step < nl * gi * gj - 1)
    def _():
        wrap_t = ty == gj - 1
        nt = jnp.where(wrap_t, 0, ty + 1)
        wrap_i = wrap_t & (i == gi - 1)
        ni = jnp.where(wrap_t, jnp.where(wrap_i, 0, i + 1), i)
        nl_ = jnp.where(wrap_i, l + 1, l)
        dmas(nl_, ni, nt, 1 - slot, "start")

    dmas(l, i, ty, slot, "wait")

    x0, c0, y0 = _tile_origin(i, ty, TX=TX, TYY=TYY, nx=nx)
    _stencil_compute(thr_ref, l, x0, c0, y0, cur_s.at[slot],
                     prev_s.at[slot], next_s.at[slot], xnb_s, out_ref,
                     TX=TX, TYY=TYY, YH=(YH if gj > 1 else 0),
                     nx=nx, ny=ny, nz=nz, cuboid=cuboid)


def _lvl_dmas(dog_ref, lvl_s, sem_v, i, ty, act, *, Ld, TX, TYY, YH,
              nx, ny, gj):
    """Start or wait the Ld level-slab copies for tile (i, ty) of the
    FUSED variant: EVERY level carries the same +-1 x-halo slab (it
    serves as `cur` for one center level and prev/next for its
    neighbors), DMA start clamped into the level like `cur`'s."""
    x0 = i * TX
    SX = TX + 2
    d0 = jnp.clip(x0 - 1, 0, nx - SX)
    for ld in range(Ld):
        _copy_slab(dog_ref.at[ld], lvl_s.at[ld], sem_v.at[ld], d0, SX,
                   ty, gj, act, TYY=TYY, YH=YH, ny=ny)


def _kernel_fused_db(thr_ref, dog_ref, out_ref, lvl_s, xnb_s, sems, *,
                     Ld, TX, TYY, YH, nx, ny, nz, gi, gj, cuboid):
    """Fused-octave double-buffered variant: one grid over (i, ty)
    spatial tiles; each step DMAs ALL Ld DoG level slabs once and
    computes every center level's mask from them — each DoG voxel is
    read ~Ld*(TX+2)/(TX*nl) times instead of ~3x (a level is prev, cur
    AND next of adjacent center levels, but the per-level grid re-read
    it for each role). Per-tile traffic drops ~30% at 256^3 and the DMA
    issue count per tile falls 3*nl -> Ld."""
    i = pl.program_id(0)
    ty = pl.program_id(1)
    nl = Ld - 2
    step = i * gj + ty
    slot = jax.lax.rem(step, 2)

    def dmas(i_, t_, s, act):
        _lvl_dmas(dog_ref, lvl_s.at[s], sems.at[s], i_, t_, act,
                  Ld=Ld, TX=TX, TYY=TYY, YH=YH, nx=nx, ny=ny, gj=gj)

    @pl.when(step == 0)
    def _():
        dmas(i, ty, slot, "start")

    @pl.when(step < gi * gj - 1)
    def _():
        wrap_t = ty == gj - 1
        nt = jnp.where(wrap_t, 0, ty + 1)
        ni = jnp.where(wrap_t, i + 1, i)
        dmas(ni, nt, 1 - slot, "start")

    dmas(i, ty, slot, "wait")

    x0, c0, y0 = _tile_origin(i, ty, TX=TX, TYY=TYY, nx=nx)
    for l in range(nl):
        _stencil_compute(thr_ref, l, x0, c0, y0, lvl_s.at[slot, l + 1],
                         lvl_s.at[slot, l], lvl_s.at[slot, l + 2],
                         xnb_s, out_ref, TX=TX, TYY=TYY,
                         YH=(YH if gj > 1 else 0), nx=nx, ny=ny, nz=nz,
                         cuboid=cuboid, out_l=l, pn_halo=True)


def _pick_cfg(nx: int, ny: int, nz: int, cuboid: bool,
              db: bool = True, nl: int = 3):
    """(TX, TYY, double_buffer, fused) adapted to the 16 MB scoped-VMEM
    limit, minimizing HBM slab reads per center voxel (x1.5 when
    single-buffered — measured wall penalty at 256^3).

    Footprint per grid step, in f32 elements x nz: slabs (doubled when
    double-buffered) + xnb TX*TYS + ~6*TX*TYY compare-chain liveness +
    the (double-buffered int8) output blocks. Per-level mode reads
    (TX+2 + 2*TXc)*TYS per center level; FUSED mode reads all Ld level
    slabs once per spatial tile ((nl+2)*(TX+2)*TYS serving nl center
    levels — each level is prev, cur AND next of adjacent centers), a
    ~30% traffic cut at 256^3 when its larger scratch fits. Candidates:
    TX in {8, 4, 2, 1} x TYY in whole-ny or halved-down y tiles (>= 64
    rows, 8-aligned); the cheapest feasible configuration wins (512^2
    lane planes: whole-y forced TX=1 single-buffered, 28 ms at 512^3 —
    y-tiling restores TX=8 double-buffered)."""
    budget = 15 * 2 ** 20 / (nz * 4)
    tyy_opts = [ny]
    t = ny
    while t % 2 == 0 and t // 2 >= 64 and t // 2 % 8 == 0:
        t //= 2
        tyy_opts.append(t)
    best = None
    for TX in (8, 4, 2, 1):
        if nx % TX:
            continue
        TXc = TX + 2 if cuboid else TX
        for TYY in tyy_opts:
            TYS = TYY + 2 * _YH if TYY != ny else TYY
            fixed = TX * TYS + 6 * TX * TYY
            for fused in (True, False):
                slabs = ((nl + 2) * (TX + 2) * TYS if fused
                         else (TX + 2 + 2 * TXc) * TYS)
                out = (nl if fused else 1) * TX * TYY // 2
                for dbf in ([True, False] if db else [False]):
                    if fused and not dbf:
                        continue  # fused is only built double-buffered
                    el = slabs * (2 if dbf else 1) + fixed + out
                    if el > budget:
                        continue
                    reads = slabs / ((nl if fused else 1) * TX * TYY)
                    cost = reads * (1.0 if dbf else 1.5)
                    if best is None or cost < best[0]:
                        best = (cost, TX, TYY, dbf, fused)
    if best is None:
        return 1, ny, False, False
    return best[1], best[2], best[3], best[4]


@functools.partial(jax.jit,
                   static_argnames=("cuboid", "interpret", "db", "cfg"))
def extrema_mask_pallas(dog_oct, thresholds, cuboid: bool = False,
                        interpret: bool = False,
                        db: bool | None = None,
                        cfg: tuple | None = None):
    """Candidate mask int8[nl, nx, ny, nz] for one octave's DoG stack.

    dog_oct: f32[num_dog_levels, nx, ny, nz]; thresholds: f32[nl] peak
    thresholds (peak_thresh * per-level max |DoG|, sift.c:821-829).
    db: None = double-buffer the slab DMAs when they fit scoped VMEM;
    True/False force. cfg: force (TX, TYY, db) or (TX, TYY, db, fused)
    directly (testing/A-B — every feasible configuration is
    bit-identical).
    """
    Ld, nx, ny, nz = dog_oct.shape
    nl = Ld - 2
    picked = cfg or _pick_cfg(nx, ny, nz, cuboid,
                              db=True if db is None else db, nl=nl)
    TX, TYY, dbf = picked[:3]
    fused = picked[3] if len(picked) > 3 else False
    assert nx % TX == 0 and ny % TYY == 0, (nx, TX, ny, TYY)
    assert not fused or dbf, "fused variant is only built double-buffered"
    SX = TX + 2
    gi = nx // TX
    gj = ny // TYY
    TYS = TYY + 2 * _YH if gj > 1 else ny
    TXc = SX if cuboid else TX

    slab_lead = (2,) if dbf else ()
    if fused:
        kernel = functools.partial(
            _kernel_fused_db, Ld=Ld, TX=TX, TYY=TYY, YH=_YH, nx=nx,
            ny=ny, nz=nz, gi=gi, gj=gj, cuboid=cuboid)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(gi, gj),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((nl, TX, TYY, nz),
                                   lambda i, t, w: (0, i, t, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, Ld, SX, TYS, nz), jnp.float32),
                pltpu.VMEM((TX, TYS, nz), jnp.float32),
                pltpu.SemaphoreType.DMA((2, Ld)),
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nl, nx, ny, nz), jnp.int8),
            interpret=interpret,
        )(thresholds, dog_oct)
    kern = (functools.partial(_kernel_db, gi=gi) if dbf else _kernel)
    kernel = functools.partial(kern, TX=TX, TYY=TYY, YH=_YH, nx=nx,
                               ny=ny, nz=nz, gj=gj, cuboid=cuboid)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nl, gi, gj),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, TX, TYY, nz),
                               lambda l, i, t, w: (l, i, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM(slab_lead + (SX, TYS, nz), jnp.float32),
            pltpu.VMEM(slab_lead + (TXc, TYS, nz), jnp.float32),
            pltpu.VMEM(slab_lead + (TXc, TYS, nz), jnp.float32),
            pltpu.VMEM((TX, TYS, nz), jnp.float32),
            pltpu.SemaphoreType.DMA(slab_lead + (3,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nl, nx, ny, nz), jnp.int8),
        interpret=interpret,
    )(thresholds, dog_oct)
