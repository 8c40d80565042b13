"""Pallas TPU kernel: icosahedral descriptor histogram accumulation.

The descriptor hot loop turns each window voxel's (rotated, weighted)
gradient and spatial bin coordinates into a 24-sparse contribution to the
[64 x 12] histogram. The XLA formulation materializes [N, 60]-shaped
intermediates in HBM per chunk; this kernel keeps everything in VMEM:

  inputs per voxel (transposed, lanes = voxels):
     grot  [3, N]   gradient rotated into the keypoint frame, Gaussian
                    weighted, zeroed where the voxel is masked out
     vbins [3, N]   spatial bin coordinates in [0, 4)
  constants (antipodal-pair layout, geometry.PAIRED_LAYOUT):
     mt    [40, 3]  Moller-Trumbore det/bary rows for 10 face pairs
                    (applied as exact-f32 VPU broadcast FMAs, not a dot)
     pri   [10, 3]  (first, second) face priorities + is-Y-shared flag
     eb    [36, 20] vertex-slot one-hots (E_BARY stacked, paired order)
  output:
     hist  [16, 48] = [(cz,cy), (cx,v)] partial histogram

Grid: one keypoint per grid row x voxel tiles; the histogram accumulates in
a VMEM scratch across the voxel tiles and is written once at the end. The
per-face hit tests replicate descriptor.py's division-free semantics
exactly (first valid face in face order wins, sift.c:1254-1291).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import geometry
from ..params import ICOS_NVERT, NHIST_PER_DIM

NB = NHIST_PER_DIM


# Voxel-tile granularity of the prep stage's any-valid flags (and the
# kernels' grid tile). Prep pads windows to a multiple of 8192, so this
# always divides N.
FLAG_TILE = 2048


def _paired_constants():
    """Device constants for the antipodal-pair face layout:
    (mt40 [40, 3], pri [10, 3], eb_paired [36, 20]) — see _face_hist."""
    lay = geometry.PAIRED_LAYOUT
    assert lay is not None, (
        "geometry.PAIRED_LAYOUT unavailable (icosahedron constants lost "
        "central symmetry?) — use the XLA descriptor path")
    mt = jnp.asarray(lay["mt40"])
    pri = jnp.asarray(np.concatenate(
        [lay["pri"], lay["ta"][:, None].astype(np.float32)], axis=1))
    eb = jnp.asarray(lay["eb_paired"])
    return mt, pri, eb


def _kernel(flags_ref, grot_ref, vbins_ref, *rest, affine=False):
    if affine:
        aff_ref, mt_ref, pri_ref, eb_ref, out_ref, acc = rest
    else:
        mt_ref, pri_ref, eb_ref, out_ref, acc = rest
    k = pl.program_id(0)
    c = pl.program_id(1)
    n_c = pl.num_programs(1)

    @pl.when(c == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    @pl.when(flags_ref[k, c] > 0)
    def _():
        vb = (_affine_vb(aff_ref, k, vbins_ref) if affine
              else vbins_ref[0])
        ZY, P = _face_hist(grot_ref[0], vb, mt_ref[:],
                           pri_ref[:], eb_ref[:])
        acc[:] += jax.lax.dot_general(
            ZY, P, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(c == n_c - 1)
    def _():
        out_ref[0] = acc[:]


def _face_hist(g, vb, mt, pri, eb):
    """Shared per-keypoint math: (ZY [16, T], P [48, T]) from g/vb [3, T].

    Exact semantics of descriptor.py's XLA path (first valid face in face
    order wins, division-free hit tests, sift.c:1254-1291), computed on
    the ANTIPODAL-PAIR layout (geometry.PAIRED_LAYOUT): the icosahedron's
    20 faces form 10 pairs whose Moller-Trumbore rows are exact f32
    negations, at most one face of a pair can pass the det >= bary_eps
    test, and K_CONST > 0 reduces the reference's k-sign test to
    det >= 0 — so face selection runs on [10, T] pair rows (40 geometry
    rows) instead of [20, T]/[60, T], bit-identically. mt = mt40 [40, 3];
    pri [10, 3] = (first-face priority, second-face priority, is-Y-shared
    flag); eb [36, 20] = vertex-slot one-hots (E_BARY stacked) with
    columns in [firsts..., seconds...] pair order, letting the vertex
    scatter run as one MXU dot against the face one-hot."""
    T = g.shape[1]
    eps = jnp.float32(1.1920928955078125e-06)  # bary_eps (sift.c:40)

    # Face-geometry precision is load-bearing: the MXU's default single
    # bf16 pass puts ~4e-3 relative noise on dets/bary numerators —
    # measured as a 0.4% median descriptor error floor vs the C oracle
    # (>1% on edge-clipped windows), invisible at 64^3 test sizes. The
    # dets feed DISCONTINUOUS consumers (bary_eps hit tests, the
    # face-order short-circuit, the det sign, the bary denominator) where
    # even 1e-5 noise flips whole contributions. All 40 rows compute
    # exactly in f32 on the VPU (5 broadcast FMA ops on [40, T]): a
    # [40, 3] @ [3, T] MXU dot would waste 125/128 of the systolic depth,
    # so the broadcast chain is both cheaper and exact (HIGHEST-precision
    # dot: +9% dense bench; bf16x3-split dot: ~1e-5 numerator noise,
    # measured parity-neutral but strictly worse than free).
    F = (mt[:, 0:1] * g[0][None, :]
         + mt[:, 1:2] * g[1][None, :]
         + mt[:, 2:3] * g[2][None, :])                        # [40, T]
    dp, shr, n1, n2 = F[0:10], F[10:20], F[20:30], F[30:40]

    # Pick each pair's candidate face by the det sign (the other face of
    # the pair cannot pass det >= eps). d_eff/shr_eff are the candidate's
    # raw det / shared numerator — exact f32 negations when the second
    # face is picked; alt is its other numerator (own exact row).
    sel = dp >= 0.0
    s10 = jnp.where(sel, 1.0, -1.0)
    d_eff = dp * s10
    shr_eff = shr * s10
    alt = jnp.where(sel, n1, n2)
    taf = pri[:, 2:3]                   # 1.0 where the shared row is Y
    ynum = taf * shr_eff + (1.0 - taf) * alt
    znum = taf * alt + (1.0 - taf) * shr_eff
    neg_eps_d = -eps * d_eff
    valid = ((d_eff >= eps) & (shr_eff >= neg_eps_d) & (alt >= neg_eps_d)
             & (d_eff - ynum - znum >= neg_eps_d))            # [10, T]

    prisel = jnp.where(sel, pri[:, 0:1], pri[:, 1:2])         # [10, T]
    cand = jnp.where(valid, prisel, 20.0)
    first = jnp.min(cand, axis=0)                             # [T]
    anyf = first < 20.0
    poh = (valid & (prisel == first[None, :])).astype(jnp.float32)

    det_s = jnp.sum(poh * d_eff, axis=0)
    yn_s = jnp.sum(poh * ynum, axis=0)
    zn_s = jnp.sum(poh * znum, axis=0)
    # det_s == 0 iff no face fired; mag == 0 kills those lanes either way.
    inv = jnp.where(det_s != 0.0, 1.0 / det_s, 0.0)
    ys = yn_s * inv
    zs = zn_s * inv
    xs = 1.0 - ys - zs

    gsq = g[0] * g[0] + g[1] * g[1] + g[2] * g[2]
    mag = jnp.where(anyf & (gsq >= eps), jnp.sqrt(gsq), 0.0)     # [T]

    # Face one-hot in the paired column order [firsts..., seconds...].
    sel_f = s10 * 0.5 + 0.5
    oh_first = poh * sel_f
    onehotf = jnp.concatenate([oh_first, poh - oh_first], axis=0)

    # Vertex scatter on the MXU: G[36, T] = eb @ onehot; rows j*12..j*12+11
    # hold the vertex one-hot of bary slot j for each voxel's face.
    G = jax.lax.dot_general(eb, onehotf,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    B = (G[0:ICOS_NVERT] * xs[None, :]
         + G[ICOS_NVERT:2 * ICOS_NVERT] * ys[None, :]
         + G[2 * ICOS_NVERT:] * zs[None, :]) * mag[None, :]      # [12, T]

    iota4 = jax.lax.broadcasted_iota(jnp.int32, (NB, T), 0)

    def sparse4(v):                                              # [4, T]
        base = jnp.floor(v)
        fr = v - base
        base_i = base.astype(jnp.int32)[None, :]
        return (jnp.where(iota4 == base_i, 1.0 - fr[None, :], 0.0)
                + jnp.where(iota4 == base_i + 1, fr[None, :], 0.0))

    Sx = sparse4(vb[0])
    Sy = sparse4(vb[1])
    Sz = sparse4(vb[2])

    ZY = (Sz[:, None, :] * Sy[None, :, :]).reshape(NB * NB, T)
    P = (Sx[:, None, :] * B[None, :, :]).reshape(NB * ICOS_NVERT, T)
    return ZY, P


def _affine_vb(aff_ref, kp, xyz_ref):
    """Rebuild a keypoint's spatial-bin rows from its affine coefficients.

    vbins is affine in the window-local voxel coordinates (descriptor.py
    _prep_window: vb_j = ((axes - c) . u R[:, j] + hw) * fctr with
    axes = start + 1 + iota), so instead of streaming three [N] f32
    arrays per keypoint from HBM the kernel reads 12 scalars
    (a_j, bx_j, by_j, bz_j per bin axis j) from SMEM and evaluates
    vb_j = a_j + bx_j x + by_j y + bz_j z against ONE [3, N] coordinate
    array shared by every keypoint of the call. The evaluation order
    differs from the XLA path by distribution of the products, so vb
    moves by ~ulps — sparse4's interpolation weights are continuous in
    vb (including across floor boundaries) and the mask that zeroes
    out-of-range/out-of-sphere voxels is still decided in prep on the
    ORIGINAL formula (it zeroes grot), so descriptors move by O(1e-6)
    relative, not discontinuously."""
    x, y, z = xyz_ref[0], xyz_ref[1], xyz_ref[2]
    return tuple(
        aff_ref[kp, 4 * j] + aff_ref[kp, 4 * j + 1] * x
        + aff_ref[kp, 4 * j + 2] * y + aff_ref[kp, 4 * j + 3] * z
        for j in range(3))


_G = 8  # keypoints packed per grid step in the batched kernel


def _kernel_packed(words_ref, grot_ref, vbins_ref, *rest,
                   mxu_prec=None, affine=False):
    """8 keypoints per grid step; their [16,T]x[T,48] histogram
    contractions fuse into ONE [128,T]x[T,384] MXU pass (only the 8
    diagonal [16,48] blocks of the result are used; the packing still wins
    because the MXU tile is 128 wide — 8 separate [16,T]x[T,48] dots would
    each burn a full tile pass over T).

    words_ref (scalar-prefetched i32[K/G, C]) bit-packs, per keypoint pack
    and voxel tile, whether each of the G keypoints has ANY unmasked voxel
    in the tile (bit j = keypoint j of the pack). Masked voxels contribute
    exactly zero (prep zeroes their gradients), so empty tiles — the
    bounding-cube corners outside the keypoint's sphere, the window margin
    of small-scale keypoints in mixed-level windows, and entire padding
    slots — can skip the per-voxel VPU math, which is the kernel's
    bottleneck. A skipped keypoint's ZY scratch block is zeroed instead
    (its diagonal product block is then zero; the off-diagonal blocks of
    the packed contraction are never read), tracked by the `dirty` SMEM
    scratch so a run of empty tiles zeroes it only once. When all G
    keypoints skip a tile, the MXU contraction is skipped too.

    mxu_prec controls only this contraction (Precision.DEFAULT = one bf16
    MXU pass with f32 accumulation, the historical behavior;
    Precision.HIGHEST = 6-pass f32, ~1.6x slower kernel, <= 3e-4 rel-L2
    apart — tools/desc_bf16.py). All per-voxel math — face selection in
    particular, whose eps comparisons decide bin assignment — stays f32.

    affine=True swaps the per-keypoint vbins blocks for the shared
    coordinate array (vbins_ref is then xyz [3, TILE]) plus per-keypoint
    affine coefficients in SMEM (aff_ref [K, 12]) — see _affine_vb."""
    if affine:
        (aff_ref, mt_ref, pri_ref, eb_ref, out_ref, acc, zy_s, p_s,
         dirty) = rest
    else:
        mt_ref, pri_ref, eb_ref, out_ref, acc, zy_s, p_s, dirty = rest
    k = pl.program_id(0)
    c = pl.program_id(1)
    n_c = pl.num_programs(1)

    @pl.when(c == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
        # p_s must not hold uninitialized memory for keypoints whose first
        # tiles are skipped: the contraction multiplies it by the zeroed ZY
        # block, and 0 x NaN/inf garbage would poison the accumulator.
        p_s[:] = jnp.zeros_like(p_s)
        for j in range(_G):
            dirty[j] = 1

    word = words_ref[k, c]

    @pl.when(word > 0)
    def _():
        mt = mt_ref[:]
        pri = pri_ref[:]
        eb = eb_ref[:]
        for j in range(_G):
            f = (word >> j) & 1

            @pl.when(f > 0)
            def _(j=j):
                vb = (_affine_vb(aff_ref, k * _G + j, vbins_ref)
                      if affine else vbins_ref[j])
                ZY, P = _face_hist(grot_ref[j], vb, mt, pri, eb)
                zy_s[j * NB * NB:(j + 1) * NB * NB, :] = ZY
                p_s[j * NB * ICOS_NVERT:(j + 1) * NB * ICOS_NVERT, :] = P
                dirty[j] = 1

            @pl.when((f == 0) & (dirty[j] == 1))
            def _(j=j):
                zy_s[j * NB * NB:(j + 1) * NB * NB, :] = jnp.zeros(
                    (NB * NB, zy_s.shape[1]), jnp.float32)
                dirty[j] = 0

        acc[:] += jax.lax.dot_general(
            zy_s[:], p_s[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=mxu_prec)

    @pl.when(c == n_c - 1)
    def _():
        for j in range(_G):
            out_ref[j] = acc[j * NB * NB:(j + 1) * NB * NB,
                             j * NB * ICOS_NVERT:(j + 1) * NB * ICOS_NVERT]


@functools.partial(jax.jit,
                   static_argnames=("interpret", "tile", "precision"))
def desc_hist_pallas(grot, vbins=None, flags=None,
                     interpret: bool = False,
                     tile: int | None = None, precision: str = "highest",
                     aff=None, xyz=None):
    """Histograms [K, 16, 48] from grot/vbins [K, 3, N] (N % 512 == 0).

    flags: optional i32[K, N // FLAG_TILE] per-voxel-tile any-valid marks
    from the prep stage (see _prep_window); empty tiles skip the per-voxel
    VPU math. None processes every tile (same results — masked voxels
    contribute exactly zero either way).

    Affine-vbins mode (DetectorParams.desc_vbins="affine"): pass
    aff f32[K, 12] + xyz f32[3, N] instead of vbins — the kernel rebuilds
    each keypoint's spatial-bin rows from 12 SMEM scalars against the
    shared coordinate array (see _affine_vb), removing the per-keypoint
    vbins flatten relayout in prep and half the kernel's HBM input.

    precision: "default" = one bf16 MXU pass with f32 accumulation for the
    histogram contraction (historical behavior); "highest" = 6-pass f32
    (DetectorParams.desc_precision)."""
    K, _, N = grot.shape
    assert (vbins is None) != (aff is None), "pass exactly one of vbins/aff"
    if aff is not None:
        assert xyz is not None and xyz.shape == (3, N) \
            and aff.shape == (K, 12), (aff.shape, xyz.shape)
    if flags is None:
        flags = jnp.ones((K, N // FLAG_TILE), jnp.int32)
    if K % _G == 0:
        return _desc_hist_packed(grot, vbins, flags, interpret, tile,
                                 precision, aff, xyz)
    return _desc_hist_single(grot, vbins, flags, interpret, aff, xyz)


def _desc_hist_packed(grot, vbins, flags, interpret: bool = False,
                      tile: int | None = None,
                      precision: str = "highest", aff=None, xyz=None):
    K, _, N = grot.shape
    # 8192 exceeds the 16 MB scoped-VMEM limit in f32 (p_s scratch
    # [384, TILE]); the kernel is MXU-bound on the contraction, and larger
    # tiles measured no faster (tools/desc_micro.py).
    TILE = tile or FLAG_TILE
    assert N % TILE == 0 and flags.shape == (K, N // TILE), (
        grot.shape, flags.shape, TILE)
    mxu_prec = (jax.lax.Precision.DEFAULT if precision == "default"
                else jax.lax.Precision.HIGHEST)
    affine = aff is not None
    kernel = functools.partial(_kernel_packed, mxu_prec=mxu_prec,
                               affine=affine)

    mt, pri, eb = _paired_constants()

    # Bit-pack the per-keypoint tile flags of each G-pack into one int32
    # per (pack, tile); the word rides in as a scalar-prefetch argument
    # (SMEM), the only memory the scalar core can branch on.
    words = jnp.sum(
        flags.reshape(K // _G, _G, -1)
        << jnp.arange(_G, dtype=jnp.int32)[None, :, None],
        axis=1, dtype=jnp.int32)

    grid = (K // _G, N // TILE)
    M_zy, M_p = _G * NB * NB, _G * NB * ICOS_NVERT
    if affine:
        vb_specs = [
            pl.BlockSpec((3, TILE), lambda k, c, w: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(aff.shape, lambda k, c, w: (0, 0),
                         memory_space=pltpu.SMEM),
        ]
        vb_args = (xyz, aff)
    else:
        vb_specs = [
            pl.BlockSpec((_G, 3, TILE), lambda k, c, w: (k, 0, c),
                         memory_space=pltpu.VMEM),
        ]
        vb_args = (vbins,)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_G, 3, TILE), lambda k, c, w: (k, 0, c),
                         memory_space=pltpu.VMEM),
            *vb_specs,
            pl.BlockSpec((40, 3), lambda k, c, w: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((10, 3), lambda k, c, w: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((36, 20), lambda k, c, w: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_G, NB * NB, NB * ICOS_NVERT),
                               lambda k, c, w: (k, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((M_zy, M_p), jnp.float32),
            pltpu.VMEM((M_zy, TILE), jnp.float32),
            pltpu.VMEM((M_p, TILE), jnp.float32),
            pltpu.SMEM((_G,), jnp.int32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, NB * NB, NB * ICOS_NVERT),
                                       jnp.float32),
        interpret=interpret,
    )(words, grot, *vb_args, mt, pri, eb)


def _desc_hist_single(grot, vbins, flags, interpret: bool = False,
                      aff=None, xyz=None):
    K, _, N = grot.shape
    TILE = FLAG_TILE
    assert N % TILE == 0 and flags.shape == (K, N // TILE), (
        grot.shape, flags.shape, TILE)

    mt, pri, eb = _paired_constants()
    affine = aff is not None

    if affine:
        vb_specs = [
            pl.BlockSpec((3, TILE), lambda k, c, f: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(aff.shape, lambda k, c, f: (0, 0),
                         memory_space=pltpu.SMEM),
        ]
        vb_args = (xyz, aff)
    else:
        vb_specs = [
            pl.BlockSpec((1, 3, TILE), lambda k, c, f: (k, 0, c),
                         memory_space=pltpu.VMEM),
        ]
        vb_args = (vbins,)
    grid = (K, N // TILE)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3, TILE), lambda k, c, f: (k, 0, c),
                         memory_space=pltpu.VMEM),
            *vb_specs,
            pl.BlockSpec((40, 3), lambda k, c, f: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((10, 3), lambda k, c, f: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((36, 20), lambda k, c, f: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, NB * NB, NB * ICOS_NVERT),
                               lambda k, c, f: (k, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NB * NB, NB * ICOS_NVERT), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_kernel, affine=affine),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, NB * NB, NB * ICOS_NVERT),
                                       jnp.float32),
        interpret=interpret,
    )(flags, grot, *vb_args, mt, pri, eb)
