"""Icosahedral gradient-orientation-histogram descriptors.

Reference semantics (extract_descrip and helpers,
/root/reference/sift3d/sift.c:1295-1536): for each keypoint, on its Gaussian
pyramid level, iterate a sphere of radius 2 * (7.0711 * sd) in real-world
units; rotate each voxel offset into the keypoint frame by R^T; compute 4x4x4
spatial bins over the cube inscribed in the sphere and reject voxels outside
it (sift.c:1483-1492); Gaussian-weight the gradient, rotate it by R^T, and
accumulate magnitude into a [64 x 12] histogram by trilinear spatial
interpolation (8 cells) x barycentric interpolation over the 3 vertices of
the icosahedron face pierced by the gradient (sift.c:1340-1397). Then
L2-normalize, truncate at 0.2*128/768, renormalize (sift.c:1508-1526).
Descriptor coordinates are scaled to base-octave voxels (sift.c:1528-1533).

TPU formulation: the per-voxel scatter factorizes into dense contractions.
Per voxel the contribution is an outer product
    (2-sparse over 4 x-bins) x (2-sparse over 4 y-bins) x
    (2-sparse over 4 z-bins) x (3-sparse over 12 vertex bins, scaled by
     magnitude and mask),
so a chunk of N voxels accumulates into the histogram with three small
matmuls: face selection for all 20 faces at once via one [N,3]x[3,60] matmul
(geometry.MT_MATRIX), the vertex weights via [N,60]x[60,12] (E_BARY_2D), and
the final reduction via [4,N]x[N,192]. Everything runs on the MXU; there is
no scatter anywhere.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import geometry
from .params import DetectorParams, NHIST_PER_DIM, ICOS_NVERT
from .windows import chunked_vmap, gather_window, window_extent

_SQRT2 = math.sqrt(2.0)


class DescriptorResult(NamedTuple):
    desc: jnp.ndarray    # f32[K, 768]
    xyz: jnp.ndarray     # f32[K, 3] base-octave coordinates
    sd: jnp.ndarray      # f32[K]


def _level_radius(sd: float, params: DetectorParams) -> float:
    sigma = np.float32(np.float32(sd) * np.float32(params.desc_sig_fctr))
    return float(np.float32(params.desc_rad_fctr) * sigma)


def _extract_one(level, coord, center, R, sd,
                 units: tuple[float, float, float], extents, chunk_vox: int,
                 params: DetectorParams, lvl=None, z_view=None):
    """Descriptor histogram [64, 12] for one keypoint.

    coord: i32[3] gather anchor; center: f32[3] true (possibly fractional)
    window center; sd: f32[] keypoint scale. When `lvl` is given, `level` is
    a stacked [L, nx, ny, nz] array and the window gathers from level lvl.
    """
    prec = jax.lax.Precision.HIGHEST
    nb = NHIST_PER_DIM

    # Window parameters, float32 exactly as the C code (sift.c:1452-1458).
    sigma = sd * jnp.float32(params.desc_sig_fctr)
    win_radius = jnp.float32(params.desc_rad_fctr) * sigma
    desc_half_width = win_radius / jnp.float32(_SQRT2)
    desc_width = jnp.float32(2.0) * desc_half_width
    desc_hist_width = desc_width / jnp.float32(nb)
    desc_bin_fctr = jnp.float32(1.0) / desc_hist_width

    if lvl is None:
        win, start = gather_window(level, coord, extents, z_view=z_view)
    else:
        from .windows import gather_window_leveled
        win, start = gather_window_leveled(level, lvl, coord, extents,
                                           z_view=z_view)
        level = level[0]  # only the 3-D dims are used below

    ux, uy, uz = (np.float32(u) for u in units)
    inv_u = tuple(np.float32(1.0) / u for u in (ux, uy, uz))

    # Gradients over the gather interior (IM_GET_GRAD_ISO, sift.c:140-145).
    gx = 0.5 * (win[2:, 1:-1, 1:-1] - win[:-2, 1:-1, 1:-1]) * inv_u[0]
    gy = 0.5 * (win[1:-1, 2:, 1:-1] - win[1:-1, :-2, 1:-1]) * inv_u[1]
    gz = 0.5 * (win[1:-1, 1:-1, 2:] - win[1:-1, 1:-1, :-2]) * inv_u[2]

    ishape = tuple(g - 2 for g in extents)
    M = ishape[0] * ishape[1] * ishape[2]
    C = -(-M // chunk_vox)  # chunks
    Mp = C * chunk_vox

    def flat(a):
        return jnp.pad(a.reshape(-1), (0, Mp - M)).reshape(C, chunk_vox)

    gxf, gyf, gzf = flat(gx), flat(gy), flat(gz)

    # Absolute voxel coordinates of the interior grid (static iotas) + pad.
    ix = jax.lax.broadcasted_iota(jnp.int32, ishape, 0) + 1 + start[0]
    iy = jax.lax.broadcasted_iota(jnp.int32, ishape, 1) + 1 + start[1]
    iz = jax.lax.broadcasted_iota(jnp.int32, ishape, 2) + 1 + start[2]
    ixf, iyf, izf = flat(ix), flat(iy), flat(iz)

    cx, cy, cz = center[0], center[1], center[2]
    n = (level.shape if z_view is None
         else (level.shape[0], level.shape[1], z_view[1]))

    # Reference loop bounds (IM_LOOP_SPHERE_START, sift.c:91-99).
    bounds = []
    for a, (c, u) in enumerate(zip((cx, cy, cz), (ux, uy, uz))):
        lo = jnp.maximum(jnp.floor(c - win_radius / u), 1.0).astype(jnp.int32)
        hi = jnp.minimum(jnp.ceil(c + win_radius / u),
                         jnp.float32(n[a] - 2)).astype(jnp.int32)
        bounds.append((lo, hi))

    mt = jnp.asarray(geometry.MT_MATRIX)        # [3, 60]
    kconst = jnp.asarray(geometry.K_CONST)      # [20]
    face_idx = jnp.asarray(geometry.FACE_IDX)   # [20, 3] vertex bins
    eps = jnp.float32(params.bary_eps)
    iota20 = jnp.arange(20, dtype=jnp.int32)
    iota12f = jnp.arange(ICOS_NVERT, dtype=jnp.float32)

    def chunk_hist(c):
        X, Y, Z = ixf[c], iyf[c], izf[c]
        g = jnp.stack([gxf[c], gyf[c], gzf[c]], axis=-1)   # [N, 3]

        mask = (jnp.arange(chunk_vox) + c * chunk_vox) < M
        for (lo, hi), I in zip(bounds, (X, Y, Z)):
            mask &= (I >= lo) & (I <= hi)

        dx = (X.astype(jnp.float32) - cx) * ux
        dy = (Y.astype(jnp.float32) - cy) * uy
        dz = (Z.astype(jnp.float32) - cz) * uz
        sq = dx * dx + dy * dy + dz * dz
        mask &= sq <= win_radius * win_radius

        vim = jnp.stack([dx, dy, dz], axis=-1)             # [N, 3]
        # vkp = R^T vim  (transpose_Mat_rm + MUL_MAT_RM_CVEC, sift.c:1480)
        vkp = jnp.einsum("ni,ij->nj", vim, R, precision=prec)
        vbins = (vkp + desc_half_width) * desc_bin_fctr
        mask &= jnp.all((vbins >= 0.0) & (vbins < float(nb)), axis=-1)

        w = jnp.exp(-0.5 * sq / (sigma * sigma))
        grot = jnp.einsum("ni,ij->nj", w[:, None] * g, R, precision=prec)

        # Face selection: all 20 faces at once (see geometry module). The
        # hit tests are made division-free by multiplying through by |det|
        # (sign-corrected); only the selected face's barycentrics divide.
        F = jnp.einsum("ni,if->nf", grot, mt, precision=prec)  # [N, 60]
        dets, ynum, znum = F[:, :20], F[:, 20:40], F[:, 40:]
        sgn = jnp.sign(dets)
        adet = dets * sgn
        neg_eps_adet = -eps * adet
        ysn = ynum * sgn
        zsn = znum * sgn
        validf = ((adet >= eps) & (ysn >= neg_eps_adet)
                  & (zsn >= neg_eps_adet)
                  & (adet - ysn - zsn >= neg_eps_adet)
                  & (kconst[None, :] * sgn >= 0.0))
        first = jnp.min(jnp.where(validf, iota20, 20), axis=-1)   # [N]
        gsq = jnp.sum(grot * grot, axis=-1)
        anyf = (first < 20) & (gsq >= eps) & mask
        onehot = iota20[None, :] == jnp.minimum(first, 19)[:, None]
        det_s = jnp.sum(jnp.where(onehot, dets, 0.0), axis=-1)
        yn_s = jnp.sum(jnp.where(onehot, ynum, 0.0), axis=-1)
        zn_s = jnp.sum(jnp.where(onehot, znum, 0.0), axis=-1)
        inv = jnp.where(det_s != 0.0, 1.0 / det_s, 0.0)
        ys = yn_s * inv
        zs = zn_s * inv
        xs = 1.0 - ys - zs
        mag = jnp.where(anyf, jnp.sqrt(gsq), 0.0)

        # Vertex indices of the selected face via a tiny [N,20]x[20,3]
        # matmul against the (unswapped) vertex index table.
        vidx = jnp.dot(onehot.astype(jnp.float32),
                       face_idx.astype(jnp.float32),
                       precision=prec)                     # [N, 3]
        # Vertex weights: scatter bary to the 3 vertex bins via one-hot
        # comparisons (pure VPU broadcasts).
        baryw = jnp.stack([xs, ys, zs], axis=-1) * mag[:, None]
        B = jnp.zeros((baryw.shape[0], ICOS_NVERT), jnp.float32)
        for j in range(3):
            B = B + baryw[:, j:j + 1] * (
                vidx[:, j:j + 1] == iota12f[None, :]).astype(jnp.float32)

        # Trilinear spatial weights, 2-sparse over 4 bins per axis
        # (SIFT3D_desc_acc_interp, sift.c:1340-1363).
        def sparse4(vb):
            base = jnp.floor(vb)
            fr = vb - base
            cells = jnp.arange(nb, dtype=jnp.float32)[None, :]
            return (jnp.where(cells == base[:, None], 1.0 - fr[:, None], 0.0)
                    + jnp.where(cells == base[:, None] + 1.0, fr[:, None],
                                0.0))
        Sx = sparse4(vbins[:, 0])
        Sy = sparse4(vbins[:, 1])
        Sz = sparse4(vbins[:, 2])

        # hist[(cz,cy), (cx,v)] += sum_n (Sz x Sy)[n, 16] . (Sx x B)[n, 48]
        ZY = (Sz[:, :, None] * Sy[:, None, :]).reshape(-1, nb * nb)
        P = (Sx[:, :, None] * B[:, None, :]).reshape(-1, nb * ICOS_NVERT)
        return jnp.einsum("nc,nq->cq", ZY, P, precision=prec)

    def body(carry, c):
        return carry + chunk_hist(c), None

    hist0 = jnp.zeros((nb * nb, nb * ICOS_NVERT), jnp.float32)
    hist, _ = jax.lax.scan(body, hist0, jnp.arange(C))
    # [cz, cy, cx, v] -> flat hist index x + 4y + 16z, vertex minor
    # (DESC_MAT_GET_COL, sift.c:136-137; strides at sift.c:1314-1315).
    return hist.reshape(nb, nb, nb, ICOS_NVERT).reshape(-1, ICOS_NVERT)


def _prep_window(level, coord, center, R, sd,
                 units: tuple[float, float, float], extents, tile: int,
                 params: DetectorParams, lvl=None, kvalid=None,
                 z_view=None, aligned_flat: bool = False,
                 affine_vbins: bool = False):
    """Per-keypoint prep for the Pallas histogram kernel: rotated weighted
    gradients and spatial bins for the whole window, flattened and padded to
    a tile multiple. Masked voxels have their gradient zeroed (their
    contribution vanishes because the kernel scales by |grot|). When `lvl`
    is given, `level` is a stacked [L, nx, ny, nz] array and the window
    gathers from level lvl.

    Everything here is elementwise over the 3-D window — the 3x3 rotation is
    unrolled into scalar-weighted sums rather than an [M, 3] matmul, so XLA
    fuses the whole prep into a few VPU passes with no lane-hostile [*, 3]
    relayouts (those dominated the per-keypoint cost before)."""
    nb = NHIST_PER_DIM

    sigma = sd * jnp.float32(params.desc_sig_fctr)
    win_radius = jnp.float32(params.desc_rad_fctr) * sigma
    desc_half_width = win_radius / jnp.float32(_SQRT2)
    desc_bin_fctr = jnp.float32(1.0) / (
        jnp.float32(2.0) * desc_half_width / jnp.float32(nb))

    if lvl is None:
        win, start = gather_window(level, coord, extents, z_view=z_view)
    else:
        from .windows import gather_window_leveled
        win, start = gather_window_leveled(level, lvl, coord, extents,
                                           z_view=z_view)
        level = level[0]  # only the 3-D dims are used below
    ux, uy, uz = (np.float32(u) for u in units)
    inv_u = tuple(np.float32(1.0) / u for u in (ux, uy, uz))
    g3 = (0.5 * (win[2:, 1:-1, 1:-1] - win[:-2, 1:-1, 1:-1]) * inv_u[0],
          0.5 * (win[1:-1, 2:, 1:-1] - win[1:-1, :-2, 1:-1]) * inv_u[1],
          0.5 * (win[1:-1, 1:-1, 2:] - win[1:-1, 1:-1, :-2]) * inv_u[2])

    ishape = tuple(g - 2 for g in extents)
    cx, cy, cz = center[0], center[1], center[2]
    n = (level.shape if z_view is None
         else (level.shape[0], level.shape[1], z_view[1]))
    axes = [start[a] + 1 + jax.lax.broadcasted_iota(jnp.int32, ishape, a)
            for a in range(3)]
    # Invalid slots (speculative-capacity padding, rejected keypoints)
    # mask out their ENTIRE window: their [K, 16, 48] histogram is zeroed
    # downstream anyway (extract_descriptors), but an all-zero mask makes
    # every skip flag 0, so the kernel never touches them — on the sparse
    # 256^3 bench a third of the hinted desc slots are padding.
    mask = (jnp.ones(ishape, bool) if kvalid is None
            else jnp.broadcast_to(kvalid, ishape))
    for a, (c, u) in enumerate(zip((cx, cy, cz), (ux, uy, uz))):
        lo = jnp.maximum(jnp.floor(c - win_radius / u), 1.0)
        hi = jnp.minimum(jnp.ceil(c + win_radius / u),
                         jnp.float32(n[a] - 2))
        mask &= ((axes[a] >= lo.astype(jnp.int32))
                 & (axes[a] <= hi.astype(jnp.int32)))

    d3 = ((axes[0].astype(jnp.float32) - cx) * ux,
          (axes[1].astype(jnp.float32) - cy) * uy,
          (axes[2].astype(jnp.float32) - cz) * uz)
    sq = d3[0] * d3[0] + d3[1] * d3[1] + d3[2] * d3[2]
    mask &= sq <= win_radius * win_radius

    # vkp = R^T vim, unrolled per output component (3-D elementwise).
    vbins3 = []
    for j in range(3):
        vkp_j = d3[0] * R[0, j] + d3[1] * R[1, j] + d3[2] * R[2, j]
        vb_j = (vkp_j + desc_half_width) * desc_bin_fctr
        mask &= (vb_j >= 0.0) & (vb_j < float(nb))
        vbins3.append(vb_j)

    w = jnp.where(mask, jnp.exp(-0.5 * sq / (sigma * sigma)), 0.0)
    wg = tuple(w * g for g in g3)
    grot3 = [wg[0] * R[0, j] + wg[1] * R[1, j] + wg[2] * R[2, j]
             for j in range(3)]

    M = ishape[0] * ishape[1] * ishape[2]
    Mp = -(-M // tile) * tile

    if aligned_flat:
        # Tiling-preserving flatten: pad the sublane (y) dim to 8 and the
        # lane (z) dim to a whole 128-lane tile, so the 3D -> flat
        # reshape keeps every (8, 128) tile in place, trading the dense
        # repack relayout for dead padded lanes fed to the kernel.
        # MEASURED NEGATIVE on hardware (tools/prep_flat_ab.py, round 5):
        # 351 vs 166 us/slot at E=59, 562 vs 349 at E=75 — the kernel's
        # dead-lane voxels (1.9-2.5x) cost far more than the relayout
        # saves. Kept as an opt-in A/B arm only; default stays dense.
        py = -(-ishape[1] // 8) * 8 - ishape[1]
        cz = -(-ishape[2] // 128) * 128
        rows = ishape[0] * (ishape[1] + py)
        rows_p = -(-(rows * cz) // tile) * tile // cz

        def fp(a):
            a = jnp.pad(a, ((0, 0), (0, py), (0, cz - ishape[2])))
            a = a.reshape(rows, cz)
            return jnp.pad(a, ((0, rows_p - rows), (0, 0))).reshape(-1)
    else:
        def fp(a):
            return jnp.pad(a.reshape(-1), (0, Mp - M))

    grot = jnp.stack([fp(a) for a in grot3])    # [3, Mp]
    if affine_vbins:
        # Don't flatten the three vbins arrays (the relayout is the
        # single largest prep cost, tools/prep_micro.py): vb_j is affine
        # in the window-local voxel coordinates, so ship the kernel 12
        # coefficients and let it rebuild vb against the call-shared
        # coordinate array (ops/desc_kernel._affine_vb). The MASK above
        # (and so grot and the flags) still uses the original vb
        # formula — bin assignment/zeroing decisions are unchanged; only
        # the interpolation weights move by ~ulps.
        fctr = desc_bin_fctr
        su = [(start[a].astype(jnp.float32) + 1.0 - center[a])
              * (ux, uy, uz)[a] for a in range(3)]
        aff = jnp.stack([
            v for j in range(3) for v in (
                (su[0] * R[0, j] + su[1] * R[1, j] + su[2] * R[2, j]
                 + desc_half_width) * fctr,
                ux * R[0, j] * fctr,
                uy * R[1, j] * fctr,
                uz * R[2, j] * fctr)])      # [12]
        vbins = aff
    else:
        vbins = jnp.stack([fp(a) for a in vbins3])  # [3, Mp]
    # Per-voxel-tile any-valid flags: the kernel skips the per-voxel math
    # for tiles that are entirely masked out (bounding-cube corners outside
    # the sphere, window margin of small-sd keypoints in mixed-level
    # windows, padding slots). Masked voxels contribute exactly zero either
    # way, so this changes speed only.
    from .ops.desc_kernel import FLAG_TILE
    flags = jnp.any(
        fp(mask).reshape(-1, FLAG_TILE), axis=1).astype(jnp.int32)
    return grot, vbins, flags


def _extract_pallas(level, coords, centers, R, sd_arr, units, extents,
                    kp_chunk: int, params: DetectorParams,
                    interpret: bool = False, level_index=None,
                    valid=None, z_view=None,
                    aligned_flat: bool | None = None):
    """Histogram extraction through the Pallas kernel, kp_chunk keypoints
    per call. `valid` (bool[K], optional) zeroes invalid slots' windows so
    the kernel skips them entirely (results are unchanged — those slots
    are zeroed downstream regardless)."""
    from .ops.desc_kernel import desc_hist_pallas

    K = coords.shape[0]
    tile = 8192
    if aligned_flat is None:
        aligned_flat = False     # measured negative; see _prep_window
    affine_vbins = params.desc_vbins == "affine" and not aligned_flat
    if level_index is None:
        level_index = jnp.zeros((K,), jnp.int32)
        lvl_arg = None
    else:
        lvl_arg = True
    if valid is None:
        valid = jnp.ones((K,), bool)

    # Mixed-level windows: sort slots by (validity, level) so each 8-slot
    # kernel pack holds same-level keypoints. Same-level windows share
    # their sphere/margin geometry, so their skip flags coincide and the
    # pack-granular MXU contraction skips empty tiles that a mixed pack
    # would keep alive; invalid slots cluster into fully-skipped packs.
    # The inverse gather restores slot order ([K, 16, 48] — trivial).
    perm = None
    from .ops.desc_kernel import _G
    if lvl_arg and K > _G:
        key = jnp.where(valid, level_index, jnp.int32(2 ** 30))
        perm = jnp.argsort(key, stable=True)
        coords, centers, R, sd_arr, level_index, valid = (
            a[perm] for a in (coords, centers, R, sd_arr, level_index,
                              valid))

    # Affine-vbins mode: ONE [3, Mp] window-local coordinate array shared
    # by every keypoint of the call (pure 1-D iota arithmetic over the
    # FLAT index — no 3-D reshape, so no relayout; loop-invariant, XLA
    # hoists it out of the chunk scan). The pad rows' coordinates don't
    # matter: padded slots carry zero gradients.
    if affine_vbins:
        ishape = tuple(e - 2 for e in extents)
        M = int(np.prod(ishape))
        Mp = -(-M // tile) * tile
        m = jnp.arange(Mp, dtype=jnp.int32)
        xyz = jnp.stack([
            (m // (ishape[1] * ishape[2])).astype(jnp.float32),
            ((m // ishape[2]) % ishape[1]).astype(jnp.float32),
            (m % ishape[2]).astype(jnp.float32)])
    else:
        xyz = None

    def chunk_fn(args):
        c_coords, c_centers, c_R, c_sd, c_lvl, c_val = args
        grot, vbins, flags = jax.vmap(
            lambda co, ce, Rk, sdk, lv, va: _prep_window(
                level, co, ce, Rk, sdk, units, extents, tile, params,
                lvl=(lv if lvl_arg else None), kvalid=va,
                z_view=z_view, aligned_flat=aligned_flat,
                affine_vbins=affine_vbins))(
            c_coords, c_centers, c_R, c_sd, c_lvl, c_val)
        if affine_vbins:
            return desc_hist_pallas(grot, flags=flags,
                                    interpret=interpret,
                                    precision=params.desc_precision,
                                    aff=vbins, xyz=xyz)
        return desc_hist_pallas(grot, vbins, flags, interpret=interpret,
                                precision=params.desc_precision)

    def chunk_fn_skip(args):
        # Inside the lax.map scan the cond is a REAL branch: packs whose
        # slots are all invalid (speculative-capacity padding — they sort
        # to the tail) skip window prep AND the kernel launch entirely.
        # Results are unchanged: invalid slots produce zeros either way.
        nb = NHIST_PER_DIM
        return jax.lax.cond(
            jnp.any(args[5]), chunk_fn,
            lambda a: jnp.zeros((kp_chunk, nb * nb, nb * ICOS_NVERT),
                                jnp.float32),
            args)

    args = (coords, centers, R, sd_arr, level_index, valid)
    Kp = K
    if K > kp_chunk and K % kp_chunk:
        # Pad to a whole number of packs with invalid slots (they sort
        # to the tail and their packs skip entirely). Exact slot counts
        # (tight hinted configs) need not align to the pack size.
        pad = kp_chunk - K % kp_chunk
        Kp = K + pad

        def padded(a):
            return jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])

        args = tuple(padded(a) for a in args)
        if perm is None and lvl_arg:
            pass  # sorted path above would have handled it
    if Kp <= kp_chunk:
        hists = chunk_fn(args)
    else:
        def reshape(x):
            return x.reshape((Kp // kp_chunk, kp_chunk) + x.shape[1:])
        out = jax.lax.map(chunk_fn_skip, tuple(reshape(a) for a in args))
        hists = out.reshape(Kp, *out.shape[2:])
    hists = hists[:K]
    if perm is not None:
        hists = hists[jnp.argsort(perm)]
    nb = NHIST_PER_DIM
    return hists.reshape(K, nb, nb, nb, ICOS_NVERT).reshape(
        K, nb ** 3, ICOS_NVERT)


def _normalize(hist: jnp.ndarray, params: DetectorParams) -> jnp.ndarray:
    """L2-normalize, truncate, renormalize (sift.c:1402-1429, 1508-1526)."""
    def norm1(h):
        n = jnp.sqrt(jnp.sum(h * h)) + jnp.float32(2.220446049250313e-16)
        return h * (1.0 / n)
    h = norm1(hist)
    h = jnp.minimum(h, jnp.float32(params.trunc_thresh))
    return norm1(h)


def extract_descriptors(level: jnp.ndarray, coords: jnp.ndarray,
                        R: jnp.ndarray, valid: jnp.ndarray, sd,
                        octave: int, units: tuple[float, float, float],
                        params: DetectorParams, kp_chunk: int = 16,
                        vox_chunk: int = 65536,
                        centers: jnp.ndarray | None = None,
                        sd_max: float | None = None,
                        use_pallas: bool | None = None,
                        level_index: jnp.ndarray | None = None,
                        fractional_centers: bool | None = None,
                        z_view=None) -> DescriptorResult:
    """Descriptors for all keypoints of one pyramid level.

    coords i32[K,3] integer gather anchors, R f32[K,3,3]; sd is the level's
    absolute scale (scalar) or per-keypoint f32[K] (subvoxel-refined);
    centers optionally give fractional window centers; units are the level's
    voxel units. level_index: optional i32[K] when `level` is a stacked
    [L, nx, ny, nz] array of same-shape levels. Invalid slots produce zeros.
    """
    if sd_max is None:
        if not np.isscalar(sd):
            raise ValueError("sd_max is required when sd is per-keypoint")
        sd_max = float(sd)
    dims = level.shape if level_index is None else level.shape[1:]
    if z_view is not None:
        dims = (dims[0], dims[1], z_view[1])
    rad = _level_radius(sd_max, params)
    if fractional_centers is None:
        fractional_centers = centers is not None
    margin = 4 if fractional_centers else 0
    extents = tuple(window_extent(rad / units[a], dims[a], margin)
                    for a in range(3))

    if centers is None:
        centers = coords.astype(jnp.float32)
    K = coords.shape[0]
    sd_arr = (jnp.full((K,), jnp.float32(sd)) if np.isscalar(sd)
              else jnp.asarray(sd, jnp.float32))

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        hists = _extract_pallas(level, coords, centers, R, sd_arr, units,
                                extents, kp_chunk, params,
                                level_index=level_index, valid=valid,
                                z_view=z_view)
    else:
        lvl_arr = (jnp.zeros((K,), jnp.int32) if level_index is None
                   else level_index)

        def one(args):
            coord, center, Rk, sd_k, lv = args
            return _extract_one(
                level, coord, center, Rk, sd_k, units, extents, vox_chunk,
                params, lvl=(lv if level_index is not None else None),
                z_view=z_view)

        hists = chunked_vmap(one, (coords, centers, R, sd_arr, lvl_arr),
                             kp_chunk)
    desc = jax.vmap(lambda h: _normalize(h, params))(hists)
    desc = jnp.where(valid[:, None, None], desc, 0.0)
    desc = desc.reshape(coords.shape[0], -1)

    coord_factor = jnp.float32(2.0 ** octave)
    xyz = centers * coord_factor
    return DescriptorResult(desc, xyz, sd_arr)
