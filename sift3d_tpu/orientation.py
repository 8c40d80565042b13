"""Orientation assignment and corner rejection.

Reference semantics (assign_eig_ori + assign_orientations,
/root/reference/sift3d/sift.c:926-1167): for each keypoint, on its Gaussian
pyramid level, form a Gaussian-weighted structure tensor and mean gradient
over a sphere of radius 3*sigma (sigma = 1.5 * keypoint scale, sift.c:41-42);
reject if the mean gradient is negligible (sift.c:996-999); eigendecompose;
reject if adjacent eigenvalue magnitude ratios exceed 0.90 (sift.c:1011-1015);
build R from the two largest eigenvectors, sign-fixed so the directional
derivative along each is positive, plus their cross product (sift.c:1017-1059);
reject if the corner score min |cos(angle(eigvec, mean grad))| is below
corner_thresh (sift.c:1091-1102). Gradients are central differences scaled to
real-world units (IM_GET_GRAD_ISO, sift.c:140-145).

TPU formulation: windows are fixed-size gathers (windows.py); the weighted
covariance reduces each window to 9 numbers; eigendecomposition runs batched
over all keypoints via jnp.linalg.eigh; every rejection is a mask, not a
compaction. Keypoint centers may be fractional (subvoxel refinement) and
scales per-keypoint; window *shapes* stay static via a scale upper bound.
"""

from __future__ import annotations


from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .params import DetectorParams
from .windows import chunked_vmap, gather_window, gather_window_leveled, \
    window_extent


class OrientationResult(NamedTuple):
    R: jnp.ndarray        # f32[K, 3, 3]
    accepted: jnp.ndarray  # bool[K] (True = keypoint survives)
    # Per-stage rejection masks, in the reference's short-circuit order
    # (assign_eig_ori returns early: grad -> ratio -> corner,
    # sift.c:996-1102). Each mask is the raw stage predicate; combine
    # cumulatively for funnel counts.
    reject_grad: jnp.ndarray    # bool[K]
    reject_ratio: jnp.ndarray   # bool[K]
    reject_corner: jnp.ndarray  # bool[K]


def _window_moments(level, coord, center, sd, units, extents,
                    params: DetectorParams, lvl=None, z_view=None):
    """Structure tensor A[3,3] and mean gradient [3] for one keypoint.

    coord: i32[3] gather anchor; center: f32[3] true (possibly fractional)
    window center; sd: f32[] keypoint scale. When `lvl` is given, `level` is
    a stacked [L, nx, ny, nz] array and the window gathers from level lvl.
    """
    sigma = jnp.float32(params.ori_sig_fctr) * sd
    rad = sigma * jnp.float32(params.ori_rad_fctr)
    if lvl is None:
        win, start = gather_window(level, coord, extents, z_view=z_view)
    else:
        win, start = gather_window_leveled(level, lvl, coord, extents,
                                           z_view=z_view)
        level = level[0]  # only the 3-D dims are used below

    ux, uy, uz = (np.float32(u) for u in units)
    inv = [np.float32(1.0) / np.float32(u) for u in units]
    # Interior of the gather (gradient-safe border of 1). Gradients multiply
    # by the reciprocal units, as IM_GET_GRAD_ISO does (sift.c:140-145).
    gx = 0.5 * (win[2:, 1:-1, 1:-1] - win[:-2, 1:-1, 1:-1]) * inv[0]
    gy = 0.5 * (win[1:-1, 2:, 1:-1] - win[1:-1, :-2, 1:-1]) * inv[1]
    gz = 0.5 * (win[1:-1, 1:-1, 2:] - win[1:-1, 1:-1, :-2]) * inv[2]

    # Absolute voxel coordinates of the interior grid.
    ishape = (extents[0] - 2, extents[1] - 2, extents[2] - 2)
    axes = [start[a] + 1 + jax.lax.broadcasted_iota(jnp.int32, ishape, a)
            for a in range(3)]
    X, Y, Z = axes

    # Reference loop bounds (sift.c:91-99), computed in f32 like the C code.
    cx, cy, cz = center[0], center[1], center[2]
    n = (level.shape if z_view is None
         else (level.shape[0], level.shape[1], z_view[1]))
    mask = jnp.ones(X.shape, dtype=bool)
    for a, (c, u, I) in enumerate(
            zip((cx, cy, cz), (ux, uy, uz), (X, Y, Z))):
        lo = jnp.maximum(jnp.floor(c - rad / u), 1.0)
        hi = jnp.minimum(jnp.ceil(c + rad / u), jnp.float32(n[a] - 2))
        mask &= (I >= lo.astype(jnp.int32)) & (I <= hi.astype(jnp.int32))

    dx = (X.astype(jnp.float32) - cx) * ux
    dy = (Y.astype(jnp.float32) - cy) * uy
    dz = (Z.astype(jnp.float32) - cz) * uz
    sq_dist = dx * dx + dy * dy + dz * dz
    mask &= sq_dist <= rad * rad

    weight = jnp.where(mask, jnp.exp(-0.5 * sq_dist / (sigma * sigma)), 0.0)

    g = jnp.stack([gx, gy, gz], axis=-1)          # [gx,gy,gz] per voxel
    wg = weight[..., None] * g
    vd_win = jnp.sum(wg.reshape(-1, 3), axis=0)    # mean gradient (f32)
    # Structure tensor: sum of w * g g^T. (The C code accumulates in f64,
    # sift.c:978-983; a tree-reduced f32 sum is within parity tolerance.)
    # NB: an "elementwise 6-sum" formulation was measured SLOWER under vmap
    # on TPU (the separate reductions do not fuse) — keep the einsum.
    A = jnp.einsum("vi,vj->ij", wg.reshape(-1, 3), g.reshape(-1, 3),
                   precision=jax.lax.Precision.HIGHEST)
    return A, vd_win


def eigh3x3(A: jnp.ndarray):
    """Batched symmetric 3x3 eigendecomposition by fixed-sweep cyclic
    Jacobi rotations: eigenvalues ascending, eigenvectors in columns (same
    convention as LAPACK dsyevd / jnp.linalg.eigh).

    jnp.linalg.eigh lowers to an iterative QR custom call whose fixed cost
    dominates tiny batches (~4 us/keypoint measured, 39% of the whole
    orientation stage); cyclic Jacobi on a 3x3 is pure elementwise VPU math
    and converges quadratically — 6 fixed sweeps reach f32 machine
    precision. Off-diagonal magnitudes after 6 sweeps are below f32 eps for
    every conditioning; keypoints with near-equal eigenvalues are rejected
    by the ratio test downstream (sift.c:1011-1015), so eigenVECTOR
    sensitivity at degeneracy does not affect results.
    """
    a = A
    V = jnp.broadcast_to(jnp.eye(3, dtype=A.dtype), A.shape)

    def rot(a, V, p, q):
        app, aqq, apq = a[..., p, p], a[..., q, q], a[..., p, q]
        # Rotation angle zeroing a_pq (Golub & Van Loan 8.4): guard the
        # already-zero case (keeps c=1, s=0).
        safe = jnp.abs(apq) > 0.0
        tau = (aqq - app) / jnp.where(safe, 2.0 * apq, 1.0)
        t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(tau == 0.0, 1.0, t)  # sign(0) == 0 guard
        c = 1.0 / jnp.sqrt(1.0 + t * t)
        s = jnp.where(safe, t * c, 0.0)
        c = jnp.where(safe, c, 1.0)

        # a' = J^T a J with J the (p, q) rotation; build row updates
        # explicitly (3x3, fully unrolled).
        rows = []
        for i in range(3):
            row = []
            for j in range(3):
                row.append(a[..., i, j])
            rows.append(row)
        new = [[rows[i][j] for j in range(3)] for i in range(3)]
        for k in range(3):
            akp, akq = rows[k][p], rows[k][q]
            new[k][p] = c * akp - s * akq
            new[k][q] = s * akp + c * akq
        rows2 = [[new[i][j] for j in range(3)] for i in range(3)]
        for k in range(3):
            apk, aqk = new[p][k], new[q][k]
            rows2[p][k] = c * apk - s * aqk
            rows2[q][k] = s * apk + c * aqk
        a = jnp.stack([jnp.stack(r, axis=-1) for r in rows2], axis=-2)

        cn, sn = c[..., None], s[..., None]
        vp, vq = V[..., :, p], V[..., :, q]
        V = V.at[..., :, p].set(cn * vp - sn * vq)
        V = V.at[..., :, q].set(sn * vp + cn * vq)
        return a, V

    for _ in range(6):
        for (p, q) in ((0, 1), (0, 2), (1, 2)):
            a, V = rot(a, V, p, q)

    w = jnp.stack([a[..., 0, 0], a[..., 1, 1], a[..., 2, 2]], axis=-1)
    order = jnp.argsort(w, axis=-1)
    w = jnp.take_along_axis(w, order, axis=-1)
    V = jnp.take_along_axis(V, order[..., None, :], axis=-1)
    return w, V


def assign_orientations(level: jnp.ndarray, coords: jnp.ndarray,
                        valid: jnp.ndarray, sd,
                        units: tuple[float, float, float],
                        params: DetectorParams,
                        chunk: int = 256,
                        centers: jnp.ndarray | None = None,
                        sd_max: float | None = None,
                        level_index: jnp.ndarray | None = None,
                        fractional_centers: bool | None = None,
                        use_pallas: bool | None = None,
                        z_view=None,
                        pallas_interpret: bool = False) -> OrientationResult:
    """Batched orientation assignment for all keypoints of one pyramid level.

    coords: i32[K, 3] integer gather anchors. centers: optional f32[K, 3]
    true window centers (defaults to coords). sd: the level's absolute scale
    (scalar) or per-keypoint f32[K]. sd_max: static upper bound on sd used to
    size windows (defaults to scalar sd). level_index: optional i32[K] when
    `level` is a stacked [L, nx, ny, nz] array of same-shape levels.
    """
    if sd_max is None:
        if not np.isscalar(sd):
            raise ValueError("sd_max is required when sd is per-keypoint")
        sd_max = float(sd)
    dims = level.shape if level_index is None else level.shape[1:]
    if z_view is not None:
        dims = (dims[0], dims[1], z_view[1])
    rad_max = params.ori_sig_fctr * sd_max * params.ori_rad_fctr
    # slack when centers can be fractional (refined offsets are clamped to
    # one voxel around the integer anchor, +1 for the gradient border)
    if fractional_centers is None:
        fractional_centers = centers is not None
    margin = 4 if fractional_centers else 0
    extents = tuple(window_extent(rad_max / units[a], dims[a], margin)
                    for a in range(3))

    if centers is None:
        centers = coords.astype(jnp.float32)
    K = coords.shape[0]
    sd_arr = (jnp.full((K,), jnp.float32(sd)) if np.isscalar(sd)
              else jnp.asarray(sd, jnp.float32))

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas and K % 8 == 0:
        from .ops.ori_kernel import ori_moments_pallas
        levels = level[None] if level_index is None else level
        lvl = (jnp.zeros((K,), jnp.int32) if level_index is None
               else level_index)
        fp = jnp.concatenate(
            [centers.astype(jnp.float32), sd_arr[:, None]], axis=-1)
        zkw = {}
        if z_view is not None:
            # shard-local slab with global coordinates (the kernel's
            # z_origin/global_nz contract) — the moments kernel now runs
            # inside shard_map bodies too.
            zkw = dict(z_origin=jnp.asarray(z_view[0], jnp.int32),
                       global_nz=int(z_view[1]))
        A, vd_win = ori_moments_pallas(levels, lvl, coords, fp, extents,
                                       tuple(units), params,
                                       interpret=pallas_interpret, **zkw)
    elif level_index is None:
        A, vd_win = chunked_vmap(
            lambda args: _window_moments(level, args[0], args[1], args[2],
                                         units, extents, params,
                                         z_view=z_view),
            (coords, centers, sd_arr), chunk)
    else:
        A, vd_win = chunked_vmap(
            lambda args: _window_moments(level, args[0], args[1], args[2],
                                         units, extents, params,
                                         lvl=args[3], z_view=z_view),
            (coords, centers, sd_arr, level_index), chunk)

    # Batched symmetric eigendecomposition, ascending eigenvalues (same
    # convention as LAPACK dsyevd in eigen_Mat_rm, imutil.c:960-1067).
    L, Q = eigh3x3(A)

    # Weak-gradient rejection (sift.c:996-999).
    grad_sq = jnp.sum(vd_win * vd_win, axis=-1)
    reject_grad = grad_sq < jnp.float32(params.ori_grad_thresh)

    # Eigenvalue ratio test (sift.c:1011-1015). C computes fabs(l_i/l_{i+1});
    # inf compares > thresh (reject), nan compares false (keep) — replicate.
    ratio01 = jnp.abs(L[:, 0] / L[:, 1])
    ratio12 = jnp.abs(L[:, 1] / L[:, 2])
    thr = jnp.float32(params.max_eig_ratio)

    def _gt(r):
        return jnp.where(jnp.isnan(r), False, r > thr)
    reject_ratio = _gt(ratio01) | _gt(ratio12)

    # Sign fixing + corner score (sift.c:1017-1059).
    v2 = Q[:, :, 2]   # largest eigenvalue's eigenvector
    v1 = Q[:, :, 1]
    d2 = jnp.sum(vd_win * v2, axis=-1)
    d1 = jnp.sum(vd_win * v1, axis=-1)
    gnorm = jnp.sqrt(grad_sq)
    cos2 = d2 / (jnp.linalg.norm(v2, axis=-1) * gnorm)
    cos1 = d1 / (jnp.linalg.norm(v1, axis=-1) * gnorm)
    corner_score = jnp.minimum(jnp.abs(cos2), jnp.abs(cos1))
    sgn2 = jnp.where(d2 > 0.0, 1.0, -1.0)[:, None]
    sgn1 = jnp.where(d1 > 0.0, 1.0, -1.0)[:, None]
    r0 = v2 * sgn2
    r1 = v1 * sgn1
    r2 = jnp.cross(r0, r1)
    R = jnp.stack([r0, r1, r2], axis=-1)  # columns = r0, r1, r2

    reject_corner = corner_score < jnp.float32(params.corner_thresh)

    accepted = valid & ~reject_grad & ~reject_ratio & ~reject_corner
    return OrientationResult(R.astype(jnp.float32), accepted,
                             valid & reject_grad, valid & reject_ratio,
                             valid & reject_corner)
