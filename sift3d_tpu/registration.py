"""Descriptor matching + RANSAC affine registration.

The reference fork removed matching/RANSAC for performance
(/root/reference/CHANGES.md:101-103); the capability is part of the SIFT3D
algorithm (Rister et al., IEEE TIP 2017, see /root/reference/README-OLD.md)
and is rebuilt here TPU-first:

 - Matching: the [N1, N2] squared-distance matrix is one MXU matmul
   (||a-b||^2 = ||a||^2 + ||b||^2 - 2 a.b); nearest/second-nearest per row by
   a masked second pass; Lowe ratio test d1/d2 < nn_thresh.
 - RANSAC: all hypotheses run in parallel (vmap over minimal 4-point samples,
   each solved as a 4x4 linear system), inliers counted with one batched
   matmul; the winner is refit on its inliers via masked normal equations.
   No sequential hypothesis loop — the entire search is one XLA computation.
 - Warping: inverse-mapped trilinear resampling on device.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .keypoints import Descriptors
from .volume import Volume, as_volume


# ---------------------------------------------------------------------------
# Matching
# ---------------------------------------------------------------------------


def _match_core(d1, d2, valid1, valid2, nn_thresh: float):
    # Squared Euclidean distances via one matmul.
    sq1 = jnp.sum(d1 * d1, axis=1, keepdims=True)
    sq2 = jnp.sum(d2 * d2, axis=1, keepdims=True)
    D = sq1 + sq2.T - 2.0 * jnp.dot(
        d1, d2.T, precision=jax.lax.Precision.HIGHEST)
    D = jnp.maximum(D, 0.0)
    big = jnp.float32(np.finfo(np.float32).max)
    D = jnp.where(valid2[None, :], D, big)

    best_idx = jnp.argmin(D, axis=1)
    best = jnp.min(D, axis=1)
    D2 = D.at[jnp.arange(D.shape[0]), best_idx].set(big)
    second = jnp.min(D2, axis=1)

    # Lowe ratio test on Euclidean distances.
    ratio = jnp.sqrt(best) / jnp.maximum(jnp.sqrt(second), 1e-30)
    ok = valid1 & (ratio < jnp.float32(nn_thresh)) & (second < big)
    return best_idx, ok


_match_jit = jax.jit(_match_core, static_argnames=("nn_thresh",))


def _pow2_bucket(n: int, minimum: int = 32) -> int:
    return max(minimum, 1 << (max(n, 1) - 1).bit_length())


def _pad_rows(a: np.ndarray, b: int) -> np.ndarray:
    if a.shape[0] == b:
        return a
    return np.pad(a, ((0, b - a.shape[0]),) + ((0, 0),) * (a.ndim - 1))


def match_descriptors(desc1: Descriptors, desc2: Descriptors,
                      nn_thresh: float = 0.8):
    """Match desc1 against desc2. Returns (idx1, idx2) index arrays of the
    accepted pairs (numpy).

    Inputs are padded to power-of-two row counts with validity masks so
    compilations are cached per bucket rather than per exact keypoint count
    (every new shape would otherwise recompile — minutes on a tunneled
    device)."""
    n1, n2 = len(desc1), len(desc2)
    if n1 == 0 or n2 == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    b1, b2 = _pow2_bucket(n1), _pow2_bucket(n2)
    v1 = np.zeros(b1, bool)
    v1[:n1] = True
    v2 = np.zeros(b2, bool)
    v2[:n2] = True
    best_idx, ok = _match_jit(
        jnp.asarray(_pad_rows(np.asarray(desc1.data, np.float32), b1)),
        jnp.asarray(_pad_rows(np.asarray(desc2.data, np.float32), b2)),
        jnp.asarray(v1), jnp.asarray(v2), float(nn_thresh))
    ok = np.asarray(ok)[:n1]
    idx1 = np.nonzero(ok)[0]
    idx2 = np.asarray(best_idx)[:n1][idx1]
    return idx1, idx2


# ---------------------------------------------------------------------------
# RANSAC affine
# ---------------------------------------------------------------------------


def _sample_distinct4(key, num_iter: int, n_valid):
    """[num_iter, 4] minimal-sample indices, each row 4 DISTINCT indices
    uniform over [0, n_valid) (sequential shifted draws: the k-th draw
    samples [0, n-k) and shifts past the earlier picks). A repeated index
    made the 4x4 hypothesis system singular -> nan -> zero inliers,
    silently shrinking the effective iteration count by ~6/n per
    hypothesis."""
    n = jnp.maximum(n_valid, 4)
    ks = jax.random.split(key, 4)
    r = [jax.random.randint(ks[j], (num_iter,), 0, n - j).astype(jnp.int32)
         for j in range(4)]
    i0 = r[0]
    i1 = r[1] + (r[1] >= i0)
    a01 = jnp.minimum(i0, i1)
    b01 = jnp.maximum(i0, i1)
    i2 = r[2] + (r[2] >= a01)
    i2 = i2 + (i2 >= b01)
    lo = jnp.minimum(a01, i2)
    hi = jnp.maximum(b01, i2)
    mid = a01 + b01 + i2 - lo - hi
    i3 = r[3] + (r[3] >= lo)
    i3 = i3 + (i3 >= mid)
    i3 = i3 + (i3 >= hi)
    return jnp.stack([i0, i1, i2, i3], axis=1)         # [num_iter, 4]


def _ransac_core(src, dst, valid, n_valid, key, num_iter: int,
                 err_thresh: float, w=None):
    """src, dst: f32[M, 3] (rows >= n_valid are padding); valid: bool[M].
    Finds affine A (3x4) minimizing ||A [src;1] - dst|| over the best
    consensus set. M is a power-of-two bucket; n_valid is traced so the
    compilation is shared across actual correspondence counts.

    w (optional f32[M]): per-correspondence precision weights for the
    consensus REFIT (hypothesis sampling and inlier counting stay
    unweighted). Keypoint coordinates are integer at octave resolution,
    so an octave-o correspondence carries ~4^o the position variance of
    an octave-0 one; weighting the refit by 1/4^o recovers sub-voxel
    affines from mixed-octave consensus sets that an unweighted fit
    lets coarse matches drag to ~2 voxels (measured 2.35 -> sub-voxel
    corner error at 192^3, tools/bench_registration.py)."""
    M = src.shape[0]
    ones = jnp.ones((M, 1), jnp.float32)
    X = jnp.concatenate([src, ones], axis=1)          # [M, 4]
    if w is None:
        w = jnp.ones((M,), jnp.float32)

    idx = _sample_distinct4(key, num_iter, n_valid)

    def fit4(sample_idx):
        Xs = X[sample_idx]                             # [4, 4]
        Ys = dst[sample_idx]                           # [4, 3]
        A = jnp.linalg.solve(Xs, Ys)                   # [4, 3]
        return A

    As = jax.vmap(fit4)(idx)                           # [num_iter, 4, 3]

    # Count inliers for all hypotheses with one batched matmul.
    pred = jnp.einsum("mi,nij->nmj", X, As,
                      precision=jax.lax.Precision.HIGHEST)
    err2 = jnp.sum((pred - dst[None]) ** 2, axis=-1)   # [num_iter, M]
    thr2 = jnp.float32(err_thresh * err_thresh)
    inl = (err2 < thr2) & valid[None, :]
    inl = jnp.where(jnp.any(jnp.isnan(As), axis=(1, 2))[:, None],
                    False, inl)
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)
    best_inl = inl[best]

    # Iteratively refit on the consensus set via masked WEIGHTED normal
    # equations: each refit tightens the model, which can admit more
    # inliers.
    def refit(inl, _):
        wc = (inl.astype(jnp.float32) * w)[:, None]
        Xw = X * wc
        AtA = Xw.T @ X + 1e-8 * jnp.eye(4, dtype=jnp.float32)
        AtY = Xw.T @ dst
        A_r = jnp.linalg.solve(AtA, AtY)               # [4, 3]
        err2f = jnp.sum((X @ A_r - dst) ** 2, axis=-1)
        return (err2f < thr2) & valid, A_r

    inl_cur = best_inl
    A_refit = None
    for _ in range(3):
        inl_cur, A_refit = refit(inl_cur, None)
    return A_refit.T, jnp.sum(inl_cur), inl_cur        # A: [3, 4]


_ransac_jit = jax.jit(_ransac_core, static_argnames=("num_iter",
                                                     "err_thresh"))


@functools.partial(jax.jit, static_argnames=("nn_thresh", "num_iter",
                                             "err_thresh"))
def _register_pairs_jit(d1, x1, q1, v1, d2, x2, q2, v2, key,
                        nn_thresh: float, num_iter: int,
                        err_thresh: float):
    """Fused match + RANSAC for B pairs in ONE dispatch (config 5: the
    per-pair jits each cost an upload + two RTT syncs on a high-latency
    link — batched they cost one of each for the whole batch).

    d1/d2: f32[B, M1/M2, 768] descriptors; x1/x2: f32[B, M1/M2, 3] base
    coords; q1/q2: f32[B, M] per-keypoint position variances (4^octave
    — integer coords at octave resolution); v1/v2: validity masks. Per
    pair: Lowe-ratio matching (_match_core), in-jit compaction of the
    accepted rows to a prefix (the RANSAC sampler draws from the valid
    prefix), then _ransac_core with 1/(q_src + q_dst) refit weights.
    Numerics are identical to the per-pair path: same distance matrix,
    same compacted correspondence order (match index order), same key.
    """
    from .detect import compact_flat

    M1 = d1.shape[1]

    def pair(d1b, x1b, q1b, v1b, d2b, x2b, q2b, v2b):
        best_idx, ok = _match_core(d1b, d2b, v1b, v2b, nn_thresh)
        cidx, cvalid, n = compact_flat(ok, M1)
        src = jnp.where(cvalid[:, None], x1b[cidx], 0.0)
        dst = jnp.where(cvalid[:, None], x2b[best_idx[cidx]], 0.0)
        wr = 1.0 / (q1b[cidx] + q2b[best_idx[cidx]])
        A, n_inl, inl = _ransac_core(src, dst, cvalid, n, key, num_iter,
                                     err_thresh, w=wr)
        return A, n, n_inl, inl, src, dst

    return jax.vmap(pair)(d1, x1, q1, v1, d2, x2, q2, v2)


@dataclasses.dataclass
class RegistrationResult:
    # f32[3, 4], maps moving voxel coords -> fixed; None when fewer than
    # 4 correspondences survived matching (register/register_batch/
    # ransac_affine share this convention — no path raises on it)
    affine: np.ndarray | None
    num_matches: int
    num_inliers: int
    matches_fixed: np.ndarray   # f32[M, 3] matched fixed-volume coords
    matches_moving: np.ndarray  # f32[M, 3]
    inlier_mask: np.ndarray     # bool[M]


def ransac_affine(src_pts: np.ndarray, dst_pts: np.ndarray,
                  err_thresh: float = 5.0, num_iter: int = 500,
                  seed: int = 0, weights=None):
    """Robust affine fit dst ~ A [src; 1]. Returns (A [3,4], inlier mask).

    Fewer than 4 correspondences cannot constrain an affine: returns
    (None, all-False mask) — the same degraded-result convention as
    register()/register_batch() (one API, one failure mode).

    weights (optional f32[M]): per-correspondence precision weights for
    the consensus refit (see _ransac_core)."""
    src_pts = np.asarray(src_pts, np.float32)
    dst_pts = np.asarray(dst_pts, np.float32)
    M = len(src_pts)
    if M < 4:
        return None, np.zeros(M, bool)
    Mb = _pow2_bucket(M)
    valid = np.zeros(Mb, bool)
    valid[:M] = True
    w = None
    if weights is not None:
        w = jnp.asarray(_pad_rows(
            np.asarray(weights, np.float32)[:, None], Mb)[:, 0])
    A, n_inl, mask = _ransac_jit(
        jnp.asarray(_pad_rows(src_pts, Mb)),
        jnp.asarray(_pad_rows(dst_pts, Mb)), jnp.asarray(valid),
        jnp.int32(M), jax.random.PRNGKey(seed), int(num_iter),
        float(err_thresh), w)
    return np.asarray(A), np.asarray(mask)[:M]


def register(fixed, moving, params=None, nn_thresh: float = 0.8,
             err_thresh: float = 5.0, num_iter: int = 500,
             kp_limit: int = 0, seed: int = 0,
             detectors=None) -> RegistrationResult:
    """Full SIFT3D registration: detect + describe both volumes, match
    descriptors, RANSAC an affine (moving -> fixed).

    detectors: optional (det_fixed, det_moving) pair of SIFT3D objects to
    reuse across calls — a detector that has already seen a same-shape
    volume runs the fused hinted detection program (one dispatch + one
    transfer per volume) instead of the cold per-stage path.

    When both volumes share a shape and there is no detector pair to
    respect, the pair runs as register_batch(B=1): both detections in one
    unrolled dispatch and match+RANSAC in another — fewer round-trip
    syncs on a high-latency link."""
    from .pipeline import SIFT3D

    fixed = as_volume(fixed)
    moving = as_volume(moving)
    if (detectors is None or not isinstance(detectors, (tuple, list))) \
            and fixed.data.shape == moving.data.shape \
            and tuple(fixed.units) == tuple(moving.units):
        det = detectors if detectors is not None else (
            SIFT3D(params) if params else SIFT3D())
        return register_batch(
            jnp.stack([jnp.asarray(fixed.data, jnp.float32)]),
            jnp.stack([jnp.asarray(moving.data, jnp.float32)]),
            nn_thresh=nn_thresh, err_thresh=err_thresh,
            num_iter=num_iter, kp_limit=kp_limit, seed=seed,
            units=tuple(fixed.units), det=det)[0]

    if detectors is not None:
        det_f, det_m = detectors
    else:
        det_f = SIFT3D(params) if params else SIFT3D()
        det_m = SIFT3D(params) if params else SIFT3D()

    kp_f = det_f.detect_keypoints(fixed)
    kp_m = det_m.detect_keypoints(moving)
    if kp_limit:
        kp_f = kp_f.sort_by_strength(kp_limit)
        kp_m = kp_m.sort_by_strength(kp_limit)
    if len(kp_f) == 0 or len(kp_m) == 0:
        # a featureless volume cannot be registered; degrade the same
        # way <4 matches does (extract_descriptors itself would raise,
        # mirroring the reference's verify_keys, sift.c:1171-1212)
        empty = np.zeros((0, 3), np.float32)
        return RegistrationResult(
            affine=None, num_matches=0, num_inliers=0,
            matches_fixed=empty, matches_moving=empty,
            inlier_mask=np.zeros(0, bool))
    ds_f = det_f.extract_descriptors(kp_f)
    ds_m = det_m.extract_descriptors(kp_m)

    idx_m, idx_f = match_descriptors(ds_m, ds_f, nn_thresh)
    pts_m = ds_m.xyz[idx_m]
    pts_f = ds_f.xyz[idx_f]
    # refit weights: integer keypoint coords at octave resolution carry
    # 4^o position variance (see _ransac_core)
    q = (4.0 ** kp_m.octave[idx_m] + 4.0 ** kp_f.octave[idx_f])
    A, inl = ransac_affine(pts_m, pts_f, err_thresh, num_iter, seed,
                           weights=1.0 / q)
    return RegistrationResult(
        affine=A, num_matches=len(idx_m),
        num_inliers=int(inl.sum()) if A is not None else 0,
        matches_fixed=pts_f, matches_moving=pts_m, inlier_mask=inl)


def register_batch(fixed_vols, moving_vols, params=None,
                   nn_thresh: float = 0.8, err_thresh: float = 5.0,
                   num_iter: int = 500, kp_limit: int = 0, seed: int = 0,
                   units=(1.0, 1.0, 1.0),
                   det=None) -> "list[RegistrationResult]":
    """Register B same-shape volume pairs (BASELINE config 5).

    All 2B volumes run through ONE batched detection program
    (SIFT3D.detect_keypoints_batch); pass the stacked arrays pre-sharded
    over a device mesh batch axis to distribute the work over ICI.
    Matching + RANSAC for ALL pairs fuse into one dispatch
    (_register_pairs_jit): per-pair jits each cost an upload + two RTT
    syncs on a high-latency link — measured ~80 ms/pair through the
    tunneled chip, the dominant batch cost before fusion.

    A pair with fewer than 4 matches yields affine=None, num_inliers=0.
    """
    from .pipeline import SIFT3D

    B = len(fixed_vols)
    if len(moving_vols) != B:
        raise ValueError("fixed/moving batch sizes differ")
    if det is None:
        det = SIFT3D(params) if params else SIFT3D()
    import jax.numpy as jnp_
    vols = jnp_.concatenate([jnp_.asarray(fixed_vols, jnp_.float32),
                             jnp_.asarray(moving_vols, jnp_.float32)])
    kps = det.detect_keypoints_batch(vols, units)
    if kp_limit:
        kps = [k.sort_by_strength(kp_limit) for k in kps]
    dss = det.extract_descriptors_batch(kps)

    # moving (dss[B+b]) matches against fixed (dss[b]); buckets shared
    # across the batch so the fused program caches per (M1, M2) pair.
    n_m = [len(dss[B + b]) for b in range(B)]
    n_f = [len(dss[b]) for b in range(B)]
    M1 = _pow2_bucket(max(max(n_m), 1))
    M2 = _pow2_bucket(max(max(n_f), 1))

    def stack(ds_list, kp_list, M):
        d = np.stack([_pad_rows(np.asarray(ds.data, np.float32), M)
                      for ds in ds_list])
        x = np.stack([_pad_rows(np.asarray(ds.xyz, np.float32), M)
                      for ds in ds_list])
        # per-keypoint position variance 4^octave (refit weights); pad
        # rows get 1.0 so the weight expression stays finite
        q = np.ones((B, M), np.float32)
        v = np.zeros((B, M), bool)
        for b, (ds, kp) in enumerate(zip(ds_list, kp_list)):
            v[b, :len(ds)] = True
            q[b, :len(ds)] = 4.0 ** kp.octave
        return jnp.asarray(d), jnp.asarray(x), jnp.asarray(q), \
            jnp.asarray(v)

    d1, x1, q1, v1 = stack([dss[B + b] for b in range(B)],
                           [kps[B + b] for b in range(B)], M1)
    d2, x2, q2, v2 = stack([dss[b] for b in range(B)],
                           [kps[b] for b in range(B)], M2)
    A_b, n_b, ninl_b, inl_b, src_b, dst_b = jax.device_get(
        _register_pairs_jit(d1, x1, q1, v1, d2, x2, q2, v2,
                            jax.random.PRNGKey(seed), float(nn_thresh),
                            int(num_iter), float(err_thresh)))

    out = []
    for b in range(B):
        n = int(n_b[b])
        pts_m, pts_f = src_b[b, :n], dst_b[b, :n]
        if n < 4:
            out.append(RegistrationResult(
                affine=None, num_matches=n, num_inliers=0,
                matches_fixed=pts_f, matches_moving=pts_m,
                inlier_mask=np.zeros(n, bool)))
            continue
        out.append(RegistrationResult(
            affine=np.asarray(A_b[b]), num_matches=n,
            num_inliers=int(ninl_b[b]), matches_fixed=pts_f,
            matches_moving=pts_m, inlier_mask=np.asarray(inl_b[b, :n])))
    return out


# ---------------------------------------------------------------------------
# Warping
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("out_shape",))
def _warp_jit(vol, A_inv, out_shape):
    """Inverse-map trilinear resampling: out[x] = vol(A_inv [x; 1])."""
    grids = [jax.lax.broadcasted_iota(jnp.float32, out_shape, a)
             for a in range(3)]
    pts = jnp.stack(
        [g.ravel() for g in grids] + [jnp.ones(
            out_shape[0] * out_shape[1] * out_shape[2], jnp.float32)],
        axis=1)                                       # [V, 4]
    src = pts @ A_inv.T                               # [V, 3]

    n = jnp.asarray(vol.shape, jnp.float32)
    lo = jnp.floor(src)
    fr = src - lo
    lo = lo.astype(jnp.int32)

    def take(ox, oy, oz):
        ix = jnp.clip(lo[:, 0] + ox, 0, vol.shape[0] - 1)
        iy = jnp.clip(lo[:, 1] + oy, 0, vol.shape[1] - 1)
        iz = jnp.clip(lo[:, 2] + oz, 0, vol.shape[2] - 1)
        return vol[ix, iy, iz]

    out = jnp.zeros(src.shape[0], jnp.float32)
    for ox in (0, 1):
        wx = (1 - fr[:, 0]) if ox == 0 else fr[:, 0]
        for oy in (0, 1):
            wy = (1 - fr[:, 1]) if oy == 0 else fr[:, 1]
            for oz in (0, 1):
                wz = (1 - fr[:, 2]) if oz == 0 else fr[:, 2]
                out = out + wx * wy * wz * take(ox, oy, oz)

    inside = jnp.all((src >= 0) & (src <= n - 1), axis=1)
    return jnp.where(inside, out, 0.0).reshape(out_shape)


def warp_volume(moving, affine: np.ndarray, out_shape) -> Volume:
    """Resample `moving` into the fixed grid given affine (moving->fixed)."""
    moving = as_volume(moving)
    A = np.eye(4, dtype=np.float64)
    A[:3, :] = np.asarray(affine, np.float64)
    A_inv = np.linalg.inv(A)[:3, :].astype(np.float32)
    out = _warp_jit(moving.data, jnp.asarray(A_inv), tuple(out_shape))
    return Volume(out, moving.units)
