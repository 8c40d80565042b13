"""Subvoxel keypoint refinement and Hessian edge rejection.

The reference fork removed both (refinement in 1.4.1, "did not improve the
accuracy", /root/reference/CHANGES.md:56; the Hessian macro survives as dead
code, immacros.h:113-150), so they are OFF by default for parity. They are
part of the classic SIFT pipeline (Lowe 2004, generalized to 3D here) and the
BASELINE configs exercise them, so they are available as opt-in features:

 - `DetectorParams(refine_subvoxel=True)`: quadratic (Taylor) fit of the DoG
   around each extremum; spatial offset = -H^-1 g solved batched over all
   candidates as [K,3,3] linear systems, plus an independent quadratic scale
   offset from the level triple. Offsets are clamped to [-1, 1] voxels.
 - `DetectorParams(edge_thresh=r)`: reject candidates whose spatial Hessian
   eigenvalue magnitudes are too anisotropic (max|l| / min|l| > r) or of
   mixed sign (saddle points) — the 3D analogue of Lowe's edge criterion.

Everything is one fused batched pass: 3x3x3 neighborhood gathers around the
(at most `capacity`) candidates, closed-form derivatives, batched eigh/solve.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .params import DetectorParams


class RefinementResult(NamedTuple):
    offset: jnp.ndarray   # f32[K, 3] subvoxel offset (zeros when disabled)
    ds: jnp.ndarray       # f32[K] scale-axis offset in level units
    edge_ok: jnp.ndarray  # bool[K] False = rejected by the edge criterion


def _gather_neighborhood(level, coords):
    """[K, 3, 3, 3] neighborhoods; coords are interior ([1, n-2])."""
    def one(c):
        return jax.lax.dynamic_slice(level, (c[0] - 1, c[1] - 1, c[2] - 1),
                                     (3, 3, 3))
    return jax.vmap(one)(coords)


def refine_candidates(prev, cur, next_, coords, valid,
                      params: DetectorParams) -> RefinementResult:
    """Refine extrema candidates on one DoG level triple."""
    nb = _gather_neighborhood(cur, coords)         # [K, 3, 3, 3]

    def center(level):
        return jax.vmap(lambda c: level[c[0], c[1], c[2]])(coords)
    return _refine_core(nb, center(prev), center(next_), valid, params)


def refine_candidates_octave(dog_oct, coords, lvl, valid,
                             params: DetectorParams) -> RefinementResult:
    """Refinement for an octave-fused candidate store: dog_oct
    [num_dog_levels, nx, ny, nz], candidates on raw level lvl (DoG stacked
    index lvl + 1)."""
    def gather(c, l):
        return jax.lax.dynamic_slice(
            dog_oct, (l, c[0] - 1, c[1] - 1, c[2] - 1), (3, 3, 3, 3))
    nb4 = jax.vmap(gather)(coords, lvl)            # [K, 3(level), 3, 3, 3]
    return _refine_core(nb4[:, 1], nb4[:, 0, 1, 1, 1], nb4[:, 2, 1, 1, 1],
                        valid, params)


def _refine_core(nb, dp, dn, valid, params: DetectorParams):
    """Shared math: nb [K,3,3,3] = cur-level neighborhood; dp/dn [K] =
    center values of the prev/next DoG levels."""
    K = nb.shape[0]
    c0 = nb[:, 1, 1, 1]

    # Gradient (central differences).
    gx = 0.5 * (nb[:, 2, 1, 1] - nb[:, 0, 1, 1])
    gy = 0.5 * (nb[:, 1, 2, 1] - nb[:, 1, 0, 1])
    gz = 0.5 * (nb[:, 1, 1, 2] - nb[:, 1, 1, 0])
    g = jnp.stack([gx, gy, gz], axis=-1)

    # Spatial Hessian (second central differences; cross terms from the
    # diagonal neighbors — same stencil as the reference's dead
    # SIFT3D_IM_GET_HESSIAN macro, immacros.h:113-150).
    hxx = nb[:, 2, 1, 1] - 2 * c0 + nb[:, 0, 1, 1]
    hyy = nb[:, 1, 2, 1] - 2 * c0 + nb[:, 1, 0, 1]
    hzz = nb[:, 1, 1, 2] - 2 * c0 + nb[:, 1, 1, 0]
    hxy = 0.25 * (nb[:, 2, 2, 1] - nb[:, 2, 0, 1]
                  - nb[:, 0, 2, 1] + nb[:, 0, 0, 1])
    hxz = 0.25 * (nb[:, 2, 1, 2] - nb[:, 2, 1, 0]
                  - nb[:, 0, 1, 2] + nb[:, 0, 1, 0])
    hyz = 0.25 * (nb[:, 1, 2, 2] - nb[:, 1, 2, 0]
                  - nb[:, 1, 0, 2] + nb[:, 1, 0, 0])
    H = jnp.stack([
        jnp.stack([hxx, hxy, hxz], -1),
        jnp.stack([hxy, hyy, hyz], -1),
        jnp.stack([hxz, hyz, hzz], -1)], axis=-2)   # [K, 3, 3]

    # --- edge rejection ---
    if params.edge_thresh is not None:
        from .orientation import eigh3x3
        lam, _ = eigh3x3(H)                         # ascending, [K, 3]
        alam = jnp.abs(lam)
        ratio = jnp.max(alam, axis=-1) / jnp.maximum(
            jnp.min(alam, axis=-1), 1e-20)
        same_sign = (jnp.all(lam > 0, axis=-1) | jnp.all(lam < 0, axis=-1))
        edge_ok = same_sign & (ratio <= jnp.float32(params.edge_thresh))
        edge_ok = edge_ok | ~valid
    else:
        edge_ok = jnp.ones((K,), bool)

    # --- subvoxel offset ---
    if params.refine_subvoxel:
        # Regularize to keep the solve well-posed on degenerate candidates;
        # offsets are clamped to one voxel anyway.
        Hr = H + 1e-12 * jnp.eye(3, dtype=H.dtype)
        off = -jnp.linalg.solve(Hr, g[..., None])[..., 0]
        off = jnp.clip(jnp.nan_to_num(off), -1.0, 1.0)

        # Scale axis: independent 1-D quadratic through (prev, cur, next).
        gs = 0.5 * (dn - dp)
        hss = dn - 2 * c0 + dp
        ds = jnp.where(jnp.abs(hss) > 1e-20, -gs / hss, 0.0)
        ds = jnp.clip(jnp.nan_to_num(ds), -1.0, 1.0)
    else:
        off = jnp.zeros((K, 3), jnp.float32)
        ds = jnp.zeros((K,), jnp.float32)

    return RefinementResult(off.astype(jnp.float32), ds.astype(jnp.float32),
                            edge_ok)
