"""End-to-end detector pipeline.

Mirrors the reference's public workflow (sift3d_detect_keypoints,
/root/reference/sift3d/sift.c:1217-1249; sift3d_extract_descriptors,
sift.c:1615-1635): a detector object holds the configuration and, after
detection, the Gaussian pyramid from which descriptors are extracted.

Execution model: detection traces into one jitted XLA computation per
(input shape, units, params) — scale-to-[-1,1], Gaussian pyramid as banded
matmuls, DoG, fused extrema stencils, batched orientation assignment. A short
host step then compacts the fixed-capacity per-level candidate stores into
the final keypoint list. Descriptor extraction groups keypoints by pyramid
level on the host (window shapes are static per level), pads each group to a
small power-of-two bucket, and runs a jitted matmul-based extractor per
group; compilations are cached per bucket size.

Reference quirk replicated deliberately: the reference's compaction copies
every keypoint field EXCEPT strength (copy_Keypoint, sift.c:372-384 has no
strength assignment), so surviving keypoint j inherits the strength of the
j-th pre-filter *candidate* in scan order. The CLI's top-100 selection sorts
by these stale values. We reproduce this by default for parity;
set stale_strength_compat=False in SIFT3D() for true strengths.
"""

from __future__ import annotations

import functools
import warnings
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .descriptor import extract_descriptors as _extract_level
from .detect import default_capacity
from .keypoints import Descriptors, Keypoints
from .orientation import assign_orientations
from .params import DESC_NUMEL, DetectorParams
from .pyramid import (PyramidPlan, build_gpyr_and_dog, make_plan,
                      scale_to_unit)
from .volume import as_volume


@functools.lru_cache(maxsize=32)
def _detect_fn(plan: PyramidPlan):
    """Pyramid + DoG + extrema candidates, one fused pass per octave (no
    orientation — that stage is bucketed to the actual candidate counts, see
    _orient_fn). Octave candidate stores keep the reference's global
    candidate order (levels are the inner loop of the reference's octave
    scan)."""
    from .detect import detect_extrema_octave

    params = plan.params
    nl = params.num_kp_levels
    caps = {}
    for o in range(plan.num_octaves):
        nvox = int(np.prod(plan.octave_dims[o]))
        per_level = (params.kp_per_level if params.kp_per_level
                     else default_capacity(nvox))
        caps[o] = nl * per_level

    extensions = params.refine_subvoxel or params.edge_thresh is not None

    @jax.jit
    def run(data):
        x = scale_to_unit(data)
        gpyr, dogs, dmaxes = build_gpyr_and_dog(x, plan,
                                                with_dogmax=True)
        out = []
        for o in range(plan.num_octaves):
            dog_oct = dogs[o]
            cand = detect_extrema_octave(dog_oct, params, caps[o],
                                         dogmax=dmaxes[o])
            if extensions:
                from .refinement import refine_candidates_octave
                ref = refine_candidates_octave(
                    dog_oct, cand.coords, cand.level, cand.valid, params)
            else:
                ref = None
            out.append((cand, ref))
        counts = jnp.stack([c.counts for c, _ in out])
        return gpyr, out, counts

    return run, caps


@functools.lru_cache(maxsize=64)
def _redetect_octave_fn(plan: PyramidPlan, octave: int, capacity: int,
                        extensions: bool):
    """Re-detect one octave's extrema with an enlarged candidate capacity.

    Used when the default fixed-capacity store overflowed: the per-level
    counts are exact (computed from the stencil mask before compaction), so
    retrying with capacity >= total preserves the reference's
    never-drop-candidates semantics (slab growth, immacros.h:199-222) at the
    cost of one extra dispatch for the rare overflowing octave."""
    from .detect import detect_extrema_octave

    params = plan.params

    @jax.jit
    def run(gpyr_oct):
        dog_oct = gpyr_oct[:-1] - gpyr_oct[1:]
        cand = detect_extrema_octave(dog_oct, params, capacity)
        if extensions:
            from .refinement import refine_candidates_octave
            ref = refine_candidates_octave(
                dog_oct, cand.coords, cand.level, cand.valid, params)
        else:
            ref = None
        return cand, ref

    return run


def _retry_capacity(total: int) -> int:
    return max(64, 1 << (total - 1).bit_length())


@functools.lru_cache(maxsize=256)
def _orient_fn(plan: PyramidPlan, octave: int, dog_idx: int, bucket: int):
    params = plan.params
    sd = plan.scales[octave][dog_idx]
    units = plan.level_units(octave)

    @jax.jit
    def run(level, coords, valid):
        return assign_orientations(level, coords, valid, sd, units, params)

    return run


@functools.lru_cache(maxsize=64)
def _orient_octave_fn(plan: PyramidPlan, octave: int, bucket: int):
    """Orientation for a mixed-level octave candidate batch: per-candidate
    scale from the level index, windows sized by the octave's largest level
    scale. Lets orientation dispatch before candidate counts reach the host
    (speculative; see detect_keypoints). Takes the FULL candidate store and
    slices the first `bucket` slots inside the jit (plus the host-bound
    coords/strength payload) so the caller issues no eager device ops."""
    params = plan.params
    nl = params.num_kp_levels
    units = plan.level_units(octave)
    scales = np.asarray(
        [plan.scales[octave][1 + li] for li in range(nl)], np.float32)
    sd_max = float(scales.max())

    @jax.jit
    def run(gpyr_oct, coords, level, valid, strength):
        co, lvl, va = coords[:bucket], level[:bucket], valid[:bucket]
        sd_arr = jnp.asarray(scales)[lvl]
        lv = gpyr_oct[1:1 + nl]                     # [nl, nx, ny, nz]
        ori = assign_orientations(
            lv, co, va, sd_arr, units, params, sd_max=sd_max,
            level_index=lvl, fractional_centers=False)
        return ori, co, strength[:bucket]

    return run


@functools.lru_cache(maxsize=256)
def _orient_fn_ext(plan: PyramidPlan, octave: int, dog_idx: int,
                   bucket: int):
    """Orientation with fractional centers and per-keypoint scales
    (subvoxel-refinement mode)."""
    params = plan.params
    sd_level = plan.scales[octave][dog_idx]
    # refined |ds| <= 1 level unit
    sd_max = sd_level * 2.0 ** (1.0 / params.num_kp_levels)
    units = plan.level_units(octave)

    @jax.jit
    def run(level, coords, valid, centers, sd_arr):
        return assign_orientations(level, coords, valid, sd_arr, units,
                                   params, centers=centers, sd_max=sd_max)

    return run


def _bucket(n: int, cap: int, minimum: int = 32) -> int:
    return min(cap, max(minimum, 1 << (max(n, 1) - 1).bit_length()))


# Speculative whole-octave orientation window (slots); octaves with more
# candidates fall back to exact per-segment dispatches.
_SPEC_ORI_SLOTS = 256

# HBM budget for one sub-batch dispatch of the fused batched program (the
# program's window transients cost ~10-15x the volume per batch element).
_BATCH_HBM_BUDGET = 2_500_000_000


@functools.lru_cache(maxsize=64)
def _seg_slice_fn(bucket: int, with_ref: bool):
    """Jitted extraction of a level segment [start, start+bucket) from an
    octave candidate store (padded so the slice never clamps)."""
    @jax.jit
    def run(coords, strength, start, ref_off=None, ref_ds=None,
            ref_edge=None):
        co = jax.lax.dynamic_slice(
            jnp.pad(coords, ((0, bucket), (0, 0))), (start, 0), (bucket, 3))
        st = jax.lax.dynamic_slice(
            jnp.pad(strength, (0, bucket)), (start,), (bucket,))
        if with_ref:
            ro = jax.lax.dynamic_slice(
                jnp.pad(ref_off, ((0, bucket), (0, 0))), (start, 0),
                (bucket, 3))
            rd = jax.lax.dynamic_slice(
                jnp.pad(ref_ds, (0, bucket)), (start,), (bucket,))
            re = jax.lax.dynamic_slice(
                jnp.pad(ref_edge, (0, bucket)), (start,), (bucket,))
            return co, st, ro, rd, re
        return co, st
    return run


@functools.lru_cache(maxsize=256)
def _extract_oct_fn(plan: PyramidPlan, octave: int, bucket: int,
                    refined: bool):
    """Descriptors for a mixed-level octave keypoint batch: per-keypoint
    scales and level indices, windows sized by the octave's largest level
    scale. One dispatch per octave instead of one per (octave, level)."""
    params = plan.params
    nl = params.num_kp_levels
    units = plan.level_units(octave)
    sd_max = plan.scales[octave][nl]  # largest keypoint-level scale
    if refined:
        sd_max *= 2.0 ** (1.0 / nl)   # refined |ds| <= 1 level unit

    @jax.jit
    def run(gpyr_oct, coords, R, valid, centers, sd_arr, lvl):
        lv = gpyr_oct[1:1 + nl]
        return _extract_level(lv, coords, R, valid, sd_arr, octave, units,
                              params, centers=centers, sd_max=sd_max,
                              level_index=lvl, fractional_centers=refined)

    return run


def _mult_of(n: int, m: int) -> int:
    return -(-n // m) * m


# The hinted-pipeline execution-policy knobs (dense_octave_acc/cand,
# sparse_desc_groups, split_desc_chunks, min_chunk_cost) live on
# DetectorParams (params.py) — hashable, validated, and part of every
# lru_cached program builder's key via the plan.


def _hint_cfg(plan: PyramidPlan, hint: dict, params,
              tight: bool = False) -> tuple:
    """Static per-octave (capacity, ori_slots, desc_slots) sizing for the
    fused hinted program, from the previous detection's per-octave
    (candidates, accepted, accepted_per_level, candidates_per_level)
    counts. Headroom factors absorb volume-to-volume drift in a workload
    of similar inputs; quantization keeps the set of compiled programs
    small. Undershoot is never wrong: capacity overflow re-detects
    exactly, ori/desc overflow falls back to the exact per-segment path.
    ori_slots/desc_slots are ints (one mixed-level pass per octave) or
    per-level tuples together (dense octaves; params.dense_octave_*).

    tight=True (a STABLE workload: the same counts observed on
    consecutive detections, SIFT3D._hint_streak) shrinks the drift
    headroom 25% -> ~3%: padding slots still pay window prep and payload
    bytes, and a stable workload does not need the margin. A later miss
    costs one exact-path fallback and resets the streak."""
    nl = params.num_kp_levels
    hr = 5 if tight else 2           # headroom shift: c >> hr
    cfg = []
    for o in range(plan.num_octaves):
        total, acc, acc_l, cand_l = hint.get(
            o, (0, 0, (0,) * nl, (0,) * nl))
        if params.kp_per_level:
            cap = nl * params.kp_per_level
        else:
            # Candidate-store capacity: compaction slot resolution and
            # the store transfers scale with it (measured ~4 ms of the
            # sparse bench at the 2x sizing), so a stable workload runs
            # the next power of two above ~1.13x the observed count
            # instead of 2x (overflow re-detects the octave exactly
            # either way; non-pow2 multiples-of-64 measured noisier/
            # slower — keep capacities powers of two).
            head = total + (total >> 3) if tight else 2 * total - 1
            cap = max(128, 1 << max(head, 1).bit_length())

        def oslots(c):
            s = min(cap, max(32 if tight else 64,
                             _mult_of(c + (c >> hr) + 1, 32 if tight
                                      else 64)))
            if s > 256:
                # keep compatible with orientation's internal chunking
                # (chunked_vmap asserts slots % 256 == 0 above 256)
                s = min(cap, _mult_of(s, 256))
            return s

        if acc >= params.dense_octave_acc or total >= params.dense_octave_cand:
            ospec = tuple(oslots(c) for c in cand_l)
            dslots = tuple(max(8, _mult_of(a + (a >> hr) + 1, 8))
                           for a in acc_l)
        else:
            ospec = oslots(total)
            if params.sparse_desc_groups and nl >= 2:
                # Per-LEVEL descriptor window groups: each level's
                # windows sized by ITS scale (window volume scales as
                # sd^3 — the octave-max mixed window spends ~2-4x the
                # voxels a smaller-scale keypoint needs). A level
                # observed empty gets 0 slots (a later appearance is a
                # hint miss -> exact redo, same as any other
                # undershoot). Orientation stays mixed: its windows are
                # far smaller and the split did not pay there.
                # tight (stable workload): EXACT slots + 1 — descriptor
                # cost is ~linear in slots (prep ~135 us/slot at 75^3
                # windows, tools/prep_micro.py), so pack-size rounding
                # padding is real money; the extractor pads internally
                # to the kernel pack where needed.
                def dsl(a):
                    if a == 0:
                        return 0
                    if tight:
                        return a + 1
                    return max(8, _mult_of(a + (a >> hr) + 1, 8))
                dslots = tuple(dsl(a) for a in acc_l)
            else:
                dslots = max(8, _mult_of(acc + (acc >> hr) + 1, 8))
        cfg.append((cap, ospec, dslots))
    return tuple(cfg)


def _hint_env(hists: list[dict], n_oct: int, nl: int) -> dict:
    """Per-octave elementwise max over raw hint dicts: the envelope that
    sizes the next hinted program for a stream of similar volumes."""
    return {o: (max(h[o][0] for h in hists),
                max(h[o][1] for h in hists),
                tuple(max(h[o][2][li] for h in hists) for li in range(nl)),
                tuple(max(h[o][3][li] for h in hists) for li in range(nl)))
            for o in range(n_oct)}


def _hint_fit(plan: PyramidPlan, cfg: tuple, counts, octs_host) -> bool:
    """True iff every octave's candidates and accepted keypoints fit the
    hinted capacities (speculation is then exact and complete)."""
    for o in range(plan.num_octaves):
        cap, ospec, dslots = cfg[o]
        if int(np.sum(counts[o])) > cap:
            return False
        od = octs_host[o]
        if isinstance(ospec, tuple):
            for li, (os_li, ds_li) in enumerate(zip(ospec, dslots)):
                if (int(counts[o][li]) > os_li
                        or int(od["levels"][li]["acc_count"]) > ds_li):
                    return False
        elif int(np.sum(counts[o])) > ospec:
            return False
        elif isinstance(dslots, tuple):   # sparse two-group desc split
            if any(int(g["acc_count"]) > ds
                   for g, ds in zip(od["groups"], dslots)):
                return False
        elif int(od["acc_count"]) > dslots:
            return False
    return True


def _quantize(desc):
    """12-bit fixed-point descriptor transport: per-descriptor scale, two
    values packed into 3 bytes. The payload transfer is serial with the
    RTT on a high-latency link, so every byte counts: quantization error
    <= dmax/8190 <= 4.3e-5 absolute — two orders below the 1% descriptor
    parity tolerance; at the dense bench's ~850 keypoints the 25% byte
    cut over uint16 is worth ~9 ms of link time."""
    dmax = jnp.max(desc, axis=1)
    dscale = jnp.where(dmax > 0, dmax, 1.0).astype(jnp.float32)
    q = jnp.round(desc / dscale[:, None] * 4095.0).astype(jnp.uint16)
    v0, v1 = q[:, 0::2], q[:, 1::2]
    b0 = (v0 & 0xFF).astype(jnp.uint8)
    b1 = ((v0 >> 8) | ((v1 & 0xF) << 4)).astype(jnp.uint8)
    b2 = (v1 >> 4).astype(jnp.uint8)
    desc_q = jnp.stack([b0, b1, b2], axis=-1).reshape(q.shape[0], -1)
    return desc_q, dscale


_DESC_Q_BYTES = DESC_NUMEL // 2 * 3   # 12-bit packed row bytes


def _dequant12(desc_q: np.ndarray, desc_scale: np.ndarray,
               k: int) -> np.ndarray:
    """Host-side inverse of _quantize for the first k rows."""
    q = desc_q[:k].reshape(k, -1, 3).astype(np.uint16)
    v0 = q[:, :, 0] | ((q[:, :, 1] & 0xF) << 8)
    v1 = (q[:, :, 1] >> 4) | (q[:, :, 2] << 4)
    desc = np.empty((k, DESC_NUMEL), np.float32)
    desc[:, 0::2] = v0
    desc[:, 1::2] = v1
    desc *= desc_scale[:k][:, None] / np.float32(4095.0)
    return desc


class _DescJob(NamedTuple):
    """One speculative-descriptor extraction unit of the hinted program:
    `slots` keypoint slots on octave `octave`, keypoint levels
    [lv_lo, lv_hi) (raw s indices), windows sized by the span's largest
    scale. `path` addresses the payload dict the results land in; `cost`
    is the static window-voxel load (slots x window volume) used to
    balance the split-pipeline chunks (_chunk_plan)."""
    octave: int
    lv_lo: int
    lv_hi: int
    slots: int
    cost: int
    path: tuple


def _desc_window_cost(plan: PyramidPlan, octave: int, sd_max: float,
                      params) -> int:
    from .descriptor import _level_radius
    from .windows import window_extent
    dims = plan.octave_dims[octave]
    units = plan.level_units(octave)
    rad = _level_radius(sd_max, params)
    ext = [window_extent(rad / units[a], dims[a]) for a in range(3)]
    return ext[0] * ext[1] * ext[2]


def _desc_jobs(plan: PyramidPlan, cfg: tuple) -> list[_DescJob]:
    """The descriptor workload of the hinted program at this cfg, in
    payload consumption order (octave ascending, levels/groups ascending
    inside — the store is level-segmented, so this is also the
    reference's keypoint order)."""
    params = plan.params
    nl = params.num_kp_levels
    jobs = []
    for o, (cap, ospec, dslots) in enumerate(cfg):
        scales = [float(plan.scales[o][1 + li]) for li in range(nl)]
        if isinstance(ospec, tuple):           # dense: per level
            for li in range(nl):
                jobs.append(_DescJob(
                    o, li, li + 1, dslots[li],
                    dslots[li] * _desc_window_cost(plan, o, scales[li],
                                                   params),
                    (o, "levels", li)))
        elif isinstance(dslots, tuple):        # sparse per-level groups
            for li in range(nl):
                jobs.append(_DescJob(
                    o, li, li + 1, dslots[li],
                    dslots[li] * _desc_window_cost(plan, o, scales[li],
                                                   params),
                    (o, "groups", li)))
        else:                                  # sparse mixed window
            jobs.append(_DescJob(
                o, 0, nl, dslots,
                dslots * _desc_window_cost(plan, o, max(scales), params),
                (o,)))
    return jobs


def _path_get(octs, path):
    tgt = octs[path[0]]
    for k in path[1:]:
        tgt = tgt[k]
    return tgt


def _desc_job_compute(plan: PyramidPlan, job: _DescJob, gpyr_oct,
                      co, R, dvalid, lvk):
    """Descriptor histograms for (a row slice of) one job: the same
    _extract_level call the exact fallback paths make, minus the xyz/sd
    outputs (the keypoint payload computes those window-free)."""
    params = plan.params
    nl = params.num_kp_levels
    units = plan.level_units(job.octave)
    scales = np.asarray(
        [plan.scales[job.octave][1 + li] for li in range(nl)], np.float32)
    if job.lv_hi - job.lv_lo == 1:
        res = _extract_level(
            gpyr_oct[1 + job.lv_lo], co, R, dvalid,
            float(scales[job.lv_lo]), job.octave, units, params)
    else:
        lv = gpyr_oct[1 + job.lv_lo:1 + job.lv_hi]
        res = _extract_level(
            lv, co, R, dvalid, jnp.asarray(scales)[lvk], job.octave,
            units, params, centers=co.astype(jnp.float32),
            sd_max=float(scales[job.lv_lo:job.lv_hi].max()),
            level_index=lvk - job.lv_lo, fractional_centers=False)
    return res.desc


def _detect_core(plan: PyramidPlan, cfg: tuple, vmapped: bool):
    """The single-volume hinted detection body MINUS the descriptor
    histograms: pyramid + DoG + extrema + candidate compaction +
    orientation + the keypoint-payload leaves. Returns (gpyr, cands,
    counts, octs, desc_args): octs is the host-bound payload with the
    desc_q/desc_scale leaves absent, and desc_args[i] holds the
    device-resident inputs (coords, R, valid, level) of _desc_jobs()[i].

    The split lets _detect_split_packed_fn dispatch descriptors as
    separate programs so the keypoint payload transfer overlaps their
    device time; _detect_full_body composes both into one program (the
    batched/vmapped forms). vmapped=True selects the XLA fallbacks for
    the Pallas kernels (which have no batching rule)."""
    from .detect import compact_flat, detect_extrema_octave

    params = plan.params
    nl = params.num_kp_levels
    ori_pallas = False if vmapped else None
    xla_only = False if vmapped else None

    # Rejection-funnel counts in the reference's short-circuit order
    # (sift.c:996-1102).
    def stages(ori):
        g = ori.reject_grad
        r = ~g & ori.reject_ratio
        c = ~g & ~ori.reject_ratio & ori.reject_corner
        return jnp.stack([g, r, c, ori.accepted])

    def core(data):
        x = scale_to_unit(data)
        gpyr, dogs, dmaxes = build_gpyr_and_dog(x, plan,
                                                use_pallas=xla_only,
                                                with_dogmax=True)
        cands, octs, desc_args = [], [], []
        for o, (cap, ospec, dslots) in enumerate(cfg):
            coord_factor = jnp.float32(2.0 ** o)
            dog_oct = dogs[o]
            cand = detect_extrema_octave(dog_oct, params, cap,
                                         use_pallas=xla_only,
                                         dogmax=dmaxes[o])
            units = plan.level_units(o)
            scales = np.asarray(
                [plan.scales[o][1 + li] for li in range(nl)], np.float32)
            cands.append(cand)

            if isinstance(ospec, tuple):
                # Dense octave: orientation AND descriptors grouped per
                # level — each level's windows sized by ITS scale (the
                # mixed window holds up to 4x the voxels; measured -35%
                # on the descriptor stage at ~1000 keypoints). Per-level
                # selection preserves candidate order (levels are store
                # segments), and the numerics equal the exact per-segment
                # fallback path exactly (same windows, same scalar sd).
                levels_out = []
                for li in range(nl):
                    os_li, ds_li = ospec[li], dslots[li]
                    sd_li = float(scales[li])
                    level = gpyr[o][1 + li]
                    sel = cand.valid & (cand.level == li)
                    idx, lvalid, _ = compact_flat(sel, os_li)
                    co = cand.coords[idx]
                    ori = assign_orientations(
                        level, co, lvalid, sd_li, units, params,
                        chunk=(256 if os_li % 256 == 0 else os_li),
                        use_pallas=ori_pallas)
                    idxd, dvalid, acc_l = compact_flat(ori.accepted, ds_li)
                    cod = co[idxd]
                    desc_args.append((cod, ori.R[idxd], dvalid,
                                      jnp.full((ds_li,), li, jnp.int32)))
                    levels_out.append(dict(
                        acc_count=acc_l, coords=cod, R=ori.R[idxd],
                        strength_true=cand.strength[idx][idxd],
                        xyz=cod.astype(jnp.float32) * coord_factor,
                        sd=jnp.full((ds_li,), jnp.float32(sd_li)),
                        funnel=jnp.sum(stages(ori), axis=1,
                                       dtype=jnp.int32)))
                octs.append(dict(
                    levels=levels_out,
                    strengths=cand.strength[:min(cap, sum(ospec))]))
                continue

            sd_max = float(scales.max())
            lv = gpyr[o][1:1 + nl]
            level_s = cand.level[:ospec]
            ori = assign_orientations(
                lv, cand.coords[:ospec], cand.valid[:ospec],
                jnp.asarray(scales)[level_s], units, params,
                sd_max=sd_max, level_index=level_s,
                fractional_centers=False,
                chunk=(256 if ospec % 256 == 0 else ospec),
                use_pallas=ori_pallas)
            onehot = (level_s[None, :]
                      == jnp.arange(nl, dtype=jnp.int32)[:, None])
            funnel = jnp.einsum(
                "ls,ks->lk", onehot.astype(jnp.float32),
                stages(ori).astype(jnp.float32)).astype(jnp.int32)
            if isinstance(dslots, tuple):
                # Per-level descriptor groups: store order is
                # level-segmented, so group order preserves the
                # reference's candidate order.
                groups = []
                for lo, hi, ds_g in ((li, li + 1, dslots[li])
                                     for li in range(nl)):
                    gsel = (ori.accepted & (level_s >= lo)
                            & (level_s < hi))
                    idx, dvalid, acc_g = compact_flat(gsel, ds_g)
                    co = cand.coords[:ospec][idx]
                    lvk = level_s[idx]
                    desc_args.append((co, ori.R[idx], dvalid, lvk))
                    groups.append(dict(
                        acc_count=acc_g, coords=co, level=lvk,
                        R=ori.R[idx],
                        strength_true=cand.strength[:ospec][idx],
                        xyz=co.astype(jnp.float32) * coord_factor,
                        sd=jnp.asarray(scales)[lvk]))
                octs.append(dict(groups=groups,
                                 strengths=cand.strength[:ospec],
                                 funnel=funnel))
            else:
                idx, dvalid, acc_count = compact_flat(ori.accepted,
                                                      dslots)
                co = cand.coords[:ospec][idx]
                lvk = level_s[idx]
                desc_args.append((co, ori.R[idx], dvalid, lvk))
                octs.append(dict(
                    acc_count=acc_count,
                    coords=co, level=lvk, R=ori.R[idx],
                    strength_true=cand.strength[:ospec][idx],
                    xyz=co.astype(jnp.float32) * coord_factor,
                    sd=jnp.asarray(scales)[lvk],
                    strengths=cand.strength[:ospec],
                    funnel=funnel))
        counts = jnp.stack([c.counts for c in cands])
        return gpyr, cands, counts, octs, desc_args

    return core


def _detect_full_body(plan: PyramidPlan, cfg: tuple, vmapped: bool):
    """The single-volume body of the fused hinted detection program (see
    _detect_full_fn): _detect_core composed with every descriptor job
    into ONE traced computation, descriptors delivered in the payload as
    12-bit packed leaves (_quantize)."""
    core = _detect_core(plan, cfg, vmapped)
    jobs = _desc_jobs(plan, cfg)

    def one(data):
        gpyr, cands, counts, octs, desc_args = core(data)
        for job, (co, R, dvalid, lvk) in zip(jobs, desc_args):
            tgt = _path_get(octs, job.path)
            if job.slots == 0:
                tgt["desc_q"] = jnp.zeros((0, _DESC_Q_BYTES), jnp.uint8)
                tgt["desc_scale"] = jnp.zeros((0,), jnp.float32)
                continue
            desc = _desc_job_compute(plan, job, gpyr[job.octave],
                                     co, R, dvalid, lvk)
            tgt["desc_q"], tgt["desc_scale"] = _quantize(desc)
        return gpyr, cands, counts, octs

    return one


@functools.lru_cache(maxsize=64)
def _detect_full_fn(plan: PyramidPlan, cfg: tuple, batch: int = 0,
                    vmapped: bool = False):
    """The fully-fused hinted detection program: one jitted computation
    of the _detect_full_body pipeline.

    cfg[o] = (capacity, ori_slots, desc_slots), all sized from the previous
    detection on this plan (see _hint_cfg). One dispatch and one
    device->host transfer replace the per-stage dispatch chain — on a
    high-latency link each extra dispatch/sync costs milliseconds, and XLA
    can overlap the independent per-octave stages.

    batch > 0 compiles the program for data[batch, nx, ny, nz] by
    UNROLLING the single-volume body over the batch inside one jit —
    not jax.vmap: the Pallas extrema + orientation kernels hand-DMA from
    ANY-space refs and have no batching rule, and the vmapped XLA
    fallbacks measured +75% device time per volume (tools/
    batch_budget.py: 26.7 -> 46.5 ms/vol at 256^3, B=4). Unrolled, each
    volume runs the exact single-volume program; outputs stack on a
    leading batch axis (the same pytree the vmapped variant produced).

    vmapped=True instead wraps the body in jax.vmap (XLA fallbacks for
    the un-batchable kernels): the GSPMD-partitionable form, kept for
    sharded inputs that _detect_full_shardmap_fn cannot take (batch not
    divisible by the mesh axis, unnamed shardings)."""
    one = _detect_full_body(plan, cfg, vmapped)
    if batch == 0:
        return jax.jit(one)
    if vmapped:
        return jax.jit(jax.vmap(one))

    @jax.jit
    def run_batch(data):
        outs = [one(data[b]) for b in range(batch)]
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *outs)

    return run_batch


_DESC_LEAF_KEYS = ("desc_q", "desc_scale")


def _is_desc_path(path) -> bool:
    return any(getattr(k, "key", None) in _DESC_LEAF_KEYS for k in path)


@functools.lru_cache(maxsize=64)
def _detect_full_packed_fn(plan: PyramidPlan, cfg: tuple):
    """The single-volume fused hinted program with its host-bound octs
    payload PACKED into two uint8 buffers on device (bitcast + concat).

    The payload pytree has ~56 small leaves; fetched individually, each
    leaf is a separate transfer message on the tunnel link. Packing
    makes the device_get a handful of transfers, and SPLITTING the
    descriptor bytes (desc_q/desc_scale — ~90% of the payload) into
    their own buffer lets the caller start that transfer asynchronously
    and overlap it with the keypoint assembly on the host. Returns
    (jitted fn, unpack metadata)."""
    one = _detect_full_body(plan, cfg, vmapped=False)
    meta_box = {}

    def run(data):
        gpyr, cands, counts, octs = one(data)
        pl_, treedef = jax.tree_util.tree_flatten_with_path(octs)
        paths = [p for p, _ in pl_]
        leaves = [l for _, l in pl_]
        flags = [_is_desc_path(p) for p in paths]
        meta_box["meta"] = (treedef,
                            [(l.dtype, l.shape) for l in leaves],
                            flags, paths)

        def pack(ls):
            if not ls:
                return jnp.zeros((0,), jnp.uint8)
            return jnp.concatenate(
                [jax.lax.bitcast_convert_type(l, jnp.uint8).reshape(-1)
                 for l in ls])

        kp_buf = pack([l for l, f in zip(leaves, flags) if not f])
        desc_buf = pack([l for l, f in zip(leaves, flags) if f])
        return gpyr, cands, counts, kp_buf, desc_buf

    fn = jax.jit(run)
    jax.eval_shape(fn, jax.ShapeDtypeStruct(plan.input_dims, jnp.float32))
    return fn, meta_box["meta"]


def _unpack_buf(raw: bytes, specs):
    out, off = [], 0
    for dtype, shape in specs:
        n = int(np.prod(shape))
        out.append(np.frombuffer(raw, dtype=np.dtype(dtype), count=n,
                                 offset=off).reshape(shape))
        off += n * np.dtype(dtype).itemsize
    return out

def _unpack_payload(kp_buf: np.ndarray, meta):
    """Rebuild the octs pytree from the keypoint buffer; descriptor
    leaves are None until _fill_desc supplies them."""
    treedef, specs, flags, _paths = meta
    kp_leaves = _unpack_buf(
        kp_buf.tobytes(), [s for s, f in zip(specs, flags) if not f])
    leaves, it = [], iter(kp_leaves)
    for f in flags:
        leaves.append(None if f else next(it))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _fill_desc(octs, desc_buf: np.ndarray, meta) -> None:
    """Write the descriptor leaves (second buffer) into the unpacked octs
    pytree in place (their parents are dicts; paths address them)."""
    treedef, specs, flags, paths = meta
    arrays = _unpack_buf(desc_buf.tobytes(),
                         [s for s, f in zip(specs, flags) if f])
    it = iter(arrays)
    for path, f in zip(paths, flags):
        if not f:
            continue
        obj = octs
        for k in path[:-1]:
            obj = obj[k.key] if hasattr(k, "key") else obj[k.idx]
        obj[path[-1].key] = next(it)


def _chunk_plan(jobs: list[_DescJob], max_chunks: int,
                min_cost: int = 3_500_000) -> list[list[tuple]]:
    """Partition the descriptor workload into up to `max_chunks`
    CONTIGUOUS spans [(job_idx, row_lo, row_hi), ...], balanced by static
    window-voxel cost and cut at 8-row (kernel pack) boundaries. Each
    chunk becomes one dispatched program whose output bytes stream to the
    host while later chunks still compute; contiguity in job order keeps
    the byte stream in payload consumption order."""
    blocks = []   # (job_idx, lo, hi, cost)
    for i, j in enumerate(jobs):
        if j.slots == 0:
            continue
        per_row = j.cost / j.slots
        for lo in range(0, j.slots, 8):
            hi = min(j.slots, lo + 8)
            blocks.append((i, lo, hi, per_row * (hi - lo)))
    total = sum(b[3] for b in blocks)
    n = max(1, min(max_chunks, int(total // min_cost), len(blocks)))
    chunks, cur, cur_cost, done = [], [], 0.0, 0.0
    for b in blocks:
        cur.append(b)
        cur_cost += b[3]
        done += b[3]
        remaining_before = total - (done - cur_cost)
        if (len(chunks) < n - 1
                and cur_cost >= remaining_before / (n - len(chunks))):
            chunks.append(cur)
            cur, cur_cost = [], 0.0
    if cur:
        chunks.append(cur)
    out = []
    for ch in chunks:
        spans = []
        for (i, lo, hi, _c) in ch:
            if spans and spans[-1][0] == i and spans[-1][2] == lo:
                spans[-1] = (i, spans[-1][1], hi)
            else:
                spans.append((i, lo, hi))
        out.append([tuple(s) for s in spans])
    return out


@functools.lru_cache(maxsize=64)
def _detect_split_packed_fn(plan: PyramidPlan, cfg: tuple):
    """The hinted program SPLIT for transfer/compute overlap (VERDICT r3
    #1): program A (_detect_core) emits the packed keypoint payload plus
    the descriptor inputs; the descriptor histograms run as up to
    params.split_desc_chunks separate programs dispatched back-to-back behind
    it. The keypoint payload's transfer rides the link WHILE the
    descriptor programs still execute, and each finished chunk's bytes
    stream behind it — the single fused program serialized the full
    device time with the full RTT (reference workload end-to-end:
    sift3d_detect_keypoints + extract, sift.c:1217-1249, 1615-1635).

    Returns (run_a, chunk_fns, kp_meta, jobs, chunks):
      run_a(data) -> (gpyr, cands, counts, kp_buf, desc_args)
      chunk_fns[c](gpyr, desc_args) -> uint8 buffer of that chunk's
        (desc_q rows, desc_scale rows) in payload consumption order."""
    core = _detect_core(plan, cfg, vmapped=False)
    jobs = _desc_jobs(plan, cfg)
    chunks = _chunk_plan(jobs, plan.params.split_desc_chunks,
                         plan.params.min_chunk_cost)
    meta_box = {}

    def run_a(data):
        gpyr, cands, counts, octs, desc_args = core(data)
        leaves, treedef = jax.tree_util.tree_flatten(octs)
        meta_box["meta"] = (treedef, [(l.dtype, l.shape) for l in leaves])
        kp_buf = jnp.concatenate(
            [jax.lax.bitcast_convert_type(l, jnp.uint8).reshape(-1)
             for l in leaves])
        return gpyr, cands, counts, kp_buf, desc_args

    fn_a = jax.jit(run_a)
    jax.eval_shape(fn_a,
                   jax.ShapeDtypeStruct(plan.input_dims, jnp.float32))

    def make_chunk(spans):
        # Narrow signature: exactly the octave stacks and job tuples this
        # chunk touches (dispatch-side pytree flattening of the full
        # gpyr + all job args measured ~0.5 ms/call of host time).
        octs = sorted({jobs[ji].octave for ji, _, _ in spans})
        jis = sorted({ji for ji, _, _ in spans})
        o_pos = {o: i for i, o in enumerate(octs)}
        j_pos = {ji: i for i, ji in enumerate(jis)}

        def run_c(gp_sub, args_sub):
            parts = []
            for (ji, lo, hi) in spans:
                job = jobs[ji]
                co, R, dv, lvk = args_sub[j_pos[ji]]
                desc = _desc_job_compute(
                    plan, job, gp_sub[o_pos[job.octave]], co[lo:hi],
                    R[lo:hi], dv[lo:hi], lvk[lo:hi])
                dq, ds = _quantize(desc)
                parts.append(dq.reshape(-1))
                parts.append(
                    jax.lax.bitcast_convert_type(ds, jnp.uint8).reshape(-1))
            return jnp.concatenate(parts)

        fn = jax.jit(run_c)

        def call(gpyr, desc_args):
            return fn([gpyr[o] for o in octs],
                      [desc_args[ji] for ji in jis])
        return call

    chunk_fns = [make_chunk(spans) for spans in chunks]
    return fn_a, chunk_fns, meta_box["meta"], jobs, chunks


def _unpack_kp_payload(kp_buf: np.ndarray, meta):
    """Rebuild the split program's keypoint payload pytree (descriptor
    leaves absent until _fill_desc_chunks inserts them)."""
    treedef, specs = meta
    leaves = _unpack_buf(kp_buf.tobytes(), specs)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _fill_desc_chunks(octs, bufs, jobs, chunks) -> None:
    """Insert the descriptor leaves into the unpacked keypoint payload
    from the chunk buffers (row spans in consumption order)."""
    for job in jobs:
        tgt = _path_get(octs, job.path)
        tgt["desc_q"] = np.zeros((job.slots, _DESC_Q_BYTES), np.uint8)
        tgt["desc_scale"] = np.zeros((job.slots,), np.float32)
    for spans, buf in zip(chunks, bufs):
        raw = buf.tobytes()
        off = 0
        for (ji, lo, hi) in spans:
            job = jobs[ji]
            nrow = hi - lo
            tgt = _path_get(octs, job.path)
            nq = nrow * _DESC_Q_BYTES
            tgt["desc_q"][lo:hi] = np.frombuffer(
                raw, np.uint8, nq, off).reshape(nrow, _DESC_Q_BYTES)
            off += nq
            tgt["desc_scale"][lo:hi] = np.frombuffer(
                raw, np.float32, nrow, off)
            off += nrow * 4


def _shard_map(f, mesh, in_specs, out_specs):
    from jax import shard_map
    try:
        return shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)
    except TypeError:   # older keyword name
        return shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_rep=False)


@functools.lru_cache(maxsize=16)
def _detect_full_shardmap_fn(plan: PyramidPlan, cfg: tuple, per: int,
                             mesh, axis: str):
    """Batched fused detection for a mesh-sharded batch: shard_map over
    the batch axis whose BODY is the unrolled single-volume program with
    the full Pallas kernels. The vmapped GSPMD form this replaces fell
    back to the XLA stencils, measured +75% device time per volume
    (26.7 -> 46.5 ms/vol at 256^3; tools/batch_budget.py) — under
    shard_map each device runs the exact single-volume program on its
    `per` local volumes. Outputs carry the same [B, ...] pytree layout
    as the vmapped/unrolled forms, batch-sharded over `axis`."""
    from jax.sharding import PartitionSpec

    one = _detect_full_body(plan, cfg, vmapped=False)
    spec = PartitionSpec(axis)

    def local(data):                      # [per, nx, ny, nz] local shard
        outs = [one(data[b]) for b in range(per)]
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *outs)

    return jax.jit(_shard_map(local, mesh, (spec,), spec))


def _batch_shard_axis(sharding, B: int):
    """(mesh, axis, per) when `sharding` shards ONLY the leading (batch)
    dim over one named mesh axis that divides B — the layout
    _detect_full_shardmap_fn supports — else None."""
    from jax.sharding import NamedSharding
    if not isinstance(sharding, NamedSharding):
        return None
    spec = tuple(sharding.spec)
    if not spec or spec[0] is None or any(s is not None for s in spec[1:]):
        return None
    axis = spec[0]
    if isinstance(axis, tuple):
        if len(axis) != 1:
            return None
        axis = axis[0]
    n = sharding.mesh.shape[axis]
    if n < 2 or B % n:
        return None
    return sharding.mesh, axis, B // n


@functools.lru_cache(maxsize=16)
def _detect_batch_fn(plan: PyramidPlan, batch: int):
    """Batched detection: one compiled program for B volumes (vmap). Shared
    by detect_keypoints_batch; orientation runs per volume afterwards
    (per-level jits are cached across volumes)."""
    from .detect import detect_extrema_octave

    _, caps = _detect_fn(plan)
    params = plan.params
    extensions = params.refine_subvoxel or params.edge_thresh is not None

    @jax.jit
    def run_batch(data):
        def one(vol):
            x = scale_to_unit(vol)
            gpyr, dogs = build_gpyr_and_dog(x, plan, use_pallas=False)
            out = []
            for o in range(plan.num_octaves):
                dog_oct = dogs[o]
                cand = detect_extrema_octave(dog_oct, params, caps[o],
                                             use_pallas=False)
                if extensions:
                    from .refinement import refine_candidates_octave
                    ref = refine_candidates_octave(
                        dog_oct, cand.coords, cand.level, cand.valid,
                        params)
                else:
                    ref = None
                out.append((cand, ref))
            counts = jnp.stack([c.counts for c, _ in out])
            return gpyr, out, counts
        return jax.vmap(one)(data)

    return run_batch, caps


class _BatchGpyrView:
    """Per-volume view of a batched pyramid: slices [B, ...] octave arrays
    lazily so serving descriptors from the speculative cache issues no
    device ops at all (each eager slice is a dispatch on a high-latency
    link)."""

    def __init__(self, gpyr_b, b):
        self._gpyr_b, self._b = gpyr_b, b

    def __getitem__(self, o):
        return self._gpyr_b[o][self._b]

    def __len__(self):
        return len(self._gpyr_b)


class _ChunkedOctave:
    """Lazy [b] indexing of one octave of a sub-batch-chunked pyramid."""

    def __init__(self, chunks, o, sub):
        self._chunks, self._o, self._sub = chunks, o, sub

    def __getitem__(self, b):
        return self._chunks[b // self._sub][self._o][b % self._sub]


class _ChunkedBatchGpyr:
    """Batched pyramid stored as per-sub-batch chunks (HBM-sized
    dispatches); presents the same [o][b] indexing as a monolithic batched
    pyramid, lazily."""

    def __init__(self, chunks, sub):
        self._chunks, self._sub = chunks, sub

    def __getitem__(self, o):
        return _ChunkedOctave(self._chunks, o, self._sub)

    def __len__(self):
        return len(self._chunks[0])


class SIFT3D:
    """SIFT3D detector + descriptor extractor (TPU-native).

    Equivalent of the reference's sift3d_detector
    (imtypes_private.h:208-223): holds parameters and, after
    detect_keypoints(), the Gaussian scale-space pyramid used by
    extract_descriptors().
    """

    def __init__(self, params: DetectorParams = DetectorParams(),
                 stale_strength_compat: bool = True):
        self.params = params
        self.stale_strength_compat = stale_strength_compat
        self._plan: PyramidPlan | None = None
        self._gpyr = None
        self._input_shape = None
        # Per-(octave, level) rejection funnel of the last detection
        # (profiling.detect_stats renders it).
        self._funnel: dict | None = None
        # Speculation state: per-octave (candidate_total, accepted) counts
        # observed on the previous detection with this plan (sizes the next
        # detection's fused program, _hint_cfg), and the resulting
        # descriptor cache keyed by keypoint identity.
        self._hint: dict[int, tuple[int, int]] | None = None
        self._hint_plan = None
        # Consecutive detections with an UNCHANGED hint envelope: at
        # streak >= 2 the workload is stable and the fused program's slot
        # headroom tightens (_hint_cfg tight=True). The envelope is the
        # per-octave elementwise max over the last params.hint_history
        # raw counts (_hint_hist), so a varied stream of similar volumes
        # stabilizes on one compiled configuration sized to its recent
        # peak instead of thrashing tight-mode on per-volume equality.
        self._hint_streak = 0
        self._hint_hist: list[dict] = []
        self._last_raw_hint: dict | None = None
        # Cumulative count of hinted detections whose speculation missed
        # (workload outgrew the hinted capacities -> one exact-path redo).
        # Instrumentation for varied-workload benchmarking (bench.py
        # --varied); never read by the pipeline itself.
        self._hint_misses = 0
        self._spec_desc_cache: dict | None = None
        self._batch_desc_caches: list | None = None

    # -- detection ----------------------------------------------------------

    def detect_keypoints(self, vol) -> Keypoints:
        vol = as_volume(vol)
        plan = make_plan(vol.shape, vol.units, self.params)
        extensions = (self.params.refine_subvoxel
                      or self.params.edge_thresh is not None)
        hint = (self._hint if not extensions and self._hint_plan == plan
                else None)
        self._spec_desc_cache = None
        self._batch_desc_caches = None

        if hint is not None:
            # Hinted detection, split into program A (pyramid + extrema
            # + orientation + keypoint payload) and chunked descriptor
            # programs dispatched back-to-back: the keypoint payload
            # transfer overlaps descriptor device time, and each chunk's
            # bytes stream as it finishes. Every capacity is sized from
            # the previous detection on this plan.
            cfg = _hint_cfg(plan, hint, self.params,
                            tight=self._hint_streak >= 2)
            if self.params.split_desc_chunks:
                run_a, chunk_fns, meta, jobs, chunks = \
                    _detect_split_packed_fn(plan, cfg)
                gpyr, cands, counts_dev, kp_buf, dargs = run_a(vol.data)
                desc_bufs = [fn(gpyr, dargs) for fn in chunk_fns]
                self._plan, self._gpyr = plan, gpyr
                self._input_shape = vol.shape
                # Queue the transfers in consumption order (the link
                # drains FIFO): counts + keypoint bytes first — ready at
                # program A's end, transferring while the descriptor
                # programs still run — then each chunk's bytes as its
                # program completes.
                counts_dev.copy_to_host_async()
                kp_buf.copy_to_host_async()
                for db in desc_bufs:
                    db.copy_to_host_async()
                counts, kb = jax.device_get((counts_dev, kp_buf))
                octs_host = _unpack_kp_payload(kb, meta)
                if _hint_fit(plan, cfg, counts, octs_host):
                    return self._assemble_hinted(
                        plan, counts, octs_host,
                        desc_fetch=lambda: _fill_desc_chunks(
                            octs_host,
                            [np.asarray(db) for db in desc_bufs],
                            jobs, chunks))
            else:   # fully-fused single program (A/B fallback)
                run_p, meta = _detect_full_packed_fn(plan, cfg)
                gpyr, cands, counts_dev, kp_buf, desc_buf = \
                    run_p(vol.data)
                self._plan, self._gpyr = plan, gpyr
                self._input_shape = vol.shape
                counts_dev.copy_to_host_async()
                kp_buf.copy_to_host_async()
                desc_buf.copy_to_host_async()
                counts, kb = jax.device_get((counts_dev, kp_buf))
                octs_host = _unpack_payload(kb, meta)
                if _hint_fit(plan, cfg, counts, octs_host):
                    return self._assemble_hinted(
                        plan, counts, octs_host,
                        desc_fetch=lambda: _fill_desc(
                            octs_host, np.asarray(desc_buf), meta))
            # Speculation missed (the workload drifted past the headroom):
            # re-run the exact path from the device-resident stores.
            self._hint_streak = 0
            self._hint_misses += 1
            caps = {o: cfg[o][0] for o in range(plan.num_octaves)}
            per_oct = [(c, None) for c in cands]
            spec_oris = None
        else:
            run, caps = _detect_fn(plan)
            gpyr, per_oct, counts_dev = run(vol.data)
            spec_raw = []    # (ori_slots, device payload) per octave
            if not extensions:
                # Speculative orientation: dispatch per octave over a fixed
                # slot prefix before candidate counts reach the host, so
                # the counts sync overlaps orientation compute.
                for o, (cand, _) in enumerate(per_oct):
                    spec = min(_SPEC_ORI_SLOTS, caps[o])
                    ori, co, st = _orient_octave_fn(plan, o, spec)(
                        gpyr[o], cand.coords, cand.level, cand.valid,
                        cand.strength)
                    spec_raw.append(
                        (spec, (co, st, ori.R, ori.accepted, None,
                                (ori.reject_grad, ori.reject_ratio,
                                 ori.reject_corner))))
            self._plan, self._gpyr = plan, gpyr
            self._input_shape = vol.shape

            # ONE device->host sync for counts AND every speculative result
            # (the device may sit behind a high-latency link — each extra
            # sync costs a full RTT). Octaves whose candidate count fits
            # the speculative window then assemble purely on the host.
            spec_oris = None
            if not extensions:
                counts, spec_host = jax.device_get(
                    (counts_dev, [p for _, p in spec_raw]))
                spec_oris = [(s, p)
                             for (s, _), p in zip(spec_raw, spec_host)]
            else:
                counts = jax.device_get(counts_dev)  # [n_oct, nl]

        # Capacity-overflow retry: counts are exact (pre-compaction mask
        # sums), so re-detecting the rare overflowing octave with a
        # next-pow2 capacity preserves the reference's never-drop-candidates
        # semantics (slab growth, immacros.h:199-222).
        caps = dict(caps)
        per_oct = list(per_oct)
        for o in range(plan.num_octaves):
            total = int(np.sum(counts[o]))
            if total > caps[o]:
                caps[o] = _retry_capacity(total)
                per_oct[o] = _redetect_octave_fn(
                    plan, o, caps[o], extensions)(gpyr[o])

        kp = self._assemble(plan, caps, per_oct, counts,
                            lambda o, i: gpyr[o][i], spec_oris)

        if not extensions:
            # Learn per-octave (candidates, accepted, accepted-per-level,
            # candidates-per-level): they size the next detection's fused
            # hinted program.
            nl = self.params.num_kp_levels
            new_hint = {
                o: (int(np.sum(counts[o])), int(np.sum(kp.octave == o)),
                    tuple(int(np.sum((kp.octave == o) & (kp.level == li)))
                          for li in range(nl)),
                    tuple(int(c) for c in counts[o]))
                for o in range(plan.num_octaves)}
            self._learn_hint(plan, new_hint)
        return kp

    def _learn_hint(self, plan, raw: dict) -> None:
        """Fold this detection's raw per-octave counts into the hint
        envelope: the per-octave max over the last params.hint_history
        raw hints. The streak (tight-mode gate) counts consecutive
        detections with an UNCHANGED envelope — a varied stream of
        similar volumes stabilizes on one configuration sized to its
        recent peak; hint_history=1 recovers the round-4 exact-equality
        behavior."""
        hist = self._hint_hist if self._hint_plan == plan else []
        hist.append(raw)
        del hist[:-self.params.hint_history]
        env = _hint_env(hist, plan.num_octaves,
                        self.params.num_kp_levels)
        self._hint_streak = (
            self._hint_streak + 1
            if self._hint_plan == plan and env == self._hint else 0)
        self._hint = env
        self._hint_plan = plan
        self._hint_hist = hist

    def _assemble_hinted(self, plan, counts, octs,
                         desc_fetch=None) -> Keypoints:
        """Assembly for the fused hinted program when speculation covered
        every octave: the payload already holds exactly the accepted
        keypoints (in the reference's candidate order) and their
        descriptors; build the keypoint list, the rejection funnel, and the
        descriptor cache with no further device work.

        desc_fetch: optional callable filling the descriptor leaves of
        `octs` in place, called AFTER the keypoint assembly — the
        descriptor bytes (~90% of the payload) then stream over the link
        while the host assembles keypoints."""
        nl = self.params.num_kp_levels
        self._funnel = {}
        cache = {}
        hint = {}
        jobs = []    # deferred descriptor-cache rows: (o, k, lv, co, dref)
        coords_l, lvl_l, oct_l, R_l, sd_l, st_true, stale = \
            [], [], [], [], [], [], []

        def add(o, k, co, lv, R, st, scales, dref):
            coords_l.append(co)
            lvl_l.append(lv)
            oct_l.append(np.full(k, o, np.int32))
            R_l.append(R)
            sd_l.append(scales[lv])
            st_true.append(st)
            if k:
                jobs.append((o, k, lv, co, dref))

        def funnel_add(o, li, f):
            c = int(counts[o][li])
            if c == 0:
                return
            g, r, cn, sv = (int(v) for v in f)
            self._funnel[(o, li)] = {
                "candidates": c, "reject_grad": g, "reject_ratio": r,
                "reject_corner": cn, "survivors": sv}

        for o, od in enumerate(octs):
            total_o = int(np.sum(counts[o]))
            scales = np.asarray(
                [plan.scales[o][1 + li] for li in range(nl)], np.float64)
            stale.append(od["strengths"][:total_o])
            acc_l = []
            if "levels" in od:
                # dense octave: per-level payload in level order
                for li, ld in enumerate(od["levels"]):
                    k = int(ld["acc_count"])
                    acc_l.append(k)
                    add(o, k, ld["coords"][:k],
                        np.full(k, li, np.int32), ld["R"][:k],
                        ld["strength_true"][:k], scales, ld)
                    funnel_add(o, li, ld["funnel"])
            elif "groups" in od:
                # sparse two-group desc split: (level 0 | levels 1+) —
                # store order is level-segmented, so group order IS the
                # reference's candidate order
                acc_l = [0] * nl
                for gd in od["groups"]:
                    k = int(gd["acc_count"])
                    lv = gd["level"][:k]
                    add(o, k, gd["coords"][:k], lv, gd["R"][:k],
                        gd["strength_true"][:k], scales, gd)
                    for li in range(nl):
                        acc_l[li] += int(np.sum(lv == li))
                for li in range(nl):
                    funnel_add(o, li, od["funnel"][li])
            else:
                k = int(od["acc_count"])
                lv = od["level"][:k]
                add(o, k, od["coords"][:k], lv, od["R"][:k],
                    od["strength_true"][:k], scales, od)
                acc_l = [int(np.sum(lv == li)) for li in range(nl)]
                for li in range(nl):
                    funnel_add(o, li, od["funnel"][li])
            hint[o] = (total_o, sum(acc_l), tuple(acc_l),
                       tuple(int(c) for c in counts[o]))

        if desc_fetch is not None:
            desc_fetch()
        for o, k, lv, co, dref in jobs:
            desc = _dequant12(dref["desc_q"], dref["desc_scale"], k)
            for j in range(k):
                key = (o, int(lv[j]), float(co[j, 0]), float(co[j, 1]),
                       float(co[j, 2]))
                cache[key] = (desc[j], dref["xyz"][j], dref["sd"][j])
        self._spec_desc_cache = cache or None
        self._last_raw_hint = hint   # batch caller reads the raw counts
        self._learn_hint(plan, hint)

        n = sum(len(c) for c in coords_l)
        if n == 0:
            return Keypoints(
                coords=np.zeros((0, 3)), octave=np.zeros(0, np.int32),
                level=np.zeros(0, np.int32), sd=np.zeros(0),
                strength=np.zeros(0), R=np.zeros((0, 3, 3), np.float32))
        if self.stale_strength_compat:
            strength = np.concatenate(stale).astype(np.float64)[:n]
        else:
            strength = np.concatenate(st_true).astype(np.float64)
        return Keypoints(
            coords=np.concatenate(coords_l).astype(np.float64),
            octave=np.concatenate(oct_l),
            level=np.concatenate(lvl_l).astype(np.int32),
            sd=np.concatenate(sd_l), strength=strength,
            R=np.concatenate(R_l))

    def _detect_batch_hinted(self, vols, plan, hint):
        """Batched detection through the vmapped fused hinted program:
        pyramid+extrema+orientation+descriptors for every volume with a
        handful of async dispatches (sub-batches sized to HBM — the fused
        program's window transients cost ~10-15x the volume per batch
        element) and ONE device_get for all payloads. The program unrolls
        the single-volume body over the sub-batch (full Pallas kernels;
        see _detect_full_fn). Returns the list of Keypoints, or None if
        any volume outgrew the hinted capacities (caller falls back to
        the exact per-volume path)."""
        B = vols.shape[0]
        cfg = _hint_cfg(plan, hint, self.params,
                        tight=self._hint_streak >= 2)
        nvox = int(np.prod(vols.shape[1:]))
        sub = min(B, max(1, int(_BATCH_HBM_BUDGET // (nvox * 4 * 14))))
        while B % sub:  # one compiled sub-batch shape
            sub -= 1
        # Mesh-sharded batches run shard_map over the batch axis with the
        # UNROLLED single-volume body per device (full Pallas kernels;
        # the vmapped GSPMD fallback costs +75% device time per volume).
        # Single-device batches unroll inside one jit. Shardings the
        # shard_map form cannot take (batch not divisible, unnamed
        # sharding) keep the vmapped GSPMD form.
        sharded = (hasattr(vols, "sharding")
                   and len(vols.sharding.device_set) > 1)
        if sharded:
            sm = _batch_shard_axis(vols.sharding, B)
            if sm is not None:
                mesh, axis, per = sm
                run = _detect_full_shardmap_fn(plan, cfg, per, mesh, axis)
            else:
                run = _detect_full_fn(plan, cfg, vmapped=True)
            sub = B
        else:
            run = _detect_full_fn(plan, cfg, batch=sub)
        chunks = []
        for s in range(0, B, sub):
            chunks.append(run(vols[s:s + sub]))
        self._plan = plan
        self._gpyr = _ChunkedBatchGpyr([c[0] for c in chunks], sub)
        self._input_shape = tuple(vols.shape[1:])
        self._batched = True
        counts_c, octs_c = jax.device_get(
            ([c[2] for c in chunks], [c[3] for c in chunks]))
        counts_b = np.concatenate(counts_c)            # [B, n_oct, nl]
        octs_host = jax.tree_util.tree_map(
            lambda *xs: np.concatenate(xs), *octs_c)
        octs_v = [[jax.tree_util.tree_map(lambda x: x[b], od)
                   for od in octs_host] for b in range(B)]
        if not all(_hint_fit(plan, cfg, counts_b[b], octs_v[b])
                   for b in range(B)):
            self._hint_streak = 0
            self._hint_misses += 1
            return None
        # _assemble_hinted clobbers the hint state per volume; snapshot
        # the batch-level previous state and fold in the batch max once.
        prev = (self._hint, self._hint_streak, self._hint_hist)
        out, caches, hints = [], [], []
        for b in range(B):
            out.append(self._assemble_hinted(plan, counts_b[b], octs_v[b]))
            caches.append(self._spec_desc_cache)
            hints.append(self._last_raw_hint)
        # The batch hint sizes the NEXT batch: per-octave max over volumes.
        new_hint = _hint_env(hints, plan.num_octaves,
                             self.params.num_kp_levels)
        self._hint, self._hint_streak, self._hint_hist = prev
        self._learn_hint(plan, new_hint)
        self._batch_desc_caches = caches
        self._spec_desc_cache = None
        return out

    def detect_keypoints_batch(self, vols, units=(1.0, 1.0, 1.0)):
        """Detect keypoints for a batch of same-shape volumes [B, nx, ny,
        nz] with one compiled program (per-volume orientation dispatches
        share cached jits). Returns a list of Keypoints. The detector's
        cached pyramid afterwards is the *batch* pyramid; use
        extract_descriptors_batch for descriptors.

        Like the single-volume path, the second batch on a plan runs the
        fused hinted program (vmapped over B) — one dispatch + one
        device_get end-to-end, with descriptors served speculatively by
        extract_descriptors_batch."""
        extensions = (self.params.refine_subvoxel
                      or self.params.edge_thresh is not None)
        vols = jnp.asarray(vols, jnp.float32)
        B = vols.shape[0]
        plan = make_plan(vols.shape[1:], units, self.params)
        self._batch_desc_caches = None
        hint = (self._hint if not extensions and self._hint_plan == plan
                else None)
        if hint is not None:
            kps = self._detect_batch_hinted(vols, plan, hint)
            if kps is not None:
                return kps
        run, caps = _detect_batch_fn(plan, B)
        gpyr_b, per_oct_b, counts_dev = run(vols)
        self._plan, self._gpyr = plan, gpyr_b
        self._input_shape = tuple(vols.shape[1:])
        self._batched = True

        from .detect import OctaveCandidates
        from .refinement import RefinementResult
        counts_b = jax.device_get(counts_dev)  # [B, n_oct, nl]
        out = []
        for b in range(B):
            per_oct = []
            for c, ref in per_oct_b:
                cand_b = OctaveCandidates(c.coords[b], c.level[b],
                                          c.strength[b], c.valid[b],
                                          c.counts[b])
                ref_b = (RefinementResult(ref.offset[b], ref.ds[b],
                                          ref.edge_ok[b])
                         if ref is not None else None)
                per_oct.append((cand_b, ref_b))
            caps_v = dict(caps)
            for o in range(plan.num_octaves):
                total = int(np.sum(counts_b[b, o]))
                if total > caps_v[o]:
                    caps_v[o] = _retry_capacity(total)
                    per_oct[o] = _redetect_octave_fn(
                        plan, o, caps_v[o], extensions)(gpyr_b[o][b])
            out.append(self._assemble(
                plan, caps_v, per_oct, counts_b[b],
                lambda o, i, b=b: gpyr_b[o][b, i]))
        if not extensions:
            # Learn the batch hint (per-octave max over volumes): the next
            # batch on this plan runs the fused hinted program.
            nl = self.params.num_kp_levels
            new_hint = {
                o: (max(int(np.sum(counts_b[b, o])) for b in range(B)),
                    max(int(np.sum(out[b].octave == o)) for b in range(B)),
                    tuple(max(int(np.sum((out[b].octave == o)
                                         & (out[b].level == li)))
                              for b in range(B)) for li in range(nl)),
                    tuple(max(int(counts_b[b, o, li]) for b in range(B))
                          for li in range(nl)))
                for o in range(plan.num_octaves)}
            self._hint_streak = (
                self._hint_streak + 1
                if self._hint_plan == plan and new_hint == self._hint
                else 0)
            self._hint = new_hint
            self._hint_plan = plan
        return out

    def extract_descriptors_batch(self, kps) -> list[Descriptors]:
        """Descriptors for the keypoint lists of a prior
        detect_keypoints_batch call."""
        out = []
        for b, kp in enumerate(kps):
            if len(kp) == 0:
                out.append(Descriptors(
                    xyz=np.zeros((0, 3), np.float32),
                    sd=np.zeros(0, np.float32),
                    data=np.zeros((0, DESC_NUMEL), np.float32)))
                continue
            proxy = SIFT3D(self.params, self.stale_strength_compat)
            proxy._plan = self._plan
            proxy._input_shape = self._input_shape
            proxy._gpyr = _BatchGpyrView(self._gpyr, b)
            if self._batch_desc_caches is not None:
                proxy._spec_desc_cache = self._batch_desc_caches[b]
            out.append(proxy.extract_descriptors(kp))
        return out

    def _assemble(self, plan, caps, per_oct, counts, level_getter,
                  spec_oris=None):
        extensions = (self.params.refine_subvoxel
                      or self.params.edge_thresh is not None)
        nl = self.params.num_kp_levels

        # Dispatch orientation per level segment (async), bucketed to the
        # candidate count, unless a speculative whole-octave orientation
        # already covers all candidates. Bucket quantization keeps the set
        # of slice/program shapes small so compilations amortize across
        # volumes.
        pending = []  # (o, i, avail, bucket, device pytree) | octave specs
        for o, (cand, ref) in enumerate(per_oct):
            cap = caps[o]
            total = int(np.sum(counts[o]))
            if total > cap:
                warnings.warn(
                    f"keypoint capacity overflow at octave {o}: {total} "
                    f"candidates > capacity {cap}; increase "
                    f"DetectorParams.kp_per_level for exact results")
            if spec_oris is not None:
                spec, payload = spec_oris[o]  # host arrays, see _assemble
                if total <= spec:
                    if total > 0:
                        pending.append(("oct", o, counts[o], spec, payload))
                    continue
            start = 0
            for li in range(nl):
                c = int(counts[o][li])
                avail = max(0, min(c, cap - start))
                if avail == 0:
                    start += c
                    continue
                i = li + 1  # dog stacked index (raw level s = li)
                b = _bucket(avail, cap)
                if extensions:
                    co, st, ro, rd, re = _seg_slice_fn(b, True)(
                        cand.coords, cand.strength, start, ref.offset,
                        ref.ds, ref.edge_ok)
                    seg_valid = jnp.arange(b) < avail
                    centers = co.astype(jnp.float32) + ro
                    sd_arr = jnp.float32(plan.scales[o][i]) * jnp.exp2(
                        rd / jnp.float32(nl))
                    ori = _orient_fn_ext(plan, o, i, b)(
                        level_getter(o, i), co, seg_valid & re, centers,
                        sd_arr)
                    payload = (centers, st, ori.R, ori.accepted, sd_arr,
                               (ori.reject_grad, ori.reject_ratio,
                                ori.reject_corner))
                else:
                    co, st = _seg_slice_fn(b, False)(
                        cand.coords, cand.strength, start)
                    seg_valid = jnp.arange(b) < avail
                    ori = _orient_fn(plan, o, i, b)(
                        level_getter(o, i), co, seg_valid)
                    payload = (co, st, ori.R, ori.accepted, None,
                               (ori.reject_grad, ori.reject_ratio,
                                ori.reject_corner))
                pending.append(("seg", o, i, avail, payload))
                start += c

        if not pending:
            self._funnel = {}
            return Keypoints(
                coords=np.zeros((0, 3)), octave=np.zeros(0, np.int32),
                level=np.zeros(0, np.int32), sd=np.zeros(0),
                strength=np.zeros(0), R=np.zeros((0, 3, 3), np.float32))

        # One batched transfer for all results.
        host = jax.device_get([p[4] for p in pending])

        # Per-(octave, level) detection funnel in the reference's
        # short-circuit order (grad -> ratio -> corner, sift.c:996-1102).
        self._funnel = {}

        def _funnel_add(o, s, acc_seg, rej_seg):
            f = self._funnel.setdefault(
                (o, s), {"candidates": 0, "reject_grad": 0,
                         "reject_ratio": 0, "reject_corner": 0,
                         "survivors": 0})
            f["candidates"] += len(acc_seg)
            f["survivors"] += int(np.sum(acc_seg))
            if rej_seg is not None:
                g, r, cn = rej_seg
                f["reject_grad"] += int(np.sum(g))
                f["reject_ratio"] += int(np.sum(~g & r))
                f["reject_corner"] += int(np.sum(~g & ~r & cn))

        coords_l, strength_l, acc_l, oct_l, lvl_l, sd_l, R_l = \
            [], [], [], [], [], [], []
        for entry, (co, st, R_, acc, sd_a, rej) in zip(pending, host):
            if entry[0] == "oct":
                # whole-octave speculative result: split level segments on
                # the host (the store is level-segmented in order)
                _, o, cnt_lvls, spec, _p = entry
                start = 0
                for li in range(nl):
                    c = int(cnt_lvls[li])
                    if c == 0:
                        continue
                    sl = slice(start, start + c)
                    coords_l.append(co[sl])
                    strength_l.append(st[sl])
                    acc_l.append(acc[sl])
                    R_l.append(R_[sl])
                    oct_l.append(np.full(c, o, np.int32))
                    lvl_l.append(np.full(c, li, np.int32))
                    sd_l.append(np.full(c, plan.scales[o][li + 1],
                                        np.float64))
                    _funnel_add(o, li, acc[sl],
                                tuple(m[sl] for m in rej) if rej else None)
                    start += c
                continue
            _, o, i, c, _p = entry
            coords_l.append(co[:c])
            strength_l.append(st[:c])
            acc_l.append(acc[:c])
            R_l.append(R_[:c])
            oct_l.append(np.full(c, o, np.int32))
            lvl_l.append(np.full(c, i - 1, np.int32))  # raw level s
            sd_l.append(sd_a[:c].astype(np.float64) if sd_a is not None
                        else np.full(c, plan.scales[o][i], np.float64))
            _funnel_add(o, i - 1, acc[:c],
                        tuple(m[:c] for m in rej) if rej else None)

        coords = np.concatenate(coords_l).astype(np.float64)
        strength = np.concatenate(strength_l).astype(np.float64)
        accepted = np.concatenate(acc_l)
        R = np.concatenate(R_l)
        octave = np.concatenate(oct_l)
        level = np.concatenate(lvl_l)
        sd = np.concatenate(sd_l)

        idx = np.nonzero(accepted)[0]
        n = len(idx)
        if self.stale_strength_compat and not extensions:
            out_strength = strength[:n]  # the reference's stale values
        else:
            out_strength = strength[idx]
        return Keypoints(coords=coords[idx], octave=octave[idx],
                         level=level[idx], sd=sd[idx],
                         strength=out_strength, R=R[idx])

    # -- descriptors --------------------------------------------------------

    def _verify_keys(self, kp: Keypoints) -> None:
        """verify_keys (sift.c:1171-1212)."""
        if len(kp) < 1:
            raise ValueError("no keypoints")
        if self._input_shape is None:
            raise ValueError(
                "no Gaussian pyramid available; call detect_keypoints first")
        factor = 2.0 ** kp.octave
        dims = np.asarray(self._input_shape, np.float64)
        if (np.any(kp.coords < 0)
                or np.any(kp.coords * factor[:, None] >= dims)):
            raise ValueError("keypoint coordinates exceed image dimensions")
        if np.any(kp.sd <= 0):
            raise ValueError("keypoint has invalid scale")

    def extract_descriptors(self, kp: Keypoints) -> Descriptors:
        self._verify_keys(kp)
        plan = self._plan
        n = len(kp)
        xyz = np.zeros((n, 3), np.float32)
        sd_out = np.zeros((n,), np.float32)
        data = np.zeros((n, DESC_NUMEL), np.float32)

        # Serve from the speculative-descriptor cache when it covers every
        # requested keypoint (identity lookup tolerates sorting/truncation
        # between detect and extract, as the reference CLI does) — zero
        # device work, zero round-trips.
        if self._spec_desc_cache is not None:
            rows = [self._spec_desc_cache.get(
                (int(kp.octave[j]), int(kp.level[j]),
                 float(kp.coords[j, 0]), float(kp.coords[j, 1]),
                 float(kp.coords[j, 2]))) for j in range(n)]
            if all(r is not None for r in rows):
                for j, (d, x, s) in enumerate(rows):
                    data[j], xyz[j], sd_out[j] = d, x, s
                return Descriptors(xyz=xyz, sd=sd_out, data=data)

        groups: dict[int, list[int]] = {}
        for j in range(n):
            groups.setdefault(int(kp.octave[j]), []).append(j)

        # Refined keypoints carry fractional coordinates; window shapes get
        # the fractional-center margin then.
        refined = (not np.all(kp.coords == np.rint(kp.coords))
                   or self.params.refine_subvoxel)

        # One dispatch per octave (mixed levels, per-keypoint scales), with
        # all host->device inputs shipped as ONE device_put pytree (each
        # small transfer costs a round-trip on a high-latency link), then
        # one batched device->host transfer of the results.
        staged = []
        for o, idxs in groups.items():
            cnt = len(idxs)
            bucket = max(8, 1 << (cnt - 1).bit_length())
            coords = np.zeros((bucket, 3), np.int32)
            R = np.tile(np.eye(3, dtype=np.float32), (bucket, 1, 1))
            valid = np.zeros((bucket,), bool)
            centers = np.zeros((bucket, 3), np.float32)
            sd_arr = np.full((bucket,), plan.scales[o][1], np.float32)
            lvl = np.zeros((bucket,), np.int32)
            coords[:cnt] = np.rint(kp.coords[idxs]).astype(np.int32)
            R[:cnt] = kp.R[idxs]
            valid[:cnt] = True
            centers[:cnt] = kp.coords[idxs]
            sd_arr[:cnt] = kp.sd[idxs]
            lvl[:cnt] = kp.level[idxs]
            staged.append((o, idxs, cnt, bucket,
                           (coords, R, valid, centers, sd_arr, lvl)))
        dev_args = jax.device_put([s[4] for s in staged])
        pending = []
        for (o, idxs, cnt, bucket, _), args in zip(staged, dev_args):
            res = _extract_oct_fn(plan, o, bucket, refined)(
                self._gpyr[o], *args)
            pending.append((idxs, cnt, res))

        host = jax.device_get([p[2] for p in pending])
        for (idxs, cnt, _), res in zip(pending, host):
            data[idxs] = res.desc[:cnt]
            xyz[idxs] = res.xyz[:cnt]
            sd_out[idxs] = res.sd[:cnt]

        return Descriptors(xyz=xyz, sd=sd_out, data=data)
