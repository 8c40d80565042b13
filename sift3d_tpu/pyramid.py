"""Scale-space pyramid: host-side plan and device-side builders.

The plan (shapes, scales, filter taps, conv matrices) is computed on the host
once per (input shape, units, params) and is entirely static, so the whole
Gaussian scale-space / DoG construction traces into one fused XLA computation
of dense matmuls and subtractions.

Reference semantics reproduced (citations into /root/reference):
 - level scale sigma(o,s) = sigma0 * 2^(o + s/num_kp_levels)
   (imutil.c:1578-1579); first_level = -1 (sift.c:437).
 - octave dims: integer-halved per octave (imutil.c:1545-1548); octave count
   floor(log2(min dim)) - 3 + 1 (sift.c:441-454).
 - GSS chain: first blur takes the [-1,1]-scaled input from sigma_n to
   sigma(0, -1); each level s is the previous level blurred by the octave-0
   incremental kernel for (s-1 -> s); the next octave starts by striding
   every 2nd voxel of level (last - 2) (build_gpyr, sift.c:662-711;
   im_downsample_2x, imutil.c:591-617).
 - the same octave-0 kernel bank is reused at every octave, applied with
   unit = 1.0, so tap spacing in voxels is 1/units (2^-o for unit-spaced
   inputs) with linear interpolation (apply_Sep_FIR_filter, imutil.c:1127).
 - DoG[s] = gpyr[s] - gpyr[s+1] (build_dog, sift.c:713-732).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .filters import (conv_diagonals, conv_matrix, gauss_kernel,
                      incremental_sigma)
from .params import DetectorParams


@dataclasses.dataclass(frozen=True)
class PyramidPlan:
    """Static description of the pyramid for one (dims, units, params)."""
    params: DetectorParams
    input_dims: tuple[int, int, int]
    units: tuple[float, float, float]
    num_octaves: int
    # dims of each octave, octave-major: octave_dims[o] = (nx, ny, nz)
    octave_dims: tuple[tuple[int, int, int], ...]
    # absolute scale per gpyr level: scales[o][i] for i = 0..num_gpyr_levels-1
    # (i indexes the stacked level axis; raw level s = i + first_level)
    scales: tuple[tuple[float, ...], ...]
    # float32 taps: first_taps for the input blur; level_taps[i] blurs stacked
    # level i-1 -> i (i = 1..num_gpyr_levels-1)
    first_taps: tuple[float, ...]
    level_taps: tuple[tuple[float, ...], ...]

    @property
    def num_gpyr_levels(self) -> int:
        return self.params.num_gpyr_levels

    @property
    def num_dog_levels(self) -> int:
        return self.params.num_dog_levels

    def level_units(self, octave: int) -> tuple[float, float, float]:
        f = 2.0 ** octave
        return tuple(u * f for u in self.units)

    def unit_factor(self, octave: int, axis: int) -> float:
        """Tap spacing in voxels at this octave/axis: the reference applies
        the kernel bank with unit=1.0 (build_gpyr, sift.c:675), so
        unit_factor = 1.0 / level_units (imutil.c:754-755)."""
        return 1.0 / self.level_units(octave)[axis]

    def conv_matrices(self, octave: int, taps) -> list[np.ndarray]:
        """Per-axis banded matrices for one blur at one octave."""
        dims = self.octave_dims[octave]
        return [
            conv_matrix(dims[a], np.asarray(taps, np.float32),
                        self.unit_factor(octave, a))
            for a in range(3)
        ]

    def conv_diags(self, octave: int, taps) -> list[tuple[np.ndarray, int]]:
        """Per-axis diagonal-form operators for one blur at one octave."""
        dims = self.octave_dims[octave]
        return [
            conv_diagonals(dims[a], np.asarray(taps, np.float32),
                           self.unit_factor(octave, a))
            for a in range(3)
        ]


def make_plan(input_dims: Sequence[int], units: Sequence[float],
              params: DetectorParams) -> PyramidPlan:
    dims = tuple(int(d) for d in input_dims)
    units = tuple(float(u) for u in units)
    num_octaves = params.num_octaves(dims)

    octave_dims = [dims]
    for _ in range(1, num_octaves):
        octave_dims.append(tuple(d // 2 for d in octave_dims[-1]))

    L = params.num_gpyr_levels
    fl = params.first_level
    scales = tuple(
        tuple(params.level_scale(o, i + fl) for i in range(L))
        for o in range(num_octaves))

    wf = params.gauss_width_fctr
    first_taps = gauss_kernel(
        incremental_sigma(params.sigma_n, scales[0][0]), wf)
    level_taps = [()]  # stacked level 0 has no incremental filter
    for i in range(1, L):
        level_taps.append(tuple(gauss_kernel(
            incremental_sigma(scales[0][i - 1], scales[0][i]), wf).tolist()))

    return PyramidPlan(
        params=params, input_dims=dims, units=units, num_octaves=num_octaves,
        octave_dims=tuple(octave_dims), scales=scales,
        first_taps=tuple(first_taps.tolist()), level_taps=tuple(level_taps))


# ---------------------------------------------------------------------------
# Device-side builders
# ---------------------------------------------------------------------------


# "high_xy" is a split mode: bf16x3 (HIGH) on the x/y axis passes, f32
# (HIGHEST) on z — 100% keypoint-set parity and 100% of descriptors
# within 1% rel-L2 of all-HIGHEST at 256^3 (tools/prec_split.py), at
# two-thirds of the all-f32 MXU cost.
_PREC_XY = {
    "highest": jax.lax.Precision.HIGHEST,
    "high_xy": jax.lax.Precision.HIGH,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}
_PREC_Z = {
    "highest": jax.lax.Precision.HIGHEST,
    "high_xy": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}
_PREC_RANK = {"default": 0, "high": 1, "high_xy": 2, "highest": 3}


def _precision(params: DetectorParams):
    """(xy, z) einsum precisions for the keypoint-level groups."""
    name = params.conv_precision
    return _PREC_XY[name], _PREC_Z[name]


def _tail_precision(params: DetectorParams):
    """(xy, z) precisions for the gpyr tail levels (0 and above the
    keypoint levels): the weaker of conv_precision and
    conv_tail_precision (the tail knob never raises precision)."""
    name = min(params.conv_precision, params.conv_tail_precision,
               key=_PREC_RANK.__getitem__)
    return _PREC_XY[name], _PREC_Z[name]


def blur(vol: jnp.ndarray, Ws: Sequence[np.ndarray],
         params: DetectorParams, octave: int = 0) -> jnp.ndarray:
    """Separable blur of vol[nx,ny,nz] as three dense matmuls.

    Per-axis pass out = W @ signal, exactly the banded matrix from
    filters.conv_matrix. The reference applies axes in x, y, z order
    (apply_Sep_FIR_filter, imutil.c:1165-1188); matmul accumulation
    reorders the per-tap sums, which is tolerance-level only.
    """
    if octave >= params.conv_exact_from_octave:
        pxy = pz = jax.lax.Precision.HIGHEST
    else:
        pxy, pz = _precision(params)
    Wx, Wy, Wz = (jnp.asarray(W) for W in Ws)
    vol = jnp.einsum("ab,byz->ayz", Wx, vol, precision=pxy)
    vol = jnp.einsum("ab,xbz->xaz", Wy, vol, precision=pxy)
    vol = jnp.einsum("ab,xyb->xya", Wz, vol, precision=pz)
    return vol


def _diag_pass(vol: jnp.ndarray, Wd: jnp.ndarray, lo: int,
               axis: int) -> jnp.ndarray:
    """One axis pass in diagonal form: out[i] = sum_k Wd[i,k] * vol[i+lo+k].

    A handful of shifted fused multiply-adds (band widths 5-14 for the
    incremental taps) that XLA fuses into one VPU pass over the volume —
    the band-sparse formulation of the same banded matrix blur() applies
    densely on the MXU. Always float32 (elementwise math never drops to
    bf16), so it is both faster and at least as precise as any matmul
    precision mode. Out-of-range reads land in a zero pad and carry zero
    weight, exactly as conv_diagonals promises."""
    n = vol.shape[axis]
    B = Wd.shape[1]
    pad = [(0, 0)] * vol.ndim
    pad[axis] = (max(0, -lo), max(0, lo + B - 1))
    volp = jnp.pad(vol, pad)
    bshape = [1] * vol.ndim
    bshape[axis] = n
    out = None
    for k in range(B):
        sl = [slice(None)] * vol.ndim
        sl[axis] = slice(k, k + n)
        term = Wd[:, k].reshape(bshape) * volp[tuple(sl)]
        out = term if out is None else out + term
    return out


def blur_diag(vol: jnp.ndarray, diags, params: DetectorParams) -> jnp.ndarray:
    """Separable blur of vol[nx,ny,nz] as three diagonal-form axis passes
    (same x, y, z order as apply_Sep_FIR_filter, imutil.c:1165-1188).

    diags: per-axis (Wd, lo) from filters.conv_diagonals."""
    del params  # diagonal passes are always exact float32
    for axis, (Wd, lo) in enumerate(diags):
        vol = _diag_pass(vol, jnp.asarray(Wd), lo, axis)
    return vol


def scale_to_unit(vol: jnp.ndarray) -> jnp.ndarray:
    """Scale to [-1, 1] by the max absolute value (im_scale,
    imutil.c:697-713); zero images pass through unchanged."""
    m = jnp.max(jnp.abs(vol))
    return jnp.where(m == 0.0, vol, vol / m)


def downsample_2x(vol: jnp.ndarray) -> jnp.ndarray:
    """Stride every 2nd voxel; output dims floor(n/2)
    (im_downsample_2x, imutil.c:591-617)."""
    nx, ny, nz = (d // 2 for d in vol.shape)
    return vol[: 2 * nx : 2, : 2 * ny : 2, : 2 * nz : 2]


def build_gpyr_sequential(vol: jnp.ndarray,
                          plan: PyramidPlan) -> list[jnp.ndarray]:
    """Gaussian scale-space pyramid, one incremental blur per level (the
    reference's exact program order). Used by the sharded path, whose halo
    widths are per-pass."""
    params = plan.params
    L = plan.num_gpyr_levels
    octaves = []
    for o in range(plan.num_octaves):
        levels = []
        if o == 0:
            first = blur(vol, plan.conv_matrices(0, plan.first_taps), params)
        else:
            # Downsample from level (last - 2) of the previous octave
            # (build_gpyr, sift.c:694-707). With the default 6-level layout
            # this is stacked index L - 3, whose absolute scale equals the
            # next octave's first level.
            src = octaves[o - 1][L - 3]
            first = downsample_2x(src)
        levels.append(first)
        for i in range(1, L):
            Ws = plan.conv_matrices(o, plan.level_taps[i])
            levels.append(blur(levels[i - 1], Ws, params, octave=o))
        octaves.append(jnp.stack(levels))
    return octaves


def build_gpyr_incremental(vol: jnp.ndarray,
                           plan: PyramidPlan) -> list[jnp.ndarray]:
    """Gaussian scale-space pyramid through diagonal-form incremental
    blurs — the reference's exact program order (build_gpyr,
    sift.c:662-711) with the band-sparse VPU formulation of each pass.

    Per level this costs one fused elementwise pass over the octave
    (band widths 5-14) instead of three dense MXU matmuls of the composed
    operators, which at 256^3 are compute-bound in the f32 multi-pass
    matmul decomposition. Always float32-exact: conv_precision does not
    apply to this path."""
    L = plan.num_gpyr_levels
    octaves = []
    for o in range(plan.num_octaves):
        levels = []
        if o == 0:
            first = blur_diag(vol, plan.conv_diags(0, plan.first_taps),
                              plan.params)
        else:
            first = downsample_2x(octaves[o - 1][L - 3])
        levels.append(first)
        for i in range(1, L):
            diags = plan.conv_diags(o, plan.level_taps[i])
            levels.append(blur_diag(levels[i - 1], diags, plan.params))
        octaves.append(jnp.stack(levels))
    return octaves


@functools.lru_cache(maxsize=64)
def _composed_matrices(plan: PyramidPlan, octave: int):
    """Per-axis composed blur operators for one octave.

    Each incremental blur is a banded matrix per axis, and separable passes
    along different axes commute, so level i of an octave is
        (Wx_i ... Wx_1) x (Wy_i ... Wy_1) x (Wz_i ... Wz_1) @ src.
    Composing on the host (float64 accumulate) turns an octave's whole level
    chain into three batched matmuls. Octave 0 folds the initial
    sigma_n -> sigma(first level) blur into every product. Deeper octaves
    fold the 2x downsample (strided row selection, im_downsample_2x,
    imutil.c:591-617) into every product as a rectangular [n_o, n_prev]
    selection factor — a device-side strided gather feeding the MXU was
    measured ~30x slower than the extra rectangular matmul work.

    Returns [num_gpyr_levels, n_out, n_src] float32 per axis; row 0 is
    stacked level 0 (octave 0: the sigma_n -> first-level blur of the
    input; deeper octaves: the pure downsample selection of the previous
    octave's level L-3).
    """
    L = plan.num_gpyr_levels
    out_per_axis = []
    for a in range(3):
        if octave == 0:
            acc = np.asarray(plan.conv_matrices(0, plan.first_taps)[a],
                             np.float64)
        else:
            n_o = plan.octave_dims[octave][a]
            n_prev = plan.octave_dims[octave - 1][a]
            acc = np.zeros((n_o, n_prev), np.float64)
            acc[np.arange(n_o), 2 * np.arange(n_o)] = 1.0
        prods = [acc]
        for i in range(1, L):
            W = np.asarray(plan.conv_matrices(octave, plan.level_taps[i])[a],
                           np.float64)
            acc = W @ acc
            prods.append(acc)
        out_per_axis.append(np.stack(prods).astype(np.float32))
    return out_per_axis


@functools.lru_cache(maxsize=64)
def _composed_matrices_src(plan: PyramidPlan, octave: int):
    """Composed per-axis blur operators from the octave's OWN source
    (the already-downsampled level), square [num_gpyr_levels, n_o, n_o]
    per axis. Octave 0 equals _composed_matrices (the sigma_n -> first
    level blur folded in); deeper octaves start from the identity (their
    level 0 is the unblurred downsample). The z-sharded pyramid uses
    this form: the downsample stays a cheap local selection, and every
    level computes from the same halo-exchanged source slab."""
    if octave == 0:
        return _composed_matrices(plan, 0)
    L = plan.num_gpyr_levels
    out_per_axis = []
    for a in range(3):
        n = plan.octave_dims[octave][a]
        acc = np.eye(n, dtype=np.float64)
        prods = [acc]
        for i in range(1, L):
            W = np.asarray(plan.conv_matrices(octave, plan.level_taps[i])[a],
                           np.float64)
            acc = W @ acc
            prods.append(acc)
        out_per_axis.append(np.stack(prods).astype(np.float32))
    return out_per_axis


def build_gpyr(vol: jnp.ndarray, plan: PyramidPlan) -> list[jnp.ndarray]:
    """Gaussian scale-space pyramid.

    Returns one stacked array per octave with shape
    [num_gpyr_levels, nx_o, ny_o, nz_o]; stacked index i corresponds to raw
    level s = i + first_level.

    Every level of an octave is computed directly from the previous
    octave's source level through composed per-axis operators (see
    _composed_matrices): three batched MXU matmuls per octave, with the 2x
    downsample folded into the operators for deeper octaves. With
    params.gpyr_impl == "incremental" the diagonal-form sequential chain
    is used instead (see build_gpyr_incremental).
    """
    params = plan.params
    if params.gpyr_impl == "incremental":
        return build_gpyr_incremental(vol, plan)
    # "chain"/"auto" resolve to the composed operators here: the chained
    # kernel's benefit is its free DoG output, so only build_gpyr_and_dog
    # routes to it.
    L = plan.num_gpyr_levels
    octaves = []
    for o in range(plan.num_octaves):
        src = vol if o == 0 else octaves[o - 1][L - 3]
        octaves.append(_build_octave_composed(src, plan, o,
                                              _composed_groups(params, o)))
    return octaves


def _composed_groups(params: DetectorParams, octave: int = 0):
    """Contiguous level ranges by precision: stacked level 0 and levels
    above the keypoint levels feed only DoG neighbor comparisons (see
    DetectorParams.conv_tail_precision); levels 1..nl feed orientation /
    descriptor windows and the next octave's source (L-3) and stay at
    conv_precision. Octaves >= conv_exact_from_octave run every level at
    HIGHEST — they cost ~8^-octave of octave 0, so exactness there is
    nearly free and removes bf16x3 flips of near-threshold extrema. Each
    entry is (start, end, (prec_xy, prec_z))."""
    L0 = params.num_gpyr_levels
    if octave >= params.conv_exact_from_octave:
        hi = (jax.lax.Precision.HIGHEST, jax.lax.Precision.HIGHEST)
        return [(0, L0, hi)]
    prec = _precision(params)
    tail_prec = _tail_precision(params)
    L = params.num_gpyr_levels
    nl = params.num_kp_levels
    hi_end = min(nl + 1, L)
    groups = [(0, 1, tail_prec), (1, hi_end, prec), (hi_end, L, tail_prec)]
    groups = [(a, b, p) for a, b, p in groups if b > a]
    if tail_prec == prec:
        groups = [(0, L, prec)]
    return groups


def _build_octave_composed(src: jnp.ndarray, plan: PyramidPlan, o: int,
                           groups) -> jnp.ndarray:
    """One octave's stacked levels from its source through the composed
    per-axis operators (three batched MXU einsums per precision group)."""
    Px, Py, Pz = (jnp.asarray(P) for P in _composed_matrices(plan, o))
    parts = []
    for a, b, (pxy, pz) in groups:
        lv = jnp.einsum("lab,byz->layz", Px[a:b], src, precision=pxy)
        lv = jnp.einsum("lab,lxbz->lxaz", Py[a:b], lv, precision=pxy)
        lv = jnp.einsum("lab,lxyb->lxya", Pz[a:b], lv, precision=pz)
        parts.append(lv)
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


def build_gpyr_and_dog(vol: jnp.ndarray, plan: PyramidPlan,
                       use_pallas: bool | None = None,
                       interpret: bool = False,
                       with_dogmax: bool = False):
    """(gpyr octaves, dog octaves[, dogmax octaves]) in one build.

    with_dogmax=True additionally returns, per octave, the f32[L-1]
    per-DoG-level max |DoG| (the extrema threshold input,
    sift.c:821-829) — free from the chain kernel's per-tile max output;
    None for composed-fallback octaves (the caller reduces the DoG
    itself there).

    With gpyr_impl "chain" — or "auto" on a TPU backend — large octaves
    run through the chained aliased Pallas builder
    (ops/blur_kernel.chain_octave): every level + DoG level written
    directly into two threaded HBM buffers, one volume read + write per
    level, no stacking, no input padding, float32-exact (the reference's
    sequential per-level program order, build_gpyr, sift.c:662-711).
    Small/ineligible octaves and every other impl use the composed /
    incremental builders plus build_dog. Pass use_pallas=False from
    vmapped (batched) callers — the kernels have no batching rule."""
    params = plan.params
    if use_pallas is None:
        # "auto" = chain on TPU: hardware parity at bench scale verified
        # (tools/tpu_parity.py 256 sparse AND dense, gpyr_impl=chain:
        # keypoint rows EXACT incl. the stale-strength column at 8.9e-8 —
        # the composed default's one dense misattribution disappears —
        # descriptors 100% within 1%, worst 2.1e-3), at the same device
        # cost as composed (7.53 vs 7.46 ms gpyr+DoG, tools/chain_full).
        use_pallas = (params.gpyr_impl == "chain"
                      or (params.gpyr_impl == "auto"
                          and jax.default_backend() == "tpu"))
    if not use_pallas or params.gpyr_impl in ("incremental", "composed"):
        gp = build_gpyr(vol, plan)
        if with_dogmax:
            return gp, build_dog(gp), [None] * plan.num_octaves
        return gp, build_dog(gp)

    from .ops.blur_kernel import chain_eligible, chain_octave
    L = plan.num_gpyr_levels
    hi = (jax.lax.Precision.HIGHEST, jax.lax.Precision.HIGHEST)
    gps, dogs, dmaxes = [], [], []
    src_prev = vol      # previous octave's downsample source level
    for o in range(plan.num_octaves):
        if not chain_eligible(plan, o):
            # Composed fallback (folds the downsample itself). Octaves
            # >= 1 are forced f32-exact to match the chain — they cost
            # ~8^-o of octave 0. A chain-INELIGIBLE octave 0 keeps the
            # composed default's mixed-precision groups (forcing it
            # exact costs ~+2 ms at 256^3 and octave 0 dominates
            # runtime), so the pyramid's precision is uniform only when
            # octave 0 itself runs the chain.
            oct_ = _build_octave_composed(
                src_prev, plan, o,
                [(0, L, hi)] if o >= 1 else _composed_groups(params, o))
            gps.append(oct_)
            dogs.append(oct_[:-1] - oct_[1:])
            dmaxes.append(None)
        else:
            src = (vol if o == 0
                   else downsample_2x_matmul(src_prev))
            gp, dg, dmx = chain_octave(src, plan, o, interpret)
            gps.append(gp)
            dogs.append(dg)
            dmaxes.append(dmx)
        src_prev = gps[o][L - 3]
    if with_dogmax:
        return gps, dogs, dmaxes
    return gps, dogs


@functools.lru_cache(maxsize=32)
def _selection_matrix(n: int) -> np.ndarray:
    S = np.zeros((n // 2, n), np.float32)
    S[np.arange(n // 2), 2 * np.arange(n // 2)] = 1.0
    return S


def downsample_2x_matmul(vol: jnp.ndarray) -> jnp.ndarray:
    """Exactly downsample_2x, as three selection matmuls on the MXU.

    A 0/1 selection at Precision.HIGHEST is bit-exact (each output is a
    single picked element), and the matmul formulation avoids the
    lane-dim strided gather that makes the direct slice slow on TPU."""
    hi = jax.lax.Precision.HIGHEST
    Sx, Sy, Sz = (jnp.asarray(_selection_matrix(vol.shape[a]))
                  for a in range(3))
    out = jnp.einsum("ab,byz->ayz", Sx, vol, precision=hi)
    out = jnp.einsum("ab,xbz->xaz", Sy, out, precision=hi)
    return jnp.einsum("ab,xyb->xya", Sz, out, precision=hi)


def build_dog(gpyr: list[jnp.ndarray]) -> list[jnp.ndarray]:
    """DoG pyramid: dog[i] = gpyr[i] - gpyr[i+1] per octave
    (build_dog, sift.c:713-732)."""
    return [g[:-1] - g[1:] for g in gpyr]
