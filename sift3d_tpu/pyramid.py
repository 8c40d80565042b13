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

from .filters import conv_matrix, gauss_kernel, incremental_sigma
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


_PREC = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}
_PREC_RANK = {"default": 0, "high": 1, "highest": 2}


def _precision(params: DetectorParams):
    return _PREC[params.conv_precision]


def _tail_precision(params: DetectorParams):
    """Precision for the gpyr tail levels (0 and > num_kp_levels): the
    weaker of conv_precision and conv_tail_precision (the tail knob never
    raises precision above the main one)."""
    name = min(params.conv_precision, params.conv_tail_precision,
               key=_PREC_RANK.__getitem__)
    return _PREC[name]


def blur(vol: jnp.ndarray, Ws: Sequence[np.ndarray],
         params: DetectorParams) -> jnp.ndarray:
    """Separable blur of vol[nx,ny,nz] as three dense matmuls.

    Per-axis pass out = W @ signal, exactly the banded matrix from
    filters.conv_matrix. The reference applies axes in x, y, z order
    (apply_Sep_FIR_filter, imutil.c:1165-1188); matmul accumulation
    reorders the per-tap sums, which is tolerance-level only.
    """
    prec = _precision(params)
    Wx, Wy, Wz = (jnp.asarray(W) for W in Ws)
    vol = jnp.einsum("ab,byz->ayz", Wx, vol, precision=prec)
    vol = jnp.einsum("ab,xbz->xaz", Wy, vol, precision=prec)
    vol = jnp.einsum("ab,xyb->xya", Wz, vol, precision=prec)
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
            levels.append(blur(levels[i - 1], Ws, params))
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


def build_gpyr(vol: jnp.ndarray, plan: PyramidPlan) -> list[jnp.ndarray]:
    """Gaussian scale-space pyramid.

    Returns one stacked array per octave with shape
    [num_gpyr_levels, nx_o, ny_o, nz_o]; stacked index i corresponds to raw
    level s = i + first_level.

    Every level of an octave is computed directly from the previous
    octave's source level through composed per-axis operators (see
    _composed_matrices): three batched MXU matmuls per octave, with the 2x
    downsample folded into the operators for deeper octaves.
    """
    params = plan.params
    prec = _precision(params)
    tail_prec = _tail_precision(params)
    L = plan.num_gpyr_levels
    nl = params.num_kp_levels
    # Level groups by precision: stacked level 0 and levels above the
    # keypoint levels feed only DoG neighbor comparisons (see
    # DetectorParams.conv_tail_precision); levels 1..nl feed orientation /
    # descriptor windows and the next octave's source (L-3) and stay at
    # conv_precision. Contiguous slices keep the einsums batched.
    hi_end = min(nl + 1, L)
    groups = [(0, 1, tail_prec), (1, hi_end, prec), (hi_end, L, tail_prec)]
    groups = [(a, b, p) for a, b, p in groups if b > a]
    if tail_prec == prec:
        groups = [(0, L, prec)]
    octaves = []
    for o in range(plan.num_octaves):
        src = vol if o == 0 else octaves[o - 1][L - 3]
        Px, Py, Pz = (jnp.asarray(P) for P in _composed_matrices(plan, o))
        parts = []
        for a, b, p in groups:
            lv = jnp.einsum("lab,byz->layz", Px[a:b], src, precision=p)
            lv = jnp.einsum("lab,lxbz->lxaz", Py[a:b], lv, precision=p)
            lv = jnp.einsum("lab,lxyb->lxya", Pz[a:b], lv, precision=p)
            parts.append(lv)
        octaves.append(parts[0] if len(parts) == 1
                       else jnp.concatenate(parts, axis=0))
    return octaves


def build_dog(gpyr: list[jnp.ndarray]) -> list[jnp.ndarray]:
    """DoG pyramid: dog[i] = gpyr[i] - gpyr[i+1] per octave
    (build_dog, sift.c:713-732)."""
    return [g[:-1] - g[1:] for g in gpyr]
