"""RTT-immune comparison of full-pyramid blur formulations.

Usage: python tools/gpyr_variants.py [size]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from device_time import device_time


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    from bench import make_bench_volume
    from sift3d_tpu.params import DetectorParams
    from sift3d_tpu.pyramid import (_composed_matrices, build_gpyr,
                                    downsample_2x, make_plan)

    params = DetectorParams()
    plan = make_plan((n, n, n), (1.0, 1.0, 1.0), params)
    L = plan.num_gpyr_levels
    vol = jnp.asarray(make_bench_volume(n))
    jax.device_get(jnp.sum(vol))
    HI = jax.lax.Precision.HIGHEST

    def report(label, fn):
        t = device_time(fn, vol)
        print(f"{label:<56}{t * 1e3:>9.2f} ms", flush=True)

    # V0: current
    report("V0 current build_gpyr (einsum chain)",
           lambda v: sum(jnp.sum(g) for g in build_gpyr(v, plan)))

    # octave-0 only, current
    def oct0(v):
        Px, Py, Pz = (jnp.asarray(P) for P in _composed_matrices(plan, 0))
        lv = jnp.einsum("lab,byz->layz", Px, v, precision=HI)
        lv = jnp.einsum("lab,lxbz->lxaz", Py, lv, precision=HI)
        lv = jnp.einsum("lab,lxyb->lxya", Pz, lv, precision=HI)
        return jnp.sum(lv)
    report("V0 octave 0 only", oct0)

    # V1: per-level transpose-cycle (contract last dim always)
    def blur_level_tc(src, Wx, Wy, Wz):
        nx, ny, nz = src.shape
        v = (src.reshape(-1, nz) @ Wz.T).reshape(nx, ny, nz)
        v = v.transpose(0, 2, 1)                  # [x, z, y]
        v = (v.reshape(-1, ny) @ Wy.T).reshape(nx, nz, ny)
        v = v.transpose(2, 1, 0)                  # [y, z, x]
        v = (v.reshape(-1, nx) @ Wx.T).reshape(ny, nz, nx)
        return v.transpose(2, 0, 1)               # [x, y, z]

    def gpyr_tc(v):
        acc = jnp.float32(0)
        src = v
        for o in range(plan.num_octaves):
            Ws = _composed_matrices(plan, o)
            levels = []
            for i in range(Ws[0].shape[0]):
                levels.append(blur_level_tc(
                    src, *(jnp.asarray(W[i]) for W in Ws)))
            if o == 0:
                st = jnp.stack(levels)
            else:
                st = jnp.stack([src] + levels)
            acc += jnp.sum(st)
            src = downsample_2x(st[L - 3])
        return acc
    report("V1 per-level transpose-cycle matmuls", gpyr_tc)

    # V2: stacked transpose-cycle: one [L*rest, n] @ [n, n] per axis
    def gpyr_tc_stacked(v):
        acc = jnp.float32(0)
        src = v
        for o in range(plan.num_octaves):
            Ws = _composed_matrices(plan, o)
            Lo = Ws[0].shape[0]
            nx, ny, nz = src.shape
            Wxs, Wys, Wzs = (jnp.asarray(W) for W in Ws)
            # z: batched over levels via block-diag-free batching
            lv = jnp.einsum("xyb,lab->lxya", src, Wzs, precision=HI)
            lv = lv.transpose(0, 1, 3, 2)          # [l, x, z, y]
            lv = jnp.einsum("lxzb,lab->lxza", lv, Wys, precision=HI)
            lv = lv.transpose(0, 3, 2, 1)          # [l, y, z, x]
            lv = jnp.einsum("lyzb,lab->lyza", lv, Wxs, precision=HI)
            lv = lv.transpose(0, 3, 1, 2)          # [l, x, y, z]
            if o > 0:
                lv = jnp.concatenate([src[None], lv], axis=0)
            acc += jnp.sum(lv)
            src = downsample_2x(lv[L - 3])
        return acc
    report("V2 stacked rhs-weight einsums + transposes", gpyr_tc_stacked)

    # V3: current formulation but DEFAULT precision end-to-end
    def gpyr_bf16(v):
        acc = jnp.float32(0)
        src = v
        for o in range(plan.num_octaves):
            Px, Py, Pz = (jnp.asarray(P)
                          for P in _composed_matrices(plan, o))
            lv = jnp.einsum("lab,byz->layz", Px, src)
            lv = jnp.einsum("lab,lxbz->lxaz", Py, lv)
            lv = jnp.einsum("lab,lxyb->lxya", Pz, lv)
            if o > 0:
                lv = jnp.concatenate([src[None], lv], axis=0)
            acc += jnp.sum(lv)
            src = downsample_2x(lv[L - 3])
        return acc
    report("V3 current einsums, DEFAULT precision", gpyr_bf16)

    # V4: V1 at DEFAULT precision
    def blur_level_tc_d(src, Wx, Wy, Wz):
        nx, ny, nz = src.shape
        v = (src.reshape(-1, nz) @ Wz.T).reshape(nx, ny, nz)
        v = v.transpose(0, 2, 1)
        v = (v.reshape(-1, ny) @ Wy.T).reshape(nx, nz, ny)
        v = v.transpose(2, 1, 0)
        v = (v.reshape(-1, nx) @ Wx.T).reshape(ny, nz, nx)
        return v.transpose(2, 0, 1)

    def gpyr_tc_d(v):
        acc = jnp.float32(0)
        src = v
        for o in range(plan.num_octaves):
            Ws = _composed_matrices(plan, o)
            levels = [blur_level_tc_d(src, *(jnp.asarray(W[i])
                                             for W in Ws))
                      for i in range(Ws[0].shape[0])]
            st = jnp.stack(levels) if o == 0 else jnp.stack([src] + levels)
            acc += jnp.sum(st)
            src = downsample_2x(st[L - 3])
        return acc
    report("V4 V1 at DEFAULT precision", gpyr_tc_d)


if __name__ == "__main__":
    main()
