"""Microbench: alternative formulations of the composed-pyramid blur at
256^3 (octave 0, 6 levels) to find the fastest MXU mapping.

Usage: python tools/blur_variants.py [size]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timed(label, fn, *args, n=5):
    jax.device_get(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.device_get(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{label:<56}{min(ts) * 1e3:>9.2f} ms", flush=True)
    return min(ts) * 1e3


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    from sift3d_tpu.params import DetectorParams
    from sift3d_tpu.pyramid import _composed_matrices, make_plan

    params = DetectorParams()
    plan = make_plan((n, n, n), (1.0, 1.0, 1.0), params)
    Px, Py, Pz = (jnp.asarray(P) for P in _composed_matrices(plan, 0))
    L = Px.shape[0]
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.normal(size=(n, n, n)).astype(np.float32))
    jax.device_get(jnp.sum(vol))

    HI = jax.lax.Precision.HIGHEST

    def s(x):
        return jnp.sum(x)

    # RTT floor
    timed("RTT floor", jax.jit(lambda v: v[0, 0, 0] * 1.0), vol)

    # current: einsum chain
    def cur(v):
        lv = jnp.einsum("lab,byz->layz", Px, v, precision=HI)
        lv = jnp.einsum("lab,lxbz->lxaz", Py, lv, precision=HI)
        lv = jnp.einsum("lab,lxyb->lxya", Pz, lv, precision=HI)
        return s(lv)
    timed("einsum x,y,z (current)", jax.jit(cur), vol)

    # per-axis costs
    def ax_x(v):
        return s(jnp.einsum("lab,byz->layz", Px, v, precision=HI))
    timed("  x-pass only [L,a,b]@[b,yz]", jax.jit(ax_x), vol)

    lv0 = jnp.einsum("lab,byz->layz", Px, vol, precision=HI)
    jax.device_get(jnp.sum(lv0))

    def ax_y(lv):
        return s(jnp.einsum("lab,lxbz->lxaz", Py, lv, precision=HI))
    timed("  y-pass only (middle contraction)", jax.jit(ax_y), lv0)

    def ax_z(lv):
        return s(jnp.einsum("lab,lxyb->lxya", Pz, lv, precision=HI))
    timed("  z-pass only (last-dim contraction)", jax.jit(ax_z), lv0)

    # variant: z-pass via [M, z] @ [z, z]^T (contract last dim, weights rhs)
    def zright(lv):
        out = jnp.einsum("lxyb,lab->lxya", lv, Pz, precision=HI)
        return s(out)
    timed("  z-pass as rhs-weights", jax.jit(zright), lv0)

    # variant: transpose-to-last for y: [l,x,y,z] -> [l,x,z,y], contract last
    def ytrans(lv):
        t = lv.transpose(0, 1, 3, 2)
        out = jnp.einsum("lxzb,lab->lxza", t, Py, precision=HI)
        return s(out.transpose(0, 1, 3, 2))
    timed("  y-pass via transpose+last-dim", jax.jit(ytrans), lv0)

    # variant: bf16 operands, f32 accumulate
    Px16, Py16, Pz16 = (p.astype(jnp.bfloat16) for p in (Px, Py, Pz))

    def bf16(v):
        v16 = v.astype(jnp.bfloat16)
        lv = jnp.einsum("lab,byz->layz", Px16, v16,
                        preferred_element_type=jnp.float32)
        lv = jnp.einsum("lab,lxbz->lxaz", Py16, lv.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        lv = jnp.einsum("lab,lxyb->lxya", Pz16, lv.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        return s(lv)
    timed("einsum bf16 ops, f32 accum", jax.jit(bf16), vol)

    # variant: single level (sequential would reuse) -- cost of one level
    def one_level(v):
        lv = jnp.einsum("ab,byz->ayz", Px[L - 1], v, precision=HI)
        lv = jnp.einsum("ab,xbz->xaz", Py[L - 1], lv, precision=HI)
        lv = jnp.einsum("ab,xyb->xya", Pz[L - 1], lv, precision=HI)
        return s(lv)
    timed("one level (widest kernel)", jax.jit(one_level), vol)

    # variant: conv_general_dilated with band taps (widest level)
    Wz = np.asarray(_composed_matrices(plan, 0)[2][L - 1])
    # extract band: find max half-width
    idx = np.where(np.abs(Wz) > 0)
    hw = int(np.max(np.abs(idx[0] - idx[1])))
    print(f"  (band half-width of widest composed kernel: {hw})")

    def conv_z(v):
        # depthwise 1-D conv along z: feature dim = 1
        x = v.reshape(n * n, 1, n)  # [batch, chan, z]
        taps = jnp.asarray(Wz[n // 2, n // 2 - hw:n // 2 + hw + 1],
                           jnp.float32).reshape(1, 1, 2 * hw + 1)
        out = jax.lax.conv_general_dilated(
            x, taps, (1,), [(hw, hw)],
            dimension_numbers=("NCH", "OIH", "NCH"),
            precision=HI)
        return s(out)
    timed("z-pass as 1-D conv (interior taps only)", jax.jit(conv_z), vol)


if __name__ == "__main__":
    main()
