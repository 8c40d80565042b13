"""Extrema + compaction stage attribution at 256^3: dogmax reductions,
stencil mask, mask counts, compact_flat, coordinate/strength resolution.

Usage: python -u tools/extrema_micro.py [size]
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
    from sift3d_tpu.detect import (_CUBE_OFFSETS, _FACE_OFFSETS,
                                   compact_flat, detect_extrema_octave)
    from sift3d_tpu.params import DetectorParams

    params = DetectorParams()
    nl = params.num_kp_levels
    Ld = params.num_dog_levels
    rng = np.random.default_rng(0)
    # realistic sparsity: smooth noise so extrema are rare
    from scipy.ndimage import gaussian_filter
    base = rng.normal(size=(Ld, n, n, n)).astype(np.float32)
    for i in range(Ld):
        base[i] = gaussian_filter(base[i], 2.0)
    dog = jnp.asarray(base)
    jax.device_get(jnp.sum(dog))
    cap = 2048 * nl

    def dogmax(args):
        (d,) = args
        cur = d[1:Ld - 1]
        return jnp.max(jnp.abs(cur), axis=(1, 2, 3))

    def mask_fn(d):
        cur = d[1:Ld - 1]
        dmax = jnp.max(jnp.abs(cur), axis=(1, 2, 3))
        peak = (jnp.float32(params.peak_thresh) * dmax)[:, None, None, None]

        def sh(a, dx, dy, dz):
            return a[:, 1 + dx: n - 1 + dx, 1 + dy: n - 1 + dy,
                     1 + dz: n - 1 + dz]

        pcur = sh(cur, 0, 0, 0)
        prev = d[0:Ld - 2]
        nxt = d[2:Ld]
        is_max = jnp.ones_like(pcur, bool)
        is_min = jnp.ones_like(pcur, bool)
        for off in _FACE_OFFSETS:
            nb = sh(cur, *off)
            is_max &= pcur > nb
            is_min &= pcur < nb
        for nb in (sh(prev, 0, 0, 0), sh(nxt, 0, 0, 0)):
            is_max &= pcur > nb
            is_min &= pcur < nb
        return ((pcur > peak) | (pcur < -peak)) & (is_max | is_min), pcur

    def mask_only(args):
        (d,) = args
        m, _ = mask_fn(d)
        return m

    def mask_counts(args):
        (d,) = args
        m, _ = mask_fn(d)
        return jnp.sum(m, axis=(1, 2, 3), dtype=jnp.int32)

    def mask_compact(args):
        (d,) = args
        m, _ = mask_fn(d)
        flat_idx, valid, _ = compact_flat(m.ravel(), cap)
        return flat_idx, valid

    def full(args):
        (d,) = args
        c = detect_extrema_octave(d, params, cap)
        return c.coords, c.strength, c.valid, c.counts

    for label, fn in (("dogmax reductions", dogmax),
                      ("+ stencil mask", mask_only),
                      ("+ per-level counts", mask_counts),
                      ("+ compact_flat", mask_compact),
                      ("full detect_extrema_octave", full)):
        t = device_time(jax.jit(fn), (dog,), k1=2, k2=12)
        print(f"{label:<30}{t * 1e3:9.2f} ms", flush=True)


# pallas-vs-XLA A/B entry: `python tools/extrema_micro.py <size> ab`
def ab():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    from sift3d_tpu.detect import detect_extrema_octave
    from sift3d_tpu.params import DetectorParams
    from scipy.ndimage import gaussian_filter

    params = DetectorParams()
    Ld = params.num_dog_levels
    rng = np.random.default_rng(0)
    base = rng.normal(size=(Ld, n, n, n)).astype(np.float32)
    for i in range(Ld):
        base[i] = gaussian_filter(base[i], 2.0)
    dog = jnp.asarray(base)
    jax.device_get(jnp.sum(dog))
    cap = 2048 * (Ld - 2)

    a = jax.jit(lambda d: detect_extrema_octave(d, params, cap,
                                                use_pallas=False))
    b = jax.jit(lambda d: detect_extrema_octave(d, params, cap,
                                                use_pallas=True))
    ra, rb = jax.device_get((a(dog), b(dog)))
    same = (np.array_equal(ra.coords, rb.coords)
            and np.array_equal(ra.level, rb.level)
            and np.array_equal(ra.strength, rb.strength)
            and np.array_equal(ra.counts, rb.counts))
    print(f"hardware parity: {same} "
          f"(counts {ra.counts.tolist()} vs {rb.counts.tolist()})",
          flush=True)

    for label, fn in (("XLA detect_extrema_octave", a),
                      ("pallas detect_extrema_octave", b)):
        t = device_time(lambda args, f=fn: f(args[0]), (dog,), k1=2, k2=12)
        print(f"{label:<30}{t * 1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[2] == "ab":
        ab()
    else:
        main()
