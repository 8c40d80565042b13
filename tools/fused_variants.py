"""Device-time attribution inside the fused hinted program: measures the
full program and ablations (no descriptors / no orientation / detect only)
with RTT-immune loop timing, at the bench hint configuration.

Usage: python -u tools/fused_variants.py [size]
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
    dense = "--dense" in sys.argv
    from bench import make_bench_volume, make_dense_volume
    import sift3d_tpu as s3d
    from sift3d_tpu.descriptor import extract_descriptors as _extract_level
    from sift3d_tpu.detect import compact_flat, detect_extrema_octave
    from sift3d_tpu.orientation import assign_orientations
    from sift3d_tpu.pipeline import _hint_cfg
    from sift3d_tpu.pyramid import build_gpyr_and_dog, make_plan, \
        scale_to_unit
    from sift3d_tpu.volume import Volume

    vol = Volume.from_array(
        make_dense_volume(n) if dense else make_bench_volume(n))
    jax.device_get(jnp.sum(vol.data))

    det = s3d.SIFT3D()
    for _ in range(4):         # learn hint, reach the tight-slot config
        det.detect_keypoints(vol)
    plan = make_plan(vol.shape, vol.units, det.params)
    cfg = _hint_cfg(plan, det._hint, det.params,
                    tight=det._hint_streak >= 2)
    params = det.params
    nl = params.num_kp_levels
    print(f"cfg: {list(cfg)}", flush=True)

    def make(with_ori, with_desc):
        def run(data):
            x = scale_to_unit(data)
            gpyr, dogs = build_gpyr_and_dog(x, plan)
            acc = jnp.float32(0)
            for o, (cap, ospec, dslots) in enumerate(cfg):
                dog_oct = dogs[o]
                cand = detect_extrema_octave(dog_oct, params, cap)
                acc += jnp.sum(cand.counts) + jnp.sum(cand.strength)
                if not with_ori:
                    continue
                units = plan.level_units(o)
                scales = np.asarray(
                    [plan.scales[o][1 + li] for li in range(nl)],
                    np.float32)
                if isinstance(ospec, tuple):   # dense octave: per level
                    for li in range(nl):
                        sd_li = float(scales[li])
                        level = gpyr[o][1 + li]
                        sel = cand.valid & (cand.level == li)
                        idx, lvalid, _ = compact_flat(sel, ospec[li])
                        co = cand.coords[idx]
                        ori = assign_orientations(
                            level, co, lvalid, sd_li, units, params,
                            chunk=(256 if ospec[li] % 256 == 0
                                   else ospec[li]))
                        acc += jnp.sum(ori.R) + jnp.sum(ori.accepted)
                        if not with_desc:
                            continue
                        idxd, dvalid, _ = compact_flat(ori.accepted,
                                                       dslots[li])
                        res = _extract_level(level, co[idxd], ori.R[idxd],
                                             dvalid, sd_li, o, units,
                                             params)
                        acc += jnp.sum(res.desc)
                    continue
                lv = gpyr[o][1:1 + nl]
                level_s = cand.level[:ospec]
                ori = assign_orientations(
                    lv, cand.coords[:ospec], cand.valid[:ospec],
                    jnp.asarray(scales)[level_s], units, params,
                    sd_max=float(scales.max()), level_index=level_s,
                    fractional_centers=False)
                acc += jnp.sum(ori.R) + jnp.sum(ori.accepted)
                if not with_desc:
                    continue
                idx, dvalid, acc_count = compact_flat(ori.accepted, dslots)
                co = cand.coords[:ospec][idx]
                lvk = level_s[idx]
                res = _extract_level(
                    lv, co, ori.R[idx], dvalid, jnp.asarray(scales)[lvk],
                    o, units, params, centers=co.astype(jnp.float32),
                    sd_max=float(scales.max()), level_index=lvk,
                    fractional_centers=False)
                acc += jnp.sum(res.desc)
            return acc
        return run

    t_det = device_time(make(False, False), vol.data, k1=1, k2=5)
    print(f"detect only:        {t_det * 1e3:8.2f} ms", flush=True)
    t_ori = device_time(make(True, False), vol.data, k1=1, k2=5)
    print(f"detect+ori:         {t_ori * 1e3:8.2f} ms  "
          f"(ori {1e3 * (t_ori - t_det):.2f})", flush=True)
    t_all = device_time(make(True, True), vol.data, k1=1, k2=5)
    print(f"detect+ori+desc:    {t_all * 1e3:8.2f} ms  "
          f"(desc {1e3 * (t_all - t_ori):.2f})", flush=True)


if __name__ == "__main__":
    main()
