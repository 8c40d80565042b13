"""Speculative descriptor dispatch: the second detection on a plan sizes a
speculative per-octave descriptor extraction from the previous accepted
counts, and extract_descriptors serves from the resulting cache with no
device work. Values must be identical to the non-speculative device path.
"""

import numpy as np
import pytest

import sift3d_tpu as s3d


@pytest.fixture(scope="module")
def blob_volume():
    rng = np.random.default_rng(7)
    n = 48
    x, y, z = np.meshgrid(*([np.arange(n)] * 3), indexing="ij")
    vol = np.zeros((n, n, n), np.float32)
    for _ in range(16):
        c = rng.uniform(6, n - 6, 3)
        s = rng.uniform(2, 5, 3)
        vol += rng.uniform(0.3, 1.0) * np.exp(
            -(((x - c[0]) / s[0]) ** 2 + ((y - c[1]) / s[1]) ** 2
              + ((z - c[2]) / s[2]) ** 2)).astype(np.float32)
    return vol


def test_spec_desc_cache_matches_device_path(blob_volume):
    det = s3d.SIFT3D()
    kp1 = det.detect_keypoints(blob_volume)
    assert len(kp1) > 0
    # First call has no hint -> no speculation; descriptors go through the
    # device path.
    d1 = det.extract_descriptors(kp1)
    assert det._hint  # learned for next time

    kp2 = det.detect_keypoints(blob_volume)
    assert det._spec_desc_cache, "speculation should cover this volume"
    np.testing.assert_array_equal(np.asarray(kp1.coords),
                                  np.asarray(kp2.coords))
    d2 = det.extract_descriptors(kp2)  # served from cache
    # the cache ships as 12-bit fixed point (2 values / 3 bytes):
    # error <= dmax/8190 <= 1.3e-4 for dmax <= 1.05
    np.testing.assert_allclose(d1.data, d2.data, atol=2e-4)
    np.testing.assert_allclose(d1.xyz, d2.xyz)
    np.testing.assert_allclose(d1.sd, d2.sd)


def test_spec_desc_cache_serves_sorted_subset(blob_volume):
    det = s3d.SIFT3D()
    det.detect_keypoints(blob_volume)
    kp = det.detect_keypoints(blob_volume)
    full = det.extract_descriptors(kp)
    top = kp.sort_by_strength(4)
    sub = det.extract_descriptors(top)
    # identity lookup: each row of the subset matches the full extraction
    for j in range(len(top)):
        m = np.nonzero((full.xyz == sub.xyz[j]).all(axis=1))[0]
        assert len(m) >= 1
        np.testing.assert_array_equal(full.data[m[0]], sub.data[j])


def test_stale_hint_on_different_volume_is_exact(blob_volume):
    """A hint learned on volume A sizes speculation for volume B; whether
    speculation hits or overflows, results must equal a fresh detector's."""
    rng = np.random.default_rng(99)
    n = blob_volume.shape[0]
    x, y, z = np.meshgrid(*([np.arange(n)] * 3), indexing="ij")
    other = np.zeros_like(blob_volume)
    for _ in range(40):  # denser -> more keypoints than blob_volume
        c = rng.uniform(6, n - 6, 3)
        s = rng.uniform(2, 4, 3)
        other += rng.uniform(0.3, 1.0) * np.exp(
            -(((x - c[0]) / s[0]) ** 2 + ((y - c[1]) / s[1]) ** 2
              + ((z - c[2]) / s[2]) ** 2)).astype(np.float32)

    det = s3d.SIFT3D()
    det.detect_keypoints(blob_volume)          # learn hint on A
    kp = det.detect_keypoints(other)           # speculate on B
    desc = det.extract_descriptors(kp)

    fresh = s3d.SIFT3D()
    kp_ref = fresh.detect_keypoints(other)
    desc_ref = fresh.extract_descriptors(kp_ref)
    np.testing.assert_array_equal(np.asarray(kp.coords),
                                  np.asarray(kp_ref.coords))
    np.testing.assert_allclose(desc.data, desc_ref.data, atol=2e-4)


def test_hint_cfg_slots_compatible_with_orientation_chunking():
    """Regression: an octave with ~204-255 candidates used to produce
    ospec=320, which is neither <= 256 nor a multiple of 256 and tripped
    chunked_vmap's divisibility assert inside the fused program."""
    from sift3d_tpu.params import DetectorParams
    from sift3d_tpu.pipeline import _hint_cfg
    from sift3d_tpu.pyramid import make_plan

    p = DetectorParams()
    plan = make_plan((64, 64, 64), (1.0, 1.0, 1.0), p)
    for total in (0, 3, 50, 203, 204, 210, 255, 256, 300, 409, 410, 1000):
        acc = max(1, total // 8)
        hint = {o: (total, acc, (acc // 3, acc // 3, acc // 3),
                    (total // 3, total // 3, total // 3))
                for o in range(plan.num_octaves)}
        for cap, ospec, dslots in _hint_cfg(plan, hint, p):
            for os_li in (ospec if isinstance(ospec, tuple) else (ospec,)):
                assert os_li <= 256 or os_li % 256 == 0, (total, os_li)
            for ds in (dslots if isinstance(dslots, tuple) else (dslots,)):
                assert ds % 8 == 0


def test_fused_program_runs_with_non_pow2_kp_per_level(blob_volume):
    """kp_per_level makes the candidate capacity non-power-of-two; the
    fused program must still compile and match the first detection."""
    import numpy as np

    det = s3d.SIFT3D(s3d.DetectorParams(kp_per_level=100))
    kp1 = det.detect_keypoints(blob_volume)
    kp2 = det.detect_keypoints(blob_volume)  # fused hinted program
    np.testing.assert_array_equal(np.asarray(kp1.coords),
                                  np.asarray(kp2.coords))


def test_spec_miss_falls_back(blob_volume):
    det = s3d.SIFT3D()
    det.detect_keypoints(blob_volume)
    kp = det.detect_keypoints(blob_volume)
    ref = det.extract_descriptors(kp)
    det._spec_desc_cache = None  # force the device path
    dev = det.extract_descriptors(kp)
    np.testing.assert_allclose(ref.data, dev.data, atol=2e-4)


def test_dense_octave_per_level_descriptor_branch():
    """Octaves whose hinted accepted count reaches params.dense_octave_acc
    per-level descriptor extraction inside the fused program (smaller
    windows). Keypoints must stay exact; descriptors may differ from the
    mixed-window device path only at f32-noise level (<< the 1% parity
    tolerance)."""
    import numpy as np
    from sift3d_tpu import pipeline

    rng = np.random.default_rng(11)
    n = 64
    x, y, z = np.meshgrid(*([np.arange(n)] * 3), indexing="ij")
    vol = np.zeros((n, n, n), np.float32)
    for _ in range(300):
        c = rng.uniform(5, n - 5, 3)
        s = rng.uniform(1.2, 3, 3)
        vol += rng.uniform(0.3, 1.0) * np.exp(
            -(((x - c[0]) / s[0]) ** 2 + ((y - c[1]) / s[1]) ** 2
              + ((z - c[2]) / s[2]) ** 2)).astype(np.float32)

    det = s3d.SIFT3D()
    kp1 = det.detect_keypoints(vol)
    dense = [o for o, h in det._hint.items()
             if h[1] >= det.params.dense_octave_acc]
    assert dense, f"phantom too sparse to exercise the branch: {det._hint}"
    d1 = det.extract_descriptors(kp1)

    kp2 = det.detect_keypoints(vol)   # fused program, per-level branch
    assert det._spec_desc_cache
    d2 = det.extract_descriptors(kp2)
    np.testing.assert_array_equal(np.asarray(kp1.coords),
                                  np.asarray(kp2.coords))
    np.testing.assert_array_equal(np.asarray(kp1.strength),
                                  np.asarray(kp2.strength))
    np.testing.assert_allclose(np.asarray(kp1.R), np.asarray(kp2.R),
                               atol=2e-4)
    rel = (np.linalg.norm(d1.data - d2.data, axis=1)
           / (np.linalg.norm(d1.data, axis=1) + 1e-12))
    assert rel.max() < 5e-3, rel.max()

    kp3 = det.detect_keypoints(vol)   # hint re-learned from hinted path
    np.testing.assert_array_equal(np.asarray(kp2.coords),
                                  np.asarray(kp3.coords))
    np.testing.assert_array_equal(np.asarray(kp2.R), np.asarray(kp3.R))


def _varied_phantoms(n=48, count=4):
    out = []
    for seed in range(count):
        rng = np.random.default_rng(100 + seed)
        x, y, z = np.meshgrid(*([np.arange(n)] * 3), indexing="ij")
        vol = np.zeros((n, n, n), np.float32)
        for _ in range(12 + 4 * seed):
            c = rng.uniform(6, n - 6, 3)
            s = rng.uniform(2, 5, 3)
            vol += rng.uniform(0.3, 1.0) * np.exp(
                -(((x - c[0]) / s[0]) ** 2 + ((y - c[1]) / s[1]) ** 2
                  + ((z - c[2]) / s[2]) ** 2)).astype(np.float32)
        out.append(vol)
    return out


def test_hint_envelope_varied_stream():
    """A stream of DIFFERENT same-shape volumes must converge: after one
    full cycle the envelope (max over hint_history raw counts) covers
    every volume, so later cycles run hinted with no misses, the streak
    grows (tight mode engages), and each volume's keypoints equal its
    cold-path detection exactly."""
    vols = _varied_phantoms()
    cold = []
    for v in vols:
        d = s3d.SIFT3D()
        cold.append(d.detect_keypoints(v))
    # distinct workloads so the envelope actually differs from any raw
    assert len({len(k) for k in cold}) > 1

    det = s3d.SIFT3D()
    for v in vols:                    # cycle 1: learn
        det.detect_keypoints(v)
    misses_after_learn = det._hint_misses
    for cycle in range(2):            # cycles 2-3: hinted, no misses
        for v, kc in zip(vols, cold):
            kp = det.detect_keypoints(v)
            np.testing.assert_array_equal(np.asarray(kp.coords),
                                          np.asarray(kc.coords))
            np.testing.assert_allclose(np.asarray(kp.strength),
                                       np.asarray(kc.strength), atol=1e-6)
    assert det._hint_misses == misses_after_learn, "steady-state misses"
    assert det._hint_streak >= 2, "envelope should be stable (tight mode)"


def test_hint_history_one_is_per_volume():
    """hint_history=1 recovers the round-4 behavior: the hint is sized to
    the last volume only, so alternating distinct volumes never builds a
    streak."""
    vols = _varied_phantoms(count=2)
    det = s3d.SIFT3D(s3d.DetectorParams(hint_history=1))
    for _ in range(3):
        for v in vols:
            det.detect_keypoints(v)
    assert det._hint_streak == 0
