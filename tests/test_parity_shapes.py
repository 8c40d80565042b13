"""Golden parity on odd, non-cubic, and anisotropic shapes: exercises
odd-dimension downsampling, octave-count boundaries, and per-axis units."""

import numpy as np
import pytest

from oracle import oracle_available, run_oracle

pytestmark = pytest.mark.skipif(not oracle_available(),
                                reason="C oracle unavailable")


def phantom_shape(shape, seed, nblobs=25):
    rr = np.random.default_rng(seed)
    gx, gy, gz = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    vol = np.zeros(shape)
    for _ in range(nblobs):
        c = [rr.uniform(0.1 * s, 0.9 * s) for s in shape]
        sg = [rr.uniform(0.03 * s, 0.12 * s) for s in shape]
        vol += rr.uniform(0.3, 1.0) * rr.choice([-1, 1]) * np.exp(
            -(((gx - c[0]) / sg[0]) ** 2 + ((gy - c[1]) / sg[1]) ** 2
              + ((gz - c[2]) / sg[2]) ** 2))
    return vol.astype(np.float32)


@pytest.mark.parametrize("shape,units,seed", [
    ((50, 50, 50), (1.0, 1.0, 1.0), 1),      # odd dims
    ((33, 47, 65), (1.0, 1.0, 1.0), 2),      # odd + non-cubic
    ((40, 40, 40), (0.8, 1.0, 1.3), 4),      # anisotropic units
])
def test_shape_parity(shape, units, seed, tmp_path):
    import sift3d_tpu as s3d
    from sift3d_tpu.volume import Volume

    vol = phantom_shape(shape, seed)
    res = run_oracle(vol, tmp_path / "o", units=units)
    det = s3d.SIFT3D()
    kp = det.detect_keypoints(Volume.from_array(vol, units))
    ref = res.keypoints
    assert len(kp) == len(ref)
    if len(kp) == 0:
        return
    assert np.array_equal(kp.coords, ref[:, 1:4])
    assert np.allclose(kp.strength, ref[:, 0], atol=1e-6)
    assert np.max(np.abs(kp.R.reshape(-1, 9) - ref[:, 7:16])) < 2e-3
    desc = det.extract_descriptors(kp)
    dref = res.descriptors
    num = np.linalg.norm(dref[:, 4:] - desc.data, axis=1)
    den = np.linalg.norm(dref[:, 4:], axis=1) + 1e-30
    assert np.mean(num / den < 0.01) >= 0.99


def test_minimum_size_volume():
    """9^3 is the smallest size with one octave; must run without error."""
    import sift3d_tpu as s3d
    kp = s3d.SIFT3D().detect_keypoints(phantom_shape((9, 9, 9), 5))
    assert len(kp) == 0  # too small/smooth for stable keypoints


def test_sphere_phantom_parity(tmp_path):
    """BASELINE config 1: hard-edged sphere phantom at 64^3. Dense candidate
    populations must be handled exactly (capacity-overflow auto-retry) with
    no user-facing overflow warning."""
    import warnings

    import sift3d_tpu as s3d
    from conftest import make_sphere_phantom

    vol = make_sphere_phantom(64)
    res = run_oracle(vol, tmp_path / "sph")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        kp = s3d.SIFT3D().detect_keypoints(vol)
    assert not [w for w in rec if "overflow" in str(w.message)]
    ref = res.keypoints
    assert len(kp) == len(ref)
    if len(kp):
        assert np.array_equal(kp.coords, ref[:, 1:4])
        assert np.allclose(kp.strength, ref[:, 0], atol=1e-6)


def test_capacity_overflow_retry_exact(tmp_path):
    """Force the overflow-retry path (tiny per-level capacity) and require
    oracle-exact results: the reference never drops candidates
    (SIFT3D_RESIZE_SLAB growth, immacros.h:199-222), so neither may we."""
    import warnings

    import sift3d_tpu as s3d

    vol = phantom_shape((48, 48, 48), 8, nblobs=40)
    res = run_oracle(vol, tmp_path / "ovf")
    params = s3d.DetectorParams(kp_per_level=8)  # far below real counts
    det = s3d.SIFT3D(params)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        kp = det.detect_keypoints(vol)
    assert not [w for w in rec if "overflow" in str(w.message)]
    ref = res.keypoints
    assert len(kp) == len(ref)
    assert np.array_equal(kp.coords, ref[:, 1:4])
    assert np.allclose(kp.strength, ref[:, 0], atol=1e-6)
    desc = det.extract_descriptors(kp)
    dref = res.descriptors
    num = np.linalg.norm(dref[:, 4:] - desc.data, axis=1)
    den = np.linalg.norm(dref[:, 4:], axis=1) + 1e-30
    assert np.mean(num / den < 0.01) >= 0.99


def test_high_candidate_count_fallback(tmp_path):
    """A low peak threshold floods the candidate stores past the speculative
    orientation window, forcing the exact per-segment fallback — parity must
    hold there too."""
    import sift3d_tpu as s3d

    rng = np.random.default_rng(3)
    vol = (phantom_shape((48, 48, 48), 8, nblobs=40)
           + 0.05 * rng.normal(size=(48, 48, 48)).astype(np.float32))
    res = run_oracle(vol, tmp_path / "hc", peak=0.01, corner=0.2)
    params = s3d.DetectorParams(peak_thresh=0.01, corner_thresh=0.2)
    det = s3d.SIFT3D(params)
    kp = det.detect_keypoints(vol)
    ref = res.keypoints

    # confirm the regime actually exceeds the speculative window somewhere
    import jax
    import jax.numpy as jnp
    from sift3d_tpu.pipeline import _SPEC_ORI_SLOTS, _detect_fn
    from sift3d_tpu.pyramid import make_plan
    plan = make_plan(vol.shape, (1.0, 1.0, 1.0), params)
    run, _caps = _detect_fn(plan)
    _, _per_oct, counts_dev = run(jnp.asarray(vol))
    counts = jax.device_get(counts_dev)
    assert counts.sum(axis=1).max() > _SPEC_ORI_SLOTS, counts
    assert len(kp) == len(ref)
    assert np.array_equal(kp.coords, ref[:, 1:4])
    assert np.allclose(kp.strength, ref[:, 0], atol=1e-6)
