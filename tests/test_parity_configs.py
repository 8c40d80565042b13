"""Golden parity on non-default configurations.

Anisotropic voxel units exercise the reference's unit-scaled, linearly
interpolated tap positions (unit_factor != 1 even at octave 0); alternative
detector parameters exercise the sigma schedule and threshold plumbing.
"""

import numpy as np
import pytest

from conftest import make_phantom
from oracle import oracle_available, run_oracle

pytestmark = pytest.mark.skipif(not oracle_available(),
                                reason="C oracle unavailable")


def _compare(vol, res, det):
    kp = det.detect_keypoints(vol)
    ref = res.keypoints
    assert len(kp) == len(ref), (len(kp), len(ref))
    assert np.array_equal(kp.coords, ref[:, 1:4])
    assert np.array_equal(kp.octave, ref[:, 4].astype(np.int32))
    assert np.allclose(kp.strength, ref[:, 0], atol=1e-6)
    assert np.max(np.abs(kp.R.reshape(-1, 9) - ref[:, 7:16])) < 2e-3
    if len(kp):
        desc = det.extract_descriptors(kp)
        dref = res.descriptors
        num = np.linalg.norm(dref[:, 4:] - desc.data, axis=1)
        den = np.linalg.norm(dref[:, 4:], axis=1) + 1e-30
        assert np.mean(num / den < 0.01) >= 0.99


def test_anisotropic_units(tmp_path):
    import sift3d_tpu as s3d
    from sift3d_tpu.volume import Volume

    vol = make_phantom(48, seed=5)
    units = (1.0, 1.25, 2.0)
    res = run_oracle(vol, tmp_path / "aniso", units=units)
    det = s3d.SIFT3D()
    kp = det.detect_keypoints(Volume.from_array(vol, units))

    ref = res.keypoints
    assert len(kp) == len(ref)
    assert np.array_equal(kp.coords, ref[:, 1:4])
    assert np.allclose(kp.strength, ref[:, 0], atol=1e-6)
    assert np.max(np.abs(kp.R.reshape(-1, 9) - ref[:, 7:16])) < 2e-3

    desc = det.extract_descriptors(kp)
    dref = res.descriptors
    num = np.linalg.norm(dref[:, 4:] - desc.data, axis=1)
    den = np.linalg.norm(dref[:, 4:], axis=1) + 1e-30
    assert np.mean(num / den < 0.01) >= 0.99


def test_alt_params(tmp_path):
    import sift3d_tpu as s3d

    vol = make_phantom(48, seed=6)
    res = run_oracle(vol, tmp_path / "altp", peak=0.05, corner=0.3,
                     kp_levels=2, sigma_n=1.0, sigma0=1.8)
    params = s3d.DetectorParams(peak_thresh=0.05, corner_thresh=0.3,
                                num_kp_levels=2, sigma_n=1.0, sigma0=1.8)
    _compare(vol, res, s3d.SIFT3D(params))


def test_more_kp_levels(tmp_path):
    import sift3d_tpu as s3d

    vol = make_phantom(48, seed=7)
    res = run_oracle(vol, tmp_path / "kpl4", kp_levels=4)
    _compare(vol, res, s3d.SIFT3D(s3d.DetectorParams(num_kp_levels=4)))


def test_policy_knobs_parity(tmp_path):
    """Non-default hinted-pipeline policy (fully fused program, mixed
    descriptor windows, per-level dense branch forced on every octave)
    must reproduce the oracle exactly — the policy knobs choose execution
    shape, never values. Runs detection twice so the hinted program (the
    path the knobs govern) actually executes."""
    import sift3d_tpu as s3d

    vol = make_phantom(48, seed=8)
    res = run_oracle(vol, tmp_path / "policy")
    params = s3d.DetectorParams(split_desc_chunks=0,
                                sparse_desc_groups=False,
                                dense_octave_acc=1, dense_octave_cand=1)
    det = s3d.SIFT3D(params)
    det.detect_keypoints(vol)          # learn the hint
    _compare(vol, res, det)            # hinted program under the policy
