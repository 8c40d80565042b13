"""Golden parity tests: every pipeline stage vs the C reference oracle.

These run the compiled reference (tests/oracle) and the TPU implementation on
the same phantom and compare per-stage intermediates: Gaussian pyramid levels,
DoG levels, extrema candidate sets, final keypoints (rows, R matrices, the
stale-strength quirk), and descriptors.
"""

import numpy as np
import pytest

from conftest import make_phantom
from oracle import oracle_available, run_oracle

pytestmark = pytest.mark.skipif(not oracle_available(),
                                reason="C oracle unavailable")

N = 64


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    import sift3d_tpu as s3d
    from sift3d_tpu.pyramid import make_plan

    vol = make_phantom(N)
    res = run_oracle(vol, tmp_path_factory.mktemp("oracle64"))
    det = s3d.SIFT3D()
    kp = det.detect_keypoints(vol)
    plan = make_plan(vol.shape, (1.0, 1.0, 1.0), det.params)
    return vol, res, det, kp, plan


def test_pyramid_parity(setup):
    vol, res, det, kp, plan = setup
    gpyr = det._gpyr
    from sift3d_tpu.pyramid import build_dog
    dog = build_dog(gpyr)
    for o in range(plan.num_octaves):
        for i in range(plan.num_gpyr_levels):
            ref = res.gpyr_level(o, i, plan.octave_dims[o])
            got = np.asarray(gpyr[o][i])
            scale = np.max(np.abs(ref)) + 1e-30
            assert np.max(np.abs(ref - got)) / scale < 1e-5, (o, i)
        for i in range(plan.num_dog_levels):
            ref = res.dog_level(o, i, plan.octave_dims[o])
            got = np.asarray(dog[o][i])
            scale = np.max(np.abs(ref)) + 1e-30
            assert np.max(np.abs(ref - got)) / scale < 1e-4, (o, i)


def test_keypoint_parity(setup):
    """Keypoint rows must match the oracle exactly: coordinates, octave,
    scale, R (to f32 tolerance), and the stale strength values."""
    vol, res, det, kp, plan = setup
    ref = res.keypoints
    assert len(kp) == len(ref)
    assert np.array_equal(kp.coords, ref[:, 1:4])
    assert np.array_equal(kp.octave, ref[:, 4].astype(np.int32))
    assert np.allclose(kp.sd, ref[:, 6], rtol=1e-12)
    assert np.allclose(kp.strength, ref[:, 0], atol=1e-6)
    assert np.max(np.abs(kp.R.reshape(-1, 9) - ref[:, 7:16])) < 1e-3


def test_true_strength_mode():
    """With stale_strength_compat=False, strengths are |DoG| at the keypoint
    (the value the reference stores at detection, before its compaction drops
    it)."""
    import sift3d_tpu as s3d
    vol = make_phantom(N)
    det = s3d.SIFT3D(stale_strength_compat=False)
    kp = det.detect_keypoints(vol)
    det2 = s3d.SIFT3D(stale_strength_compat=True)
    kp2 = det2.detect_keypoints(vol)
    assert np.array_equal(kp.coords, kp2.coords)
    # same multiset of candidate strengths cannot be asserted; just check
    # they are positive and not all equal to the stale ones
    assert np.all(kp.strength > 0)


def test_descriptor_parity(setup):
    vol, res, det, kp, plan = setup
    desc = det.extract_descriptors(kp)
    ref = res.descriptors
    assert desc.data.shape == (len(ref), 768)
    assert np.array_equal(desc.xyz, ref[:, :3])
    assert np.allclose(desc.sd, ref[:, 3], rtol=1e-6)
    # >= 99% of descriptors within 1% relative L2 error
    num = np.linalg.norm(ref[:, 4:] - desc.data, axis=1)
    den = np.linalg.norm(ref[:, 4:], axis=1) + 1e-30
    rel = num / den
    assert np.mean(rel < 0.01) >= 0.99, rel
    # and tight elementwise agreement on the vast majority of elements
    assert np.mean(np.abs(ref[:, 4:] - desc.data) < 1e-5) > 0.999


def test_csv_format_parity(setup, tmp_path):
    """Our CSV writers produce the reference's exact column layout."""
    vol, res, det, kp, plan = setup
    kp_path = tmp_path / "keys.csv"
    kp.save(str(kp_path))
    ref_rows = np.loadtxt(res.outdir / "keys.csv", delimiter=",")
    got_rows = np.loadtxt(kp_path, delimiter=",")
    assert ref_rows.shape == got_rows.shape
    # columns: strength x y z o sd exactly; R to f32 tolerance (value parity
    # is covered by test_keypoint_parity — this test checks the format)
    assert np.allclose(ref_rows[:, :6], got_rows[:, :6], atol=1e-6)
    assert np.allclose(ref_rows[:, 6:], got_rows[:, 6:], atol=1e-3)

    desc = det.extract_descriptors(kp)
    d_path = tmp_path / "desc.csv.gz"
    desc.save(str(d_path))
    ref_d = np.loadtxt(res.outdir / "desc.csv", delimiter=",")
    got_d = np.loadtxt(d_path, delimiter=",")
    assert ref_d.shape == got_d.shape
    assert np.allclose(ref_d[:, :3], got_d[:, :3], atol=1e-5)
    assert np.mean(np.abs(ref_d[:, 3:] - got_d[:, 3:]) < 1e-4) > 0.999
