"""Golden parity at 128^3 (BASELINE configs 2-3 scale): full keypoint set
and descriptors against the C oracle."""

import numpy as np
import pytest

from conftest import make_phantom
from oracle import oracle_available, run_oracle

pytestmark = pytest.mark.skipif(not oracle_available(),
                                reason="C oracle unavailable")


def test_full_128_parity(tmp_path):
    import sift3d_tpu as s3d

    vol = make_phantom(128, nblobs=80, seed=21)
    res = run_oracle(vol, tmp_path / "o128")
    det = s3d.SIFT3D()
    kp = det.detect_keypoints(vol)

    ref = res.keypoints
    assert len(ref) > 10, "phantom produced too few keypoints to be a test"
    assert len(kp) == len(ref)
    assert np.array_equal(kp.coords, ref[:, 1:4])
    assert np.array_equal(kp.octave, ref[:, 4].astype(np.int32))
    assert np.allclose(kp.strength, ref[:, 0], atol=1e-6)
    # R matrices: f32 parity for virtually all; allow a tiny tail of
    # near-degenerate eigenvector flips
    r_err = np.max(np.abs(kp.R.reshape(-1, 9) - ref[:, 7:16]), axis=1)
    assert np.mean(r_err < 1e-3) >= 0.99

    desc = det.extract_descriptors(kp)
    dref = res.descriptors
    num = np.linalg.norm(dref[:, 4:] - desc.data, axis=1)
    den = np.linalg.norm(dref[:, 4:], axis=1) + 1e-30
    assert np.mean(num / den < 0.01) >= 0.99
