"""Keypoint/descriptor store unit tests."""

import numpy as np

from sift3d_tpu.keypoints import Descriptors, Keypoints


def _kp(n=5):
    rng = np.random.default_rng(0)
    return Keypoints(
        coords=rng.integers(0, 50, (n, 3)).astype(np.float64),
        octave=rng.integers(0, 3, n).astype(np.int32),
        level=rng.integers(0, 3, n).astype(np.int32),
        sd=rng.uniform(1.0, 8.0, n),
        strength=rng.uniform(0.0, 1.0, n),
        R=np.tile(np.eye(3, dtype=np.float32), (n, 1, 1)),
    )


def test_sort_by_strength_descending_and_limit():
    kp = _kp(10)
    s = kp.sort_by_strength()
    assert np.all(np.diff(s.strength) <= 0)
    assert len(kp.sort_by_strength(limit=3)) == 3
    # limit=0 keeps everything (reference semantics, sift.c:1897)
    assert len(kp.sort_by_strength(limit=0)) == 10


def test_to_matrix_base_octave_scaling():
    kp = _kp()
    m = kp.to_matrix()
    np.testing.assert_allclose(m, kp.coords * (2.0 ** kp.octave)[:, None])


def test_save_roundtrip(tmp_path):
    kp = _kp()
    p = tmp_path / "k.csv"
    kp.save(str(p))
    rows = np.loadtxt(p, delimiter=",")
    assert rows.shape == (5, 15)
    np.testing.assert_allclose(rows[:, 0], kp.strength, atol=1e-6)
    np.testing.assert_allclose(rows[:, 1:4], kp.coords, atol=1e-6)
    np.testing.assert_allclose(rows[:, 4], kp.octave)
    np.testing.assert_allclose(rows[:, 5], kp.sd, atol=1e-6)


def test_descriptor_matrix_layout():
    rng = np.random.default_rng(1)
    d = Descriptors(xyz=rng.normal(size=(3, 3)).astype(np.float32),
                    sd=np.ones(3, np.float32),
                    data=rng.normal(size=(3, 768)).astype(np.float32))
    m = d.to_matrix()
    assert m.shape == (3, 771)
    np.testing.assert_array_equal(m[:, :3], d.xyz)
    np.testing.assert_array_equal(m[:, 3:], d.data)
    assert len(d[1:]) == 2
