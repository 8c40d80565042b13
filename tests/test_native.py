"""Native C++ IO runtime: parity with the pure-Python fallbacks."""

import gzip

import numpy as np
import pytest

from sift3d_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_csv_write_matches_python(tmp_path):
    from sift3d_tpu.keypoints import _write_csv
    rng = np.random.default_rng(0)
    mat = rng.normal(scale=100, size=(50, 15))

    native_path = tmp_path / "n.csv"
    assert native.csv_write(native_path, mat)

    # Python reference rendering
    expected = "".join(
        ",".join(f"{v:f}" for v in row) + "\n" for row in mat)
    assert native_path.read_text() == expected


def test_csv_write_gz(tmp_path):
    mat = np.array([[1.5, -2.25]])
    p = tmp_path / "m.csv.gz"
    assert native.csv_write(p, mat)
    assert gzip.open(p).read().decode() == "1.500000,-2.250000\n"


def test_read_file_bytes_gz(tmp_path):
    payload = bytes(range(256)) * 100
    p = tmp_path / "x.gz"
    with gzip.open(p, "wb") as f:
        f.write(payload)
    assert native.read_file_bytes(p) == payload
    # plain file too
    p2 = tmp_path / "y.bin"
    p2.write_bytes(payload)
    assert native.read_file_bytes(p2) == payload


def test_cast_to_f32_scaling():
    raw = np.arange(10, dtype=np.int16).tobytes()
    out = native.cast_to_f32(raw, 4, 10, 2.0, -1.0, True)
    np.testing.assert_allclose(out, np.arange(10) * 2.0 - 1.0)
    out2 = native.cast_to_f32(raw, 4, 10, 2.0, -1.0, False)
    np.testing.assert_allclose(out2, np.arange(10, dtype=np.float32))


def test_nifti_read_uses_native(tmp_path):
    """End-to-end: NIfTI read gives identical results with and without the
    native fast path."""
    from sift3d_tpu.io.nifti import read_nifti, write_nifti
    vol = np.random.default_rng(1).normal(size=(8, 9, 10)).astype(np.float32)
    p = tmp_path / "v.nii.gz"
    write_nifti(p, vol, units=(1.0, 2.0, 3.0))
    data, units = read_nifti(p)
    np.testing.assert_array_equal(data, vol)
    assert units == (1.0, 2.0, 3.0)
