"""NIfTI + CSV IO tests."""

import gzip

import numpy as np
import pytest

from sift3d_tpu.io import read_volume, write_volume
from sift3d_tpu.io.nifti import read_nifti, write_nifti


def test_nifti_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    vol = rng.normal(size=(9, 11, 13)).astype(np.float32)
    for name in ("a.nii", "a.nii.gz"):
        p = tmp_path / name
        write_nifti(p, vol, units=(1.0, 1.5, 2.0))
        data, units = read_nifti(p)
        np.testing.assert_array_equal(data, vol)
        assert units == (1.0, 1.5, 2.0)


def test_nifti_dtypes_and_scaling(tmp_path):
    """Integer NIfTI with scl_slope/inter must be scaled on read
    (reference nifti.c:101-111)."""
    import struct
    vol = (np.arange(2 * 3 * 4) % 100).astype(np.int16).reshape(2, 3, 4)
    p = tmp_path / "b.nii"
    hdr = bytearray(348)
    struct.pack_into("<i", hdr, 0, 348)
    struct.pack_into("<8h", hdr, 40, 3, 2, 3, 4, 1, 1, 1, 1)
    struct.pack_into("<h", hdr, 70, 4)   # DT_INT16
    struct.pack_into("<h", hdr, 72, 16)
    struct.pack_into("<8f", hdr, 76, 0, 1, 1, 1, 1, 1, 1, 1)
    struct.pack_into("<f", hdr, 108, 352.0)
    struct.pack_into("<f", hdr, 112, 2.0)   # slope
    struct.pack_into("<f", hdr, 116, -1.0)  # inter
    hdr[344:348] = b"n+1\x00"
    with open(p, "wb") as f:
        f.write(bytes(hdr))
        f.write(b"\x00" * 4)
        f.write(vol.transpose(2, 1, 0).tobytes())
    data, units = read_nifti(p)
    np.testing.assert_allclose(data, vol.astype(np.float32) * 2.0 - 1.0)


def test_nifti_4d_channels(tmp_path):
    vol = np.random.default_rng(1).normal(size=(5, 6, 7, 2)).astype(
        np.float32)
    p = tmp_path / "c.nii.gz"
    write_nifti(p, vol)
    data, _ = read_nifti(p)
    assert data.shape == (5, 6, 7, 2)
    np.testing.assert_array_equal(data, vol)
    # the detector path rejects multi-channel
    with pytest.raises(ValueError):
        read_volume(p)


def test_read_volume_units(tmp_path):
    vol = np.zeros((8, 8, 8), np.float32)
    p = tmp_path / "d.nii"
    write_nifti(p, vol, units=(0.5, 0.5, 2.5))
    v = read_volume(p)
    assert v.units == (0.5, 0.5, 2.5)
    assert v.shape == (8, 8, 8)


def test_bad_format(tmp_path):
    p = tmp_path / "x.png"
    p.write_bytes(b"nope")
    with pytest.raises(ValueError):
        read_volume(p)


def test_csv_gz_writer(tmp_path):
    from sift3d_tpu.keypoints import _write_csv
    mat = np.array([[1.5, -2.25], [0.0, 3.125]])
    p1 = tmp_path / "m.csv"
    p2 = tmp_path / "m.csv.gz"
    _write_csv(p1, mat)
    _write_csv(p2, mat)
    text = p1.read_text()
    assert text == "1.500000,-2.250000\n0.000000,3.125000\n"
    assert gzip.open(p2).read().decode() == text
