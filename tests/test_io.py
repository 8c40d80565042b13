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


def test_hdr_img_pair_roundtrip(tmp_path):
    """A .hdr/.img pair must read back from EITHER member's name, the way
    nifticlib resolves the sibling (reference imutil.c:318-331,
    nifti.c:52-62)."""
    rng = np.random.default_rng(1)
    vol = rng.normal(size=(7, 9, 11)).astype(np.float32)
    for hdr_name in ("p.hdr", "q.img", "r.img.gz"):
        p = tmp_path / hdr_name
        write_nifti(p, vol, units=(1.0, 1.25, 2.0))
        stem = str(p)
        for s in (".hdr.gz", ".img.gz", ".hdr", ".img"):
            if stem.endswith(s):
                stem = stem[:-len(s)]
                break
        suffix = ".gz" if hdr_name.endswith(".gz") else ""
        # both members exist on disk
        import os
        assert os.path.exists(stem + ".hdr" + suffix)
        assert os.path.exists(stem + ".img" + suffix)
        # read via both names
        for member in (".hdr", ".img"):
            data, units = read_nifti(stem + member + suffix)
            np.testing.assert_array_equal(data, vol)
            assert units == (1.0, 1.25, 2.0)


def test_img_read_via_read_volume(tmp_path):
    vol = np.arange(8 * 9 * 10, dtype=np.float32).reshape(8, 9, 10)
    write_nifti(tmp_path / "v.img", vol)
    v = read_volume(tmp_path / "v.img")
    np.testing.assert_array_equal(np.asarray(v.data), vol)
    v2 = read_volume(tmp_path / "v.hdr")
    np.testing.assert_array_equal(np.asarray(v2.data), vol)


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
