"""Batch volume loader: native threaded reads, Python fallbacks, prefetch
iteration semantics."""

import numpy as np
import pytest

from sift3d_tpu import native
from sift3d_tpu.io import (BatchVolumeLoader, group_by_shape,
                           iter_volume_batches, read_nifti, write_nifti)
from sift3d_tpu.io.loader import peek_header


def _write_set(tmp_path, n, shape=(12, 10, 8), units=(1.0, 1.0, 1.0),
               suffix=".nii"):
    rng = np.random.default_rng(7)
    paths, datas = [], []
    for i in range(n):
        data = rng.normal(size=shape).astype(np.float32)
        p = tmp_path / f"vol_{i}{suffix}"
        write_nifti(p, data, units)
        paths.append(p)
        datas.append(data)
    return paths, datas


def test_peek_header(tmp_path):
    paths, _ = _write_set(tmp_path, 1, shape=(6, 5, 4), units=(2.0, 1.0, 3.0))
    shape, nc, units = peek_header(paths[0])
    assert shape == (6, 5, 4) and nc == 1 and units == (2.0, 1.0, 3.0)


def test_native_single_read_matches_python(tmp_path):
    if not native.available():
        pytest.skip("native library unavailable")
    # int16 with slope/inter exercises the fused cast+scale+transpose
    data = (np.arange(4 * 3 * 5).reshape(4, 3, 5) % 251).astype(np.int16)
    import struct
    p = tmp_path / "t.nii"
    write_nifti(p, data.astype(np.float32), (1.0, 2.0, 0.5))
    # rewrite as int16 with scaling by patching a fresh file
    raw = p.read_bytes()
    hdr = bytearray(raw[:352])
    struct.pack_into("<h", hdr, 70, 4)      # datatype int16
    struct.pack_into("<h", hdr, 72, 16)     # bitpix
    struct.pack_into("<f", hdr, 112, 0.25)  # scl_slope
    struct.pack_into("<f", hdr, 116, -3.0)  # scl_inter
    payload = data.transpose(2, 1, 0).tobytes()
    p2 = tmp_path / "scaled.nii"
    p2.write_bytes(bytes(hdr) + payload)

    want, units = read_nifti(p2)
    res = native.nifti_read_batch([p2], want.size)
    assert res is not None
    flat, dims, u, rc = res
    assert rc[0] == 0
    assert tuple(dims[0, :3]) == want.shape
    np.testing.assert_allclose(flat.reshape(want.shape), want, rtol=1e-6)
    np.testing.assert_allclose(u[0], units, rtol=1e-6)


@pytest.mark.parametrize("suffix", [".nii", ".nii.gz"])
def test_loader_batches_roundtrip(tmp_path, suffix):
    paths, datas = _write_set(tmp_path, 5, units=(1.0, 1.5, 2.0),
                              suffix=suffix)
    batches = list(iter_volume_batches(paths, batch_size=2))
    assert [b[0].shape[0] for b in batches] == [2, 2, 1]
    got = np.concatenate([b[0] for b in batches])
    np.testing.assert_allclose(got, np.stack(datas), rtol=1e-6)
    for _, units in batches:
        assert units == (1.0, 1.5, 2.0)


def test_loader_pair_fallback(tmp_path):
    """.hdr/.img pairs are not native-reader territory; the loader must
    silently use the Python reader for them (rc != 0 path)."""
    paths, datas = _write_set(tmp_path, 2)
    extra = np.full((12, 10, 8), 0.5, np.float32)
    hdr = tmp_path / "pair.hdr"
    write_nifti(hdr, extra)
    paths.append(hdr)
    datas.append(extra)
    batches = list(iter_volume_batches(paths, batch_size=3))
    np.testing.assert_allclose(batches[0][0], np.stack(datas), rtol=1e-6)


def test_loader_shape_mismatch_raises(tmp_path):
    paths, _ = _write_set(tmp_path, 2)
    write_nifti(tmp_path / "odd.nii", np.zeros((4, 4, 4), np.float32))
    paths.append(tmp_path / "odd.nii")
    with pytest.raises(ValueError, match="shape"):
        list(iter_volume_batches(paths, batch_size=3))


def test_group_by_shape(tmp_path):
    a, _ = _write_set(tmp_path, 2, shape=(6, 6, 6))
    b = tmp_path / "big.nii"
    write_nifti(b, np.zeros((8, 8, 8), np.float32))
    groups = group_by_shape(a + [b])
    assert set(groups) == {((6, 6, 6), 1), ((8, 8, 8), 1)}
    assert groups[((6, 6, 6), 1)] == a


def test_loader_feeds_batched_detection(tmp_path):
    """End-to-end: loader batches drive detect_keypoints_batch and match
    per-volume detection."""
    import sift3d_tpu as s3d
    from sift3d_tpu.volume import Volume

    rng = np.random.default_rng(3)
    n = 24
    ax = np.arange(n, dtype=np.float32)
    paths, vols = [], []
    for i in range(3):
        vol = np.zeros((n, n, n), np.float32)
        for _ in range(4):
            c = rng.uniform(6, 18, 3)
            s = rng.uniform(1.5, 3.0)
            vol += np.exp(-((ax[:, None, None] - c[0]) ** 2
                            + (ax[None, :, None] - c[1]) ** 2
                            + (ax[None, None, :] - c[2]) ** 2) / s ** 2)
        p = tmp_path / f"mri_{i}.nii.gz"
        write_nifti(p, vol)
        paths.append(p)
        vols.append(vol)

    det = s3d.SIFT3D()
    for bvols, units in iter_volume_batches(paths, batch_size=3):
        kps = det.detect_keypoints_batch(bvols, units)
    det2 = s3d.SIFT3D()
    for i, vol in enumerate(vols):
        kp = det2.detect_keypoints(Volume.from_array(vol))
        np.testing.assert_array_equal(kps[i].coords, kp.coords)


def test_native_read_4d_channels(tmp_path):
    if not native.available():
        pytest.skip("native library unavailable")
    data = np.arange(3 * 4 * 5 * 2, dtype=np.float32).reshape(3, 4, 5, 2)
    p = tmp_path / "c.nii"
    write_nifti(p, data)
    want, _ = read_nifti(p)
    res = native.nifti_read_batch([p], want.size)
    assert res is not None
    flat, dims, _, rc = res
    assert rc[0] == 0 and tuple(dims[0]) == (3, 4, 5, 2)
    np.testing.assert_array_equal(flat.reshape(want.shape), want)


def test_native_rejects_big_endian(tmp_path):
    """Big-endian files are the Python reader's territory: the native
    reader must return a nonzero rc (loader falls back), and the loader
    end-to-end must still produce the right data."""
    if not native.available():
        pytest.skip("native library unavailable")
    import struct
    data = np.arange(2 * 3 * 4, dtype=np.float32).reshape(2, 3, 4)
    hdr = bytearray(352)
    struct.pack_into(">i", hdr, 0, 348)
    struct.pack_into(">8h", hdr, 40, 3, 2, 3, 4, 1, 1, 1, 1)
    struct.pack_into(">h", hdr, 70, 16)    # float32
    struct.pack_into(">h", hdr, 72, 32)
    struct.pack_into(">8f", hdr, 76, 0.0, 1.0, 1.0, 1.0, 1, 1, 1, 1)
    struct.pack_into(">f", hdr, 108, 352.0)
    hdr[344:348] = b"n+1\x00"
    payload = data.transpose(2, 1, 0).astype(">f4").tobytes()
    p = tmp_path / "be.nii"
    p.write_bytes(bytes(hdr) + payload)

    res = native.nifti_read_batch([p], data.size)
    assert res is not None and res[3][0] != 0
    batches = list(iter_volume_batches([p], batch_size=1))
    np.testing.assert_array_equal(batches[0][0][0], data)


def test_loader_device_put(tmp_path):
    """device_put=True yields device-resident arrays from the producer
    thread with identical contents."""
    import jax
    paths, datas = _write_set(tmp_path, 3)
    batches = list(iter_volume_batches(paths, batch_size=2,
                                       device_put=True))
    assert all(isinstance(b[0], jax.Array) for b in batches)
    got = np.concatenate([np.asarray(b[0]) for b in batches])
    np.testing.assert_allclose(got, np.stack(datas), rtol=1e-6)
