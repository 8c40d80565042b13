"""Batched multi-volume detection (one compiled program per batch shape)."""

import numpy as np
import pytest

from conftest import disable_persistent_cache_fixture, make_phantom

_no_persistent_cache = pytest.fixture(autouse=True, scope="module")(
    disable_persistent_cache_fixture)


def test_batch_matches_individual():
    import sift3d_tpu as s3d

    vols = np.stack([make_phantom(48, nblobs=40, seed=s) for s in (11, 12)])
    det = s3d.SIFT3D()
    kps = det.detect_keypoints_batch(vols)
    descs = det.extract_descriptors_batch(kps)
    assert len(kps) == 2

    for b in range(2):
        ref_det = s3d.SIFT3D()
        ref_kp = ref_det.detect_keypoints(vols[b])
        assert np.array_equal(kps[b].coords, ref_kp.coords)
        assert np.allclose(kps[b].strength, ref_kp.strength, atol=1e-7)
        ref_desc = ref_det.extract_descriptors(ref_kp)
        assert np.allclose(descs[b].data, ref_desc.data, atol=1e-5)


def test_batch_with_extensions_matches_individual():
    """Refinement + edge rejection must work in the batched path and agree
    with the per-volume detector."""
    import numpy as np
    import sift3d_tpu as s3d
    from conftest import make_phantom

    params = s3d.DetectorParams(refine_subvoxel=True, edge_thresh=10.0)
    vols = np.stack([make_phantom(48, seed=s) for s in (7, 11)])
    det_b = s3d.SIFT3D(params)
    kps = det_b.detect_keypoints_batch(vols)
    descs = det_b.extract_descriptors_batch(kps)
    assert any(len(k) > 0 for k in kps), "phantoms produced no keypoints"
    for b in range(2):
        det1 = s3d.SIFT3D(params)
        ref = det1.detect_keypoints(vols[b])
        assert len(kps[b]) == len(ref)
        if len(ref) == 0:
            continue
        np.testing.assert_allclose(kps[b].coords, ref.coords, atol=1e-5)
        np.testing.assert_allclose(kps[b].sd, ref.sd, rtol=1e-6)
        d1 = det1.extract_descriptors(ref)
        assert np.abs(descs[b].data - d1.data).max() < 1e-4


def test_batch_hinted_second_call_exact():
    """The second batch on a plan runs the vmapped fused hinted program
    (one dispatch + one device_get); keypoints must be identical to the
    exact first pass and descriptors served from the speculative caches
    must agree within the uint16-payload quantization budget."""
    import numpy as np
    import sift3d_tpu as s3d
    from conftest import make_phantom

    vols = np.stack([make_phantom(48, seed=s) for s in (3, 5, 9)])
    det = s3d.SIFT3D()
    kps1 = det.detect_keypoints_batch(vols)
    ds1 = det.extract_descriptors_batch(kps1)
    assert det._hint is not None  # batch path learned a hint

    kps2 = det.detect_keypoints_batch(vols)
    assert det._batch_desc_caches is not None, "hinted batch did not run"
    ds2 = det.extract_descriptors_batch(kps2)
    for a, b in zip(kps1, kps2):
        np.testing.assert_array_equal(np.asarray(a.coords),
                                      np.asarray(b.coords))
        np.testing.assert_array_equal(np.asarray(a.strength),
                                      np.asarray(b.strength))
    for a, b in zip(ds1, ds2):
        # uint16 payload quantization (<= 7.7e-6) + vmapped-blur ULP drift
        np.testing.assert_allclose(a.data, b.data, atol=5e-5)


def test_batch_hinted_sub_batching_exact(monkeypatch):
    """With a tiny HBM budget the hinted batch splits into sub-batch
    dispatches; results must be identical to the unchunked path."""
    import numpy as np
    import sift3d_tpu as s3d
    from sift3d_tpu import pipeline
    from conftest import make_phantom

    vols = np.stack([make_phantom(48, seed=s) for s in (3, 5, 9)])
    det = s3d.SIFT3D()
    kps1 = det.detect_keypoints_batch(vols)
    det.extract_descriptors_batch(kps1)

    monkeypatch.setattr(pipeline, "_BATCH_HBM_BUDGET", 1)  # force sub=1
    kps2 = det.detect_keypoints_batch(vols)
    assert det._batch_desc_caches is not None
    ds2 = det.extract_descriptors_batch(kps2)
    for a, b in zip(kps1, kps2):
        np.testing.assert_array_equal(np.asarray(a.coords),
                                      np.asarray(b.coords))
    assert all(len(d.data) == len(k) for d, k in zip(ds2, kps2))
