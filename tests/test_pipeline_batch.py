"""Batched multi-volume detection (one compiled program per batch shape)."""

import numpy as np

from conftest import make_phantom


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
