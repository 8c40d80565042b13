"""Functional API wrappers."""

import numpy as np

from conftest import make_phantom


def test_detect_and_extract():
    import sift3d_tpu as s3d
    vol = make_phantom(48, nblobs=40, seed=11)
    kp, desc = s3d.detect_and_extract(vol, limit=10)
    assert len(kp) <= 10
    assert desc.data.shape == (len(kp), 768)


def test_register_sift3d_alias():
    import sift3d_tpu as s3d
    from sift3d_tpu.registration import warp_volume
    from sift3d_tpu.volume import Volume
    fixed = Volume.from_array(make_phantom(64, nblobs=60, seed=11))
    A = np.eye(3, 4, dtype=np.float32)
    A[:, 3] = (3.0, -2.0, 1.0)
    moving = warp_volume(fixed, A, (64, 64, 64))
    res = s3d.register_sift3d(fixed, moving, num_iter=200)
    assert res.num_inliers >= 10
    # recovered mapping close to the inverse translation on volume points
    pts = np.random.default_rng(0).uniform(16, 48, (50, 3))
    p_est = res.affine @ np.c_[pts, np.ones(50)].T
    p_true = (pts - A[:, 3]).T
    assert np.abs(p_est - p_true).max() < 2.0


def test_empty_result():
    import sift3d_tpu as s3d
    kp, desc = s3d.detect_and_extract(np.zeros((16, 16, 16), np.float32))
    assert len(kp) == 0 and len(desc) == 0
