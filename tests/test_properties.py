"""Algorithm property tests (SURVEY section 4, item 4): descriptor rotation
invariance under 90-degree volume rotations and keypoint scale covariance
under 2x downsampling."""

import numpy as np
import pytest

from conftest import make_phantom


def _match_greedy(d1, d2):
    """Greedy nearest-neighbor matching between descriptor matrices."""
    D = np.linalg.norm(d1[:, None, :] - d2[None, :, :], axis=-1)
    return D.argmin(axis=1), D.min(axis=1)


def test_descriptor_rotation_invariance():
    """Rotating the volume by 90 degrees must leave descriptors (nearly)
    unchanged: the orientation normalization cancels the rotation."""
    import sift3d_tpu as s3d

    vol = make_phantom(64, nblobs=60, seed=11)
    det1 = s3d.SIFT3D()
    kp1 = det1.detect_keypoints(vol)
    de1 = det1.extract_descriptors(kp1)

    # rotate 90 degrees about z: (x, y, z) -> (y, nx-1-x, z)
    vol_r = np.rot90(vol, k=1, axes=(0, 1)).copy()
    det2 = s3d.SIFT3D()
    kp2 = det2.detect_keypoints(vol_r)
    de2 = det2.extract_descriptors(kp2)

    assert len(kp1) > 10 and len(kp2) > 10
    # map keypoint coordinates through the rotation and pair them up:
    # np.rot90(axes=(0,1)) sends (x, y, z) -> (n-1-y, x, z)
    n = vol.shape[0]
    xyz1_r = np.stack([n - 1 - de1.xyz[:, 1], de1.xyz[:, 0],
                       de1.xyz[:, 2]], axis=1)
    matched = 0
    invariant = 0
    for j in range(len(de1)):
        d = np.linalg.norm(de2.xyz - xyz1_r[j], axis=1)
        k = d.argmin()
        if d[k] <= 1.0 and abs(de1.sd[j] - de2.sd[k]) < 1e-3:
            matched += 1
            rel = (np.linalg.norm(de1.data[j] - de2.data[k])
                   / (np.linalg.norm(de1.data[j]) + 1e-30))
            if rel < 0.25:
                invariant += 1
    assert matched >= 0.4 * len(de1)
    # the vast majority of co-located descriptors agree despite the rotation
    assert invariant >= 0.8 * matched, (invariant, matched)


def test_keypoint_scale_covariance():
    """Downsampling the volume by 2x shifts surviving keypoints one octave
    down with halved base-coordinates."""
    import sift3d_tpu as s3d

    vol = make_phantom(64, nblobs=60, seed=11)
    det1 = s3d.SIFT3D()
    kp1 = det1.detect_keypoints(vol)
    base1 = kp1.to_matrix()

    vol_small = vol[::2, ::2, ::2]
    det2 = s3d.SIFT3D()
    kp2 = det2.detect_keypoints(vol_small)
    base2 = kp2.to_matrix()

    assert len(kp1) > 10 and len(kp2) > 3
    # each small-volume keypoint should have a counterpart at ~2x coords
    # in the full volume with ~2x the scale
    hits = 0
    for j in range(len(kp2)):
        d = np.max(np.abs(base1 - 2.0 * base2[j]), axis=1)
        k = d.argmin()
        if d[k] <= 4.0 and abs(kp1.sd[k] / (2.0 * kp2.sd[j]) - 1.0) < 0.7:
            hits += 1
    assert hits >= 0.5 * len(kp2), (hits, len(kp2))
