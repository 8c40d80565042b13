"""Functional convenience API mirroring the reference's public surface.

The reference exposes sift3d_detect_keypoints / sift3d_extract_descriptors
on a detector object (/root/reference/sift3d/sift.h) and the upstream 1.x
line had register_SIFT3D. These wrappers give the same one-call ergonomics;
the object API (pipeline.SIFT3D) remains the primary interface.
"""

from __future__ import annotations

import numpy as np

from .keypoints import Descriptors, Keypoints
from .params import DESC_NUMEL, DetectorParams
from .pipeline import SIFT3D
from .registration import RegistrationResult, register


def detect_keypoints(vol, params: DetectorParams = DetectorParams(),
                     detector: SIFT3D | None = None) -> Keypoints:
    """Detect keypoints in one call. Pass (and keep) a `detector` to reuse
    its pyramid for extract_descriptors."""
    det = detector if detector is not None else SIFT3D(params)
    return det.detect_keypoints(vol)


def detect_and_extract(vol, params: DetectorParams = DetectorParams(),
                       limit: int = 0):
    """Keypoints + descriptors in one call; optional strongest-N limit
    (the reference CLI uses 100)."""
    det = SIFT3D(params)
    kp = det.detect_keypoints(vol)
    if limit:
        kp = kp.sort_by_strength(limit)
    if len(kp):
        desc = det.extract_descriptors(kp)
    else:
        desc = Descriptors(xyz=np.zeros((0, 3), np.float32),
                           sd=np.zeros(0, np.float32),
                           data=np.zeros((0, DESC_NUMEL), np.float32))
    return kp, desc


def register_sift3d(fixed, moving, params: DetectorParams | None = None,
                    **kwargs) -> RegistrationResult:
    """Full SIFT3D registration (the upstream register_SIFT3D capability):
    detect + describe both volumes, match, RANSAC affine."""
    return register(fixed, moving, params=params, **kwargs)
