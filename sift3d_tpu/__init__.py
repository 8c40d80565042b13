"""sift3d_tpu: TPU-native volumetric SIFT3D.

A ground-up JAX/XLA/Pallas re-design of the SIFT3D volumetric keypoint
detector and icosahedral descriptor (reference: fatimp/SIFT3D v2.0.0), plus
the descriptor-matching + RANSAC registration the upstream algorithm defines.

Quick start::

    import sift3d_tpu as s3d

    det = s3d.SIFT3D()
    kp = det.detect_keypoints(volume)           # [nx, ny, nz] float array
    kp = kp.sort_by_strength(limit=100)
    desc = det.extract_descriptors(kp)
"""

from .api import detect_and_extract, detect_keypoints, register_sift3d
from .keypoints import Descriptors, Keypoints
from .params import DESC_NUMEL, DetectorParams
from .pipeline import SIFT3D
from .volume import Volume
from . import io

__all__ = [
    "SIFT3D", "DetectorParams", "Volume", "Keypoints", "Descriptors",
    "DESC_NUMEL", "detect_keypoints", "detect_and_extract",
    "register_sift3d", "io",
]

__version__ = "0.1.0"
