"""Image and matrix IO.

Format dispatch mirrors the reference (im_get_format,
/root/reference/sift3d/imutil.c:318-402): .nii and .nii.gz are NIfTI; the
Analyze extensions (.img/.img.gz/.hdr) route to the NIfTI reader.
"""

from __future__ import annotations



import numpy as np

from ..volume import Volume
from .nifti import read_nifti, write_nifti

_NIFTI_EXTS = (".nii", ".nii.gz", ".img", ".img.gz", ".hdr", ".hdr.gz")


def read_volume(path) -> Volume:
    """Read a volume file into a Volume (single-channel)."""
    p = str(path)
    if not any(p.endswith(e) for e in _NIFTI_EXTS):
        raise ValueError(f"unsupported image format: {p}")
    data, units = read_nifti(p)
    if data.ndim == 4:
        if data.shape[-1] != 1:
            raise ValueError(
                "only single-channel volumes are supported by the detector")
        data = data[..., 0]
    return Volume.from_array(data, units)


def write_volume(path, vol) -> None:
    if isinstance(vol, Volume):
        write_nifti(path, np.asarray(vol.data), vol.units)
    else:
        write_nifti(path, np.asarray(vol))


from .loader import BatchVolumeLoader, group_by_shape, iter_volume_batches

__all__ = ["read_volume", "write_volume", "read_nifti", "write_nifti",
           "BatchVolumeLoader", "group_by_shape", "iter_volume_batches"]
