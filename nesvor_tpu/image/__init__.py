from .image import (
    Image,
    Slice,
    Stack,
    Volume,
    load_nii_volume,
    load_slices,
    load_stack,
    load_volume,
    save_nii_volume,
    save_slices,
)
from .image_utils import (
    affine2transformation,
    compare_resolution_affine,
    transformation2affine,
)
from .nifti import read_nifti, write_nifti

__all__ = [
    "Image",
    "Slice",
    "Stack",
    "Volume",
    "load_nii_volume",
    "load_slices",
    "load_stack",
    "load_volume",
    "save_nii_volume",
    "save_slices",
    "affine2transformation",
    "compare_resolution_affine",
    "transformation2affine",
    "read_nifti",
    "write_nifti",
]
