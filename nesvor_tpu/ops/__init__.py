from .interp import grid_sample_2d, grid_sample_3d, sample_volume_voxel
from .slice_acq import slice_acquisition, slice_acquisition_adjoint

__all__ = [
    "grid_sample_2d",
    "grid_sample_3d",
    "sample_volume_voxel",
    "slice_acquisition",
    "slice_acquisition_adjoint",
]
