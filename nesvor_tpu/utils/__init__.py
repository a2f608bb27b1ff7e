from .psf import GAUSSIAN_FWHM, SINC_FWHM, get_PSF, get_psf, resolution2sigma
from .loss import ncc_loss
from .misc import (
    MovingAverage,
    gaussian_1d_kernel,
    gaussian_blur,
    makedirs,
    merge_args,
    meshgrid,
)
from .logger import LazyLog, TrainLogger, log_args, log_params, setup_logger

__all__ = [
    "GAUSSIAN_FWHM",
    "SINC_FWHM",
    "get_PSF",
    "get_psf",
    "resolution2sigma",
    "ncc_loss",
    "MovingAverage",
    "gaussian_1d_kernel",
    "gaussian_blur",
    "makedirs",
    "merge_args",
    "meshgrid",
    "LazyLog",
    "TrainLogger",
    "log_args",
    "log_params",
    "setup_logger",
]
