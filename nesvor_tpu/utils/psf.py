"""Point-spread-function utilities (host-side numpy + jnp constants).

Rebuild of reference nesvor/utils/psf.py:5-65. The PSF kernel is computed
host-side (its shape is data-dependent and must be static before jit) and
fed to the projector as a static-shaped array.
"""

from __future__ import annotations

from math import log, sqrt
from typing import Optional, Sequence, Tuple, Union

import jax.numpy as jnp
import numpy as np

# reference psf.py:5-6
GAUSSIAN_FWHM = 1 / (2 * sqrt(2 * log(2)))
SINC_FWHM = 1.206709128803223 * GAUSSIAN_FWHM


def resolution2sigma(rx, ry=None, rz=None, isotropic: bool = False):
    """In-plane sinc-FWHM / through-plane gaussian-FWHM sigmas
    (reference psf.py:9-34). Accepts scalars, triples, or arrays whose last
    axis is the (x, y, z) resolution."""
    if isotropic:
        fx = fy = fz = GAUSSIAN_FWHM
    else:
        fx = fy = SINC_FWHM
        fz = GAUSSIAN_FWHM
    assert not ((ry is None) ^ (rz is None))
    if ry is None:
        if isinstance(rx, (float, int)):
            if isotropic:
                return fx * rx
            return fx * rx, fy * rx, fz * rx
        if isinstance(rx, (jnp.ndarray, np.ndarray)):
            if isotropic:
                return fx * rx
            assert rx.shape[-1] == 3
            if isinstance(rx, np.ndarray):
                return rx * np.array([fx, fy, fz], dtype=rx.dtype)
            return rx * jnp.array([fx, fy, fz], dtype=rx.dtype)
        if isinstance(rx, (list, tuple)):
            assert len(rx) == 3
            return resolution2sigma(rx[0], rx[1], rx[2], isotropic=isotropic)
        raise TypeError(str(type(rx)))
    return fx * rx, fy * ry, fz * rz


def get_psf(
    r_max: Optional[int] = None,
    res_ratio: Tuple[float, float, float] = (1, 1, 3),
    threshold: float = 1e-3,
    dtype=np.float32,
) -> np.ndarray:
    """Discretized 3-D Gaussian PSF on an odd grid, thresholded at 1e-3,
    trimmed to nonzero support, normalized (reference psf.py:37-65).

    Returns a numpy array (d, h, w): it parameterizes kernel shapes and so
    must be concrete at trace time.
    """
    sigma_x, sigma_y, sigma_z = resolution2sigma(res_ratio, isotropic=False)
    if r_max is None:
        r_max = max(int(2 * r + 1) for r in (sigma_x, sigma_y, sigma_z))
        r_max = max(r_max, 4)
    x = np.linspace(-r_max, r_max, 2 * r_max + 1, dtype=np.float64)
    grid_z, grid_y, grid_x = np.meshgrid(x, x, x, indexing="ij")
    psf = np.exp(
        -0.5
        * (
            grid_x**2 / sigma_x**2
            + grid_y**2 / sigma_y**2
            + grid_z**2 / sigma_z**2
        )
    )
    psf[np.abs(psf) < threshold] = 0
    rx = int(np.nonzero(psf.sum((0, 1)) > 0)[0][0])
    ry = int(np.nonzero(psf.sum((0, 2)) > 0)[0][0])
    rz = int(np.nonzero(psf.sum((1, 2)) > 0)[0][0])
    psf = psf[
        rz : 2 * r_max + 1 - rz, ry : 2 * r_max + 1 - ry, rx : 2 * r_max + 1 - rx
    ]
    psf = psf / psf.sum()
    return psf.astype(dtype)


# Alias matching the reference public name (nesvor/utils/psf.py:37)
get_PSF = get_psf
