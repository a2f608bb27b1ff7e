"""NIfTI-affine <-> RigidTransform bridge (rebuild of reference
nesvor/image/image_utils.py:8-85). Host-side numpy; results are jnp arrays."""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..transform import RigidTransform


def compare_resolution_affine(r1, a1, r2, a2, s1, s2) -> bool:
    """1e-3 tolerance consistency check (reference image_utils.py:8-23)."""
    r1 = np.array(r1)
    a1 = np.array(a1)
    r2 = np.array(r2)
    a2 = np.array(a2)
    if s1 != s2:
        return False
    if r1.shape != r2.shape:
        return False
    if np.amax(np.abs(r1 - r2)) > 1e-3:
        return False
    if a1.shape != a2.shape:
        return False
    if np.amax(np.abs(a1 - a2)) > 1e-3:
        return False
    return True


def affine2transformation(
    volume: np.ndarray,
    mask: np.ndarray,
    resolutions: np.ndarray,
    affine: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray, RigidTransform]:
    """Decompose a NIfTI affine into per-slice rigid transforms, flipping x
    when det < 0 (reference image_utils.py:26-63).

    volume/mask are (d, h, w) numpy arrays in (z, y, x) index order.
    Returns possibly-flipped volume/mask and a RigidTransform of length d.
    """
    d, h, w = volume.shape

    R = affine[:3, :3].astype(np.float64)
    negative_det = np.linalg.det(R) < 0

    T = affine[:3, -1:].astype(np.float64)
    R = R @ np.linalg.inv(np.diag(resolutions.astype(np.float64)))

    T0 = np.array([(w - 1) / 2 * resolutions[0], (h - 1) / 2 * resolutions[1], 0])
    T = np.linalg.inv(R) @ T + T0.reshape(3, 1)

    tz = np.arange(d, dtype=np.float64) * resolutions[2] + T[2, 0]
    tx = np.full_like(tz, T[0, 0])
    ty = np.full_like(tz, T[1, 0])
    t = np.stack((tx, ty, tz), -1).reshape(-1, 3, 1)
    Rmat = np.broadcast_to(R, (d, 3, 3)).copy()

    if negative_det:
        volume = volume[:, :, ::-1].copy()
        mask = mask[:, :, ::-1].copy()
        t[:, 0, -1] *= -1
        Rmat[:, :, 0] *= -1

    transformation = RigidTransform(
        jnp.asarray(np.concatenate((Rmat, t), -1), dtype=jnp.float32),
        trans_first=True,
    )
    return volume, mask, transformation


def transformation2affine(
    volume_shape: Tuple[int, int, int],
    transformation: RigidTransform,
    resolution_x: float,
    resolution_y: float,
    resolution_z: float,
) -> np.ndarray:
    """Inverse of affine2transformation for a single transform
    (reference image_utils.py:66-85). ``volume_shape`` is (d, h, w)."""
    mat = np.asarray(transformation.matrix(trans_first=True))
    assert mat.shape[0] == 1
    R = mat[0, :, :-1].astype(np.float64)
    T = mat[0, :, -1:].astype(np.float64).copy()
    d, h, w = volume_shape
    affine = np.eye(4)
    T[0] -= (w - 1) / 2 * resolution_x
    T[1] -= (h - 1) / 2 * resolution_y
    T[2] -= (d - 1) / 2 * resolution_z
    T = R @ T.reshape(3, 1)
    R = R @ np.diag([resolution_x, resolution_y, resolution_z])
    affine[:3, :] = np.concatenate((R, T), -1)
    return affine
