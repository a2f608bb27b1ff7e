"""Trilinear/bilinear grid sampling (JAX replacement for torch.grid_sample).

The reference uses F.grid_sample with align_corners=True and zero padding
(nesvor/image/image.py:124-132, nesvor/svort/registration.py:240-254).
Implemented as vectorized gathers — XLA fuses the 8-corner interpolation.
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_sample_3d(volume: jnp.ndarray, xyz: jnp.ndarray) -> jnp.ndarray:
    """Sample ``volume`` (D, H, W) at normalized coords ``xyz`` (..., 3).

    ``xyz`` is in [-1, 1] with align_corners=True semantics: -1 maps to
    voxel 0 and +1 to voxel (size-1) along each axis; x indexes W, y indexes
    H, z indexes D (torch.grid_sample convention). Out-of-range samples
    return 0 (zero padding).
    """
    D, H, W = volume.shape
    shape = xyz.shape[:-1]
    xyz = xyz.reshape(-1, 3)
    x = (xyz[:, 0] + 1.0) * 0.5 * (W - 1)
    y = (xyz[:, 1] + 1.0) * 0.5 * (H - 1)
    z = (xyz[:, 2] + 1.0) * 0.5 * (D - 1)
    return _trilinear_zero_pad(volume, x, y, z).reshape(shape)


def sample_volume_voxel(volume: jnp.ndarray, x, y, z) -> jnp.ndarray:
    """Trilinear sample at voxel coordinates (x indexes W, z indexes D),
    zero outside. Inputs are flat arrays of equal length."""
    return _trilinear_zero_pad(volume, x, y, z)


def _trilinear_zero_pad(volume: jnp.ndarray, x, y, z) -> jnp.ndarray:
    D, H, W = volume.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    z0 = jnp.floor(z)
    wx = x - x0
    wy = y - y0
    wz = z - z0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    z0 = z0.astype(jnp.int32)

    flat = volume.reshape(-1)
    out = jnp.zeros_like(x, dtype=volume.dtype)
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                xi = x0 + dx
                yi = y0 + dy
                zi = z0 + dz
                valid = (
                    (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H) & (zi >= 0) & (zi < D)
                )
                idx = jnp.clip(zi, 0, D - 1) * (H * W) + jnp.clip(yi, 0, H - 1) * W + jnp.clip(
                    xi, 0, W - 1
                )
                w = (
                    (wx if dx else 1.0 - wx)
                    * (wy if dy else 1.0 - wy)
                    * (wz if dz else 1.0 - wz)
                )
                out = out + jnp.where(valid, w * jnp.take(flat, idx), 0.0)
    return out


def grid_sample_2d(image: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of ``image`` (H, W) at normalized coords (..., 2),
    align_corners=True, zero padding."""
    H, W = image.shape
    shape = xy.shape[:-1]
    xy = xy.reshape(-1, 2)
    x = (xy[:, 0] + 1.0) * 0.5 * (W - 1)
    y = (xy[:, 1] + 1.0) * 0.5 * (H - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    flat = image.reshape(-1)
    out = jnp.zeros_like(x, dtype=image.dtype)
    for dy in (0, 1):
        for dx in (0, 1):
            xi = x0 + dx
            yi = y0 + dy
            valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
            idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
            w = (wx if dx else 1.0 - wx) * (wy if dy else 1.0 - wy)
            out = out + jnp.where(valid, w * jnp.take(flat, idx), 0.0)
    return out.reshape(shape)
