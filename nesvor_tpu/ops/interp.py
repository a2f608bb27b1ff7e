"""Trilinear/bilinear grid sampling (JAX replacement for torch.grid_sample).

The reference uses F.grid_sample with align_corners=True and zero padding
(nesvor/image/image.py:124-132, nesvor/svort/registration.py:240-254).

Two implementations:
  * plain: 8 narrow gathers per point (XLA fuses the interpolation) — fine
    on CPU and for small point sets;
  * corner-packed (``corner_pack_volume`` + passing the packed volume):
    the volume is zero-padded by one voxel and stored as (cells, 8) rows so
    each sample needs ONE 32-byte gather (XLA's gather is latency-bound and
    width-independent to 64 B — PERF.md). The halo makes torch's
    zero-padding semantics exact with no per-corner masking: a point in the
    border band interpolates against halo zeros with the same weights.
"""

from __future__ import annotations

import jax.numpy as jnp


class PackedVolume:
    """Corner-packed zero-haloed volume for one-gather trilinear sampling.

    ``rows[i]`` holds the 8 cell corners (dx fastest) of cell i of the
    1-voxel-zero-padded volume; ``shape`` is the ORIGINAL (D, H, W)."""

    def __init__(self, rows: jnp.ndarray, shape):
        self.rows = rows
        self.shape = tuple(shape)

    def tree_flatten(self):
        return (self.rows,), self.shape

    @classmethod
    def tree_unflatten(cls, shape, children):
        return cls(children[0], shape)


import jax  # noqa: E402

jax.tree_util.register_pytree_node(
    PackedVolume, PackedVolume.tree_flatten, PackedVolume.tree_unflatten
)


def corner_pack_volume(volume: jnp.ndarray) -> PackedVolume:
    """(D, H, W) -> PackedVolume with ((D+1)(H+1)(W+1), 8) corner rows.

    Pad-by-one on every side, then cells (Dp-1)(Hp-1)(Wp-1) = (D+1)(H+1)(W+1)
    each store their 8 corners contiguously."""
    D, H, W = volume.shape
    p = jnp.pad(volume, 1)
    cols = []
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                cols.append(
                    p[dz : dz + D + 1, dy : dy + H + 1, dx : dx + W + 1].reshape(-1)
                )
    return PackedVolume(jnp.stack(cols, axis=1), (D, H, W))


def _trilinear_packed(packed: PackedVolume, x, y, z):
    """One-gather trilinear sample at voxel coords (zero outside), exact
    torch zero-padding semantics: the one-voxel halo reproduces the border
    fade-out band (x in (-1, 0) or (size-1, size)) with the standard
    weights; a single mask zeroes points with no in-range corner."""
    D, H, W = packed.shape
    xp = x + 1.0
    yp = y + 1.0
    zp = z + 1.0
    inside = (
        (xp > 0) & (xp < W + 1) & (yp > 0) & (yp < H + 1) & (zp > 0) & (zp < D + 1)
    )
    xp = jnp.clip(xp, 0.0, W + 1 - 1e-6)
    yp = jnp.clip(yp, 0.0, H + 1 - 1e-6)
    zp = jnp.clip(zp, 0.0, D + 1 - 1e-6)
    x0 = jnp.floor(xp).astype(jnp.int32)
    y0 = jnp.floor(yp).astype(jnp.int32)
    z0 = jnp.floor(zp).astype(jnp.int32)
    wx = xp - x0
    wy = yp - y0
    wz = zp - z0
    idx = (z0 * (H + 1) + y0) * (W + 1) + x0
    rows = jnp.take(packed.rows, idx, axis=0)  # (..., 8)
    c = 0
    out = 0.0
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                w = (
                    (wx if dx else 1.0 - wx)
                    * (wy if dy else 1.0 - wy)
                    * (wz if dz else 1.0 - wz)
                )
                out = out + w * rows[..., c]
                c += 1
    return jnp.where(inside, out, 0.0)


def grid_sample_3d(volume, xyz: jnp.ndarray) -> jnp.ndarray:
    """Sample ``volume`` (D, H, W) — or a ``PackedVolume`` — at normalized
    coords ``xyz`` (..., 3).

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
    if isinstance(volume, PackedVolume):
        return _trilinear_packed(volume, x, y, z).reshape(shape)
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
