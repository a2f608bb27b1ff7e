"""Image data model + NIfTI I/O (rebuild of reference nesvor/image/image.py).

``Image``/``Slice``/``Volume``/``Stack`` hold jnp arrays (device-resident)
with host-side Python orchestration; NIfTI round-trips go through the pure
numpy reader/writer in :mod:`nesvor_tpu.image.nifti`. Semantics follow the
reference line-for-line where they define behavior (masking rules, affine
bridges, slice-gap-initialized stack transforms), but all tensor math is JAX.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.interp import grid_sample_3d
from ..transform import RigidTransform, transform_points
from ..utils import meshgrid
from .image_utils import (
    affine2transformation,
    compare_resolution_affine,
    transformation2affine,
)
from .nifti import read_nifti, write_nifti


def _trilinear_host(volume: np.ndarray, x, y, z) -> np.ndarray:
    """Numpy twin of ops.interp._trilinear_zero_pad (align-corners voxel
    coords, zero outside): used by the host-side Volume.resample path."""
    D, H, W = volume.shape
    x0f = np.floor(x)
    y0f = np.floor(y)
    z0f = np.floor(z)
    wx = (x - x0f).astype(np.float32)
    wy = (y - y0f).astype(np.float32)
    wz = (z - z0f).astype(np.float32)
    x0 = x0f.astype(np.int64)
    y0 = y0f.astype(np.int64)
    z0 = z0f.astype(np.int64)
    flat = volume.reshape(-1)
    out = np.zeros(x.shape, dtype=np.float32)
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                xi = x0 + dx
                yi = y0 + dy
                zi = z0 + dz
                valid = (
                    (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H) & (zi >= 0) & (zi < D)
                )
                idx = (
                    np.clip(zi, 0, D - 1) * (H * W)
                    + np.clip(yi, 0, H - 1) * W
                    + np.clip(xi, 0, W - 1)
                )
                w = (
                    (wx if dx else 1.0 - wx)
                    * (wy if dy else 1.0 - wy)
                    * (wz if dz else 1.0 - wz)
                )
                out += np.where(valid, w * flat[idx], 0.0)
    return out


class Image:
    """3-D image + bool mask + RigidTransform + per-axis resolution
    (reference image.py:17-94). ``image`` is (d, h, w) in (z, y, x) order."""

    def __init__(
        self,
        image: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        transformation: Optional[RigidTransform] = None,
        resolution_x: float = 1.0,
        resolution_y: float = 1.0,
        resolution_z: float = 1.0,
    ) -> None:
        assert image.ndim == 3
        self.image = image
        if mask is None:
            mask = jnp.ones_like(image, dtype=bool)
        self.mask = mask
        if transformation is None:
            transformation = RigidTransform(jnp.zeros((1, 6), dtype=jnp.float32))
        self.transformation = transformation
        self.resolution_x = float(resolution_x)
        self.resolution_y = float(resolution_y)
        self.resolution_z = float(resolution_z)

    def _clone_image(self, zero: bool = False) -> Dict:
        return {
            "image": jnp.zeros_like(self.image) if zero else jnp.array(self.image),
            "mask": jnp.zeros_like(self.mask) if zero else jnp.array(self.mask),
            "transformation": self.transformation.clone(),
            "resolution_x": self.resolution_x,
            "resolution_y": self.resolution_y,
            "resolution_z": self.resolution_z,
        }

    @property
    def shape_xyz(self) -> jnp.ndarray:
        return jnp.asarray(self.image.shape[::-1])

    @property
    def resolution_xyz(self) -> jnp.ndarray:
        return jnp.asarray(
            [self.resolution_x, self.resolution_y, self.resolution_z],
            dtype=jnp.float32,
        )

    def save(self, path: str, masked: bool = True) -> None:
        affine = transformation2affine(
            self.image.shape,
            self.transformation,
            self.resolution_x,
            self.resolution_y,
            self.resolution_z,
        )
        # host-side masking: a device op here would recompile per distinct
        # slice shape when saving slice folders
        img_np = np.asarray(self.image)
        if masked:
            img_np = img_np * np.asarray(self.mask).astype(img_np.dtype)
        save_nii_volume(path, img_np, affine)

    @property
    def xyz_masked(self) -> np.ndarray:
        # fully host-side, and stays a NUMPY array: the masked-coordinate
        # count is data-dependent, so ANY device op on the (n_masked, 3)
        # array (even an eager ravel or slice) compiles a fresh program per
        # distinct mask count — ~60 s through the remote compile service on
        # EVERY reconstruct, since optimized poses shift the count each run
        # (bench r03: xyz phase 62.8 s device vs 0.1 s host). Consumers
        # upload fixed-size padded chunks only.
        mat = np.asarray(self.transformation.matrix(trans_first=False))
        mat = mat.reshape(-1, 3, 4)[0]
        xyz = self._xyz_masked_untransformed_np()
        return xyz @ mat[:, :3].T + mat[:, 3]

    def _xyz_masked_untransformed_np(self) -> np.ndarray:
        # host-side nonzero: the device op has a data-dependent output
        # shape, so it both forces a host sync AND compiles a fresh program
        # per distinct mask count (measured 58.6 s for one 2M-voxel mask
        # through the remote-TPU tunnel); numpy does this in milliseconds
        mask_np = np.asarray(self.mask)
        kji = np.stack(np.nonzero(mask_np), -1)[:, ::-1].astype(np.float32)
        shape_xyz = np.asarray(self.image.shape[::-1], dtype=np.float32)
        res = np.array(
            [self.resolution_x, self.resolution_y, self.resolution_z],
            dtype=np.float32,
        )
        return (kji - (shape_xyz - 1) / 2) * res

    @property
    def xyz_masked_untransformed(self) -> jnp.ndarray:
        return jnp.asarray(self._xyz_masked_untransformed_np())

    @property
    def v_masked(self) -> jnp.ndarray:
        return self.image[self.mask]

    def rescale(self, intensity_mean: float) -> None:
        scale = intensity_mean / self.image[self.mask].mean()
        self.image = self.image * scale

    def clone(self, zero: bool = False):
        raise NotImplementedError


class Slice(Image):
    """2-D slice stored as (1, h, w) (reference image.py:97-120)."""

    def __init__(
        self,
        image: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        transformation: Optional[RigidTransform] = None,
        resolution_x: float = 1.0,
        resolution_y: float = 1.0,
        resolution_z: float = 1.0,
        stack_idx: Optional[int] = None,
        slice_idx: Optional[int] = None,
    ) -> None:
        super().__init__(
            image, mask, transformation, resolution_x, resolution_y, resolution_z
        )
        self.stack_idx = stack_idx
        self.slice_idx = slice_idx

    def clone(self, zero: bool = False) -> "Slice":
        return Slice(
            stack_idx=self.stack_idx,
            slice_idx=self.slice_idx,
            **self._clone_image(zero),
        )


@partial(jax.jit, static_argnames=("res_xyz", "res_new"))
def _resample_bounds_jit(mask, transformation, transformation_new, res_xyz, res_new):
    """Bounds (2, 3) of the masked voxels in the new frame, ±10 voxels."""
    shape = mask.shape  # (D, H, W), static
    grid = meshgrid(
        (shape[2], shape[1], shape[0]), res_xyz
    ).reshape(-1, 3)
    xyz = transform_points(transformation, grid)
    R = transformation_new.matrix()[0, :3, :3]
    xyz = jnp.matmul(jnp.linalg.inv(R), xyz[..., None])[..., 0]
    m = mask.reshape(-1, 1)
    rn = jnp.asarray(res_new, xyz.dtype)
    lo = jnp.min(jnp.where(m, xyz, jnp.inf), axis=0) - rn * 10
    hi = jnp.max(jnp.where(m, xyz, -jnp.inf), axis=0) + rn * 10
    return jnp.stack([lo, hi], 0)


@partial(jax.jit, static_argnames=("shape_new", "res_xyz", "res_new"))
def _resample_eval_jit(
    image, transformation, transformation_new, xyz_min, shape_new, res_xyz, res_new
):
    """Build the new-frame grid and trilinearly sample the volume — one
    compiled program per (shape, resolution) combination."""
    R = transformation_new.matrix()[0, :3, :3]
    mat = jnp.zeros((1, 3, 4), dtype=R.dtype)
    mat = mat.at[0, :, :3].set(R)
    shape_arr = jnp.asarray(shape_new, jnp.float32)
    rn = jnp.asarray(res_new, jnp.float32)
    mat = mat.at[0, :, -1].set(xyz_min + (shape_arr - 1) / 2 * rn)

    # meshgrid with a traced origin (utils.meshgrid coerces min to host floats)
    axes = [
        jnp.arange(s, dtype=jnp.float32) * r + xyz_min[i]
        for i, (s, r) in enumerate(zip(shape_new, res_new))
    ]
    grid = jnp.stack(jnp.meshgrid(*axes[::-1], indexing="ij")[::-1], -1)
    grid = jnp.matmul(R, grid[..., None])[..., 0]
    xyz = transform_points(transformation.inv(), grid.reshape(-1, 3))
    shape_old = jnp.asarray(image.shape[::-1], jnp.float32)
    xyz = xyz / ((shape_old - 1) * jnp.asarray(res_xyz, jnp.float32) / 2)
    v = grid_sample_3d(image, xyz).reshape(grid.shape[:-1])
    return v, mat


class Volume(Image):
    """3-D volume with point sampling and resampling (reference image.py:123-177)."""

    def sample_points(self, xyz: jnp.ndarray) -> jnp.ndarray:
        shape = xyz.shape[:-1]
        xyz = transform_points(self.transformation.inv(), xyz.reshape(-1, 3))
        xyz = xyz / ((self.shape_xyz - 1) * self.resolution_xyz / 2)
        return grid_sample_3d(self.image, xyz).reshape(shape)

    def resample(
        self,
        resolution_new: Optional[Union[float, jnp.ndarray]],
        transformation_new: Optional[RigidTransform] = None,
        host: bool = False,
    ) -> "Volume":
        """Two jitted dispatches (bounds, then static-shape grid+sample):
        the eager formulation cost ~100 s of per-op dispatch latency through
        the remote-TPU tunnel at typical volume sizes.

        ``host=True`` runs the identical math in numpy on the host instead —
        the right choice for small/binary volumes (the sample_volume
        occupancy mask) where the device path's value is one fused program
        but its cost is a first-run remote compile (~17 s per machine image,
        BENCH_r03 resample_s) that dwarfs the milliseconds of actual work."""
        if transformation_new is None:
            transformation_new = self.transformation
        if resolution_new is None:
            res_new = tuple(float(r) for r in np.asarray(self.resolution_xyz))
        elif isinstance(resolution_new, (float, int)):
            res_new = (float(resolution_new),) * 3
        else:
            res_new = tuple(float(r) for r in np.asarray(resolution_new))
        if host:
            return self._resample_host(res_new, transformation_new)

        res_xyz = tuple(float(r) for r in np.asarray(self.resolution_xyz))
        bounds = np.asarray(
            _resample_bounds_jit(
                self.mask, self.transformation, transformation_new, res_xyz, res_new
            )
        )  # one fetch
        xyz_min = bounds[0]
        # bucket the output shape to multiples of 32: the sampled extent is
        # data-dependent, and an exact shape would force a fresh compile of
        # the grid+sample program on every call (~60 s through the remote
        # compile service); the extra border voxels fall outside the mask.
        # 32 (not 8) keeps the shape stable when optimized poses drift the
        # bounds slightly between runs (measured: an 8-bucket boundary
        # crossing cost a 60 s recompile in sample_volume)
        shape_xyz = (
            np.ceil(np.ceil((bounds[1] - bounds[0]) / np.asarray(res_new)) / 32) * 32
        ).astype(int)

        v, mat = _resample_eval_jit(
            self.image,
            self.transformation,
            transformation_new,
            jnp.asarray(xyz_min, jnp.float32),
            tuple(int(s) for s in shape_xyz),
            res_xyz,
            res_new,
        )
        return Volume(
            v,
            v > 0,
            RigidTransform(mat, trans_first=True),
            res_new[0],
            res_new[1],
            res_new[2],
        )

    def _resample_host(self, res_new, transformation_new) -> "Volume":
        """Numpy mirror of the jitted resample (same bounds rule, 32-voxel
        shape buckets, align-corners trilinear with zero padding); kept
        numerically interchangeable with the device path — pinned by
        tests/test_image.py::test_resample_host_matches_device."""
        img = np.asarray(self.image, dtype=np.float32)
        mask = np.asarray(self.mask)
        D, H, W = img.shape
        res_xyz = np.array(
            [self.resolution_x, self.resolution_y, self.resolution_z], np.float32
        )
        rn = np.asarray(res_new, np.float32)

        # --- bounds of the masked voxels in the new frame, ±10 voxels ---
        kji = np.stack(np.nonzero(mask), -1)[:, ::-1].astype(np.float32)
        if kji.shape[0] == 0:
            kji = np.zeros((1, 3), np.float32)
        shape_xyz = np.array([W, H, D], np.float32)
        pts = (kji - (shape_xyz - 1) / 2) * res_xyz  # centered world grid coords
        mat_self = np.asarray(self.transformation.matrix(trans_first=False)).reshape(
            -1, 3, 4
        )[0]
        xyz = pts @ mat_self[:, :3].T + mat_self[:, 3]
        R_new = np.asarray(transformation_new.matrix()).reshape(-1, 3, 4)[0, :, :3]
        xyz = xyz @ np.linalg.inv(R_new).T
        lo = xyz.min(0) - rn * 10
        hi = xyz.max(0) + rn * 10

        shape_new = (np.ceil(np.ceil((hi - lo) / rn) / 32) * 32).astype(int)  # (X,Y,Z)

        # --- new-frame grid, rotate to world, pull back, trilinear sample ---
        mat = np.zeros((1, 3, 4), np.float32)
        mat[0, :, :3] = R_new
        mat[0, :, 3] = lo + (shape_new.astype(np.float32) - 1) / 2 * rn
        axes = [
            np.arange(s, dtype=np.float32) * r + lo[i]
            for i, (s, r) in enumerate(zip(shape_new, rn))
        ]
        grid = np.stack(
            np.meshgrid(*axes[::-1], indexing="ij")[::-1], -1
        )  # (Z, Y, X, 3[xyz])
        g = grid.reshape(-1, 3) @ R_new.T
        # inverse of self.transformation (trans_first=False): x -> Rᵀ(x - t)
        g = (g - mat_self[:, 3]) @ mat_self[:, :3]
        # voxel coordinates (align_corners: world extent spans voxel centers)
        vox = g / res_xyz + (shape_xyz - 1) / 2
        v = _trilinear_host(img, vox[:, 0], vox[:, 1], vox[:, 2])
        v = v.reshape(grid.shape[:-1])
        return Volume(
            jnp.asarray(v),
            jnp.asarray(v > 0),
            RigidTransform(jnp.asarray(mat), trans_first=True),
            float(rn[0]),
            float(rn[1]),
            float(rn[2]),
        )

    def clone(self, zero: bool = False) -> "Volume":
        return Volume(**self._clone_image(zero))


class Stack:
    """(n, 1, h, w) slice stack with per-slice transforms initialized by slice
    gap (reference image.py:183-248)."""

    def __init__(
        self,
        slices: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        transformation: Optional[RigidTransform] = None,
        score: float = 0.0,
        resolution_x: float = 1.0,
        resolution_y: float = 1.0,
        thickness: float = 1.0,
        gap: float = 1.0,
    ) -> None:
        self.slices = slices
        if mask is None:
            mask = jnp.ones_like(slices, dtype=bool)
        self.mask = mask
        if transformation is None:
            n = slices.shape[0]
            t = jnp.zeros((n, 6), dtype=jnp.float32)
            t = t.at[:, -1].set((jnp.arange(n, dtype=jnp.float32) - n / 2) * gap)
            transformation = RigidTransform(t)
        self.transformation = transformation
        if score is None:
            score = jnp.ones(slices.shape[0], dtype=jnp.float32)
        self.score = score
        self.resolution_x = float(resolution_x)
        self.resolution_y = float(resolution_y)
        self.thickness = float(thickness)
        self.gap = float(gap)

    def __len__(self) -> int:
        return self.slices.shape[0]

    def __getitem__(self, idx):
        assert self.slices.ndim == 4
        slices = self.slices[idx]
        masks = self.mask[idx]
        transformation = self.transformation[idx]
        if slices.ndim < self.slices.ndim:
            return Slice(
                slices,
                masks,
                transformation,
                self.resolution_x,
                self.resolution_y,
                self.thickness,
            )
        return [
            Slice(
                slices[i],
                masks[i],
                transformation[i],
                self.resolution_x,
                self.resolution_y,
                self.thickness,
            )
            for i in range(len(transformation))
        ]


# ---- NIfTI I/O (reference image.py:251-393) ---------------------------------------


def save_nii_volume(
    path: str,
    volume: Union[jnp.ndarray, np.ndarray],
    affine: Optional[np.ndarray],
) -> None:
    assert volume.ndim == 3 or (volume.ndim == 4 and volume.shape[1] == 1)
    if volume.ndim == 4:
        volume = volume[:, 0]
    # (d, h, w) -> file (x, y, z) order
    vol_np = np.asarray(volume).transpose(2, 1, 0)
    if affine is None:
        affine = np.eye(4)
    write_nifti(path, vol_np, np.asarray(affine))


def load_nii_volume(path: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    data, resolutions, affine, hdr = read_nifti(path)
    ndim_used = int(hdr["dim"][0])
    assert ndim_used == 3 or (
        ndim_used > 3 and all(int(d) == 1 for d in hdr["dim"][4 : 1 + ndim_used])
    ), ("Expect a 3D volume but the input is %dD" % ndim_used)
    while data.ndim > 3:
        data = data.squeeze(-1)
    volume = data.transpose(2, 1, 0)  # -> (z, y, x)
    return volume.astype(np.float32), resolutions, affine


def save_slices(folder: str, images: List[Slice]) -> None:
    for i, image in enumerate(images):
        image.save(os.path.join(folder, f"{i}.nii.gz"), True)


def load_slices(folder: str) -> List[Slice]:
    slices = []
    ids = []
    for f in os.listdir(folder):
        if not (f.endswith("nii") or f.endswith("nii.gz")):
            continue
        ids.append(int(f.split(".nii")[0]))
        vol, resolutions, affine = load_nii_volume(os.path.join(folder, f))
        mask = vol > 0
        vol, mask, transformation = affine2transformation(
            vol, mask, resolutions, affine
        )
        slices.append(
            Slice(
                image=jnp.asarray(vol),
                mask=jnp.asarray(mask),
                transformation=transformation,
                resolution_x=float(resolutions[0]),
                resolution_y=float(resolutions[1]),
                resolution_z=float(resolutions[2]),
            )
        )
    return [s for _, s in sorted(zip(ids, slices), key=lambda p: p[0])]


def load_stack(path_vol: str, path_mask: Optional[str] = None) -> Stack:
    slices, resolutions, affine = load_nii_volume(path_vol)
    if path_mask is None:
        mask = slices > 0
    else:
        mask_np, resolutions_m, affine_m = load_nii_volume(path_mask)
        mask = mask_np > 0
        if not compare_resolution_affine(
            resolutions, affine, resolutions_m, affine_m, slices.shape, mask.shape
        ):
            raise ValueError(
                "Error: the sizes/resolutions/affine transformations of the "
                "input stack and stack mask do not match!"
            )

    slices, mask, transformation = affine2transformation(
        slices, mask, resolutions, affine
    )
    return Stack(
        slices=jnp.asarray(slices)[:, None],
        mask=jnp.asarray(mask)[:, None],
        transformation=transformation,
        resolution_x=float(resolutions[0]),
        resolution_y=float(resolutions[1]),
        thickness=float(resolutions[2]),
        gap=float(resolutions[2]),
    )


def load_volume(path_vol: str, path_mask: Optional[str] = None) -> Volume:
    vol, resolutions, affine = load_nii_volume(path_vol)
    if path_mask is None:
        mask = vol > 0
    else:
        mask_np, resolutions_m, affine_m = load_nii_volume(path_mask)
        mask = mask_np > 0
        if not compare_resolution_affine(
            resolutions, affine, resolutions_m, affine_m, vol.shape, mask.shape
        ):
            raise ValueError(
                "Error: the sizes/resolutions/affine transformations of the "
                "input stack and stack mask do not match!"
            )

    vol, mask, transformation = affine2transformation(vol, mask, resolutions, affine)
    transformation = RigidTransform(
        transformation.axisangle().mean(0, keepdims=True)
    )
    return Volume(
        image=jnp.asarray(vol),
        mask=jnp.asarray(mask),
        transformation=transformation,
        resolution_x=float(resolutions[0]),
        resolution_y=float(resolutions[1]),
        resolution_z=float(resolutions[2]),
    )
