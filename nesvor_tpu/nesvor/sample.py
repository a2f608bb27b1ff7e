"""Inference sampling of the trained INR (rebuild of reference
nesvor/nesvor/sample.py:10-64).

Voxel batches are padded to a fixed chunk size so one jitted kernel serves
every chunk (no per-chunk recompiles); the MC-PSF average runs on device.
"""

from __future__ import annotations

from argparse import Namespace
from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..image import Slice, Volume
from ..transform import transform_points
from ..utils import meshgrid, resolution2sigma
from .models import inr_forward, sample_batch
from .train import INRModel


@partial(jax.jit, static_argnames=("cfg", "n_samples"))
def _eval_chunk(params, cfg, bounding_box, xyz, psf_sigma, n_samples, key, mats):
    """Render one padded chunk of points: MC-PSF average of the INR density
    (reference sample.py:17-33). ``mats`` is (N, 3, 4) or None."""
    pts = sample_batch(xyz, mats, psf_sigma, n_samples, key)
    density, _, _ = inr_forward(params, cfg, bounding_box, pts)
    return density.mean(-1)


def sample_points(model: INRModel, xyz: jnp.ndarray, args: Namespace) -> jnp.ndarray:
    shape = xyz.shape[:-1]
    xyz = xyz.reshape(-1, 3)
    n = xyz.shape[0]
    batch_size = int(args.inference_batch_size)
    n_samples = (
        0 if getattr(args, "no_output_psf", False) else int(args.n_inference_samples)
    )
    n_samples = max(n_samples, 1)
    psf_sigma = resolution2sigma(float(args.output_resolution), isotropic=True)
    key = jax.random.PRNGKey(getattr(args, "seed", 0) or 0)

    out = np.empty(n, dtype=np.float32)
    for i in range(0, n, batch_size):
        chunk = xyz[i : i + batch_size]
        pad = batch_size - chunk.shape[0]
        if pad:
            chunk = jnp.concatenate([chunk, jnp.zeros((pad, 3), chunk.dtype)], 0)
        key, k = jax.random.split(key)
        v = _eval_chunk(
            model.params, model.cfg, model.bounding_box, chunk, psf_sigma,
            n_samples, k, None,
        )
        out[i : i + batch_size] = np.asarray(v)[: batch_size - pad]
    return jnp.asarray(out.reshape(shape))


def sample_volume(model: INRModel, mask: Volume, args: Namespace) -> Volume:
    """Resample the mask to the output resolution and fill masked voxels from
    the INR (reference sample.py:10-14)."""
    img = mask.resample(args.output_resolution, None)
    values = sample_points(model, img.xyz_masked, args)
    flat = img.image.reshape(-1)
    midx = jnp.nonzero(img.mask.reshape(-1))[0]
    img.image = flat.at[midx].set(values).reshape(img.image.shape)
    return img


def sample_slice(
    model: INRModel, slice: Slice, mask: Volume, args: Namespace
) -> Slice:
    """Simulate one slice from the INR (reference sample.py:36-53)."""
    out = slice.clone(zero=True)
    xyz = meshgrid(
        np.asarray(out.shape_xyz), np.asarray(out.resolution_xyz)
    ).reshape(-1, 3)
    m = mask.sample_points(transform_points(out.transformation, xyz)) > 0
    if not bool(m.any()):
        return out
    n_samples = (
        1 if getattr(args, "no_output_psf", False) else int(args.n_inference_samples)
    )
    psf_sigma = jnp.asarray(
        resolution2sigma(np.asarray(out.resolution_xyz), isotropic=False)
    )
    key = jax.random.PRNGKey(getattr(args, "seed", 0) or 0)
    mats = out.transformation.matrix(trans_first=True)
    midx = jnp.nonzero(m)[0]
    xyz_masked = xyz[midx]
    pts = sample_batch(
        xyz_masked,
        jnp.broadcast_to(mats, (xyz_masked.shape[0], 3, 4)),
        psf_sigma,
        n_samples,
        key,
    )
    density, _, _ = inr_forward(model.params, model.cfg, model.bounding_box, pts)
    v = density.mean(-1)
    mask_img = m.reshape(out.mask.shape)
    out.mask = mask_img
    out.image = out.image.reshape(-1).at[midx].set(v).reshape(out.image.shape)
    return out


def sample_slices(
    model: INRModel, slices: List[Slice], mask: Volume, args: Namespace
) -> List[Slice]:
    return [sample_slice(model, s, mask, args) for s in slices]
