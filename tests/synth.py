"""Synthetic fetal-like test data: phantom volume -> motion-free multi-stack
acquisitions via the PSF projector (the recipe of reference
tests/slice_acquisition/test_slice_acq.py:13-74, used as the data generator
for end-to-end reconstruction tests and the benchmark)."""

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from nesvor_tpu.image import Slice, Stack
from nesvor_tpu.ops.slice_acq import slice_acquisition
from nesvor_tpu.transform import RigidTransform, mat_update_resolution
from nesvor_tpu.utils import get_psf

from .phantom3d import phantom3d


def make_phantom_stacks(
    vs: int = 64,
    n_stacks: int = 8,
    gap: float = 3.0,
    res: float = 1.0,
    res_s: float = 1.0,
    intensity: float = 700.0,
    rng_seed: Optional[int] = None,
    motion_std: Tuple[float, float] = (0.0, 0.0),
    smooth_sigma: float = 0.6,
    texture_amp: float = 0.0,
    texture_sigma: float = 1.2,
) -> Tuple[List[Stack], jnp.ndarray]:
    """Simulate ``n_stacks`` stacks of a vs^3 phantom at distinct orientations.

    Returns (stacks, ground-truth volume (vs, vs, vs) in world res ``res``).
    ``motion_std`` = (rot_std_radians, trans_std_mm) adds per-slice rigid
    motion to make registration non-trivial. ``smooth_sigma`` (voxels)
    band-limits the piecewise-constant phantom so PSNR against it is a
    meaningful quality metric (the raw discrete phantom caps PSNR at ~12 dB
    for ANY method once the acquisition PSF is applied).

    ``texture_amp`` > 0 multiplicatively modulates the phantom interior with
    band-limited noise (unit-std Gaussian noise blurred by ``texture_sigma``
    voxels): fine structure at the resolution limit, so encoder quality
    comparisons are not confounded by the base phantom's smoothness.
    """
    volume = jnp.asarray(phantom3d(n=vs), dtype=jnp.float32) * intensity
    if smooth_sigma:
        from nesvor_tpu.utils import gaussian_blur

        volume = gaussian_blur(volume[None, None], smooth_sigma, 3.0)[0, 0]
    if texture_amp:
        from nesvor_tpu.utils import gaussian_blur

        trng = np.random.default_rng(
            rng_seed + 1 if rng_seed is not None else 1
        )
        tex = jnp.asarray(trng.normal(size=volume.shape), jnp.float32)
        tex = gaussian_blur(tex[None, None], texture_sigma, 3.0)[0, 0]
        tex = tex / jnp.maximum(jnp.std(tex), 1e-6)
        volume = volume * (1.0 + texture_amp * tex * (volume > 0.05 * intensity))
    vol_in = volume[None, None]
    s_thick = gap
    n_slice = int((np.sqrt(3) * vs * res) / gap) + 4
    ss = int((np.sqrt(3) * vs * res) / res_s) + 4
    psf = jnp.asarray(get_psf(res_ratio=(res_s / res, res_s / res, s_thick / res)))

    base_angles = [
        [0, 0, 0],
        [np.pi / 2, 0, 0],
        [0, np.pi / 2, 0],
        [0, 0, np.pi / 2],
        [np.pi / 4, np.pi / 4, 0],
        [0, np.pi / 4, np.pi / 4],
        [np.pi / 4, 0, np.pi / 4],
        [np.pi / 3, np.pi / 3, 0],
        [0, np.pi / 3, np.pi / 3],
        [np.pi / 3, 0, np.pi / 3],
    ]
    rng = np.random.default_rng(rng_seed if rng_seed is not None else 0)

    stacks = []
    for i in range(n_stacks):
        angle = np.tile(np.asarray(base_angles[i % len(base_angles)], np.float32), (n_slice, 1))
        tz = (np.arange(n_slice, dtype=np.float32) - (n_slice - 1) / 2.0) * gap
        tx = ty = np.full_like(tz, 0.5)
        ax = np.concatenate([angle, np.stack((tx, ty, tz), -1)], -1)
        if motion_std[0] or motion_std[1]:
            ax[:, :3] += rng.normal(0, motion_std[0], size=(n_slice, 3))
            ax[:, 3:] += rng.normal(0, motion_std[1], size=(n_slice, 3))
        transform = RigidTransform(jnp.asarray(ax), trans_first=True)
        mat = mat_update_resolution(transform.matrix(), 1, res)
        slices = slice_acquisition(
            mat, vol_in, None, None, psf, (ss, ss), res_s / res, False, False
        )
        stacks.append(
            Stack(
                slices=slices,
                mask=slices > 0,
                transformation=transform,
                resolution_x=res_s,
                resolution_y=res_s,
                thickness=s_thick,
                gap=gap,
            )
        )
    return stacks, volume


def make_brain_stacks(
    vs: int = 96,
    n_stacks: int = 6,
    gap: float = 3.0,
    res: float = 1.0,
    res_s: float = 1.0,
    intensity: float = 700.0,
    rng_seed: int = 0,
    motion_std: Tuple[float, float] = (0.0, 0.0),
    bias_strength: float = 0.0,
) -> Tuple[List[Stack], jnp.ndarray, List[jnp.ndarray], np.ndarray]:
    """Simulate stacks of the brain-like phantom (nesvor_tpu.utils.brain_phantom):
    folded cortex, multi-tissue T2 contrast, optional per-stack
    multiplicative bias field (N4-style coil inhomogeneity, applied to the
    acquired volume per stack, NOT to the returned ground truth — the
    reference's bias head models exactly this, nesvor/models.py:248-258,
    343-349).

    Returns (stacks, ground-truth volume, per-stack brain masks in stack
    geometry, brain mask on the ground-truth grid) — the per-stack masks are
    what ``--stack-masks`` consumes; the volume mask is the region where a
    mask-trained reconstruction has data (quality gates must stay inside it:
    the scalp is bright but never trained when stack masks are used).
    """
    from nesvor_tpu.utils.brain_phantom import bias_field, brain_phantom

    gt, tissues = brain_phantom(vs, seed=rng_seed, return_tissues=True)
    gt = jnp.asarray(gt, jnp.float32) * intensity
    brain_frac = (
        tissues["gm"]
        + tissues["wm"]
        + tissues["deep_gm"]
        + tissues["ventricles"]
        + tissues["csf"]
    )
    brain_mask = brain_frac > 0.3
    mask_vol = jnp.asarray(brain_mask.astype(np.float32))[None, None]

    s_thick = gap
    n_slice = int((np.sqrt(3) * vs * res) / gap) + 4
    ss = int((np.sqrt(3) * vs * res) / res_s) + 4
    psf = jnp.asarray(get_psf(res_ratio=(res_s / res, res_s / res, s_thick / res)))

    base_angles = [
        [0, 0, 0],
        [np.pi / 2, 0, 0],
        [0, np.pi / 2, 0],
        [0, 0, np.pi / 2],
        [np.pi / 4, np.pi / 4, 0],
        [0, np.pi / 4, np.pi / 4],
        [np.pi / 4, 0, np.pi / 4],
        [np.pi / 3, np.pi / 3, 0],
        [0, np.pi / 3, np.pi / 3],
        [np.pi / 3, 0, np.pi / 3],
    ]
    rng = np.random.default_rng(rng_seed)

    stacks = []
    stack_masks = []
    for i in range(n_stacks):
        vol_i = gt
        if bias_strength:
            b = bias_field(vs, seed=rng_seed * 100 + i, strength=bias_strength)
            vol_i = gt * jnp.asarray(b)
        angle = np.tile(
            np.asarray(base_angles[i % len(base_angles)], np.float32), (n_slice, 1)
        )
        tz = (np.arange(n_slice, dtype=np.float32) - (n_slice - 1) / 2.0) * gap
        tx = ty = np.full_like(tz, 0.5)
        ax = np.concatenate([angle, np.stack((tx, ty, tz), -1)], -1)
        if motion_std[0] or motion_std[1]:
            ax[:, :3] += rng.normal(0, motion_std[0], size=(n_slice, 3))
            ax[:, 3:] += rng.normal(0, motion_std[1], size=(n_slice, 3))
        transform = RigidTransform(jnp.asarray(ax), trans_first=True)
        mat = mat_update_resolution(transform.matrix(), 1, res)
        slices = slice_acquisition(
            mat, vol_i[None, None], None, None, psf, (ss, ss), res_s / res,
            False, False,
        )
        # brain mask in stack geometry: acquire the binary mask volume
        # through the same PSF projector, threshold at half-occupancy
        m = slice_acquisition(
            mat, mask_vol, None, None, psf, (ss, ss), res_s / res, False, False
        )
        stack_masks.append(m > 0.5)
        stacks.append(
            Stack(
                slices=slices,
                mask=slices > 0,
                transformation=transform,
                resolution_x=res_s,
                resolution_y=res_s,
                thickness=s_thick,
                gap=gap,
            )
        )
    return stacks, gt, stack_masks, brain_mask


def stacks_to_slices(stacks: List[Stack]) -> List[Slice]:
    """Flatten stacks to the Slice list shape the trainer consumes,
    including the q99 intensity normalization the registration pipeline
    always applies before training (reference svort/inference.py:555-562) —
    the INR converges from softplus(0) ~ 0.7, so v must be O(1)."""
    slices = []
    for stack in stacks:
        mask_np = np.asarray(stack.mask)
        nonempty = mask_np.reshape(mask_np.shape[0], -1).any(1)
        q99 = jnp.quantile(stack.slices[stack.mask], 0.99)
        stack.slices = stack.slices / q99
        for i in np.nonzero(nonempty)[0]:
            slices.append(stack[int(i)])
    return slices


def psnr(a: np.ndarray, b: np.ndarray, mask: Optional[np.ndarray] = None) -> float:
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    if mask is not None:
        a = a[mask]
        b = b[mask]
    mse = np.mean((a - b) ** 2)
    peak = b.max() - b.min()
    return float(10 * np.log10(peak**2 / mse))
