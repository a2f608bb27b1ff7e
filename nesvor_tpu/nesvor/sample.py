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
    (reference sample.py:17-33). ``mats`` is (N, 3, 4) or None.

    The MC axis is evaluated in scanned groups so peak activation memory is
    bounded by ``batch * group`` points, not ``batch * n_samples`` (the
    default 32768 x 512 would need ~16 GB of width-256 activations)."""
    if n_samples <= 1:
        pts = sample_batch(xyz, mats, psf_sigma, n_samples, key)
        density, _, _ = inr_forward(params, cfg, bounding_box, pts)
        return density.mean(-1)

    # bound peak activation memory at ~2^21 points per group regardless of
    # n_samples' factorization (ceil division; the last group's extra
    # samples are valid MC draws, so averaging over n_groups*group is fine)
    cap = max(1, 2**21 // max(xyz.shape[0], 1))
    group = min(n_samples, cap)
    n_groups = -(-n_samples // group)

    def body(acc, k):
        pts = sample_batch(xyz, mats, psf_sigma, group, k)
        density, _, _ = inr_forward(params, cfg, bounding_box, pts)
        return acc + density.sum(-1), None

    acc, _ = jax.lax.scan(
        body, jnp.zeros(xyz.shape[0], jnp.float32), jax.random.split(key, n_groups)
    )
    return acc / (n_groups * group)


def _eval_points(
    model: INRModel,
    xyz: jnp.ndarray,
    mats,
    psf_sigma,
    n_samples: int,
    batch_size: int,
    key,
    dp_devices: int = 0,
) -> np.ndarray:
    """Evaluate points in fixed-size padded chunks (one compiled shape).
    ``mats`` is None or (N, 3, 4) per-point matrices.

    ``dp_devices > 1`` shards each chunk's point axis over a device mesh
    (inference data parallelism — the volume-sampling analog of train's
    --dp-devices; reference is single-GPU, SURVEY.md §2.3). Params are
    replicated. Results are bit-identical to the single-device path when
    ``batch_size`` is a multiple of ``dp_devices`` (the partitionable
    counter-based PRNG derives MC draws from array position); otherwise the
    batch is rounded up, which shifts chunk boundaries and therefore the
    per-chunk RNG streams — same distribution, different MC draws."""
    point_sharding = None
    if dp_devices and dp_devices > 1:
        import logging

        from ..parallel.dp import make_mesh
        from jax.sharding import NamedSharding, PartitionSpec as P

        if dp_devices > len(jax.devices()):
            raise ValueError(
                f"--dp-devices {dp_devices} > {len(jax.devices())} available "
                "devices"
            )
        if jax.process_count() > 1:
            # multi-host meshes need non-addressable shards that
            # jax.device_put cannot build here; inference is cheap enough
            # per host, so run it single-device rather than crash after
            # an expensive training phase
            logging.warning(
                "dp inference is single-process only; falling back to the "
                "single-device path"
            )
        else:
            mesh = make_mesh(jax.devices()[:dp_devices])
            point_sharding = NamedSharding(mesh, P("dp"))
            if batch_size % dp_devices:
                logging.info(
                    "inference_batch_size %d rounded up to a multiple of "
                    "dp_devices (MC draws will differ from the "
                    "single-device run at noise level)", batch_size,
                )
            batch_size = -(-batch_size // dp_devices) * dp_devices
    # keep the full point set in NUMPY: the total count is data-dependent
    # (mask nonzeros), so eager device slicing/padding on the (n, 3) array
    # compiles fresh dynamic_slice/concatenate programs per distinct count —
    # ~25 s of remote compiles on every reconstruct (bench r03). Only the
    # fixed-size padded chunks below ever become device arrays.
    xyz = np.asarray(xyz)
    if mats is not None:
        mats = np.asarray(mats)
    n = xyz.shape[0]
    # dispatch every chunk first, fetch after: JAX dispatch is async, so the
    # device pipelines chunk i+1 while the host would otherwise be blocked
    # fetching chunk i (each fetch costs a tunnel RTT on the remote path)
    pending = []
    for i in range(0, n, batch_size):
        chunk = xyz[i : i + batch_size]
        pad = batch_size - chunk.shape[0]
        if pad:
            chunk = np.concatenate(
                [chunk, np.zeros((pad, 3), chunk.dtype)], 0
            )
        m = None
        if mats is not None:
            m = mats[i : i + batch_size]
            if pad:
                m = np.concatenate(
                    [m, np.broadcast_to(np.eye(3, 4, dtype=m.dtype), (pad, 3, 4))], 0
                )
        if point_sharding is not None:
            chunk = jax.device_put(chunk, point_sharding)
            if m is not None:
                m = jax.device_put(m, point_sharding)
        key, k = jax.random.split(key)
        pending.append(
            _eval_chunk(
                model.params, model.cfg, model.bounding_box, chunk, psf_sigma,
                n_samples, k, m,
            )
        )
    out = np.empty(n, dtype=np.float32)
    for j, i in enumerate(range(0, n, batch_size)):
        hi = min(i + batch_size, n)
        out[i:hi] = np.asarray(pending[j])[: hi - i]
    return out


def sample_points(model: INRModel, xyz, args: Namespace) -> jnp.ndarray:
    # host-side reshape: callers pass arbitrary-count point sets, and an
    # eager device reshape would compile per distinct count (see _eval_points)
    xyz = np.asarray(xyz)
    shape = xyz.shape[:-1]
    xyz = xyz.reshape(-1, 3)
    batch_size = int(args.inference_batch_size)
    n_samples = (
        0 if getattr(args, "no_output_psf", False) else int(args.n_inference_samples)
    )
    n_samples = max(n_samples, 1)
    psf_sigma = resolution2sigma(float(args.output_resolution), isotropic=True)
    key = jax.random.PRNGKey(getattr(args, "seed", 0) or 0)
    out = _eval_points(
        model, xyz, None, psf_sigma, n_samples, batch_size, key,
        dp_devices=int(getattr(args, "dp_devices", 0) or 0),
    )
    return jnp.asarray(out.reshape(shape))


# per-phase wall times of the most recent sample_volume call, for bench
# telemetry (mirrors train.LAST_RUN_STATS): resample_s / xyz_s / eval_s /
# fill_s / n_voxels
LAST_SAMPLE_STATS: dict = {}


def sample_volume(model: INRModel, mask: Volume, args: Namespace) -> Volume:
    """Resample the mask to the output resolution and fill masked voxels from
    the INR (reference sample.py:10-14)."""
    import logging
    import time

    t0 = time.time()
    # host=True: the occupancy mask is a small binary volume, and the device
    # resample's only cost at this size is a first-run remote compile
    # (17.1 s in BENCH_r03 vs 0.02 s of numpy work) — host math is identical
    # (pinned by tests/test_image.py::test_resample_host_matches_device)
    img = mask.resample(args.output_resolution, None, host=True)
    t05 = time.time()
    xyz = img.xyz_masked  # numpy (count-dependent shape stays off-device)
    t1 = time.time()
    values = sample_points(model, xyz, args)
    t2 = time.time()
    # fill masked voxels host-side: values are already on host, and a device
    # scatter keyed on jnp.nonzero would compile per distinct mask count
    flat = np.zeros(img.image.size, dtype=np.float32)
    flat[np.asarray(img.mask).reshape(-1)] = np.asarray(values)
    img.image = jnp.asarray(flat.reshape(img.image.shape))
    t3 = time.time()
    LAST_SAMPLE_STATS.clear()
    LAST_SAMPLE_STATS.update(
        resample_s=round(t05 - t0, 2), xyz_s=round(t1 - t05, 2),
        eval_s=round(t2 - t1, 2), fill_s=round(t3 - t2, 2),
        n_voxels=int(xyz.shape[0]),
    )
    logging.debug("sample_volume: %s", LAST_SAMPLE_STATS)
    return img


def sample_slice(
    model: INRModel, slice: Slice, mask: Volume, args: Namespace
) -> Slice:
    """Simulate one slice from the INR (reference sample.py:36-53)."""
    out = slice.clone(zero=True)
    xyz = meshgrid(
        np.asarray(out.shape_xyz), np.asarray(out.resolution_xyz)
    ).reshape(-1, 3)
    # the in-mask test runs on device at the slice's full (stable) grid
    # shape; everything keyed on the data-dependent masked COUNT — nonzero,
    # gather, fill — happens host-side in numpy, because eager device ops
    # at count-dependent shapes compile a fresh program per slice
    m = np.asarray(
        mask.sample_points(transform_points(out.transformation, xyz)) > 0
    )
    if not m.any():
        return out
    n_samples = (
        1 if getattr(args, "no_output_psf", False) else int(args.n_inference_samples)
    )
    psf_sigma = jnp.asarray(
        resolution2sigma(np.asarray(out.resolution_xyz), isotropic=False)
    )
    key = jax.random.PRNGKey(getattr(args, "seed", 0) or 0)
    mats = np.asarray(out.transformation.matrix(trans_first=True))
    midx = np.nonzero(m)[0]
    xyz_masked = np.asarray(xyz)[midx]
    v = _eval_points(
        model,
        xyz_masked,
        np.broadcast_to(mats.reshape(-1, 3, 4), (xyz_masked.shape[0], 3, 4)),
        psf_sigma,
        n_samples,
        int(getattr(args, "inference_batch_size", 0) or 32768),
        key,
        dp_devices=int(getattr(args, "dp_devices", 0) or 0),
    )
    out.mask = jnp.asarray(m.reshape(tuple(out.mask.shape)))
    flat = np.zeros(int(np.prod(out.image.shape)), dtype=np.float32)
    flat[midx] = np.asarray(v)
    out.image = jnp.asarray(flat.reshape(out.image.shape))
    return out


def sample_slices(
    model: INRModel, slices: List[Slice], mask: Volume, args: Namespace
) -> List[Slice]:
    return [sample_slice(model, s, mask, args) for s in slices]
