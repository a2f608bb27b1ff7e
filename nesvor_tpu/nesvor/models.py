"""NeSVoR implicit-neural-representation models (pure-functional JAX).

Rebuild of reference nesvor/nesvor/models.py:72-384. The torch ``nn.Module``
state becomes explicit pytrees:

  * ``INRParams``: hash table (replaces tcnn.Encoding — see ops/hash_grid)
    + density MLP (replaces tcnn CutlassMLP / nn.Sequential,
    reference models.py:27-69).
  * ``NeSVoRParams``: per-slice learnable axis-angle poses (reference
    :202-219), slice embeddings (:222-225), slice scales ``logit_coef``
    (:226-229), slice log-variances (:230-233), sigma net (:237-246) and
    bias net (:248-258).

Mixed precision is TPU-native: fp32 master params, bfloat16 compute inside
the encoder+MLPs (replacing the reference's fp16 autocast + GradScaler —
bf16 needs no loss scaling), fp32 loss math.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.cell_grid import (
    cell_encode,
    init_cell_grid,
    make_cell_grid_spec,
)
from ..ops.fourier import fourier_encode, init_fourier_basis
from ..ops.hash_grid import (
    compute_level_resolutions,
    hash_encode,
    init_hash_table,
)
from ..transform import RigidTransform, ax_transform_points, mat_transform_points
from ..utils import resolution2sigma

# loss/regularization keys (reference models.py:14-19)
D_LOSS = "MSE"
S_LOSS = "logVar"
DS_LOSS = "MSE+logVar"
B_REG = "biasReg"
T_REG = "transReg"
I_REG = "imageReg"


# ---------------------------------------------------------------------------
# configs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class INRConfig:
    n_levels: int
    base_resolution: int
    level_resolutions: Tuple[int, ...]
    n_features_per_level: int = 2
    log2_hashmap_size: int = 19
    level_scale: float = 1.3819
    width: int = 64
    depth: int = 1
    n_features_z: int = 15
    compute_dtype: Any = jnp.bfloat16
    # "cellhash": fused cell-block layout, one 64B gather per point per level
    # (TPU-fast; dense levels keep exact Instant-NGP shared-vertex semantics,
    # hashed levels use per-cell corner blocks — see ops/cell_grid.py).
    # "hash": the reference vertex-hash layout (8 gathers; exact tcnn
    # semantics at every level).
    # "fourier": gather-free random Fourier features, one octave per grid
    # level (all-MXU; see ops/fourier.py) — pair with a wider/deeper MLP.
    encoder: str = "hash"
    fourier_dirs: int = 8
    # version marker for the fourier feature ordering: "halves" = [sin|cos]
    # full-width halves (current, see ops/fourier.py). Checkpoints saved
    # before this field existed used per-level [sin_l|cos_l] blocks; the
    # loader detects the missing key and permutes the density net's first
    # layer accordingly (cli/io.py).
    feature_layout: str = "halves"

    @property
    def table_size(self) -> int:
        return 2**self.log2_hashmap_size

    @property
    def cell_spec(self):
        return make_cell_grid_spec(
            self.level_resolutions, self.n_features_per_level, self.table_size
        )

    @property
    def features_per_level(self) -> int:
        """Feature block width per level in the encoding output (drives the
        bias head's low-frequency slice, reference models.py:343-349)."""
        if self.encoder == "fourier":
            return 2 * self.fourier_dirs
        return self.n_features_per_level

    @property
    def n_encoding_features_actual(self) -> int:
        return self.n_levels * self.features_per_level

    @property
    def n_encoding_features(self) -> int:
        return self.n_levels * self.n_features_per_level


@dataclass(frozen=True)
class NeSVoRConfig:
    inr: INRConfig
    n_slices: int
    n_samples: int = 256
    n_features_slice: int = 16
    n_levels_bias: int = 0
    no_transformation_optimization: bool = False
    no_slice_scale: bool = False
    no_pixel_variance: bool = False
    no_slice_variance: bool = False
    image_regularization: str = "edge"
    delta: float = 0.2  # multiplied by v_mean at build time (reference :189)
    # sigma/bias head MLP size; 0 = follow inr.width/depth (the reference
    # sizes every net from the same --width/--depth, models.py:118-119,
    # 243-256 — useful to decouple when the density net is widened for the
    # fourier encoder)
    head_width: int = 0
    head_depth: int = 0

    @property
    def head_size(self):
        return (
            self.head_width or self.inr.width,
            self.head_depth or self.inr.depth,
        )


def build_inr_config(bounding_box, args) -> INRConfig:
    """Derive hash-grid geometry from the bounding box (reference
    models.py:78-101): base resolution from the coarsest grid size, level
    count from the finest, both data-dependent and therefore host-side."""
    bb = np.asarray(bounding_box, dtype=np.float64)
    extent = float((bb[1] - bb[0]).max())
    base_resolution = int(math.ceil(extent / args.coarsest_resolution))
    n_levels = int(
        math.ceil(
            math.log2(extent / args.finest_resolution / base_resolution)
            / math.log2(args.level_scale)
            + 1
        )
    )
    compute_dtype = jnp.float32 if args.single_precision else jnp.bfloat16
    encoder = getattr(args, "encoder", "fourier")
    # width/depth 0 = encoder-appropriate auto sizing: the gather-free
    # fourier flagship feeds a wider/deeper MXU-friendly density MLP
    # (256x3, PERF.md round-2/3 studies), while the grid encoders keep the
    # reference sizing (64x1, reference cli/main.py --width/--depth).
    width = args.width or (256 if encoder == "fourier" else 64)
    depth = args.depth or (3 if encoder == "fourier" else 1)
    return INRConfig(
        encoder=encoder,
        n_levels=n_levels,
        base_resolution=base_resolution,
        level_resolutions=compute_level_resolutions(
            base_resolution, args.level_scale, n_levels
        ),
        n_features_per_level=args.n_features_per_level,
        log2_hashmap_size=args.log2_hashmap_size,
        level_scale=args.level_scale,
        width=width,
        depth=depth,
        n_features_z=args.n_features_z,
        compute_dtype=compute_dtype,
        fourier_dirs=getattr(args, "fourier_dirs", 8),
    )


# ---------------------------------------------------------------------------
# tiny MLPs
# ---------------------------------------------------------------------------


def mlp_init(
    key, n_in: int, n_out: int, width: int, depth: int, zero_last: bool = False
) -> Dict:
    """MLP with ``depth`` hidden layers of ``width`` (reference build_network,
    models.py:27-69). He-uniform init.

    ``zero_last`` zeroes the output layer — used for the variance/bias heads
    so they start flat (log_var = 0, log_bias = 0). The reference gets this
    behavior implicitly: its hash-grid features start at 1e-4, so the torch
    default-initialized heads see a near-constant input; the fourier encoder
    emits full-scale features from step 0, and a randomly-initialized
    variance head then weights pixels with random noise early in training,
    which can push the density net into the dead softplus-saturated zero
    optimum (measured: -21.8 dB with a 64x1 random-init head vs 19.3+ dB
    flat-start)."""
    dims = [n_in] + [width] * depth + [n_out]
    layers = []
    for i in range(len(dims) - 1):
        key, sub = jax.random.split(key)
        bound = 1.0 / math.sqrt(dims[i])
        if zero_last and i == len(dims) - 2:
            w = jnp.zeros((dims[i], dims[i + 1]), jnp.float32)
            b = jnp.zeros((dims[i + 1],), jnp.float32)
        else:
            w = jax.random.uniform(
                sub, (dims[i], dims[i + 1]), jnp.float32, -bound, bound
            )
            key, sub = jax.random.split(key)
            b = jax.random.uniform(
                sub, (dims[i + 1],), jnp.float32, -bound, bound
            )
        layers.append({"w": w, "b": b})
    return {"layers": layers}


def mlp_apply(params: Dict, x: jnp.ndarray, compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """ReLU MLP on the MXU.

    Hidden activations stay in ``compute_dtype`` end-to-end (the MXU still
    accumulates each dot in f32 internally; only the stored tensor is
    rounded). At the training batch (1M points x width 256) f32 hidden
    activations made the MLP stack bandwidth-bound at 37 GB/step — 80% of
    the whole step (profiled); bf16 halves that traffic. Matches the
    reference operating point (tiny-cuda-nn computes the whole MLP in fp16
    with fp32 accumulation). The final layer emits f32 for the loss heads.

    A fused Pallas kernel (ops/fused_mlp.py — the tcnn fully-fused-MLP
    analog: whole layer stack in VMEM per row tile, forward recompute in
    the backward) exists behind NESVOR_TPU_FUSED_MLP=1, but measures
    SLOWER than this XLA chain on the current toolchain (20.5 vs
    14.0 ms/step for the density net fwd+bwd at 1M rows; Mosaic does not
    overlap the tile DMAs with compute when dW accumulators live in
    VMEM-resident outputs), so the chain is the default."""
    import os

    if (
        compute_dtype == jnp.bfloat16
        and jax.default_backend() == "tpu"
        and x.shape[0] >= 2048
        and os.environ.get("NESVOR_TPU_FUSED_MLP")
    ):
        from ..ops.fused_mlp import fused_mlp

        return fused_mlp(params, x, compute_dtype)
    h = x.astype(compute_dtype)
    layers = params["layers"]
    for i, layer in enumerate(layers):
        last = i == len(layers) - 1
        h = (
            jnp.dot(
                h,
                layer["w"].astype(compute_dtype),
                preferred_element_type=jnp.float32 if last else compute_dtype,
            )
            + layer["b"].astype(jnp.float32 if last else compute_dtype)
        )
        if not last:
            h = jax.nn.relu(h)
    return h  # fp32 out


# ---------------------------------------------------------------------------
# INR
# ---------------------------------------------------------------------------


def init_inr(key, cfg: INRConfig) -> Dict:
    k1, k2 = jax.random.split(key)
    if cfg.encoder == "cellhash":
        enc = {"cell": init_cell_grid(k1, cfg.cell_spec)}
    elif cfg.encoder == "hash":
        enc = {
            "table": init_hash_table(
                k1, cfg.n_levels, cfg.table_size, cfg.n_features_per_level
            )
        }
    elif cfg.encoder == "fourier":
        # fixed basis (frozen in the optimizer, like the grid hash function)
        enc = {
            "fourier_basis": init_fourier_basis(
                k1, cfg.level_resolutions, cfg.fourier_dirs
            )
        }
    else:
        raise ValueError(f"unknown encoder {cfg.encoder!r}")
    return {
        **enc,
        "density_net": mlp_init(
            k2,
            cfg.n_encoding_features_actual,
            1 + cfg.n_features_z,
            cfg.width,
            cfg.depth,
        ),
    }


def inr_forward(
    params: Dict, cfg: INRConfig, bounding_box: jnp.ndarray, x: jnp.ndarray
):
    """x (..., 3) world coords -> (density (...,), pe (..., L*F), z (..., 1+nz))
    (reference INR.forward, models.py:142-152)."""
    prefix = x.shape[:-1]
    xn = (x.reshape(-1, 3) - bounding_box[0]) / (bounding_box[1] - bounding_box[0])
    if cfg.encoder == "cellhash":
        pe = cell_encode(
            params["cell"], xn, cfg.cell_spec, compute_dtype=cfg.compute_dtype
        )
    elif cfg.encoder == "fourier":
        pe = fourier_encode(
            jax.lax.stop_gradient(params["fourier_basis"]),
            xn,
            cfg.fourier_dirs,
            compute_dtype=cfg.compute_dtype,
        )
    else:
        pe = hash_encode(
            params["table"].astype(cfg.compute_dtype), xn, cfg.level_resolutions
        )
    z = mlp_apply(params["density_net"], pe, cfg.compute_dtype)
    density = jax.nn.softplus(z[..., 0].astype(jnp.float32)).reshape(prefix)
    return density, pe, z


def sample_batch(
    xyz: jnp.ndarray,
    transformation: Optional[jnp.ndarray],
    psf_sigma,
    n_samples: int,
    key: Optional[jax.Array],
    trans_first: bool = True,
) -> jnp.ndarray:
    """Monte-Carlo PSF point sampling (reference INR.sample_batch,
    models.py:154-174). ``transformation`` is an optional (N or 1, 3, 4)
    matrix batch; ``psf_sigma`` scalar or (N, 3)."""
    if n_samples > 1:
        if isinstance(psf_sigma, jnp.ndarray) and psf_sigma.ndim > 1:
            psf_sigma = psf_sigma.reshape(-1, 1, 3)
        xyz_psf = jax.random.normal(key, (xyz.shape[0], n_samples, 3), xyz.dtype)
        xyz = xyz[:, None] + xyz_psf * psf_sigma
    else:
        xyz = xyz[:, None]
    if transformation is not None:
        xyz = mat_transform_points(transformation[:, None], xyz, trans_first)
    return xyz


# ---------------------------------------------------------------------------
# NeSVoR training model
# ---------------------------------------------------------------------------


def init_nesvor(
    key,
    cfg: NeSVoRConfig,
    transformation: RigidTransform,
    resolution: jnp.ndarray,
    v_mean: float,
) -> Tuple[Dict, Dict]:
    """Returns (params, consts): params are trainable leaves; consts hold the
    initial poses, PSF sigmas, bounding box and delta (registered buffers in
    the reference, models.py:202-258)."""
    axisangle = transformation.axisangle(trans_first=True)
    keys = jax.random.split(key, 5)
    params = {
        "inr": None,  # filled below
        "axisangle": jnp.asarray(axisangle, jnp.float32),
    }
    if not cfg.no_slice_scale:
        params["logit_coef"] = jnp.zeros(cfg.n_slices, jnp.float32)
    if not cfg.no_slice_variance:
        params["log_var_slice"] = jnp.zeros(cfg.n_slices, jnp.float32)
    if cfg.n_features_slice:
        params["slice_embedding"] = jax.random.normal(
            keys[0], (cfg.n_slices, cfg.n_features_slice), jnp.float32
        )
    params["inr"] = init_inr(keys[1], cfg.inr)
    if not cfg.no_pixel_variance:
        params["sigma_net"] = mlp_init(
            keys[2],
            cfg.n_features_slice + cfg.inr.n_features_z,
            1,
            *cfg.head_size,
            zero_last=True,
        )
    if cfg.n_levels_bias:
        params["b_net"] = mlp_init(
            keys[3],
            cfg.n_levels_bias * cfg.inr.features_per_level + cfg.n_features_slice,
            1,
            *cfg.head_size,
            zero_last=True,
        )
    consts = {
        "axisangle_init": jnp.asarray(axisangle, jnp.float32),
        "psf_sigma": jnp.asarray(
            resolution2sigma(resolution, isotropic=False), jnp.float32
        ),
        "delta": jnp.asarray(cfg.delta * v_mean, jnp.float32),
    }
    return params, consts


def bias_features(pe, inr_cfg: INRConfig, n_levels_bias: int) -> jnp.ndarray:
    """The encoding features of the first ``n_levels_bias`` (coarsest) levels,
    for the bias-field head (reference models.py:343-349). Layout-aware: the
    grid encoders emit per-level blocks (a prefix slice), the fourier encoder
    emits ``[sin | cos]`` halves (see ops/fourier.py) so the low-frequency
    features are a prefix of each half."""
    if inr_cfg.encoder == "fourier":
        half = inr_cfg.n_levels * inr_cfg.fourier_dirs
        nb = n_levels_bias * inr_cfg.fourier_dirs
        return jnp.concatenate(
            [pe[..., :nb], pe[..., half : half + nb]], axis=-1
        )
    return pe[..., : n_levels_bias * inr_cfg.features_per_level]


def _image_regularization(kind: str, density, xyz, delta):
    """MC-pair regularizers via the flip trick (reference models.py:366-384)."""
    d_density = density - jnp.flip(density, axis=1)
    dx2 = jnp.sum((xyz - jnp.flip(xyz, axis=1)) ** 2, -1) + 1e-6
    if kind == "TV":
        return jnp.abs(d_density / jnp.sqrt(dx2)).mean()
    if kind == "edge":
        dd2_dx2 = d_density**2 / dx2 / (delta * delta)
        return delta * (jnp.sqrt(1 + dd2_dx2).mean() - 1)
    if kind == "L2":
        return (d_density**2 / dx2).mean()
    raise ValueError(kind)


def _trans_loss(axisangle, axisangle_init):
    """Pose deviation regularizer (reference models.py:357-363)."""
    x = RigidTransform(axisangle, trans_first=True)
    y = RigidTransform(axisangle_init, trans_first=True)
    err = y.inv().compose(x).axisangle(trans_first=True)
    return jnp.mean(err[:, :3] ** 2) + 1e-3 * jnp.mean(err[:, 3:] ** 2)


def nesvor_loss(
    params: Dict,
    consts: Dict,
    cfg: NeSVoRConfig,
    bounding_box: jnp.ndarray,
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,
) -> Dict[str, jnp.ndarray]:
    """One training forward pass -> loss dict (reference NeSVoR.forward,
    models.py:260-327)."""
    xyz = batch["xyz"]  # (B, 3)
    v = batch["v"]  # (B,)
    slice_idx = batch["slice_idx"]  # (B,) int32
    B = xyz.shape[0]
    S = cfg.n_samples

    # MC PSF sampling (reference :267-273)
    xyz_psf = jax.random.normal(key, (B, S, 3), xyz.dtype)
    psf_sigma = consts["psf_sigma"][slice_idx][:, None]  # (B, 1, 3)
    # per-slice pose applied to jittered points; grads flow into axisangle
    t = params["axisangle"][slice_idx][:, None]  # (B, 1, 6)
    if cfg.no_transformation_optimization:
        t = jax.lax.stop_gradient(t)
    xyz_t = ax_transform_points(t, xyz[:, None] + xyz_psf * psf_sigma, True)

    # INR + heads (reference net_forward, :329-355)
    density, pe, z = inr_forward(params["inr"], cfg.inr, bounding_box, xyz_t)
    density = density.reshape(B, S)

    zs = []
    if cfg.n_features_slice:
        se = params["slice_embedding"][slice_idx]  # (B, E)
        se_flat = jnp.broadcast_to(
            se[:, None], (B, S, cfg.n_features_slice)
        ).reshape(B * S, -1)
        zs.append(se_flat)

    results: Dict[str, jnp.ndarray] = {}
    if cfg.n_levels_bias:
        pe_bias = bias_features(pe, cfg.inr, cfg.n_levels_bias)
        log_bias = mlp_apply(
            params["b_net"],
            jnp.concatenate(zs + [pe_bias.astype(jnp.float32)], -1),
            cfg.inr.compute_dtype,
        )
        results["log_bias"] = log_bias.reshape(B, S)
    if not cfg.no_pixel_variance:
        log_var = mlp_apply(
            params["sigma_net"],
            jnp.concatenate(zs + [z[..., 1:].astype(jnp.float32)], -1),
            cfg.inr.compute_dtype,
        )
        results["log_var"] = log_var.reshape(B, S)

    # imaging model (reference :279-314)
    if "log_bias" in results:
        log_bias = results["log_bias"].astype(jnp.float32)
        bias = jnp.exp(log_bias)
        bias_detach = jax.lax.stop_gradient(bias)
    else:
        log_bias = 0.0
        bias = 1.0
        bias_detach = 1.0
    if "log_var" in results:
        log_var = results["log_var"].astype(jnp.float32)
        var = jnp.exp(log_var)
    else:
        var = 1.0

    if not cfg.no_slice_scale:
        c = jax.nn.softmax(params["logit_coef"], 0)[slice_idx] * cfg.n_slices
    else:
        c = 1.0

    v_out = (bias * density).mean(-1)
    v_out = c * v_out
    if not cfg.no_pixel_variance:
        var = (bias_detach * var).mean(-1)
        var = jax.lax.stop_gradient(c) * var
        var = var**2
    if not cfg.no_slice_variance:
        var = var + jnp.exp(params["log_var_slice"])[slice_idx]

    # losses (reference :316-326)
    losses = {D_LOSS: ((v_out - v) ** 2 / (2 * var)).mean()}
    if not (cfg.no_pixel_variance and cfg.no_slice_variance):
        losses[S_LOSS] = 0.5 * jnp.log(var).mean()
        losses[DS_LOSS] = losses[D_LOSS] + losses[S_LOSS]
    if not cfg.no_transformation_optimization:
        losses[T_REG] = _trans_loss(params["axisangle"], consts["axisangle_init"])
    if cfg.n_levels_bias:
        losses[B_REG] = jnp.mean(log_bias) ** 2
    losses[I_REG] = _image_regularization(
        cfg.image_regularization, density, xyz_t, consts["delta"]
    )
    return losses
