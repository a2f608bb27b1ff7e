"""SVoRT v1/v2 slice-to-volume registration transformers (pure JAX).

Rebuild of reference nesvor/svort/models.py:19-457. Parameters are flat
torch-named dicts (see attention.py), so the pretrained Zenodo torch
checkpoints convert by pure re-serialization.

  * ``SVoRT`` (v1, reference :19-118): 3 stacked SVRtransformer iterations
    (9-point pose tokens + 2 position dims, d_model 512, 8 heads, 4 layers,
    ResNet-50 slice encoder); per iteration the predicted poses drive a
    no-grad PSF reconstruction, then an SRRtransformer IQA reweighting with
    a 2-iteration CG SRR.
  * ``SVoRTv2`` (reference :121-210): first iteration uses svrnet1
    (1-channel), later iterations svrnet2 (2-channel, 8 layers) with a
    per-slice IQA score head; SRR(n_iter=2, use_CG=True) weighted by scores.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.slice_acq import slice_acquisition
from ..transform import (
    RigidTransform,
    ax_update_resolution,
    mat2axisangle,
    mat2point,
    mat_update_resolution,
    point2mat,
)
from .attention import (
    init_linear,
    init_positional_encoding,
    init_resnet,
    init_transformer_encoder,
    linear,
    positional_encoding,
    resnet,
    transformer_encoder,
)
from .srr import SRR, PSFreconstruction

Params = Dict[str, jnp.ndarray]


def _pos_augment(slices: jnp.ndarray, slices_est: Optional[jnp.ndarray], res_d_in: int):
    """Append simulated slices + normalized x/y position channels
    (reference models.py:297-330)."""
    n, _, h, w = slices.shape
    y = jnp.linspace(-(h - 1) / 256, (h - 1) / 256, h)
    x = jnp.linspace(-(w - 1) / 256, (w - 1) / 256, w)
    yy, xx = jnp.meshgrid(y, x, indexing="ij")
    yb = jnp.broadcast_to(yy[None, None], (n, 1, h, w))
    xb = jnp.broadcast_to(xx[None, None], (n, 1, h, w))
    if slices_est is not None:
        return jnp.concatenate([slices, slices_est, yb, xb], 1)
    if res_d_in == 3:
        return jnp.concatenate([slices, yb, xb], 1)
    return jnp.concatenate([slices, 0 * slices, yb, xb], 1)


class SVRtransformer:
    """Pose-residual transformer (reference models.py:269-363)."""

    def __init__(
        self,
        n_res=34,
        n_layers=4,
        n_head=4,
        d_in=8,
        d_out=6,
        d_model=256,
        d_inner=512,
        res_d_in=3,
        res_scale=1,
    ):
        self.n_res = n_res
        self.n_layers = n_layers
        self.n_head = n_head
        self.d_in = d_in
        self.d_out = d_out
        self.d_model = d_model
        self.d_inner = d_inner
        self.res_d_in = res_d_in
        self.res_scale = res_scale

    def init(self, params: Params, key, prefix: str) -> None:
        k1, k2, k3 = jax.random.split(key, 3)
        init_resnet(
            params, k1, f"{prefix}.img_encoder", self.n_res, self.d_model, self.res_d_in
        )
        init_positional_encoding(params, f"{prefix}.pos_emb", self.d_model, self.d_in)
        init_transformer_encoder(
            params, k2, f"{prefix}.encoder", self.n_layers, self.n_head,
            self.d_model // self.n_head, self.d_model // self.n_head,
            self.d_model, self.d_inner,
        )
        init_linear(params, k3, f"{prefix}.fc", self.d_model, self.d_out)

    def __call__(self, params, prefix, theta, slices, pos, volume, psf_params):
        y = None
        if volume is not None:
            transforms = mat_update_resolution(
                point2mat(theta), 1, psf_params["res_r"]
            )
            y = jax.lax.stop_gradient(
                slice_acquisition(
                    transforms, volume, None, None, psf_params["psf"],
                    psf_params["slice_shape"],
                    psf_params["res_s"] / psf_params["res_r"],
                    False, psf_params["interp_psf"],
                    slice_chunk=psf_params.get("slice_chunk"),
                )
            )
        pos_full = jnp.concatenate((theta, pos), -1)
        pe = positional_encoding(params, f"{prefix}.pos_emb", pos_full, self.d_model)
        aug = _pos_augment(slices, y, self.res_d_in)
        x = resnet(params, f"{prefix}.img_encoder", aug, self.n_res)
        x, attn = transformer_encoder(
            params, f"{prefix}.encoder", x, pe,
            self.n_layers, self.n_head,
            self.d_model // self.n_head, self.d_model // self.n_head,
        )
        x = linear(params, f"{prefix}.fc", x)
        return theta + x * self.res_scale, attn


class SVRtransformerV2(SVRtransformer):
    """Adds a per-slice IQA score head; gelu/post-norm encoder
    (reference models.py:366-457)."""

    def __init__(
        self,
        n_res=50,
        n_layers=4,
        n_head=4,
        d_in=8,
        d_out=6,
        d_model=256,
        d_inner=512,
        n_channels=2,
    ):
        super().__init__(
            n_res, n_layers, n_head, d_in, d_out, d_model, d_inner,
            res_d_in=n_channels + 2,
        )
        self.n_channels = n_channels

    def init(self, params: Params, key, prefix: str) -> None:
        k0, k1 = jax.random.split(key)
        super().init(params, k0, prefix)
        init_linear(params, k1, f"{prefix}.fc_score", self.d_model, 1)

    def __call__(self, params, prefix, theta, slices, pos, volume, psf_params):
        y = None
        if volume is not None:
            transforms = mat_update_resolution(
                point2mat(theta), 1, psf_params["res_r"]
            )
            y = jax.lax.stop_gradient(
                slice_acquisition(
                    transforms, volume, None, None, psf_params["psf"],
                    psf_params["slice_shape"],
                    psf_params["res_s"] / psf_params["res_r"],
                    False, psf_params["interp_psf"],
                    slice_chunk=psf_params.get("slice_chunk"),
                )
            )
        pos_full = jnp.concatenate((theta, pos), -1)
        pe = positional_encoding(params, f"{prefix}.pos_emb", pos_full, self.d_model)
        n, _, h, w = slices.shape
        yy = jnp.linspace(-(h - 1) / 256, (h - 1) / 256, h)
        xx = jnp.linspace(-(w - 1) / 256, (w - 1) / 256, w)
        gy, gx = jnp.meshgrid(yy, xx, indexing="ij")
        chans = [slices] if y is None else [slices, y]
        chans += [
            jnp.broadcast_to(gy[None, None], (n, 1, h, w)),
            jnp.broadcast_to(gx[None, None], (n, 1, h, w)),
        ]
        aug = jnp.concatenate(chans, 1)
        x = resnet(params, f"{prefix}.img_encoder", aug, self.n_res)
        x, attn = transformer_encoder(
            params, f"{prefix}.encoder", x, pe,
            self.n_layers, self.n_head,
            self.d_model // self.n_head, self.d_model // self.n_head,
            activation_attn="softmax", activation_ff="gelu", prenorm=False,
        )
        dtheta = linear(params, f"{prefix}.fc", x)
        score = linear(params, f"{prefix}.fc_score", x)
        score = jax.nn.softmax(score, axis=0) * score.shape[0]
        score = jnp.clip(score, max=3.0)
        return theta + dtheta, score, attn


class SRRtransformer:
    """IQA reweighting transformer + 2-iteration CG SRR
    (reference models.py:216-266)."""

    def __init__(
        self, n_res=34, n_layers=4, n_head=4, d_in=8, d_out=1, d_model=256,
        d_inner=512, differentiable_srr=False,
    ):
        self.n_res = n_res
        self.n_layers = n_layers
        self.n_head = n_head
        self.d_in = d_in
        self.d_out = d_out
        self.d_model = d_model
        self.d_inner = d_inner
        self.srr = SRR(n_iter=2, use_CG=True, differentiable=differentiable_srr)

    def init(self, params: Params, key, prefix: str) -> None:
        k1, k2, k3 = jax.random.split(key, 3)
        init_resnet(params, k1, f"{prefix}.img_encoder", self.n_res, self.d_model, 2)
        init_positional_encoding(params, f"{prefix}.pos_emb", self.d_model, self.d_in)
        init_transformer_encoder(
            params, k2, f"{prefix}.encoder", self.n_layers, self.n_head,
            self.d_model // self.n_head, self.d_model // self.n_head,
            self.d_model, self.d_inner,
        )
        init_linear(params, k3, f"{prefix}.fc", self.d_model, self.d_out)

    def __call__(self, params, prefix, theta, transforms, slices, volume, psf_params, idx):
        slices_est = slice_acquisition(
            transforms, volume, None, None, psf_params["psf"],
            psf_params["slice_shape"],
            psf_params["res_s"] / psf_params["res_r"],
            False, psf_params["interp_psf"],
            slice_chunk=psf_params.get("slice_chunk"),
        )
        idx_full = jnp.concatenate((theta, idx), -1)
        x_img = jnp.concatenate((slices, slices_est), 1)
        pe = positional_encoding(params, f"{prefix}.pos_emb", idx_full, self.d_model)
        x = resnet(params, f"{prefix}.img_encoder", x_img, self.n_res)
        x, _ = transformer_encoder(
            params, f"{prefix}.encoder", x, pe,
            self.n_layers, self.n_head,
            self.d_model // self.n_head, self.d_model // self.n_head,
        )
        x = linear(params, f"{prefix}.fc", x)
        x = jax.nn.softmax(x, axis=0) * x.shape[0]
        x = jnp.clip(x, max=3.0)
        volume = self.srr(
            transforms, slices, volume, psf_params, x.reshape(-1, 1, 1, 1)
        )
        return volume, x


class SVoRT:
    """v1: 3 SVRtransformer iterations + SRRtransformer IQA
    (reference models.py:19-118)."""

    version = "v1"

    def __init__(self, n_iter=3, iqa=True, vol=True, pe=True,
                 differentiable_srr=False):
        self.n_iter = n_iter
        self.vol = vol
        self.pe = pe
        self.iqa = iqa and vol
        self.differentiable_srr = differentiable_srr
        self.attn = None
        self.iqa_score = None
        self.svrnet = [
            SVRtransformer(
                n_res=50,
                n_layers=4,
                n_head=4 * 2,
                d_in=9 + 2,
                d_out=9,
                d_model=256 * 2,
                d_inner=512 * 2,
                res_d_in=4 if (i > 0 and vol) else 3,
            )
            for i in range(n_iter)
        ]
        if iqa:
            self.srrnet = SRRtransformer(
                n_res=34, n_layers=4, n_head=4, d_in=8, d_out=1,
                d_model=256, d_inner=512,
                differentiable_srr=differentiable_srr,
            )

    def init(self, key) -> Params:
        params: Params = {}
        keys = jax.random.split(key, self.n_iter + 1)
        for i, net in enumerate(self.svrnet):
            net.init(params, keys[i], f"svrnet.{i}")
        if self.iqa:
            self.srrnet.init(params, keys[-1], "srrnet")
        return params

    def __call__(self, params: Params, data: Dict):
        psf_params = {
            "psf": data["psf_rec"],
            "slice_shape": data["slice_shape"],
            "interp_psf": False,
            "res_s": data["resolution_slice"],
            "res_r": data["resolution_recon"],
            "s_thick": data["slice_thickness"],
            "volume_shape": data["volume_shape"],
            # present only on inference-scale inputs (run_model*): bounds
            # the projector programs' transient working set
            "slice_chunk": data.get("slice_chunk"),
        }
        transforms = RigidTransform(data["transforms"])
        stacks = data["stacks"]
        positions = data["positions"]

        thetas = []
        volumes = []
        trans = []

        if not self.pe:
            transforms = RigidTransform(transforms.axisangle() * 0)
            positions = positions * 0 + data["slice_thickness"]

        theta = mat2point(
            transforms.matrix(), stacks.shape[-1], stacks.shape[-2],
            psf_params["res_s"],
        )
        volume = None
        attn = None

        for i in range(self.n_iter):
            theta, attn = self.svrnet[i](
                params,
                f"svrnet.{i}",
                theta,
                stacks,
                positions,
                None if ((volume is None) or (not self.vol)) else jax.lax.stop_gradient(volume),
                psf_params,
            )
            thetas.append(theta)
            _trans = RigidTransform(point2mat(theta))
            trans.append(_trans)

            mat = mat_update_resolution(
                jax.lax.stop_gradient(_trans.matrix()), 1, psf_params["res_r"]
            )
            volume = PSFreconstruction(mat, stacks, None, None, psf_params)
            ax = mat2axisangle(_trans.matrix())
            ax = ax_update_resolution(ax, 1, psf_params["res_s"])
            if self.iqa:
                volume, iqa_score = self.srrnet(
                    params, "srrnet", ax, mat, stacks, volume, psf_params, positions
                )
                self.iqa_score = iqa_score
            volumes.append(volume)

        self.attn = attn
        return trans, volumes, thetas


class SVoRTv2:
    """v2: svrnet1 (first iter) + svrnet2 (later iters) + score-weighted SRR
    (reference models.py:121-210)."""

    version = "v2"

    def __init__(self, n_iter=4, iqa=True, vol=True, pe=True,
                 differentiable_srr=False):
        self.n_iter = n_iter
        self.vol = vol
        self.pe = pe
        self.iqa = iqa and vol
        self.attn = None
        self.iqa_score = None
        self.svrnet1 = SVRtransformerV2(
            n_layers=4, n_head=4 * 2, d_in=9 + 2, d_out=9,
            d_model=256 * 2, d_inner=512 * 2, n_channels=1,
        )
        self.svrnet2 = SVRtransformerV2(
            n_layers=4 * 2, n_head=4 * 2, d_in=9 + 2, d_out=9,
            d_model=256 * 2, d_inner=512 * 2, n_channels=2,
        )
        if self.iqa:
            self.srr = SRR(n_iter=2, use_CG=True,
                           differentiable=differentiable_srr)

    def init(self, key) -> Params:
        params: Params = {}
        k1, k2 = jax.random.split(key)
        self.svrnet1.init(params, k1, "svrnet1")
        self.svrnet2.init(params, k2, "svrnet2")
        return params

    def __call__(self, params: Params, data: Dict):
        psf_params = {
            "psf": data["psf_rec"],
            "slice_shape": data["slice_shape"],
            "interp_psf": False,
            "res_s": data["resolution_slice"],
            "res_r": data["resolution_recon"],
            "s_thick": data["slice_thickness"],
            "volume_shape": data["volume_shape"],
            # present only on inference-scale inputs (run_model*): bounds
            # the projector programs' transient working set
            "slice_chunk": data.get("slice_chunk"),
        }
        transforms = RigidTransform(data["transforms"])
        stacks = data["stacks"]
        positions = data["positions"]

        thetas = []
        volumes = []
        trans = []

        if not self.pe:
            transforms = RigidTransform(transforms.axisangle() * 0)
            positions = positions * 0 + data["slice_thickness"]

        theta = mat2point(
            transforms.matrix(), stacks.shape[-1], stacks.shape[-2],
            psf_params["res_s"],
        )
        volume = None
        attn = None

        for i in range(self.n_iter):
            net, prefix = (self.svrnet2, "svrnet2") if i else (self.svrnet1, "svrnet1")
            theta, iqa_score, attn = net(
                params,
                prefix,
                theta,
                stacks,
                positions,
                None if ((volume is None) or (not self.vol)) else jax.lax.stop_gradient(volume),
                psf_params,
            )
            thetas.append(theta)
            _trans = RigidTransform(point2mat(theta))
            trans.append(_trans)
            mat = mat_update_resolution(
                jax.lax.stop_gradient(_trans.matrix()), 1, psf_params["res_r"]
            )
            volume = PSFreconstruction(mat, stacks, None, None, psf_params)
            if self.iqa:
                volume = self.srr(
                    mat, stacks, volume, psf_params, iqa_score.reshape(-1, 1, 1, 1)
                )
                self.iqa_score = iqa_score
            volumes.append(volume)
        self.attn = attn
        return trans, volumes, thetas


# ---------------------------------------------------------------------------
# model runners (reference inference.py:67-173)
# ---------------------------------------------------------------------------


def run_model(transforms, stacks, model, params, res_s, s_thick, res_r):
    """v1: run stacks in triplets with 2 anchor stacks, rotation-averaged
    stack correction (reference inference.py:67-131)."""
    from ..utils import get_PSF
    from .inference import _SLICE_CHUNK, average_rotation, svort_volume_shape

    slice_shape = stacks[0].shape[-2:]
    positions = [
        jnp.arange(s.shape[0], dtype=jnp.float32) - s.shape[0] // 2 for s in stacks
    ]

    transforms_out = []
    volume = None
    n_run = max(1, len(stacks) - 2)
    psf = jnp.asarray(
        get_PSF(res_ratio=(res_s / res_r, res_s / res_r, s_thick / res_r))
    )
    for j in range(n_run):
        idxes = [0, 1, j + 2] if j > 0 else list(range(min(3, len(stacks))))
        data = {
            "psf_rec": psf,
            "slice_shape": slice_shape,
            "resolution_slice": res_s,
            "resolution_recon": res_r,
            "slice_thickness": s_thick,
            "volume_shape": svort_volume_shape(res_r),
            "slice_chunk": _SLICE_CHUNK,
            "transforms": RigidTransform.cat(
                [transforms[idx] for idx in idxes]
            ).matrix(),
            "stacks": jnp.concatenate([stacks[idx] for idx in idxes], axis=0),
            "positions": jnp.concatenate(
                [
                    jnp.stack(
                        (positions[i], jnp.ones_like(positions[i]) * k), -1
                    )
                    for k, i in enumerate(idxes)
                ],
                axis=0,
            ),
        }
        t_out, v_out, _ = model(params, data)
        t_out = t_out[-1]

        if j == 0:
            volume = v_out[-1]

        pos_np = np.asarray(data["positions"][:, -1])
        transforms_diff = []
        for ns in range(len(idxes)):
            idx = jnp.asarray(np.nonzero(pos_np == ns)[0])
            if j > 0 and ns != 2:  # anchor stack
                diff = transforms_out[ns].compose(t_out[idx].inv())
                diff_ax = diff.axisangle()
                mid = diff_ax.shape[0] // 2
                transforms_diff.append(diff_ax[mid - 3 : mid + 3])
                continue
            transforms_out.append(t_out[idx])  # new stack
            if j > 0:
                diff_ax = jnp.concatenate(transforms_diff, 0)
                meanT = diff_ax[:, 3:].mean(0, keepdims=True)
                meanR = average_rotation(diff_ax[:, :3])
                diff_mean = jnp.concatenate((meanR, meanT), -1)
                transforms_out[-1] = RigidTransform(diff_mean).compose(
                    transforms_out[-1]
                )
    return transforms_out, volume


def run_model_all_stack(transforms, stacks, model, params, res_s, s_thick, res_r):
    """v2: all stacks at once (reference inference.py:134-173)."""
    from ..utils import get_PSF
    from .inference import _SLICE_CHUNK, svort_volume_shape

    slice_shape = stacks[0].shape[-2:]
    positions = jnp.concatenate(
        [
            jnp.stack(
                (
                    jnp.arange(s.shape[0], dtype=jnp.float32) - s.shape[0] // 2,
                    jnp.full((s.shape[0],), i, dtype=jnp.float32),
                ),
                axis=-1,
            )
            for i, s in enumerate(stacks)
        ],
        axis=0,
    )
    data = {
        "psf_rec": jnp.asarray(
            get_PSF(res_ratio=(res_s / res_r, res_s / res_r, s_thick / res_r))
        ),
        "slice_shape": slice_shape,
        "resolution_slice": res_s,
        "resolution_recon": res_r,
        "slice_thickness": s_thick,
        "volume_shape": svort_volume_shape(res_r),
        "slice_chunk": _SLICE_CHUNK,
        "transforms": RigidTransform.cat(transforms).matrix(),
        "stacks": jnp.concatenate(stacks, axis=0),
        "positions": positions,
    }
    t_out, v_out, _ = model(params, data)
    pos_np = np.asarray(positions[:, -1])
    transforms_out = [
        t_out[-1][jnp.asarray(np.nonzero(pos_np == i)[0])] for i in range(len(stacks))
    ]
    return transforms_out, v_out[-1]
