"""Transformer encoder + ResNet backbone for SVoRT (pure JAX).

Rebuild of reference nesvor/svort/attention.py:8-567: multi-head
self-attention over slice tokens (single batch), learnable log-spaced
sin/cos positional encoding over the 11 pose dims, torchvision-style
ResNet-34/50 slice encoder with BatchNorm(track_running_stats=False)
(i.e. batch statistics at eval, reference :241), and the exact entmax15
sparse attention activation (:257-567) with its analytic gradient.

Parameters live in a FLAT dict keyed by the torch ``state_dict`` names
(e.g. ``model.layer1.0.conv1.weight``). This makes the Zenodo-checkpoint
converter a pure re-serialization: torch conv weights are (O, I, kh, kw),
which ``lax.conv_general_dilated`` consumes natively with OIHW dimension
numbers; linear weights are (out, in) applied as ``x @ w.T``.
All matmuls/convs run in fp32 (registration accuracy matters more than
throughput here; slice token counts are only a few hundred).
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, jnp.ndarray]


# ---------------------------------------------------------------------------
# primitive layers (flat-name param convention)
# ---------------------------------------------------------------------------


def _kaiming_normal(key, shape, fan_out_mode=True):
    # torch kaiming_normal_(mode="fan_out", nonlinearity="relu") for convs
    fan = shape[0] * shape[2] * shape[3] if fan_out_mode else np.prod(shape[1:])
    std = math.sqrt(2.0 / fan)
    return jax.random.normal(key, shape, jnp.float32) * std


def init_linear(params: Params, key, name: str, d_in: int, d_out: int) -> None:
    k1, k2 = jax.random.split(key)
    bound = 1.0 / math.sqrt(d_in)
    params[f"{name}.weight"] = jax.random.uniform(
        k1, (d_out, d_in), jnp.float32, -bound, bound
    )
    params[f"{name}.bias"] = jax.random.uniform(
        k2, (d_out,), jnp.float32, -bound, bound
    )


def linear(params: Params, name: str, x: jnp.ndarray) -> jnp.ndarray:
    return x @ params[f"{name}.weight"].T + params[f"{name}.bias"]


def init_conv(params: Params, key, name: str, d_in, d_out, k) -> None:
    params[f"{name}.weight"] = _kaiming_normal(key, (d_out, d_in, k, k))


def conv2d(params: Params, name: str, x, stride=1, padding=0) -> jnp.ndarray:
    return jax.lax.conv_general_dilated(
        x,
        params[f"{name}.weight"],
        window_strides=(stride, stride),
        padding=[(padding, padding)] * 2,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


def init_bn(params: Params, name: str, dim: int) -> None:
    params[f"{name}.weight"] = jnp.ones(dim, jnp.float32)
    params[f"{name}.bias"] = jnp.zeros(dim, jnp.float32)


def batch_norm(params: Params, name: str, x: jnp.ndarray, eps=1e-5) -> jnp.ndarray:
    """BatchNorm2d with track_running_stats=False: always batch statistics
    (reference attention.py:241)."""
    mean = x.mean((0, 2, 3), keepdims=True)
    var = x.var((0, 2, 3), keepdims=True)
    xn = (x - mean) * jax.lax.rsqrt(var + eps)
    return xn * params[f"{name}.weight"][None, :, None, None] + params[
        f"{name}.bias"
    ][None, :, None, None]


def init_layer_norm(params: Params, name: str, dim: int) -> None:
    params[f"{name}.weight"] = jnp.ones(dim, jnp.float32)
    params[f"{name}.bias"] = jnp.zeros(dim, jnp.float32)


def layer_norm(params: Params, name: str, x: jnp.ndarray, eps=1e-6) -> jnp.ndarray:
    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * params[f"{name}.weight"] + params[
        f"{name}.bias"
    ]


# ---------------------------------------------------------------------------
# entmax15 (reference attention.py:257-567; Peters et al. 2019)
# ---------------------------------------------------------------------------


@jax.custom_vjp
def entmax15(z: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    return _entmax15_fwd_impl(z, axis)


def _entmax15_fwd_impl(z, axis=-1):
    z = jnp.moveaxis(z, axis, -1)
    z = z / 2.0
    z = z - z.max(-1, keepdims=True)
    K = z.shape[-1]
    z_sorted = -jnp.sort(-z, axis=-1)
    k = jnp.arange(1, K + 1, dtype=z.dtype)
    mean = jnp.cumsum(z_sorted, -1) / k
    mean_sq = jnp.cumsum(z_sorted**2, -1) / k
    ss = k * (mean_sq - mean**2)
    delta = (1 - ss) / k
    delta_nz = jnp.maximum(delta, 0)
    tau = mean - jnp.sqrt(delta_nz)
    support = tau <= z_sorted
    k_star = jnp.sum(support, -1) - 1
    tau_star = jnp.take_along_axis(tau, k_star[..., None], -1)
    out = jnp.maximum(z - tau_star, 0) ** 2
    return jnp.moveaxis(out, -1, axis)


def _entmax15_vjp_fwd(z, axis=-1):
    y = _entmax15_fwd_impl(z, axis)
    return y, (y, axis)


def _entmax15_vjp_bwd(res, g):
    y, axis = res
    s = jnp.sqrt(y)
    gs = g * s
    q = gs.sum(axis, keepdims=True) / jnp.maximum(s.sum(axis, keepdims=True), 1e-12)
    return (gs - q * s, None)


entmax15.defvjp(_entmax15_vjp_fwd, _entmax15_vjp_bwd)


# ---------------------------------------------------------------------------
# transformer (reference attention.py:8-232)
# ---------------------------------------------------------------------------


def init_mha(params: Params, key, name: str, n_head, d_model, d_k, d_v) -> None:
    keys = jax.random.split(key, 4)
    init_linear(params, keys[0], f"{name}.w_qs", d_model, n_head * d_k)
    init_linear(params, keys[1], f"{name}.w_ks", d_model, n_head * d_k)
    init_linear(params, keys[2], f"{name}.w_vs", d_model, n_head * d_v)
    init_linear(params, keys[3], f"{name}.fc", n_head * d_v, d_model)
    init_layer_norm(params, f"{name}.layer_norm", d_model)


def mha(
    params: Params,
    name: str,
    x: jnp.ndarray,
    n_head: int,
    d_k: int,
    d_v: int,
    mask: Optional[jnp.ndarray],
    activation: str,
    prenorm: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-batch self attention over (L, d_model) tokens
    (reference :38-80)."""
    residual = x
    if prenorm:
        x = layer_norm(params, f"{name}.layer_norm", x)
    L = x.shape[0]
    q = linear(params, f"{name}.w_qs", x).reshape(L, n_head, d_k)
    k = linear(params, f"{name}.w_ks", x).reshape(L, n_head, d_k)
    v = linear(params, f"{name}.w_vs", x).reshape(L, n_head, d_v)
    # (h, lq, lk)
    attn = jnp.einsum("qhd,khd->hqk", q / (d_k**0.5), k)
    if mask is not None:
        attn = attn + mask
    if activation == "softmax":
        attn = jax.nn.softmax(attn, axis=-1)
    elif activation == "entmax":
        attn = entmax15(attn, axis=-1)
    else:
        raise ValueError("Unknown activation!")
    out = jnp.einsum("hqk,khd->qhd", attn, v).reshape(L, n_head * d_v)
    out = linear(params, f"{name}.fc", out) + residual
    if not prenorm:
        out = layer_norm(params, f"{name}.layer_norm", out)
    return out, attn


def init_ffn(params: Params, key, name: str, d_in, d_hid) -> None:
    k1, k2 = jax.random.split(key)
    init_linear(params, k1, f"{name}.w_1", d_in, d_hid)
    init_linear(params, k2, f"{name}.w_2", d_hid, d_in)
    init_layer_norm(params, f"{name}.layer_norm", d_in)


def ffn(params: Params, name: str, x, activation: str, prenorm: bool):
    residual = x
    if prenorm:
        x = layer_norm(params, f"{name}.layer_norm", x)
    # torch F.gelu (reference pos_ffn activation) is the exact erf gelu;
    # jax.nn.gelu defaults to the tanh approximation (parity-tested)
    act = {
        "relu": jax.nn.relu,
        "gelu": lambda h: jax.nn.gelu(h, approximate=False),
    }[activation]
    x = linear(params, f"{name}.w_2", act(linear(params, f"{name}.w_1", x)))
    x = x + residual
    if not prenorm:
        x = layer_norm(params, f"{name}.layer_norm", x)
    return x


def init_positional_encoding(params: Params, name: str, d_model: int, d_in: int):
    """Learnable log-spaced frequencies (reference :164-178)."""
    num_w = d_model // 2 // d_in
    w = 1e-3 ** jnp.linspace(0, 1, num_w)
    params[f"{name}.w"] = jnp.tile(w.reshape(1, -1, 1), (1, 1, d_in))


def positional_encoding(params: Params, name: str, x: jnp.ndarray, d_model: int):
    w = params[f"{name}.w"]  # (1, num_w, d_in)
    x = x[:, None, :]  # (L, 1, d_in)
    enc = jnp.concatenate([jnp.sin(w * x), jnp.cos(w * x)], 1)  # (L, 2*num_w, d_in)
    enc = enc.reshape(enc.shape[0], -1)
    num_pad = d_model - enc.shape[-1]
    if num_pad:
        enc = jnp.pad(enc, ((0, 0), (0, num_pad)))
    return enc


def init_transformer_encoder(
    params: Params, key, name: str, n_layers, n_head, d_k, d_v, d_model, d_inner
) -> None:
    keys = jax.random.split(key, n_layers * 2)
    for i in range(n_layers):
        init_mha(
            params, keys[2 * i], f"{name}.layer_stack.{i}.slf_attn", n_head, d_model, d_k, d_v
        )
        init_ffn(params, keys[2 * i + 1], f"{name}.layer_stack.{i}.pos_ffn", d_model, d_inner)
    init_layer_norm(params, f"{name}.layer_norm", d_model)


def transformer_encoder(
    params: Params,
    name: str,
    x: jnp.ndarray,
    pos_enc: jnp.ndarray,
    n_layers: int,
    n_head: int,
    d_k: int,
    d_v: int,
    mask: Optional[jnp.ndarray] = None,
    activation_attn: str = "softmax",
    activation_ff: str = "relu",
    prenorm: bool = False,
):
    out = x + pos_enc
    if not prenorm:
        out = layer_norm(params, f"{name}.layer_norm", out)
    attn = None
    for i in range(n_layers):
        out, attn = mha(
            params, f"{name}.layer_stack.{i}.slf_attn", out, n_head, d_k, d_v,
            mask, activation_attn, prenorm,
        )
        out = ffn(
            params, f"{name}.layer_stack.{i}.pos_ffn", out, activation_ff, prenorm
        )
    if prenorm:
        out = layer_norm(params, f"{name}.layer_norm", out)
    return out, attn


# ---------------------------------------------------------------------------
# ResNet (torchvision-compatible topology; reference attention.py:235-254)
# ---------------------------------------------------------------------------

_RESNET_BLOCKS = {34: (3, 4, 6, 3), 50: (3, 4, 6, 3)}
_BOTTLENECK = {34: False, 50: True}


def init_resnet(
    params: Params, key, name: str, n_res: int, d_model: int, d_in: int
) -> None:
    blocks = _RESNET_BLOCKS[n_res]
    bottleneck = _BOTTLENECK[n_res]
    expansion = 4 if bottleneck else 1
    keys = iter(jax.random.split(key, 256))

    init_conv(params, next(keys), f"{name}.model.conv1", d_in, 64, 7)
    init_bn(params, f"{name}.model.bn1", 64)
    in_planes = 64
    for li, (planes, n_block) in enumerate(zip((64, 128, 256, 512), blocks)):
        for bi in range(n_block):
            stride = 2 if (li > 0 and bi == 0) else 1
            prefix = f"{name}.model.layer{li + 1}.{bi}"
            if bottleneck:
                init_conv(params, next(keys), f"{prefix}.conv1", in_planes, planes, 1)
                init_bn(params, f"{prefix}.bn1", planes)
                init_conv(params, next(keys), f"{prefix}.conv2", planes, planes, 3)
                init_bn(params, f"{prefix}.bn2", planes)
                init_conv(
                    params, next(keys), f"{prefix}.conv3", planes, planes * 4, 1
                )
                init_bn(params, f"{prefix}.bn3", planes * 4)
            else:
                init_conv(params, next(keys), f"{prefix}.conv1", in_planes, planes, 3)
                init_bn(params, f"{prefix}.bn1", planes)
                init_conv(params, next(keys), f"{prefix}.conv2", planes, planes, 3)
                init_bn(params, f"{prefix}.bn2", planes)
            if bi == 0 and (stride != 1 or in_planes != planes * expansion):
                init_conv(
                    params,
                    next(keys),
                    f"{prefix}.downsample.0",
                    in_planes,
                    planes * expansion,
                    1,
                )
                init_bn(params, f"{prefix}.downsample.1", planes * expansion)
            in_planes = planes * expansion
    init_linear(params, next(keys), f"{name}.model.fc", in_planes, d_model)


def _max_pool_3x3_s2(x):
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 1, 3, 3),
        window_strides=(1, 1, 2, 2),
        padding=((0, 0), (0, 0), (1, 1), (1, 1)),
    )


def _resnet_block(params: Params, h, prefix: str, stride: int, bottleneck: bool):
    identity = h
    if bottleneck:
        out = jax.nn.relu(
            batch_norm(params, f"{prefix}.bn1", conv2d(params, f"{prefix}.conv1", h))
        )
        out = jax.nn.relu(
            batch_norm(
                params,
                f"{prefix}.bn2",
                conv2d(params, f"{prefix}.conv2", out, stride, 1),
            )
        )
        out = batch_norm(
            params, f"{prefix}.bn3", conv2d(params, f"{prefix}.conv3", out)
        )
    else:
        out = jax.nn.relu(
            batch_norm(
                params,
                f"{prefix}.bn1",
                conv2d(params, f"{prefix}.conv1", h, stride, 1),
            )
        )
        out = batch_norm(
            params, f"{prefix}.bn2", conv2d(params, f"{prefix}.conv2", out, 1, 1)
        )
    if f"{prefix}.downsample.0.weight" in params:
        identity = batch_norm(
            params,
            f"{prefix}.downsample.1",
            conv2d(params, f"{prefix}.downsample.0", h, stride, 0),
        )
    return jax.nn.relu(out + identity)


def _resnet_impl(params: Params, x: jnp.ndarray, name: str, n_res: int):
    blocks = _RESNET_BLOCKS[n_res]
    bottleneck = _BOTTLENECK[n_res]

    h = jax.nn.relu(
        batch_norm(params, f"{name}.model.bn1", conv2d(params, f"{name}.model.conv1", x, 2, 3))
    )
    h = _max_pool_3x3_s2(h)
    for li, n_block in enumerate(blocks):
        # inner remat: during the outer recompute each layer group stores
        # only its input, so backward peak memory is one layer group's
        # activations rather than the whole network's
        def layer_fn(params, h, li=li, n_block=n_block):
            for bi in range(n_block):
                stride = 2 if (li > 0 and bi == 0) else 1
                prefix = f"{name}.model.layer{li + 1}.{bi}"
                h = _resnet_block(params, h, prefix, stride, bottleneck)
            return h

        h = jax.checkpoint(layer_fn)(params, h)
    h = h.mean((2, 3))  # adaptive avg pool to 1x1
    return linear(params, f"{name}.model.fc", h)


def resnet(params: Params, name: str, x: jnp.ndarray, n_res: int) -> jnp.ndarray:
    """(N, C, H, W) -> (N, d_model) slice-token features.

    Rematerialized at two levels (whole net + per layer group): forward-only
    use (all of inference) is unchanged, while differentiating through the
    encoder — SVoRT training, which the reference does not ship — stores
    only the network input and recomputes activations layer group by layer
    group in the backward pass. Without this the SVoRT train step needs
    ~24 GB of HBM at typical shapes (measured); with it, well under one
    v5e's 16 GB.
    """

    def net_fn(params, x):
        return _resnet_impl(params, x, name, n_res)

    return jax.checkpoint(net_fn)(params, x)
