"""Activation-level parity of the JAX SVoRT stack against a torch replica.

The JAX params live in a flat dict keyed by torch ``state_dict`` names, so
each test exports them into the torch replica (tests/torch_ref.py, built
from the reference architecture at /root/reference/nesvor/svort/
attention.py:8-254 + models.py:269-457) with ``load_state_dict(strict=True)``
— any param name, shape, or layout divergence from real torch checkpoints
fails the load itself; then both sides run the same random inputs and the
outputs must agree to ~1e-4 (fp32).

This replaces the previously circular converter test: the torch side here
is an independent torch nn.Module tree, not a re-serialization of the JAX
names.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from nesvor_tpu.svort import attention as A

from torch_ref import (
    TorchMHA,
    TorchFFN,
    TorchPositionalEncoding,
    TorchResNet,
    TorchSVRtransformer,
    TorchSVRtransformerV2,
    TorchTransformerEncoder,
)


def to_torch_state(params, strip):
    out = {}
    for k, v in params.items():
        assert k.startswith(strip + "."), k
        out[k[len(strip) + 1 :]] = torch.from_numpy(np.asarray(v))
    return out


def assert_close(jax_out, torch_out, atol=1e-4, rtol=1e-4):
    np.testing.assert_allclose(
        np.asarray(jax_out), torch_out.detach().numpy(), atol=atol, rtol=rtol
    )


@pytest.mark.parametrize("activation", ["softmax", "entmax"])
def test_mha_parity(activation):
    n_head, d_model, d_k, d_v, L = 4, 64, 16, 16, 13
    params = {}
    A.init_mha(params, jax.random.PRNGKey(0), "m", n_head, d_model, d_k, d_v)
    tm = TorchMHA(n_head, d_model, d_k, d_v, activation=activation).eval()
    tm.load_state_dict(to_torch_state(params, "m"), strict=True)

    x = np.random.default_rng(1).normal(size=(L, d_model)).astype(np.float32)
    out_j, attn_j = A.mha(
        params, "m", jnp.asarray(x), n_head, d_k, d_v, None, activation, False
    )
    out_t, attn_t = tm(torch.from_numpy(x))
    assert_close(out_j, out_t)
    assert_close(attn_j, attn_t)


@pytest.mark.parametrize("activation,prenorm", [("relu", False), ("gelu", False), ("relu", True)])
def test_ffn_parity(activation, prenorm):
    d_in, d_hid, L = 48, 96, 7
    params = {}
    A.init_ffn(params, jax.random.PRNGKey(2), "f", d_in, d_hid)
    tm = TorchFFN(d_in, d_hid, activation, prenorm).eval()
    tm.load_state_dict(to_torch_state(params, "f"), strict=True)
    x = np.random.default_rng(3).normal(size=(L, d_in)).astype(np.float32)
    assert_close(
        A.ffn(params, "f", jnp.asarray(x), activation, prenorm),
        tm(torch.from_numpy(x)),
    )


def test_positional_encoding_parity():
    d_model, d_in, L = 64, 11, 9
    params = {}
    A.init_positional_encoding(params, "p", d_model, d_in)
    tm = TorchPositionalEncoding(d_model, d_in)
    tm.load_state_dict(to_torch_state(params, "p"), strict=True)
    x = np.random.default_rng(4).normal(size=(L, d_in)).astype(np.float32)
    assert_close(
        A.positional_encoding(params, "p", jnp.asarray(x), d_model),
        tm(torch.from_numpy(x)),
    )


@pytest.mark.parametrize("gelu_postnorm", [False, True])
def test_transformer_encoder_parity(gelu_postnorm):
    n_layers, n_head, d_model, d_inner, L = 2, 4, 64, 128, 11
    d_k = d_v = d_model // n_head
    act_ff = "gelu" if gelu_postnorm else "relu"
    params = {}
    A.init_transformer_encoder(
        params, jax.random.PRNGKey(5), "e", n_layers, n_head, d_k, d_v, d_model, d_inner
    )
    tm = TorchTransformerEncoder(
        n_layers, n_head, d_k, d_v, d_model, d_inner, activation_ff=act_ff
    ).eval()
    tm.load_state_dict(to_torch_state(params, "e"), strict=True)
    rng = np.random.default_rng(6)
    x = rng.normal(size=(L, d_model)).astype(np.float32)
    pe = rng.normal(size=(L, d_model)).astype(np.float32)
    out_j, _ = A.transformer_encoder(
        params, "e", jnp.asarray(x), jnp.asarray(pe), n_layers, n_head, d_k, d_v,
        activation_ff=act_ff,
    )
    out_t, _ = tm(torch.from_numpy(x), torch.from_numpy(pe))
    assert_close(out_j, out_t)


@pytest.mark.parametrize("n_res,d_in", [(34, 4), (50, 3)])
def test_resnet_parity(n_res, d_in):
    d_model = 32
    params = {}
    A.init_resnet(params, jax.random.PRNGKey(7), "r", n_res, d_model, d_in)
    tm = TorchResNet(n_res, d_model, d_in).eval()
    tm.load_state_dict(to_torch_state(params, "r"), strict=True)
    # 64x64 keeps layer4 spatial at 2x2 — at 32x32 it collapses to 1x1 and
    # batch-stats BN over 3 samples amplifies fp noise by rsqrt(var~0)
    x = np.random.default_rng(8).normal(size=(3, d_in, 64, 64)).astype(np.float32)
    out_j = A.resnet(params, "r", jnp.asarray(x), n_res)
    out_t = tm(torch.from_numpy(x))
    # ~50 conv+bn layers deep: accumulated fp32 reassociation differences
    assert_close(out_j, out_t, atol=1e-3, rtol=1e-3)


@pytest.mark.slow
def test_svrtransformer_parity():
    """Full v1-style SVR block (reference models.py:269-363), volume=None."""
    from nesvor_tpu.svort.models import SVRtransformer

    net = SVRtransformer(
        n_res=34, n_layers=2, n_head=4, d_in=11, d_out=9,
        d_model=64, d_inner=128, res_d_in=3, res_scale=1,
    )
    params = {}
    net.init(params, jax.random.PRNGKey(9), "s")
    tm = TorchSVRtransformer(
        n_res=34, n_layers=2, n_head=4, d_in=11, d_out=9,
        d_model=64, d_inner=128, res_d_in=3, res_scale=1,
    ).eval()
    tm.load_state_dict(to_torch_state(params, "s"), strict=True)

    rng = np.random.default_rng(10)
    slices = rng.normal(size=(4, 1, 32, 32)).astype(np.float32)
    theta = rng.normal(size=(4, 9)).astype(np.float32)
    pos = rng.normal(size=(4, 2)).astype(np.float32)

    out_j, _ = net(params, "s", jnp.asarray(theta), jnp.asarray(slices),
                   jnp.asarray(pos), None, None)
    out_t, _ = tm(torch.from_numpy(theta), torch.from_numpy(slices),
                  torch.from_numpy(pos))
    assert_close(out_j, out_t, atol=5e-4, rtol=5e-4)


@pytest.mark.slow
def test_svrtransformer_v2_parity():
    """v2 SVR block with score head, gelu encoder (reference models.py:366-457)."""
    from nesvor_tpu.svort.models import SVRtransformerV2

    net = SVRtransformerV2(
        n_res=50, n_layers=2, n_head=4, d_in=11, d_out=9,
        d_model=64, d_inner=128, n_channels=1,
    )
    params = {}
    net.init(params, jax.random.PRNGKey(11), "s")
    tm = TorchSVRtransformerV2(
        n_res=50, n_layers=2, n_head=4, d_in=11, d_out=9,
        d_model=64, d_inner=128, n_channels=1,
    ).eval()
    tm.load_state_dict(to_torch_state(params, "s"), strict=True)

    rng = np.random.default_rng(12)
    # 64x64: the v2 block uses ResNet-50 (see test_resnet_parity note)
    slices = rng.normal(size=(4, 1, 64, 64)).astype(np.float32)
    theta = rng.normal(size=(4, 9)).astype(np.float32)
    pos = rng.normal(size=(4, 2)).astype(np.float32)

    out_j, score_j, _ = net(params, "s", jnp.asarray(theta), jnp.asarray(slices),
                            jnp.asarray(pos), None, None)
    out_t, score_t, _ = tm(torch.from_numpy(theta), torch.from_numpy(slices),
                           torch.from_numpy(pos))
    assert_close(out_j, out_t, atol=5e-4, rtol=5e-4)
    assert_close(score_j, score_t, atol=5e-4, rtol=5e-4)


# (converter round-trip against the torch replica lives in tests/test_convert.py)
