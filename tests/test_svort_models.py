"""SVoRT model-stack tests: entmax oracle, transformer/ResNet shape+finite
checks, positional encoding, and a full (random-weight) SVoRT forward on a
tiny problem. The reference has no tests for any of this (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nesvor_tpu.svort.attention import (
    entmax15,
    init_positional_encoding,
    init_resnet,
    init_transformer_encoder,
    positional_encoding,
    resnet,
    transformer_encoder,
)
from tests.helpers import assert_close


def _entmax15_numpy(z):
    """Exact entmax-1.5 oracle by direct tau search (1-D)."""
    z = z / 2.0
    z = z - z.max()
    # solve sum(max(z - tau, 0)^2) = 1 by bisection
    lo, hi = z.min() - 1.0, z.max()
    for _ in range(100):
        tau = (lo + hi) / 2
        s = np.sum(np.maximum(z - tau, 0) ** 2)
        if s > 1:
            lo = tau
        else:
            hi = tau
    return np.maximum(z - (lo + hi) / 2, 0) ** 2


def test_entmax15_oracle():
    rng = np.random.default_rng(0)
    for _ in range(5):
        z = rng.normal(size=17).astype(np.float32) * 3
        got = entmax15(jnp.asarray(z)[None], axis=-1)[0]
        want = _entmax15_numpy(z.astype(np.float64))
        assert_close(got, want, atol=1e-4, rtol=1e-3)
        assert abs(float(got.sum()) - 1.0) < 1e-4


def test_entmax15_grad():
    z = jnp.asarray(np.random.default_rng(1).normal(size=(2, 9)), jnp.float32)
    g = jax.grad(lambda x: (entmax15(x, axis=-1) ** 2).sum())(z)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_positional_encoding_shapes():
    params = {}
    init_positional_encoding(params, "pe", 512, 11)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(7, 11)), jnp.float32)
    enc = positional_encoding(params, "pe", x, 512)
    assert enc.shape == (7, 512)
    assert bool(jnp.all(jnp.isfinite(enc)))


def test_transformer_encoder_shapes():
    key = jax.random.PRNGKey(0)
    params = {}
    init_transformer_encoder(params, key, "enc", 2, 4, 16, 16, 64, 128)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(5, 64)), jnp.float32)
    pe = jnp.zeros((5, 64))
    out, attn = transformer_encoder(params, "enc", x, pe, 2, 4, 16, 16)
    assert out.shape == (5, 64)
    assert attn.shape == (4, 5, 5)
    assert_close(attn.sum(-1), jnp.ones((4, 5)), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("n_res", [34, 50])
def test_resnet_shapes(n_res):
    key = jax.random.PRNGKey(0)
    params = {}
    init_resnet(params, key, "r", n_res, 32, d_in=3)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 64, 64)), jnp.float32)
    out = resnet(params, "r", x, n_res)
    assert out.shape == (2, 32)
    assert bool(jnp.all(jnp.isfinite(out)))
    # torch-compatible names present
    assert f"r.model.layer4.0.downsample.0.weight" in params


def test_svort_v2_forward_tiny():
    """Random-weight SVoRTv2 on a tiny 2-stack problem: runs, shapes right,
    finite outputs (weight conversion parity needs the Zenodo checkpoint,
    unavailable offline)."""
    from nesvor_tpu.svort.models import SVoRTv2
    from nesvor_tpu.utils import get_PSF
    from nesvor_tpu.transform import RigidTransform

    model = SVoRTv2(n_iter=2)
    params = model.init(jax.random.PRNGKey(0))

    n_slice, hw = 4, 32
    stacks = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, size=(2 * n_slice, 1, hw, hw)),
        jnp.float32,
    )
    ax = np.zeros((2 * n_slice, 6), np.float32)
    ax[:, 5] = np.tile(np.arange(n_slice) - n_slice / 2, 2) * 3.0
    positions = jnp.asarray(
        np.stack(
            [np.tile(np.arange(n_slice) - n_slice // 2, 2), np.repeat([0, 1], n_slice)],
            -1,
        ),
        jnp.float32,
    )
    data = {
        "psf_rec": jnp.asarray(get_PSF(res_ratio=(1.0, 1.0, 3.0))),
        "slice_shape": (hw, hw),
        "resolution_slice": 1.0,
        "resolution_recon": 1.0,
        "slice_thickness": 3.0,
        "volume_shape": (32, 32, 32),
        "transforms": RigidTransform(jnp.asarray(ax)).matrix(),
        "stacks": stacks,
        "positions": positions,
    }
    trans, volumes, thetas = model(params, data)
    assert len(trans) == 2 and len(volumes) == 2
    assert trans[-1].matrix().shape == (2 * n_slice, 3, 4)
    assert volumes[-1].shape == (1, 1, 32, 32, 32)
    assert bool(jnp.all(jnp.isfinite(trans[-1].matrix())))
    assert bool(jnp.all(jnp.isfinite(volumes[-1])))
