"""Fused Pallas MLP vs the XLA layer chain (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from nesvor_tpu.nesvor.models import mlp_init
from nesvor_tpu.ops.fused_mlp import fused_mlp


def _ref_chain(params, x, dtype=jnp.bfloat16):
    h = x.astype(dtype)
    layers = params["layers"]
    for i, layer in enumerate(layers):
        last = i == len(layers) - 1
        h = jnp.dot(
            h,
            layer["w"].astype(dtype),
            preferred_element_type=jnp.float32 if last else dtype,
        ) + layer["b"].astype(jnp.float32 if last else dtype)
        if not last:
            h = jax.nn.relu(h)
    return h


def test_fused_mlp_forward_matches():
    key = jax.random.PRNGKey(0)
    params = mlp_init(key, 192, 16, 64, 3)
    x = jax.random.normal(jax.random.PRNGKey(1), (3000, 192), jnp.float32)
    out = fused_mlp(params, x)
    ref = _ref_chain(params, x)
    assert out.shape == (3000, 16)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=3e-2, rtol=3e-2
    )


def test_fused_mlp_grads_match():
    key = jax.random.PRNGKey(2)
    params = mlp_init(key, 31, 1, 32, 2)
    x = jax.random.normal(jax.random.PRNGKey(3), (2500, 31), jnp.float32)
    t = jax.random.normal(jax.random.PRNGKey(4), (2500, 1), jnp.float32)

    def loss_fused(p, x):
        return jnp.mean((fused_mlp(p, x) - t) ** 2)

    def loss_ref(p, x):
        return jnp.mean((_ref_chain(p, x) - t) ** 2)

    (gp_f, gx_f) = jax.grad(loss_fused, argnums=(0, 1))(params, x)
    (gp_r, gx_r) = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    for lf, lr in zip(gp_f["layers"], gp_r["layers"]):
        np.testing.assert_allclose(
            np.asarray(lf["w"]), np.asarray(lr["w"]), atol=2e-2, rtol=5e-2
        )
        np.testing.assert_allclose(
            np.asarray(lf["b"]).reshape(-1),
            np.asarray(lr["b"]).reshape(-1),
            atol=2e-2,
            rtol=5e-2,
        )
    np.testing.assert_allclose(
        np.asarray(gx_f), np.asarray(gx_r), atol=2e-2, rtol=5e-2
    )


def test_fused_mlp_save_hs_grads_match_recompute(monkeypatch):
    """The no-recompute backward (forward-saved activations) must produce
    the same gradients as the recompute backward."""
    import nesvor_tpu.ops.fused_mlp as F

    key = jax.random.PRNGKey(4)
    params = mlp_init(key, 31, 1, 32, 2)
    x = jax.random.normal(jax.random.PRNGKey(5), (513, 31), jnp.float32)

    def loss(params, x):
        return jnp.sum(fused_mlp(params, x, jnp.float32) ** 2)

    monkeypatch.setattr(F, "SAVE_HS", False)
    g_re = jax.grad(loss, argnums=(0, 1))(params, x)
    monkeypatch.setattr(F, "SAVE_HS", True)
    g_hs = jax.grad(loss, argnums=(0, 1))(params, x)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_re), jax.tree_util.tree_leaves(g_hs)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-5)
