"""Fourier-feature encoder tests: shapes, band ordering, INR integration."""

import jax
import jax.numpy as jnp
import numpy as np

from nesvor_tpu.ops.fourier import fourier_encode, init_fourier_basis


def test_basis_shapes_and_scales():
    res = (4, 8, 16)
    B = init_fourier_basis(jax.random.PRNGKey(0), res, n_dirs=6)
    assert B.shape == (3, 18)
    # per-level column norms = 2*pi*res/2
    norms = np.linalg.norm(np.asarray(B), axis=0).reshape(3, 6)
    for l, r in enumerate(res):
        np.testing.assert_allclose(norms[l], np.pi * r, rtol=1e-5)


def test_encode_values_and_level_order():
    res = (2, 32)
    D = 4
    B = init_fourier_basis(jax.random.PRNGKey(1), res, n_dirs=D)
    x = jax.random.uniform(jax.random.PRNGKey(2), (10, 3))
    pe = np.asarray(fourier_encode(B, x, D, compute_dtype=jnp.float32))
    assert pe.shape == (10, 2 * 2 * D)
    ang = np.asarray(x) @ np.asarray(B)
    # [sin half | cos half], levels ascending within each half
    np.testing.assert_allclose(pe[:, : 2 * D], np.sin(ang), atol=1e-6)
    np.testing.assert_allclose(pe[:, 2 * D :], np.cos(ang), atol=1e-6)


def test_bias_features_layout():
    """bias_features must pick exactly the first-n-level features under both
    the grid per-level-block layout and the fourier [sin|cos] layout."""
    import jax.numpy as jnp

    from nesvor_tpu.nesvor.models import INRConfig, bias_features

    cfg_f = INRConfig(
        n_levels=3, base_resolution=2, level_resolutions=(2, 4, 8),
        encoder="fourier", fourier_dirs=2,
    )
    # pe columns tagged by (level, kind): sin half [s0 s0 s1 s1 s2 s2], cos half
    pe = jnp.asarray(
        [[0, 0, 1, 1, 2, 2, 10, 10, 11, 11, 12, 12]], jnp.float32
    )
    out = np.asarray(bias_features(pe, cfg_f, 2))
    np.testing.assert_array_equal(out, [[0, 0, 1, 1, 10, 10, 11, 11]])
    assert out.shape[-1] == 2 * cfg_f.features_per_level

    cfg_g = INRConfig(
        n_levels=3, base_resolution=2, level_resolutions=(2, 4, 8),
        encoder="cellhash", n_features_per_level=2,
    )
    pe_g = jnp.asarray([[0, 0, 1, 1, 2, 2]], jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(bias_features(pe_g, cfg_g, 2)), [[0, 0, 1, 1]]
    )


def test_encode_custom_vjp_matches_autodiff():
    """The custom backward (which reuses the saved sin/cos output) must match
    plain autodiff of the same math exactly in f32."""
    res = (2, 8, 32)
    D = 4
    B = init_fourier_basis(jax.random.PRNGKey(5), res, n_dirs=D)
    x = jax.random.uniform(jax.random.PRNGKey(6), (64, 3))
    w = jax.random.normal(jax.random.PRNGKey(7), (len(res) * 2 * D,))

    def f_custom(x):
        return jnp.sum(fourier_encode(B, x, D, compute_dtype=jnp.float32) * w)

    def f_plain(x):
        ang = x @ B
        pe = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=1)
        return jnp.sum(pe * w)

    g_c = np.asarray(jax.grad(f_custom)(x))
    g_p = np.asarray(jax.grad(f_plain)(x))
    np.testing.assert_allclose(g_c, g_p, rtol=1e-5, atol=1e-5)


def test_inr_fourier_end_to_end():
    """A fourier INR must fit a smooth target through the full model path
    (init -> forward -> grads flow to MLP but not the basis)."""
    from nesvor_tpu.nesvor.models import INRConfig, init_inr, inr_forward

    cfg = INRConfig(
        n_levels=4,
        base_resolution=2,
        level_resolutions=(2, 4, 8, 16),
        encoder="fourier",
        fourier_dirs=4,
        width=32,
        depth=2,
        compute_dtype=jnp.float32,
    )
    params = init_inr(jax.random.PRNGKey(3), cfg)
    assert params["fourier_basis"].shape == (3, 16)
    bb = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]])
    x = jax.random.uniform(jax.random.PRNGKey(4), (128, 3))
    target = jnp.sin(4 * x[:, 0]) + x[:, 1]

    def loss(params):
        d, pe, z = inr_forward(params, cfg, bb, x)
        return jnp.mean((d - target) ** 2)

    g = jax.grad(loss)(params)
    # basis is stop-gradiented; MLP gets gradients
    assert float(jnp.abs(g["fourier_basis"]).max()) == 0.0
    assert float(jnp.abs(g["density_net"]["layers"][0]["w"]).max()) > 0.0

    import optax

    tx = optax.adam(1e-2)
    st = tx.init(params)
    l0 = loss(params)

    @jax.jit
    def step(p, st):
        gr = jax.grad(loss)(p)
        up, st = tx.update(gr, st)
        return optax.apply_updates(p, up), st

    for _ in range(200):
        params, st = step(params, st)
    l1 = loss(params)
    assert float(l1) < 0.1 * float(l0), (float(l0), float(l1))
