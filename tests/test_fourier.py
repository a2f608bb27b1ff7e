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
    # level-0 block first: [sin l0 | cos l0 | sin l1 | cos l1]
    np.testing.assert_allclose(pe[:, :D], np.sin(ang[:, :D]), atol=1e-6)
    np.testing.assert_allclose(pe[:, D : 2 * D], np.cos(ang[:, :D]), atol=1e-6)
    np.testing.assert_allclose(pe[:, 2 * D : 3 * D], np.sin(ang[:, D:]), atol=1e-6)


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
