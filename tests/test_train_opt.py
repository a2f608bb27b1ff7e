"""Optimizer construction semantics of the training engine: selective weight
decay, frozen-group routing, and the variance-head LR warmup (the decoupled
small-head collapse fix; no reference analog — reference train.py:135-152
uses one param group for everything but weight decay)."""

from argparse import Namespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nesvor_tpu.nesvor.models import (
    NeSVoRConfig,
    build_inr_config,
    init_nesvor,
)
from nesvor_tpu.nesvor.train import build_optimizer
from nesvor_tpu.transform import RigidTransform


def _tiny_setup(var_warmup=0):
    args = Namespace(
        n_features_per_level=2, log2_hashmap_size=8, level_scale=1.3819,
        coarsest_resolution=16.0, finest_resolution=4.0, n_levels_bias=1,
        encoder="fourier", fourier_dirs=2, depth=1, width=16,
        n_features_z=4, single_precision=True,
        var_warmup_iters=var_warmup,
        learning_rate=1e-2, gamma=0.33, milestones=[0.5], n_iter=100,
    )
    bbox = np.asarray([[-16.0, -16.0, -16.0], [16.0, 16.0, 16.0]])
    inr_cfg = build_inr_config(bbox, args)
    cfg = NeSVoRConfig(
        inr=inr_cfg, n_slices=3, n_samples=4, n_features_slice=4,
        n_levels_bias=1, head_width=8, head_depth=1,
    )
    key = jax.random.PRNGKey(0)
    transformation = RigidTransform(jnp.zeros((3, 6), jnp.float32))
    params, _ = init_nesvor(
        key, cfg, transformation, jnp.ones((3, 3), jnp.float32), 1.0
    )
    return params, cfg, args


def _apply_n(tx, params, n):
    import optax

    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    for _ in range(n):
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    return params


@pytest.mark.parametrize("warmup", [0, 3])
def test_var_warmup_groups(warmup):
    params, cfg, args = _tiny_setup(var_warmup=warmup)
    tx, _ = build_optimizer(params, cfg, args)

    p1 = _apply_n(tx, params, 2)

    def moved(a, b):
        return any(
            bool(jnp.any(x != y))
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
        )

    # density net always trains from step 0
    assert moved(params["inr"]["density_net"], p1["inr"]["density_net"])
    head_moved = moved(
        {k: params[k] for k in ("sigma_net", "b_net", "log_var_slice")},
        {k: p1[k] for k in ("sigma_net", "b_net", "log_var_slice")},
    )
    if warmup:
        # heads are held for the first `warmup` steps...
        assert not head_moved
        # ...and released after
        p2 = _apply_n(tx, params, warmup + 2)
        assert moved(params["sigma_net"], p2["sigma_net"])
        assert moved(params["log_var_slice"], p2["log_var_slice"])
    else:
        assert head_moved


def test_fourier_basis_frozen():
    params, cfg, args = _tiny_setup(var_warmup=0)
    tx, _ = build_optimizer(params, cfg, args)
    p1 = _apply_n(tx, params, 2)
    b0 = jax.tree.leaves(
        {k: v for k, v in params["inr"].items() if "fourier_basis" in k}
    )
    b1 = jax.tree.leaves(
        {k: v for k, v in p1["inr"].items() if "fourier_basis" in k}
    )
    assert b0 and all(bool(jnp.all(x == y)) for x, y in zip(b0, b1))


@pytest.mark.parametrize("encoder", ["fourier", "cellhash", "hash"])
def test_nesvor_loss_with_bias_head(encoder):
    """nesvor_loss with n_levels_bias > 0 must run (and differentiate) for
    every encoder — guards the bias_features layout contract end-to-end."""
    from nesvor_tpu.nesvor.models import nesvor_loss

    args = Namespace(
        n_features_per_level=2, log2_hashmap_size=8, level_scale=1.3819,
        coarsest_resolution=16.0, finest_resolution=4.0, n_levels_bias=2,
        encoder=encoder, fourier_dirs=2, depth=1, width=16,
        n_features_z=4, single_precision=True,
    )
    bbox = jnp.asarray([[-16.0, -16.0, -16.0], [16.0, 16.0, 16.0]])
    inr_cfg = build_inr_config(np.asarray(bbox), args)
    cfg = NeSVoRConfig(
        inr=inr_cfg, n_slices=3, n_samples=4, n_features_slice=4,
        n_levels_bias=2, head_width=8, head_depth=1,
    )
    key = jax.random.PRNGKey(0)
    transformation = RigidTransform(jnp.zeros((3, 6), jnp.float32))
    params, consts = init_nesvor(
        key, cfg, transformation, jnp.ones((3, 3), jnp.float32), 1.0
    )
    batch = {
        "xyz": jnp.asarray(
            np.random.default_rng(0).uniform(-8, 8, (16, 3)), jnp.float32
        ),
        "v": jnp.ones((16,), jnp.float32),
        "slice_idx": jnp.zeros((16,), jnp.int32),
    }

    def total(params):
        losses = nesvor_loss(
            params, consts, cfg, bbox, batch, jax.random.PRNGKey(1)
        )
        assert "biasReg" in losses
        return sum(jnp.asarray(v) for v in losses.values())

    val, grads = jax.value_and_grad(total)(params)
    assert bool(jnp.isfinite(val))
    for leaf in jax.tree.leaves(grads):
        assert bool(jnp.all(jnp.isfinite(leaf)))


def test_project_gauge_removes_coherent_drift():
    """_project_gauge must remove a coherent SE(3) drift applied on top of
    genuine per-slice deviations (the gauge mode), while preserving the
    relative poses between slices exactly."""
    import numpy as np
    import jax.numpy as jnp

    from nesvor_tpu.nesvor.train import _project_gauge
    from nesvor_tpu.transform import RigidTransform

    rng = np.random.default_rng(3)
    n = 24
    ax_init = np.concatenate(
        [rng.normal(0, 0.05, (n, 3)), rng.normal(0, 3.0, (n, 3))], -1
    ).astype(np.float32)
    # small zero-mean per-slice deviations + one large coherent drift
    dev = np.concatenate(
        [rng.normal(0, 0.005, (n, 3)), rng.normal(0, 0.1, (n, 3))], -1
    ).astype(np.float32)
    dev -= dev.mean(0, keepdims=True)
    drift = RigidTransform(
        jnp.asarray([[0.05, -0.03, 0.02, 1.5, -0.7, 0.9]], jnp.float32),
        trans_first=False,
    )
    t_init = RigidTransform(jnp.asarray(ax_init), trans_first=True)
    t_dev = RigidTransform(jnp.asarray(ax_init + dev), trans_first=True)
    t_drifted = drift.compose(t_dev)

    ax_proj = _project_gauge(
        t_drifted.axisangle(trans_first=True), jnp.asarray(ax_init)
    )
    t_proj = RigidTransform(ax_proj, trans_first=True)

    # 1. relative poses preserved exactly (projection is a global motion)
    rel_before = t_drifted[0:1].inv().compose(t_drifted).axisangle()
    rel_after = t_proj[0:1].inv().compose(t_proj).axisangle()
    np.testing.assert_allclose(
        np.asarray(rel_before), np.asarray(rel_after), atol=2e-5
    )

    # 2. the residual mean deviation-from-init is near zero (drift removed;
    # small-angle mean leaves only a second-order residual)
    resid = t_proj.compose(t_init.inv()).axisangle(trans_first=False)
    resid = np.asarray(resid)
    assert np.linalg.norm(resid[:, :3].mean(0)) < 2e-3, resid[:, :3].mean(0)
    assert np.linalg.norm(resid[:, 3:].mean(0)) < 5e-2, resid[:, 3:].mean(0)
    # 3. and the drift really was large before
    before = np.asarray(t_drifted.compose(t_init.inv()).axisangle(trans_first=False))
    assert np.linalg.norm(before[:, :3].mean(0)) > 0.05
