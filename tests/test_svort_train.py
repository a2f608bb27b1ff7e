"""SVoRT training on synthetic motion: the loss must drop and the trained
model must localize slices better than the motion-free initialization."""

import jax
import numpy as np
import pytest

from nesvor_tpu.svort.train import (
    SVoRTTrainConfig,
    make_training_example,
    pose_error,
    train_svort,
)

pytestmark = pytest.mark.slow


def _tiny_cfg(**kw):
    base = dict(
        version="v1", n_iter_model=1, steps=40, lr=3e-4, n_examples=2,
        vs=24, n_stacks=3, gap=4.0, res_s=1.0, res_r=1.0,
        motion_rot=0.05, motion_trans=1.5, volume_shape=(48, 48, 48),
        seed=0, log_every=10,
    )
    base.update(kw)
    return SVoRTTrainConfig(**base)


def test_svort_training_reduces_loss_and_pose_error():
    cfg = _tiny_cfg()
    model, params, history = train_svort(cfg)
    losses = history["loss"]
    assert len(losses) >= 2
    assert np.isfinite(losses).all()
    # the reset-input task (infer orientation from content) is much
    # harder than pose refinement; a CPU smoke run shows a steady
    # decline rather than a collapse
    assert losses[-1] < 0.85 * losses[0], losses

    # a training example (generalization needs far more than a CPU smoke
    # run's 30 steps x 2 examples; this checks the training machinery —
    # gradients reach the pose head and move predictions toward the truth):
    # trained poses must beat the motion-free initialization
    ex = make_training_example(cfg, seed=cfg.seed * 10_000 + 0)
    _, _, thetas = model(params, ex["data"])
    from nesvor_tpu.transform import mat2point

    theta_init = mat2point(
        ex["data"]["transforms"],
        ex["data"]["slice_shape"][1],
        ex["data"]["slice_shape"][0],
        cfg.res_s,
    )
    rot0, trans0 = pose_error(theta_init, ex["theta_gt"])
    rot1, trans1 = pose_error(thetas[-1], ex["theta_gt"])
    assert np.isfinite([rot1, trans1]).all()
    assert rot1 + trans1 < rot0 + trans0, (rot0, trans0, rot1, trans1)


def test_svort_training_with_volume_loss_smoke():
    """volume_weight > 0 must differentiate through the (unrolled) SRR CG
    and produce finite losses for both model versions."""
    for version in ("v1", "v2"):
        cfg = _tiny_cfg(
            version=version, steps=2, n_examples=1, vs=16, gap=4.0,
            volume_shape=(32, 32, 32), volume_weight=1.0, log_every=1,
        )
        _, params, history = train_svort(cfg)
        assert np.isfinite(history["loss"]).all(), (version, history)
        for leaf in jax.tree_util.tree_leaves(params):
            assert bool(np.isfinite(np.asarray(leaf)).all()), version
