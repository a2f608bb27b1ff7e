"""Mid-training checkpoint/resume: an interrupted-and-resumed run must
reproduce the uninterrupted run exactly (fixed chunk size => identical RNG
stream and identical chunk boundaries)."""

from argparse import Namespace

import jax
import numpy as np

from tests.synth import make_phantom_stacks, stacks_to_slices
from nesvor_tpu.nesvor.train import train


def _args(n_iter, **kw):
    a = Namespace(
        n_features_per_level=2, log2_hashmap_size=12, level_scale=1.3819,
        coarsest_resolution=16.0, finest_resolution=2.0, n_levels_bias=0,
        encoder="fourier", fourier_dirs=4, depth=1, width=32,
        head_width=16, head_depth=1, n_features_z=7, n_features_slice=4,
        no_transformation_optimization=False, no_slice_scale=False,
        no_pixel_variance=False, no_slice_variance=False,
        single_precision=True,
        weight_transformation=0.1, weight_bias=100.0,
        image_regularization="edge", weight_image=2.0, delta=0.2,
        learning_rate=5e-3, gamma=0.33, milestones=[0.5, 0.75, 0.9],
        n_iter=n_iter, batch_size=64, n_samples=4,
        seed=0, mask_threshold=1.0, max_chunk_steps=2,
        # exercise the optax.multi_transform (warmup) optimizer state in
        # the checkpoint payload
        var_warmup_iters=2,
    )
    for k, v in kw.items():
        setattr(a, k, v)
    return a


def test_resume_reproduces_uninterrupted_run(tmp_path, monkeypatch):
    stacks, _ = make_phantom_stacks(
        vs=16, n_stacks=2, gap=2.0, res=1.0, res_s=1.0, intensity=1.0
    )
    slices = stacks_to_slices(stacks)

    model_ref, _, _ = train(slices, _args(8))

    # interrupt a checkpointed run right after the iter-4 save, then resume
    import os

    import pytest

    import importlib

    T = importlib.import_module("nesvor_tpu.nesvor.train")

    ckpt = str(tmp_path / "state.ckpt")
    orig_save = T._save_train_state

    def save_then_interrupt(path, params, opt_state, key, done, args):
        orig_save(path, params, opt_state, key, done, args)
        if done == 4:
            raise KeyboardInterrupt

    monkeypatch.setattr(T, "_save_train_state", save_then_interrupt)
    with pytest.raises(KeyboardInterrupt):
        train(slices, _args(8, train_checkpoint=ckpt))
    monkeypatch.setattr(T, "_save_train_state", orig_save)
    assert os.path.exists(ckpt)

    model_resumed, _, _ = train(slices, _args(8, train_checkpoint=ckpt))
    assert not os.path.exists(ckpt)  # removed on successful completion

    for a, b in zip(
        jax.tree_util.tree_leaves(model_ref.params),
        jax.tree_util.tree_leaves(model_resumed.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_resume_rejects_mismatched_run(tmp_path):
    stacks, _ = make_phantom_stacks(
        vs=16, n_stacks=2, gap=2.0, res=1.0, res_s=1.0, intensity=1.0
    )
    slices = stacks_to_slices(stacks)
    ckpt = str(tmp_path / "state.ckpt")
    train(slices, _args(4, train_checkpoint=ckpt))
    # different n_iter: checkpoint must be ignored (fresh start), not crash
    model, _, _ = train(slices, _args(6, train_checkpoint=ckpt))
    for leaf in jax.tree_util.tree_leaves(model.params):
        assert bool(np.isfinite(np.asarray(leaf)).all())
