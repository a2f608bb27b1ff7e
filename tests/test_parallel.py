"""Multi-device data-parallel tests on the virtual 8-device CPU mesh, plus
a real 2-process (multi-host-shaped) launch."""

import jax
import numpy as np
import pytest


@pytest.mark.slow
def test_dryrun_multichip_8():
    assert len(jax.devices()) >= 8
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    v = jax.jit(fn)(*args)
    assert np.isfinite(float(v))


@pytest.mark.slow
def test_multihost_two_process_cpu():
    """Real jax.distributed 2-process launch: 2 processes x 4 CPU devices
    form one 8-device global mesh; both run the full DP step and must agree
    on the pmean-reduced losses (proves cross-process collectives work).
    Delegates to the driver-artifact launcher so the test exercises exactly
    the code path that produces MULTICHIP evidence (worker script, barrier
    before the first Gloo collective, file-backed stdout, loss-agreement
    check) — it raises RuntimeError on any worker failure or disagreement."""
    import __graft_entry__ as ge

    ge._dryrun_multihost(8)


@pytest.mark.slow
def test_train_dp_devices():
    """train() with --dp-devices exercises the integrated shard_map path end
    to end (sharded pixel bag, pmean gradients, replicated optimizer)."""
    from argparse import Namespace

    from tests.synth import make_phantom_stacks, stacks_to_slices
    from nesvor_tpu.nesvor.train import train

    stacks, _ = make_phantom_stacks(
        vs=16, n_stacks=2, gap=2.0, res=1.0, res_s=1.0, intensity=1.0
    )
    slices = stacks_to_slices(stacks)
    args = Namespace(
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
        n_iter=4, batch_size=64, n_samples=4,
        seed=0, mask_threshold=1.0, dp_devices=4, max_chunk_steps=2,
    )
    model, out_slices, mask = train(slices, args)
    for leaf in jax.tree_util.tree_leaves(model.params):
        assert bool(jax.numpy.all(jax.numpy.isfinite(leaf)))
    assert len(out_slices) == len(slices)


def test_dp_inference_matches_single_device():
    """sample_points with dp_devices=4 must produce the same values as the
    single-device path (replicated params, position-derived MC draws)."""
    import numpy as np
    from argparse import Namespace

    from tests.synth import make_phantom_stacks, stacks_to_slices
    from nesvor_tpu.nesvor.train import train
    from nesvor_tpu.nesvor.sample import sample_points

    stacks, _ = make_phantom_stacks(
        vs=16, n_stacks=2, gap=2.0, res=1.0, res_s=1.0, intensity=1.0
    )
    slices = stacks_to_slices(stacks)
    args = Namespace(
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
        n_iter=2, batch_size=64, n_samples=4,
        seed=0, mask_threshold=1.0, max_chunk_steps=2,
    )
    model, _, _ = train(slices, args)

    rng = np.random.default_rng(0)
    xyz = jax.numpy.asarray(
        rng.uniform(-6, 6, size=(1000, 3)).astype(np.float32)
    )
    args.output_resolution = 1.0
    args.inference_batch_size = 256
    args.n_inference_samples = 8
    args.no_output_psf = False

    args.dp_devices = 0
    v_single = np.asarray(sample_points(model, xyz, args))
    args.dp_devices = 4
    v_dp = np.asarray(sample_points(model, xyz, args))
    assert np.isfinite(v_dp).all()
    np.testing.assert_allclose(v_dp, v_single, rtol=1e-5, atol=1e-5)
