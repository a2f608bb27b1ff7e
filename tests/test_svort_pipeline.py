"""Registration pipeline tests: SVoRT v1 forward (triplet runner), the v2
all-stack runner + score-weighted SRR, the full run_svort svort path with
random weights, and the stack-registration (VVR) path, on tiny stacks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nesvor_tpu.image import Stack
from tests.synth import make_phantom_stacks

pytestmark = pytest.mark.slow


def test_svort_v1_forward_tiny():
    from nesvor_tpu.svort.models import SVoRT, run_model
    from nesvor_tpu.transform import RigidTransform

    model = SVoRT(n_iter=1)
    params = model.init(jax.random.PRNGKey(0))

    n_slice, hw = 3, 32
    stacks = [
        jnp.asarray(
            np.random.default_rng(i).uniform(0, 1, size=(n_slice, 1, hw, hw)),
            jnp.float32,
        )
        for i in range(3)
    ]
    transforms = []
    for i in range(3):
        ax = np.zeros((n_slice, 6), np.float32)
        ax[:, 5] = (np.arange(n_slice) - n_slice / 2) * 3.0
        transforms.append(RigidTransform(jnp.asarray(ax)))

    t_out, volume = run_model(
        transforms, stacks, model, params, res_s=1.0, s_thick=3.0, res_r=1.0
    )
    assert len(t_out) == 3
    assert t_out[0].matrix().shape == (n_slice, 3, 4)
    assert bool(jnp.all(jnp.isfinite(t_out[0].matrix())))
    assert bool(jnp.all(jnp.isfinite(volume)))


@pytest.mark.slow
def test_svort_v2_forward_tiny():
    """v2 all-stack runner: svrnet1 (iter 0) -> svrnet2 (iter 1) with the
    per-slice score head weighting the CG SRR (reference
    inference.py:134-173, models.py:121-210)."""
    from nesvor_tpu.svort.models import SVoRTv2, run_model_all_stack
    from nesvor_tpu.transform import RigidTransform

    model = SVoRTv2(n_iter=2)
    params = model.init(jax.random.PRNGKey(0))

    n_slice, hw = 3, 32
    stacks = [
        jnp.asarray(
            np.random.default_rng(i).uniform(0, 1, size=(n_slice, 1, hw, hw)),
            jnp.float32,
        )
        for i in range(2)
    ]
    transforms = []
    for i in range(2):
        ax = np.zeros((n_slice, 6), np.float32)
        ax[:, 5] = (np.arange(n_slice) - n_slice / 2) * 3.0
        transforms.append(RigidTransform(jnp.asarray(ax)))

    t_out, volume = run_model_all_stack(
        transforms, stacks, model, params, res_s=1.0, s_thick=3.0, res_r=1.0
    )
    assert len(t_out) == 2
    assert t_out[0].matrix().shape == (n_slice, 3, 4)
    for t in t_out:
        assert bool(jnp.all(jnp.isfinite(t.matrix())))
    assert bool(jnp.all(jnp.isfinite(volume)))
    # the score head ran: per-slice IQA weights in (0, 3], softmax*N-scaled
    score = np.asarray(model.iqa_score)
    assert score.shape[0] == 2 * n_slice
    assert np.all(score > 0) and np.all(score <= 3.0)
    assert abs(score.mean() - 1.0) < 1.0  # softmax*N keeps mass ~N


@pytest.mark.slow
@pytest.mark.parametrize("version", ["v1", "v2"])
def test_run_svort_full_pipeline_random_weights(version):
    """The real `--registration svort` code path end-to-end (run_model[_all_
    stack] -> correct_svort -> get_transforms_full -> VVR -> scoring -> final
    selection, reference inference.py:447-562) with random weights."""
    from nesvor_tpu.svort.inference import run_svort
    from nesvor_tpu.svort.models import SVoRT, SVoRTv2

    if version == "v1":
        model = SVoRT(n_iter=1)
    else:
        model = SVoRTv2(n_iter=1)
    params = model.init(jax.random.PRNGKey(1))

    stacks, _ = make_phantom_stacks(
        vs=24, n_stacks=3, gap=3.0, res=1.0, res_s=1.5, intensity=700.0
    )
    slices = run_svort(stacks, model, params, svort=True, vvr=True, force_vvr=False)
    assert len(slices) > 0
    v = jnp.concatenate([s.v_masked for s in slices])
    assert 0.5 < float(jnp.quantile(v, 0.99)) < 2.0
    for s in slices[:3]:
        assert bool(jnp.all(jnp.isfinite(s.transformation.axisangle())))


def test_run_svort_stack_registration():
    """--registration stack path: parse_data + multi-init VVR + final
    normalization, on small misaligned stacks."""
    from nesvor_tpu.svort.inference import run_svort

    stacks, gt = make_phantom_stacks(
        vs=24, n_stacks=2, gap=3.0, res=1.0, res_s=1.5, intensity=700.0
    )
    # misalign stack 1 by a small rigid offset
    ax = np.array(stacks[1].transformation.axisangle())
    ax[:, 3] += 1.5
    from nesvor_tpu.transform import RigidTransform

    stacks[1].transformation = RigidTransform(jnp.asarray(ax))

    slices = run_svort(stacks, None, None, svort=False, vvr=True, force_vvr=False)
    assert len(slices) > 0
    v = jnp.concatenate([s.v_masked for s in slices])
    # q99-normalized output
    assert 0.5 < float(jnp.quantile(v, 0.99)) < 2.0
    for s in slices[:3]:
        assert bool(jnp.all(jnp.isfinite(s.transformation.axisangle())))


def test_run_svort_none():
    """--registration none path: normalization only."""
    from nesvor_tpu.svort.inference import run_svort

    stacks, _ = make_phantom_stacks(
        vs=16, n_stacks=2, gap=3.0, res=1.0, res_s=1.0, intensity=700.0
    )
    slices = run_svort(stacks, None, None, svort=False, vvr=False, force_vvr=False)
    assert len(slices) == sum(
        int(np.asarray(s.mask).reshape(len(s.mask), -1).any(1).sum()) for s in stacks
    )
