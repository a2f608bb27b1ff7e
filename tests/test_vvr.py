"""VVR registration test (port of reference tests/svort/test_vvr.py:16-44,
downsized from 128^3 to 64^3 so it runs on the CPU test mesh in reasonable
time; same recovery tolerance)."""

import jax.numpy as jnp
import numpy as np
import pytest

from nesvor_tpu.svort.registration import VVR
from nesvor_tpu.transform import RigidTransform
from nesvor_tpu.utils import ncc_loss
from tests.helpers import assert_close
from tests.phantom3d import phantom3d

pytestmark = pytest.mark.slow


def test_vvr():
    phantom = jnp.asarray(phantom3d(n=64), jnp.float32)[None, None]
    vvr = VVR(
        num_levels=3,
        num_steps=8,
        step_size=2,
        max_iter=20,
        optimizer={"name": "gd", "momentum": 0.1},
        loss=lambda s, x, y: ncc_loss(x[None], y[None], win=None, reduction="none"),
        auto_grad=False,
    )

    trans_first = False
    source = phantom
    target = phantom

    params = {"res_s": 1, "s_thick": 1.5}
    ax = jnp.asarray([[0.4, 0.1, -0.6, 20, -50, 100]], jnp.float32)
    t_target = jnp.asarray(
        [[0.4 + 0.05, 0.1 - 0.05, -0.6 + 0.1, 20 + 3, -50 - 2, 100 + 1.5]],
        jnp.float32,
    )
    t_target = RigidTransform(t_target, trans_first=trans_first)

    ax_out, _ = vvr(ax, source, target, params, t_target, trans_first)

    assert_close(
        ax_out,
        t_target.axisangle(trans_first=trans_first),
        atol=1e-4,
        rtol=1e-3,
    )


def test_vvr_batched_matches_sequential():
    """A multi-sample VVR run (the batched multi-init used by
    stack_registration) must reproduce each sample's sequential result:
    samples only share the iteration loop, never state."""
    phantom = jnp.asarray(phantom3d(n=32), jnp.float32)[None, None]
    rng = np.random.default_rng(3)
    # two distinct sources: phantom and a shifted/attenuated variant
    src2 = jnp.roll(phantom, 2, axis=-1) * 0.8
    target = phantom

    def make_vvr():
        return VVR(
            num_levels=2,
            num_steps=3,
            step_size=2,
            max_iter=8,
            optimizer={"name": "gd", "momentum": 0.1},
            loss=lambda s, x, y: ncc_loss(x, y, win=None, reduction="none"),
            auto_grad=False,
        )

    params = {"res_s": 1, "s_thick": 1.5}
    trans_first = False
    t_target = RigidTransform(
        jnp.asarray([[0.1, -0.05, 0.2, 2.0, -1.0, 1.5]], jnp.float32),
        trans_first=trans_first,
    )
    ax0 = jnp.asarray(
        rng.normal(0, 0.1, (2, 6)) * np.asarray([1, 1, 1, 20, 20, 20]),
        jnp.float32,
    )

    ax_b, ncc_b = make_vvr()(
        ax0, jnp.concatenate([phantom, src2], 0), target, params,
        t_target, trans_first,
    )
    for i, src in enumerate([phantom, src2]):
        ax_s, ncc_s = make_vvr()(
            ax0[i : i + 1], src, target, params, t_target, trans_first
        )
        assert_close(ax_b[i : i + 1], ax_s, atol=1e-5, rtol=1e-5)
        # vmapped packing fuses differently from the single-volume path;
        # the NCC values agree to float32 noise
        assert_close(
            jnp.asarray(ncc_b).reshape(-1)[i],
            jnp.asarray(ncc_s).reshape(-1)[0],
            atol=1e-4, rtol=1e-4,
        )


def test_vvr_level_split_matches_full():
    """Running the pyramid as a coarse pass (levels [1]) followed by a fine
    pass (levels [0]) must follow the exact trajectory of one [1, 0] run —
    the property the multi-init pruning in stack_registration relies on
    (momentum resets at every level boundary, so splitting levels across
    calls changes nothing for a surviving candidate)."""
    phantom = jnp.asarray(phantom3d(n=32), jnp.float32)[None, None]
    params = {"res_s": 1, "s_thick": 1.5}
    trans_first = False
    t_target = RigidTransform(
        jnp.asarray([[0.1, -0.05, 0.2, 2.0, -1.0, 1.5]], jnp.float32),
        trans_first=trans_first,
    )
    ax0 = jnp.asarray([[0.05, -0.1, 0.02, 3.0, -2.0, 1.0]], jnp.float32)

    def make_vvr(levels=None):
        return VVR(
            num_levels=2,
            num_steps=3,
            step_size=2,
            max_iter=8,
            optimizer={"name": "gd", "momentum": 0.1},
            loss=lambda s, x, y: ncc_loss(x, y, win=None, reduction="none"),
            auto_grad=False,
            levels=levels,
        )

    # Drive multilevel() directly (degree units throughout): going through
    # __call__ twice adds a degree<->radian round trip between the calls,
    # and that ~1e-7 perturbation can flip a borderline accept decision in
    # a later iteration, amplifying to ~1e-4 in the final pose (measured)
    # — accept-flip sensitivity of the discrete accept rule, not a level-
    # subsetting error. The invariant under test is that the SAME degree
    # trajectory continues exactly across a level split.
    def run_levels(levels, theta_deg):
        vvr = make_vvr(levels=levels)
        vvr.theta_t = t_target
        vvr.trans_first = trans_first
        vvr.prepare(theta_deg, phantom, phantom, params)
        return vvr.multilevel(theta_deg, phantom, phantom)

    theta0_deg = make_vvr().rad2degree(ax0)
    ax_full, ncc_full = run_levels([1, 0], theta0_deg)
    ax_mid, _ = run_levels([1], theta0_deg)
    ax_split, ncc_split = run_levels([0], ax_mid)
    assert_close(ax_split, ax_full, atol=1e-6, rtol=1e-6)
    assert_close(ncc_split, ncc_full, atol=1e-7, rtol=1e-6)


def test_vvr_device_loop_matches_host(monkeypatch):
    """The lax.while_loop device stage (_vvr_stage) must follow the host
    iteration loop exactly: same accepted steps, same freeze behavior,
    same early exit — on a multi-row batch with distinct sources (the
    stack_registration shape). Also pins max_points: a capped grid is a
    different (smaller) problem, so the cap must apply identically on
    both paths."""
    phantom = jnp.asarray(phantom3d(n=32), jnp.float32)[None, None]
    src2 = jnp.roll(phantom, 2, axis=-1) * 0.8
    params = {"res_s": 1, "s_thick": 1.5}
    trans_first = False
    t_target = RigidTransform(
        jnp.asarray([[0.1, -0.05, 0.2, 2.0, -1.0, 1.5]], jnp.float32),
        trans_first=trans_first,
    )
    rng = np.random.default_rng(7)
    ax0 = jnp.asarray(
        rng.normal(0, 0.1, (2, 6)) * np.asarray([1, 1, 1, 10, 10, 10]),
        jnp.float32,
    )

    def run(max_points):
        return VVR(
            num_levels=2,
            num_steps=3,
            step_size=2,
            max_iter=8,
            optimizer={"name": "gd", "momentum": 0.1},
            loss=lambda s, x, y: ncc_loss(x, y, win=None, reduction="none"),
            auto_grad=False,
            max_points=max_points,
        )(
            ax0, jnp.concatenate([phantom, src2], 0), phantom, params,
            t_target, trans_first,
        )

    for max_points in (None, 2000):
        monkeypatch.delenv("NESVOR_TPU_VVR_DEVICE_LOOP", raising=False)
        ax_dev, ncc_dev = run(max_points)
        monkeypatch.setenv("NESVOR_TPU_VVR_DEVICE_LOOP", "0")
        ax_host, ncc_host = run(max_points)
        assert_close(ax_dev, ax_host, atol=1e-5, rtol=1e-5)
        assert_close(ncc_dev, ncc_host, atol=1e-5, rtol=1e-5)
