"""Classical multilevel rigid registration (rebuild of reference
nesvor/svort/registration.py:10-284).

TPU-first restructuring of the reference's host-driven optimizer:

  * the per-sample active set (reference :110-130, dynamic tensor shrinking)
    becomes a convergence *mask* over a static batch — shapes never change
    under jit;
  * the numeric central-difference gradient (reference :140-155, 12
    sequential loss evaluations) is computed in ONE batched warp: the
    (N, 6) parameter batch is expanded to (N*13, 6) [theta, theta±step·e_j]
    and evaluated in a single fused grid-sample — a 13x reduction in kernel
    dispatches;
  * per-level image shapes are static per level, so each level gets its own
    jitted evaluate.

Semantics match the reference: normalized-gradient descent with momentum,
step accepted only while the loss improves, per-level gaussian blur +
resample pyramid, degrees for rotations during optimization.
"""

from __future__ import annotations

import os
import time
import types
from functools import partial
from typing import Callable, Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.interp import grid_sample_2d, grid_sample_3d
from ..transform import RigidTransform
from ..utils import gaussian_blur, meshgrid, ncc_loss

_DEG2RAD = np.array([np.pi / 180, np.pi / 180, np.pi / 180, 1, 1, 1], np.float32)

# Per-level telemetry of the most recent multilevel() run: list of
# {"level", "wall_s", "iters", "rows"} dicts — consumed by the VVR perf
# work (PERF.md round-5) and scripts/bench_full_pipeline.py.
LAST_VVR_STATS: List[dict] = []


def resample(x: jnp.ndarray, res_xyz_old, res_xyz_new) -> jnp.ndarray:
    """Arbitrary-factor grid_sample resampler (reference registration.py:267-284).
    x is (N, C, *spatial) with spatial in (z, y, x) order; res lists are
    ordered like the spatial dims reversed (x first)."""
    ndim = x.ndim - 2
    assert len(res_xyz_new) == len(res_xyz_old) == ndim
    grids = []
    for i in range(ndim):
        fac = res_xyz_old[i] / res_xyz_new[i]
        size_new = int(x.shape[-i - 1] * fac)
        grid_max = (size_new - 1) / fac / (x.shape[-i - 1] - 1)
        grids.append(jnp.linspace(-grid_max, grid_max, size_new, dtype=x.dtype))
    grid = jnp.stack(jnp.meshgrid(*grids[::-1], indexing="ij")[::-1], -1)

    sampler = grid_sample_3d if ndim == 3 else grid_sample_2d

    def sample_one(vol):
        return sampler(vol, grid)

    N, C = x.shape[0], x.shape[1]
    flat = x.reshape((N * C,) + x.shape[2:])
    out = jax.vmap(sample_one)(flat)
    return out.reshape((N, C) + out.shape[1:])


class Registration:
    """Multilevel coarse-to-fine registration base (reference :10-186)."""

    def __init__(
        self,
        num_levels: int,
        num_steps: int,
        step_size: float,
        max_iter: int,
        optimizer: Dict,
        loss: Union[Dict, Callable],
        auto_grad: bool,
        levels: Optional[List[int]] = None,
        max_points: Optional[int] = None,
    ) -> None:
        self.num_levels = num_levels
        self.current_level = num_levels - 1
        self.num_steps = [num_steps] * num_levels
        self.step_sizes = [step_size * 2**level for level in range(num_levels)]
        self.max_iter = max_iter
        self.auto_grad = auto_grad
        # Optional subset of pyramid levels to run (coarse-to-fine order),
        # e.g. [2, 1] for a coarse pass or [0] for a fine polish. The step
        # size / blur / resample schedule of each level is unchanged, and
        # momentum resets at every level boundary either way — so running
        # [2, 1] then [0] in two calls follows the exact trajectory of one
        # [2, 1, 0] run. Default: all levels.
        self.levels = levels
        # Optional cap on the number of masked grid points the loss is
        # evaluated over at each level (deterministic stride subsample of
        # the flat masked index). A 6-DOF rigid problem needs ~1e2 points
        # per DOF for a stable NCC gradient; the finest pyramid level of an
        # inference-scale VVR has ~1.5e6 — warping all of them through the
        # 13-row FD stencil is what makes level 0 compute-bound (PERF.md
        # round-5: 4.3 s/iter). None (the default, and what the
        # reference-tolerance tests use) evaluates the full masked grid.
        self.max_points = max_points

        if isinstance(loss, dict):
            loss = dict(loss)
            loss_name = loss.pop("name")
            if loss_name == "mse":
                self.loss = lambda x, y: (x - y) ** 2
            elif loss_name == "ncc":
                self.loss = lambda x, y: ncc_loss(
                    x, y, reduction="none", level=self.current_level, **loss
                )
            else:
                raise ValueError("unknown loss")
        elif callable(loss):
            self.loss = lambda x, y: loss(self, x, y)
        else:
            raise ValueError("unknown loss")

        if optimizer["name"] == "gd" and "momentum" not in optimizer:
            optimizer = dict(optimizer, momentum=0)
        self.optimizer = dict(optimizer)
        self._momentum_buf: Optional[jnp.ndarray] = None

    # ---- units -------------------------------------------------------------
    def degree2rad(self, theta):
        return theta * jnp.asarray(_DEG2RAD, theta.dtype)

    def rad2degree(self, theta):
        return theta / jnp.asarray(_DEG2RAD, theta.dtype)

    # ---- hooks -------------------------------------------------------------
    def prepare(self, theta, source, target, params):
        return

    def update_level(self, theta, source, target):
        raise NotImplementedError

    def warp(self, theta, source, target):
        raise NotImplementedError

    # ---- core --------------------------------------------------------------
    def evaluate(self, theta, source, target):
        warped, tgt = self.warp(theta, source, target)
        loss = self.loss(warped, tgt)
        return loss.reshape(loss.shape[0], -1).mean(1)

    def _evaluate_grouped(self, theta_big, source, target, n_groups, N):
        """Evaluate a (n_groups*N)-row parameter batch with ONE warp, but
        apply the loss per N-sized group so custom loss callables keep the
        reference's batch contract (they see exactly the original batch)."""
        # ``warp`` accepts any source batch that divides the parameter
        # rows (rows are laid out [group0 samples | group1 samples | ...],
        # so row g*N + i pairs with source i) — no tiling needed
        warped, tgt = self.warp(theta_big, source, target)
        losses = []
        for g in range(n_groups):
            w = warped[g * N : (g + 1) * N]
            t = tgt[g * N : (g + 1) * N]
            loss = self.loss(w, t)
            losses.append(loss.reshape(loss.shape[0], -1).mean(1))
        return jnp.stack(losses, 0)  # (n_groups, N) or (n_groups, 1)

    def grad(self, theta, source, target, step_size, loss=None):
        """Loss + gradient. auto_grad uses JAX autodiff; otherwise a batched
        central difference: ONE warp over the FD-stencil parameter rows (the
        reference evaluates 13 times sequentially, registration.py:140-155),
        with the loss applied per group to keep its batch semantics.

        ``loss`` — the loss at ``theta``, when the caller already knows it
        (the accepted step of the previous iteration evaluated it): skips the
        base row of the stencil, 13 -> 12 warped groups (~7% of VVR time)."""
        if self.auto_grad:
            if loss is None:
                loss = self.evaluate(theta, source, target)
            grads = jax.grad(lambda t: self.evaluate(t, source, target).sum())(theta)
            return loss, grads
        N = theta.shape[0]
        eye = jnp.eye(6, dtype=theta.dtype) * step_size
        pert = jnp.concatenate([eye, -eye], 0)  # (12, 6): +e_j then -e_j
        fd_rows = (theta[None, :, :] + pert[:, None, :]).reshape(12 * N, 6)
        if loss is None:
            # rows: [theta (N) | group g = theta + pert[g-1] (12 groups of N)]
            big = jnp.concatenate([theta, fd_rows], 0)
            losses = self._evaluate_grouped(big, source, target, 13, N)
            loss, fd = losses[0], losses[1:]
        else:
            fd = self._evaluate_grouped(fd_rows, source, target, 12, N)
        grad = (fd[0:6] - fd[6:12]).T  # (N, 6)
        return loss, grad

    def optimizer_step(self, grad, active, first):
        if self.optimizer["name"] != "gd":
            raise ValueError("unknown optimizer")
        m = self.optimizer["momentum"]
        if m:
            if first or self._momentum_buf is None:
                self._momentum_buf = grad
            else:
                self._momentum_buf = jnp.where(
                    active[:, None], self._momentum_buf * m + grad, self._momentum_buf
                )
            step = self._momentum_buf
        else:
            step = grad
        return step / (jnp.linalg.norm(step, axis=-1, keepdims=True) + 1e-6)

    # Early-exit check cadence. ``bool(active.any())`` is a blocking device
    # fetch each iteration; a strided check (queue K iterations, sync once)
    # was tried to hide the dispatch-tunnel round-trips — and MEASURED
    # SLOWER at pipeline scale (230 vs 160 s VVR phase): stages typically
    # converge within a few iterations, so the masked no-op iterations a
    # stride runs past the exit point cost more device time than the
    # round-trips saved. Keep the per-iteration check.
    exit_check_every = 1

    def step(self, theta, source, target, step_size, loss=None):
        """One GD stage with per-sample accept/freeze masking
        (reference :110-130). ``loss`` optionally carries the loss at the
        incoming ``theta`` (valid between stages of one level — the images
        do not change); the loss of every accepted step is carried forward
        so each iteration warps 12 FD groups + 1 trial instead of 13 + 1.
        Returns (theta, loss_all, carried loss at theta, iterations run)."""
        N = theta.shape[0]
        active = jnp.ones(N, dtype=bool)
        loss_all = jnp.zeros(N, theta.dtype)
        self._momentum_buf = None
        iters = 0
        for it in range(self.max_iter):
            loss, grad = self.grad(theta, source, target, step_size, loss=loss)
            loss_all = jnp.where(active, loss, loss_all)
            step = self.optimizer_step(grad, active, it == 0) * (-step_size)
            theta_new = theta + step
            loss_new = self.evaluate(theta_new, source, target)
            improved = jnp.logical_and(active, loss_new < loss)
            theta = jnp.where(improved[:, None], theta_new, theta)
            loss = jnp.where(improved, loss_new, loss)
            active = improved
            iters = it + 1
            if (it + 1) % self.exit_check_every == 0 and not bool(
                active.any()
            ):
                break
        return theta, jax.lax.stop_gradient(loss_all), loss, iters

    def singlelevel(self, theta, source, target, num_steps, step_size):
        loss_all = None
        carry = None
        iters = 0
        for _ in range(num_steps):
            theta, loss_all, carry, it = self.step(
                theta, source, target, step_size, loss=carry
            )
            iters += it
            step_size /= 2
        return theta, loss_all, iters

    def multilevel(self, theta, source, target):
        loss = None
        levels = (
            self.levels
            if self.levels is not None
            else range(self.num_levels - 1, -1, -1)
        )
        for level in levels:
            t0 = time.time()
            self.current_level = level
            source_new, target_new = self.update_level(theta, source, target)
            theta, loss, iters = self.singlelevel(
                theta,
                source_new,
                target_new,
                self.num_steps[level],
                self.step_sizes[level],
            )
            self._momentum_buf = None
            LAST_VVR_STATS.append({
                "level": level,
                "wall_s": round(time.time() - t0, 2),
                "iters": iters,
                "rows": int(theta.shape[0]),
            })
        return theta, loss

    def __call__(self, theta, source, target, params):
        self.prepare(theta, source, target, params)
        theta0 = jnp.array(theta)
        theta = self.rad2degree(jax.lax.stop_gradient(theta))
        theta, loss = self.multilevel(theta, source, target)
        dtheta = self.degree2rad(theta) - theta0
        return theta0 + dtheta, loss

    def evaluate_level(self, theta, source, target, level=0):
        """Loss-only evaluation of every parameter row at ONE pyramid level
        — no optimization. Used by the multi-init pruning chooser
        (svort/inference.py): ranking candidates by their loss AT THE FINE
        RESOLUTION before polishing picks the same winner the unpruned
        all-candidates-all-levels run would, where ranking by the coarse
        level's final loss measurably does not (PERF.md round-5: the
        coarse-NCC chooser cost 0.55 dB on the composed pipeline).
        Caller must run ``prepare`` first (or call through a wrapper that
        does); one warp over all rows, a few dispatches total."""
        theta_deg = self.rad2degree(jax.lax.stop_gradient(theta))
        self.current_level = level
        source_new, target_new = self.update_level(theta_deg, source, target)
        return self.evaluate(theta_deg, source_new, target_new)


def _vvr_warp_rows(
    theta_deg, packed, grid, grid_scale, target_flat, theta_t, trans_first
):
    """Warp every (degree-unit) parameter row against its corner-packed
    source and pair it with the flat masked target (the shared core of
    ``VVR.warp`` and the device-loop stage ``_vvr_stage`` — one
    implementation so the two paths cannot drift).

    ``packed``: PackedVolume whose rows carry a leading source dim Ns
    (``jax.vmap(corner_pack_volume)``). Parameter rows are laid out
    [group0 | group1 | ...] with each group containing Ns consecutive rows
    paired to sources 0..Ns-1; Ns == 1 shares the single source across all
    rows."""
    transforms = (
        RigidTransform(
            theta_deg * jnp.asarray(_DEG2RAD, theta_deg.dtype),
            trans_first=trans_first,
        )
        .inv()
        .compose(theta_t)
        .matrix()
    )  # (N, 3, 4)
    g = jnp.matmul(
        transforms[:, None, :, :3],
        grid[None, :, :, None] + transforms[:, None, :, 3:],
    )
    g = g[..., 0] * grid_scale  # (N, V, 3)
    Ns = packed.rows.shape[0]
    N = g.shape[0]
    if Ns == 1:
        p0 = jax.tree_util.tree_map(lambda x: x[0], packed)
        warped = jax.vmap(lambda gr: grid_sample_3d(p0, gr))(g)
    else:
        assert N % Ns == 0, (N, Ns)
        g_r = g.reshape(N // Ns, Ns, *g.shape[1:])
        warped = jax.vmap(
            lambda gr: jax.vmap(grid_sample_3d)(packed, gr)
        )(g_r).reshape(N, *g.shape[1:-1])
    tgt = jnp.broadcast_to(target_flat[None], (N,) + target_flat.shape)
    return warped.reshape(N, 1, -1), tgt.reshape(N, 1, -1)


@partial(
    jax.jit,
    static_argnames=(
        "loss_fn", "trans_first", "momentum", "max_iter", "has_loss", "level"
    ),
)
def _vvr_stage(
    theta, source, grid, grid_scale, target_flat, theta_t, step_size,
    loss_in, *, loss_fn, trans_first, momentum, max_iter, has_loss, level,
):
    """One GD stage of ``VVR`` as a single device program: the per-iteration
    loop (FD gradient -> momentum step -> trial -> per-sample accept/freeze
    -> early exit when no sample improves) runs inside ``lax.while_loop``,
    so a stage costs ONE dispatch + one host fetch instead of ~6 dispatches
    and a blocking ``active.any()`` fetch per iteration (PERF.md round-5:
    the coarse pyramid levels were host-loop-overhead-bound at ~1.8 s/iter
    for ~25 k-point grids). Semantics are identical to the host loop in
    ``Registration.step`` — pinned by test_vvr_device_loop_matches_host —
    and the early exit happens ON DEVICE at every iteration, unlike the
    measured-and-reverted strided host check (no masked overshoot).
    ``level`` only keys the jit cache: dict-config NCC losses close over
    ``self.current_level``, so equal-shape programs at different levels
    must not share a cache entry."""
    from ..ops.interp import corner_pack_volume

    N = theta.shape[0]
    if source.shape[0] == 1:
        packed = jax.tree_util.tree_map(
            lambda x: x[None], corner_pack_volume(source[0, 0])
        )
    else:
        packed = jax.vmap(corner_pack_volume)(source[:, 0])

    def rows_loss(th_rows, n_groups):
        warped, tgt = _vvr_warp_rows(
            th_rows, packed, grid, grid_scale, target_flat, theta_t,
            trans_first,
        )
        out = []
        for gi in range(n_groups):
            lv = loss_fn(warped[gi * N:(gi + 1) * N], tgt[gi * N:(gi + 1) * N])
            out.append(lv.reshape(N, -1).mean(1))
        return jnp.stack(out, 0)

    loss0 = loss_in if has_loss else rows_loss(theta, 1)[0]
    eye = jnp.eye(6, dtype=theta.dtype) * step_size
    pert = jnp.concatenate([eye, -eye], 0)  # (12, 6): +e_j then -e_j

    def body(c):
        it, th, loss, loss_all, mom, active = c
        fd_rows = (th[None, :, :] + pert[:, None, :]).reshape(12 * N, 6)
        fd = rows_loss(fd_rows, 12)
        grad = (fd[0:6] - fd[6:12]).T  # (N, 6)
        loss_all = jnp.where(active, loss, loss_all)
        if momentum:
            mom = jnp.where(
                it == 0, grad,
                jnp.where(active[:, None], mom * momentum + grad, mom),
            )
        else:
            mom = grad
        step_dir = mom / (jnp.linalg.norm(mom, axis=-1, keepdims=True) + 1e-6)
        th_new = th + step_dir * (-step_size)
        loss_new = rows_loss(th_new, 1)[0]
        improved = jnp.logical_and(active, loss_new < loss)
        th = jnp.where(improved[:, None], th_new, th)
        loss = jnp.where(improved, loss_new, loss)
        return (it + 1, th, loss, loss_all, mom, improved)

    def cond(c):
        return jnp.logical_and(c[0] < max_iter, c[5].any())

    init = (
        jnp.int32(0), theta, loss0, jnp.zeros(N, theta.dtype),
        jnp.zeros_like(theta), jnp.ones(N, bool),
    )
    it, th, loss, loss_all, _, _ = jax.lax.while_loop(cond, body, init)
    return th, jax.lax.stop_gradient(loss_all), loss, it


class VVR(Registration):
    """Volume-to-volume rigid registration (reference :189-264)."""

    def __init__(
        self, num_levels, num_steps, step_size, max_iter, optimizer, loss,
        auto_grad, levels=None, max_points=None,
    ):
        super().__init__(
            num_levels, num_steps, step_size, max_iter, optimizer, loss,
            auto_grad, levels=levels, max_points=max_points,
        )
        self.theta_t: Optional[RigidTransform] = None
        self._grid = None
        self._grid_scale = None
        self._target_flat = None
        self.trans_first = True

    def prepare(self, theta, source, target, params):
        res = [params["s_thick"], params["res_s"], params["res_s"]]
        self.res = min(res)
        self.relative_res = [r / self.res for r in res]

    def update_level(self, theta, source, target):
        sigma = [0.5 * (2**self.current_level) / r for r in self.relative_res]
        source = gaussian_blur(source, sigma, truncated=4.0)
        target = gaussian_blur(target, sigma, truncated=4.0)

        source = resample(source, self.relative_res[::-1], [2**self.current_level] * 3)
        target = resample(target, self.relative_res[::-1], [2**self.current_level] * 3)

        res_new = self.res * (2**self.current_level)
        mask = np.asarray(target > 0).reshape(-1)
        midx_np = np.nonzero(mask)[0]
        if self.max_points and midx_np.size > self.max_points:
            # deterministic stride subsample (raster order — spatially
            # ~uniform); see the ``max_points`` comment in __init__
            stride = int(np.ceil(midx_np.size / self.max_points))
            midx_np = midx_np[::stride]
        midx = jnp.asarray(midx_np)

        grid = meshgrid(
            (target.shape[-1], target.shape[-2], target.shape[-3]),
            (res_new, res_new, res_new),
        ).reshape(-1, 3)
        self._grid = grid[midx]
        self._target_flat = target.reshape(-1)[midx]

        scale = jnp.asarray(
            [
                2.0 / (source.shape[-1] - 1),
                2.0 / (source.shape[-2] - 1),
                2.0 / (source.shape[-3] - 1),
            ],
            dtype=source.dtype,
        )
        self._grid_scale = scale / res_new
        return source, target

    def warp(self, theta, source, target):
        # corner-packed sampling: one 32 B gather per warped point instead of
        # 8 (the finite-difference grad warps a 13x parameter batch through
        # this — the dominant cost of VVR on TPU)
        from ..ops.interp import corner_pack_volume

        if source.shape[0] == 1:
            packed = jax.tree_util.tree_map(
                lambda x: x[None], corner_pack_volume(source[0, 0])
            )
        else:
            packed = jax.vmap(corner_pack_volume)(source[:, 0])
        return _vvr_warp_rows(
            theta, packed, self._grid, self._grid_scale, self._target_flat,
            self.theta_t, self.trans_first,
        )

    def step(self, theta, source, target, step_size, loss=None):
        """Device-loop GD stage (``_vvr_stage``): the whole iteration loop
        is one dispatch. Falls back to the host loop for autodiff losses,
        non-GD optimizers, or NESVOR_TPU_VVR_DEVICE_LOOP=0."""
        if (
            self.auto_grad
            or self.optimizer["name"] != "gd"
            or os.environ.get("NESVOR_TPU_VVR_DEVICE_LOOP", "1") == "0"
        ):
            return super().step(theta, source, target, step_size, loss)
        has_loss = loss is not None
        th, loss_all, carry, iters = _vvr_stage(
            theta, source, self._grid, self._grid_scale, self._target_flat,
            self.theta_t, jnp.asarray(step_size, theta.dtype),
            loss if has_loss else jnp.zeros(theta.shape[0], theta.dtype),
            loss_fn=self.loss, trans_first=self.trans_first,
            momentum=float(self.optimizer.get("momentum", 0)),
            max_iter=int(self.max_iter), has_loss=has_loss,
            level=int(self.current_level),
        )
        return th, loss_all, carry, int(iters)

    def __call__(self, theta, source, target, params, transform_t, trans_first):
        self.theta_t = transform_t
        self.trans_first = trans_first
        return super().__call__(theta, source, target, params)

    def evaluate_at(
        self, theta, source, target, params, transform_t, trans_first,
        level=0,
    ):
        """Per-row loss at one pyramid level without optimizing (see
        ``Registration.evaluate_level``)."""
        self.theta_t = transform_t
        self.trans_first = trans_first
        self.prepare(theta, source, target, params)
        return self.evaluate_level(theta, source, target, level=level)
