"""NeSVoR training engine (rebuild of reference nesvor/nesvor/train.py).

TPU-first design: the pixel bag lives on device; each jit-compiled train
step samples a pixel batch, runs MC-PSF rendering + loss + optax AdamW
update, and steps are chunked through ``lax.scan`` so the host dispatches
once per logging interval instead of once per iteration (the reference's
eager loop syncs every step for the EMA logger, train.py:199-200).

Deviations from the reference, by design:
  * batches are sampled i.i.d. uniformly (with replacement) from the pixel
    bag instead of epoch-reshuffled contiguous chunks (train.py:60-75) —
    statistically equivalent for SGD, removes the host-side reshuffle;
  * bf16 compute replaces fp16 autocast + GradScaler (no loss scaling
    needed), fp32 master weights.
"""

from __future__ import annotations

import logging
from argparse import Namespace
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..image import Slice, Volume
from ..transform import RigidTransform, transform_points
from ..utils import MovingAverage, TrainLogger, gaussian_blur
from .models import (
    B_REG,
    D_LOSS,
    DS_LOSS,
    I_REG,
    S_LOSS,
    T_REG,
    NeSVoRConfig,
    build_inr_config,
    init_nesvor,
    nesvor_loss,
)


# telemetry from the most recent train() call (steady-state step time from
# the adaptive-chunk measurement, wall clock, chunk size) — consumed by
# bench.py to report compile-vs-steady split
LAST_RUN_STATS: Dict[str, float] = {}
# full final param pytree of the most recent train() call (debug aid for
# inspecting the variance/scale/pose heads post-hoc; not part of the API)
LAST_PARAMS: Dict = {}


def _save_train_state(path: str, params, opt_state, key, done: int, args) -> None:
    """Mid-run training checkpoint (additive — the reference has model-level
    checkpoints only, no resume; SURVEY.md §5). Non-executable flat npz:
    the pytree STRUCTURE is never stored — on load it is rebuilt from the
    live (params, opt_state) of the current run, so unpickling-style code
    execution is impossible. Atomic write so an interrupt mid-save never
    corrupts the previous state."""
    import os

    leaves = jax.tree_util.tree_leaves((params, opt_state))
    arrays = {f"leaf{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["key"] = np.asarray(key)
    seed = getattr(args, "seed", None)
    arrays["meta"] = np.asarray(
        [int(done), int(args.n_iter), -1 if seed is None else int(seed),
         len(leaves)],
        np.int64,
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def _load_train_state(path: str, params, opt_state, args):
    """Restore (params, opt_state, key, done) from a mid-run checkpoint, or
    None when the checkpoint does not match the current run (different
    n_iter/seed or parameter structure) — callers then start fresh."""
    with open(path, "rb") as f:
        if f.read(2) != b"PK":
            logging.warning(
                "train checkpoint %s is a legacy pickle state (pre-npz); "
                "not loading it — starting fresh", path,
            )
            return None
    with np.load(path, allow_pickle=False) as data:
        done, n_iter, seed, n_leaves = (int(v) for v in data["meta"])
        want_seed = getattr(args, "seed", None)
        if n_iter != int(args.n_iter) or seed != (
            -1 if want_seed is None else int(want_seed)
        ):
            logging.warning(
                "train checkpoint %s is for a different run "
                "(n_iter/seed mismatch); starting fresh", path,
            )
            return None
        ref_leaves, treedef = jax.tree_util.tree_flatten((params, opt_state))
        if n_leaves != len(ref_leaves):
            logging.warning(
                "train checkpoint %s does not match the model structure "
                "(%d vs %d leaves); starting fresh",
                path, n_leaves, len(ref_leaves),
            )
            return None
        leaves = [
            jnp.asarray(data[f"leaf{i}"], getattr(r, "dtype", None))
            for i, r in enumerate(ref_leaves)
        ]
        key = jnp.asarray(data["key"])
    params, opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
    return params, opt_state, key, done


@dataclass
class INRModel:
    """Trained-INR handle: everything needed to sample the volume and to
    checkpoint (reference saves INR state_dict + bounding_box, cli/io.py:38-46)."""

    params: Dict
    cfg: Any  # INRConfig
    bounding_box: jnp.ndarray


@jax.jit
def _points_bounds_jit(xyz, slice_idx, transformation):
    from ..transform import mat_transform_points

    mat = transformation.matrix(trans_first=True)
    xyz_t = mat_transform_points(mat[slice_idx], xyz, True)
    return jnp.stack([xyz_t.min(0), xyz_t.max(0)], 0)


@partial(
    jax.jit,
    static_argnames=("shape", "mask_threshold", "resolution_min", "resolution_max"),
)
def _occupancy_jit(
    xyz,
    slice_idx,
    transformation,
    resolution,
    xyz_min,
    shape,
    mask_threshold,
    resolution_min,
    resolution_max,
):
    from ..transform import mat_transform_points

    mat = transformation.matrix(trans_first=True)
    xyz_t = mat_transform_points(mat[slice_idx], xyz, True)
    kji = jnp.round((xyz_t - xyz_min) / resolution_min).astype(jnp.int32)
    flat = kji[..., 0] + shape[2] * kji[..., 1] + shape[2] * shape[1] * kji[..., 2]
    counts = jnp.bincount(flat, length=shape[0] * shape[1] * shape[2])
    mask = counts.reshape((1, 1) + shape).astype(jnp.float32)
    thr = (
        mask_threshold
        * resolution_min**3
        / jnp.exp(jnp.log(resolution).mean()) ** 3
    )
    thr = thr * (mask.sum() / jnp.maximum((mask > 0).sum(), 1))
    return (
        gaussian_blur(mask, resolution_max / resolution_min, 3.0) > thr
    )[0, 0]


@jax.jit
def _bbox_mean_jit(xyz, v, slice_idx, transformation, resolution):
    from ..transform import mat_transform_points

    mat = transformation.matrix(trans_first=True)
    xyz_t = mat_transform_points(mat[slice_idx], xyz, True)
    max_r = resolution.max()
    bbox = jnp.stack([xyz_t.min(0) - 2 * max_r, xyz_t.max(0) + 2 * max_r], 0)
    vq = v if v.size < 256**3 else v[: 256**3]
    q1, q2 = jnp.quantile(vq, jnp.asarray([0.1, 0.9], dtype=vq.dtype))
    sel = jnp.logical_and(v > q1, v < q2)
    n_sel = sel.sum()
    # empty quantile band (discrete intensities): fall back to the plain
    # mean (the reference would produce NaN here)
    mean = jnp.where(
        n_sel > 0,
        jnp.where(sel, v, 0).sum() / jnp.maximum(n_sel, 1),
        v.mean(),
    )
    return bbox, mean


class Dataset:
    """Flattens all masked pixels of all slices into device-resident arrays
    (reference train.py:19-41)."""

    def __init__(self, slices: List[Slice], args: Namespace) -> None:
        self.mask_threshold = getattr(args, "mask_threshold", 1.0)

        xyz_all = []
        v_all = []
        slice_idx_all = []
        transformation_all = []
        resolution_all = []
        from ..native import pixel_bag as _native_bag

        # batch-fetch all slice images/masks, one transfer per distinct
        # shape (per-slice np.asarray costs a ~0.25 s tunnel round trip
        # each — ~60 s for a typical 229-slice dataset)
        by_shape: Dict[Tuple, List[int]] = {}
        for i, s in enumerate(slices):
            by_shape.setdefault(tuple(s.image.shape), []).append(i)
        img_np: Dict[int, np.ndarray] = {}
        msk_np: Dict[int, np.ndarray] = {}
        for idxs in by_shape.values():
            imgs = np.asarray(jnp.stack([slices[i].image for i in idxs]))
            msks = np.asarray(jnp.stack([slices[i].mask for i in idxs]))
            for j, i in enumerate(idxs):
                img_np[i] = imgs[j]
                msk_np[i] = msks[j]

        for i, s in enumerate(slices):
            # host-side pixel extraction: per-slice jnp.nonzero would compile
            # a fresh device program for every distinct masked-pixel count
            # (hundreds of remote compiles); the fused C++ pass (native/)
            # or numpy does this in microseconds
            img = img_np[i]
            msk = msk_np[i]
            res = np.asarray(
                [s.resolution_x, s.resolution_y, s.resolution_z], np.float32
            )
            bag = _native_bag(img, msk, res)
            if bag is not None:
                xyz, v = bag
            else:
                kji = np.stack(np.nonzero(msk), -1)[:, ::-1].astype(np.float32)
                shape_xyz = np.asarray(img.shape[::-1])
                xyz = (kji - (shape_xyz - 1) / 2) * res
                v = img[msk]
            xyz_all.append(xyz)
            v_all.append(v)
            slice_idx_all.append(np.full(xyz.shape[0], i, dtype=np.int32))
            transformation_all.append(s.transformation)
            resolution_all.append(res)

        self.xyz = jnp.asarray(np.concatenate(xyz_all), jnp.float32)
        self.v = jnp.asarray(np.concatenate(v_all), jnp.float32)
        self.slice_idx = jnp.asarray(np.concatenate(slice_idx_all))
        self.transformation = RigidTransform.cat(transformation_all)
        self.resolution = jnp.asarray(np.stack(resolution_all, 0), jnp.float32)

    @property
    def xyz_transformed(self) -> jnp.ndarray:
        mat = self.transformation.matrix(trans_first=True)
        from ..transform import mat_transform_points

        return mat_transform_points(mat[self.slice_idx], self.xyz, True)

    @property
    def bounding_box(self) -> jnp.ndarray:
        """Extent of transformed points ± 2·max_res (reference train.py:43-50)."""
        return self._bbox_mean()[0]

    @property
    def mean(self) -> float:
        """Robust mean via the 10-90% quantile band (reference train.py:53-58)."""
        return self._bbox_mean()[1]

    def _bbox_mean(self):
        """One jitted dispatch for bbox + robust mean (the eager formulation
        cost ~60 s of per-op dispatch latency through the remote tunnel).

        The cache is keyed on the identity of the transformation's
        *underlying arrays* (immutable jnp buffers), so both reassigning
        ``self.transformation`` and swapping the arrays inside the same
        RigidTransform object invalidate it."""
        key = tuple(id(leaf) for leaf in jax.tree.leaves(self.transformation))
        cache = getattr(self, "_bbox_mean_cache", None)
        if cache is None or cache[0] != key:
            bbox, mean = _bbox_mean_jit(
                self.xyz,
                self.v,
                self.slice_idx,
                self.transformation,
                self.resolution,
            )
            self._bbox_mean_cache = (
                key,
                (jnp.asarray(np.asarray(bbox)), float(mean)),
            )
        return self._bbox_mean_cache[1]

    @property
    def mask(self) -> Volume:
        """Occupancy mask volume: bincount of transformed pixels, blurred and
        thresholded (reference train.py:82-120). Two jitted dispatches
        (bounds, then static-shape occupancy)."""
        res = np.asarray(self.resolution)
        resolution_min = float(res.min())
        resolution_max = float(res.max())
        bounds = np.asarray(
            _points_bounds_jit(self.xyz, self.slice_idx, self.transformation)
        )
        xyz_min = bounds[0] - resolution_max * 10
        xyz_max = bounds[1] + resolution_max * 10
        # bucket to multiples of 32: data-dependent shapes would recompile
        # the occupancy program on every run (32 keeps shapes stable under
        # small pose-drift changes of the bounds; see Volume.resample)
        shape_xyz = (
            np.ceil(np.ceil((xyz_max - xyz_min) / resolution_min) / 32) * 32
        ).astype(int)
        shape = (int(shape_xyz[2]), int(shape_xyz[1]), int(shape_xyz[0]))

        mask = _occupancy_jit(
            self.xyz,
            self.slice_idx,
            self.transformation,
            self.resolution,
            jnp.asarray(xyz_min, jnp.float32),
            shape,
            float(self.mask_threshold),
            resolution_min,
            resolution_max,
        )

        xyz_c = xyz_min + (shape_xyz - 1) / 2 * resolution_min
        return Volume(
            mask.astype(jnp.float32),
            mask,
            RigidTransform(
                jnp.asarray(
                    np.concatenate([0 * xyz_c, xyz_c]).reshape(1, 6), jnp.float32
                ),
                True,
            ),
            resolution_min,
            resolution_min,
            resolution_min,
        )


def _decay_mask(params: Dict) -> Dict:
    """weight_decay=1e-2 on the MLP heads only (params named "_net" in the
    reference, train.py:135-152); encoding/pose/embedding leaves get none."""

    def mask_entry(path, leaf):
        names = [str(getattr(p, "key", "")) for p in path]
        return any("_net" in n for n in names)

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    return jax.tree_util.tree_unflatten(
        treedef, [mask_entry(path, leaf) for path, leaf in flat]
    )


def _zero_grad_mask(
    params: Dict, cfg: NeSVoRConfig, var_warmup: int = 0,
    pose_lr_mult: float = 1.0,
):
    """Freeze axisangle when transformation optimization is disabled; route
    the variance/bias heads to their own group when a warmup is requested;
    route the slice poses to their own group when --pose-lr-mult != 1."""

    def label(path, leaf):
        names = [str(getattr(p, "key", "")) for p in path]
        if cfg.no_transformation_optimization and names and names[0] == "axisangle":
            return "frozen"
        if "fourier_basis" in names:  # fixed encoding basis
            return "frozen"
        if var_warmup and names and names[0] in (
            "sigma_net", "b_net", "log_var_slice"
        ):
            return "var"
        if pose_lr_mult != 1.0 and names and names[0] == "axisangle":
            return "pose"
        return "train"

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    return jax.tree_util.tree_unflatten(
        treedef, [label(p, l) for p, l in flat]
    )


def build_optimizer(params: Dict, cfg: NeSVoRConfig, args: Namespace):
    """AdamW betas (0.9, 0.99), eps 1e-15, selective weight decay, multistep
    LR decay with gamma at milestone fractions (reference train.py:135-159).

    ``args.var_warmup_iters`` (optional, default 0) holds the variance/bias
    heads at zero LR for the first N iterations so the density net latches
    onto the signal before the noise model starts reweighting pixels — the
    decoupled-head collapse fix (PERF.md round-2 findings): a small head
    adapts var fast enough early on to kill the density gradient.

    ``args.pose_lr_mult`` (optional, default 1.0) scales the slice-pose
    (axisangle) learning rate relative to the shared schedule — a lever for
    the composed register->reconstruct workload where joint pose
    optimization must absorb per-slice registration residual (VERDICT r05
    item 1)."""
    var_warmup = int(getattr(args, "var_warmup_iters", 0) or 0)
    pose_lr_mult = float(getattr(args, "pose_lr_mult", 1.0) or 1.0)
    boundaries = {
        int(m * args.n_iter): args.gamma for m in args.milestones
    }
    schedule = optax.piecewise_constant_schedule(args.learning_rate, boundaries)

    def make_adamw(lr):
        return optax.adamw(
            learning_rate=lr,
            b1=0.9,
            b2=0.99,
            eps=1e-15,
            weight_decay=1e-2,
            mask=_decay_mask(params),
        )

    groups = {"train": make_adamw(schedule), "frozen": optax.set_to_zero()}
    if var_warmup:
        groups["var"] = make_adamw(
            lambda count: jnp.where(count < var_warmup, 0.0, schedule(count))
        )
    if pose_lr_mult != 1.0:
        groups["pose"] = make_adamw(
            lambda count: pose_lr_mult * schedule(count)
        )
    tx = optax.multi_transform(
        groups, _zero_grad_mask(params, cfg, var_warmup, pose_lr_mult)
    )
    return tx, schedule


def _project_gauge(axisangle, axisangle_init):
    """Remove the mean SE(3) deviation-from-init — the pose gauge mode — from
    the optimized poses.

    Joint pose+INR optimization has a global SE(3) gauge freedom: all slices
    can drift coherently (with the density field following) without changing
    the data term, leaving the reconstruction rotated against the scanner
    frame the user provided (measured: 47.85 mrad over 5000 iters in
    BENCH_r02, costing ~9 dB of raw PSNR vs the gauge-fixed value). The
    reference's transformation regularizer (nesvor/nesvor/models.py:357-363)
    penalizes per-slice deviation too weakly to anchor this mode (0.1 ×
    (0.048)² ≈ 2e-4 at the measured drift).

    Applied after every optimizer update (inside the scanned step), each
    correction is ~urad-scale, so the density field never sees a discrete
    pose jump. (The first round-3 version projected once per dispatch
    chunk — a few mrad at once, which the field had to re-track, measurably
    costing converged gauge-fixed PSNR.) Deviations are composed world-side
    (diff = opt ∘ init⁻¹, the same convention bench.py uses to measure
    drift); the arithmetic mean of axisangle deviations stands in for the
    Karcher mean, exact to second order in the per-step increment.
    """
    x = RigidTransform(axisangle, trans_first=True)
    y = RigidTransform(axisangle_init, trans_first=True)
    diff_ax = x.compose(y.inv()).axisangle(trans_first=False)
    g = RigidTransform(diff_ax.mean(0, keepdims=True), trans_first=False)
    return g.inv().compose(x).axisangle(trans_first=True)


def make_train_step(
    cfg: NeSVoRConfig,
    bounding_box: jnp.ndarray,
    loss_weights: Dict[str, float],
    tx,
    batch_size: int,
    n_pixels: int,
    mesh=None,
    gauge_anchor: bool = True,
    trans_reg_decay_iters: int = 0,
):
    """Build the jitted chunked train step.

    ``mesh`` (optional ``jax.sharding.Mesh`` with a "dp" axis) enables data
    parallelism — the one strategy that pays for this model size (SURVEY.md
    §2.3): the pixel bag is sharded on axis 0, each device draws its local
    sub-batch (``batch_size // n_dev``), and per-step gradients/losses are
    ``pmean``-reduced over ICI; params and optimizer state stay replicated.
    The scan lives INSIDE shard_map so a whole dispatch chunk runs without
    re-entering the collective launcher."""
    n_dev = int(mesh.devices.size) if mesh is not None else 1
    local_batch = batch_size // n_dev
    assert local_batch > 0, (batch_size, n_dev)
    anchor_poses = gauge_anchor and not cfg.no_transformation_optimization

    def loss_fn(params, consts, batch, key, t_reg_w):
        losses = nesvor_loss(params, consts, cfg, bounding_box, batch, key)
        total = 0.0
        for k, w in loss_weights.items():
            if k in losses and w:
                total = total + w * (t_reg_w if k == T_REG else 1.0) * losses[k]
        return total, losses

    def one_step(carry, step_key):
        params, opt_state, consts, data, step = carry
        if mesh is not None:
            step_key = jax.random.fold_in(step_key, jax.lax.axis_index("dp"))
        k_batch, k_mc = jax.random.split(step_key)
        if trans_reg_decay_iters:
            # anneal the deviation-from-init pose anchor to zero over the
            # first N iterations: on the composed register->reconstruct
            # workload the init poses carry the registration's residual
            # error, and a constant transReg pins the refinement to them
            # (VERDICT r05 item 1); the early anchor is kept so the density
            # field forms before the poses float free
            t_reg_w = jnp.clip(
                1.0 - step.astype(jnp.float32) / trans_reg_decay_iters,
                0.0, 1.0,
            )
        else:
            t_reg_w = 1.0
        # data["v"].shape[0] is the per-device shard size under shard_map,
        # the full bag otherwise
        idx = jax.random.randint(k_batch, (local_batch,), 0, data["v"].shape[0])
        batch = {
            "xyz": data["xyz"][idx],
            "v": data["v"][idx],
            "slice_idx": data["slice_idx"][idx],
        }
        grads, losses = jax.grad(loss_fn, has_aux=True)(
            params, consts, batch, k_mc, t_reg_w
        )
        if mesh is not None:
            grads = jax.lax.pmean(grads, "dp")
            losses = jax.lax.pmean(losses, "dp")
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if anchor_poses:
            # per-STEP gauge projection: each correction is ~urad-scale, so
            # the density field never sees a discrete pose jump (the earlier
            # per-chunk projection moved poses by a few mrad at once and the
            # field had to re-track them, measurably costing converged PSNR)
            params = dict(
                params,
                axisangle=_project_gauge(
                    params["axisangle"], consts["axisangle_init"]
                ),
            )
        return (params, opt_state, consts, data, step + 1), losses

    def scan_chunk(params, opt_state, consts, data, step0, keys):
        (params, opt_state, _, _, _), losses = jax.lax.scan(
            one_step, (params, opt_state, consts, data, step0), keys
        )
        return params, opt_state, losses

    if mesh is not None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        scan_chunk = shard_map(
            scan_chunk,
            mesh=mesh,
            in_specs=(P(), P(), P(), P("dp"), P(), P()),
            out_specs=(P(), P(), P()),
            # the cellhash backward contains a pallas_call, whose output
            # avals carry no varying-mesh-axes info; skip the vma check
            check_vma=False,
        )

    # loss keys are cfg-static (mirror nesvor_loss's emission logic); the
    # trace-time assert below fails loudly if nesvor_loss ever diverges
    names = [D_LOSS, I_REG]
    if not (cfg.no_pixel_variance and cfg.no_slice_variance):
        names += [S_LOSS, DS_LOSS]
    if not cfg.no_transformation_optimization:
        names += [T_REG]
    if cfg.n_levels_bias:
        names += [B_REG]
    names = sorted(names)

    @partial(jax.jit, static_argnames=("n_steps",))
    def run_chunk_jit(params, opt_state, consts, data, key, step0, n_steps: int):
        keys = jax.random.split(key, n_steps)
        params, opt_state, losses = scan_chunk(
            params, opt_state, consts, data, step0, keys
        )
        assert sorted(losses) == names, (
            f"nesvor_loss emitted {sorted(losses)} but make_train_step "
            f"predicted {names}"
        )
        # stack the loss dict into ONE array: the host then fetches it once
        # per chunk (each separate device->host fetch costs a ~26 ms tunnel
        # RTT; the dict form cost 6 RTTs per chunk)
        return params, opt_state, jnp.stack([losses[k] for k in names])

    def run_chunk(params, opt_state, consts, data, key, done: int, n_steps: int):
        params, opt_state, stack = run_chunk_jit(
            params, opt_state, consts, data, key,
            jnp.asarray(done, jnp.int32), n_steps,
        )
        return params, opt_state, names, stack

    # expose the jitted callable so train() can pull XLA cost analysis
    # (per-step FLOPs / bytes for the bench MFU diagnostic) off the
    # already-compiled executable
    run_chunk.jitted = run_chunk_jit
    return run_chunk


def train(
    slices: List[Slice], args: Namespace
) -> Tuple[INRModel, List[Slice], Volume]:
    """Main training loop (reference train.py:123-232). Returns the trained
    INR, slices with optimized poses, and the occupancy mask volume."""
    import time as _time

    from .._precision import ensure_f32_matmul_semantics

    ensure_f32_matmul_semantics()
    LAST_RUN_STATS.clear()  # per-run telemetry; stale values skew bench.py
    _t0 = _time.time()
    dataset = Dataset(slices, args)
    bounding_box = dataset.bounding_box
    logging.debug("train setup: dataset+bbox %.1f s", _time.time() - _t0)
    inr_cfg = build_inr_config(bounding_box, args)
    cfg = NeSVoRConfig(
        inr=inr_cfg,
        n_slices=len(slices),
        n_samples=args.n_samples,
        n_features_slice=args.n_features_slice,
        n_levels_bias=args.n_levels_bias,
        no_transformation_optimization=args.no_transformation_optimization,
        no_slice_scale=args.no_slice_scale,
        no_pixel_variance=args.no_pixel_variance,
        no_slice_variance=args.no_slice_variance,
        image_regularization=args.image_regularization,
        delta=args.delta,
        head_width=getattr(args, "head_width", 0) or 0,
        head_depth=getattr(args, "head_depth", 0) or 0,
    )
    logging.debug(
        "hash grid: lowest=%d highest=%d scale=%.4f n_levels=%d",
        inr_cfg.base_resolution,
        inr_cfg.level_resolutions[-1],
        inr_cfg.level_scale,
        inr_cfg.n_levels,
    )

    seed = args.seed if getattr(args, "seed", None) is not None else 0
    key = jax.random.PRNGKey(seed)
    key, k_init = jax.random.split(key)
    _t0 = _time.time()
    params, consts = jax.jit(init_nesvor, static_argnames=("cfg", "v_mean"))(
        k_init,
        cfg,
        dataset.transformation,
        dataset.resolution,
        v_mean=dataset.mean,
    )
    logging.debug("train setup: mean+init %.1f s", _time.time() - _t0)

    tx, schedule = build_optimizer(params, cfg, args)
    opt_state = tx.init(params)

    loss_weights = {
        D_LOSS: 1.0,
        S_LOSS: 1.0,
        T_REG: args.weight_transformation,
        B_REG: args.weight_bias,
        I_REG: args.weight_image,
    }

    n_pixels = int(dataset.v.shape[0])
    data = {"xyz": dataset.xyz, "v": dataset.v, "slice_idx": dataset.slice_idx}

    # optional data parallelism over a device mesh (--dp-devices; additive —
    # the reference is strictly single-GPU, SURVEY.md §2.3)
    n_dp = int(getattr(args, "dp_devices", 0) or 0)
    mesh = None
    if n_dp > 1:
        from ..parallel.dp import make_mesh, shard_pixel_bag

        devices = jax.devices()
        if len(devices) < n_dp:
            raise ValueError(
                f"--dp-devices {n_dp} but only {len(devices)} devices visible"
            )
        mesh = make_mesh(devices[:n_dp])
        data = shard_pixel_bag(data, mesh)
        logging.info("data-parallel training over %d devices", n_dp)

    trans_reg_decay = float(getattr(args, "trans_reg_decay_frac", 0.0) or 0.0)
    run_chunk = make_train_step(
        cfg, bounding_box, loss_weights, tx, args.batch_size, n_pixels,
        mesh=mesh,
        gauge_anchor=not getattr(args, "no_gauge_anchor", False),
        trans_reg_decay_iters=int(trans_reg_decay * args.n_iter),
    )

    # fixed-size dispatch chunks: LR milestones live inside the optax
    # schedule (step count in opt_state), so chunking only sets the
    # logging cadence and bounds a single device dispatch (very long scans
    # can trip runtime watchdogs); all full chunks share one compilation.
    # NOTE: the remote-TPU execution path kills device programs running
    # longer than ~60 s, so chunk size is chosen adaptively: start small,
    # time a steady-state chunk, then target ~30 s per dispatch (bounded by
    # 250 steps; the 26 ms dispatch overhead stays negligible either way).
    max_chunk = int(getattr(args, "max_chunk_steps", 0) or 0)
    adaptive = max_chunk <= 0
    if adaptive:
        max_chunk = max(1, min(5, args.n_iter))
    average = MovingAverage(1 - 0.001)
    train_logger: Optional[TrainLogger] = None

    import time

    from ..utils import LazyLog, log_params

    logging.debug(LazyLog(lambda: log_params(params)))

    start = time.time()
    done = 0
    chunk_timings = []
    # mid-run checkpoint/resume (additive; reference has none — SURVEY §5).
    # Resume is exact when the chunk sequence matches, i.e. with a fixed
    # --max-chunk-steps; under adaptive chunking the RNG stream after the
    # resume point can differ from an uninterrupted run (same distribution).
    ckpt_path = getattr(args, "train_checkpoint", None)
    ckpt_every = int(getattr(args, "checkpoint_every", 0) or 0)
    if ckpt_path:
        import os

        if os.path.exists(ckpt_path):
            resumed = _load_train_state(ckpt_path, params, opt_state, args)
            if resumed is not None:
                params, opt_state, key, done = resumed
                logging.info(
                    "resumed training from %s at iteration %d", ckpt_path, done
                )
    last_ckpt = done
    logging.info("NeSVoR training starts.")
    while done < args.n_iter:
        n_steps = min(max_chunk, args.n_iter - done)
        key, k_chunk = jax.random.split(key)
        t_chunk = time.time()
        with jax.profiler.StepTraceAnnotation("train_chunk", step_num=done):
            params, opt_state, loss_names, loss_stack = run_chunk(
                params, opt_state, consts, data, k_chunk, done, n_steps
            )
        losses = dict(zip(loss_names, np.asarray(loss_stack)))  # one fetch
        dt_chunk = time.time() - t_chunk
        # per-chunk (n_steps, seconds) telemetry: bench.py separates steady
        # rate (median over same-size chunks) from compile overhead and
        # tunnel stalls (VERDICT r03 weak-#2 — raw wall varied 160-201 s
        # across same-code runs purely from remote-tunnel stalls)
        LAST_RUN_STATS.setdefault("chunks", []).append((n_steps, dt_chunk))
        LAST_RUN_STATS["final_losses"] = {
            k: float(v[-1]) for k, v in losses.items()
        }
        done += n_steps
        if ckpt_path and done < args.n_iter and (
            ckpt_every <= 0 or done - last_ckpt >= ckpt_every
        ):
            _save_train_state(ckpt_path, params, opt_state, key, done, args)
            last_ckpt = done
        if adaptive and len(chunk_timings) < 3 and n_steps == max_chunk:
            # the 2nd same-size chunk is compile-free: use it to size chunks
            # for a ~30 s dispatch budget
            chunk_timings.append(dt_chunk)
            if len(chunk_timings) == 2:
                step_time = chunk_timings[1] / max_chunk
                LAST_RUN_STATS["steady_ms_per_step"] = step_time * 1e3
                max_chunk = int(min(250, max(max_chunk, 30.0 / max(step_time, 1e-3))))
                adaptive = False
                logging.debug(
                    "adaptive chunking: %.3f s/step -> %d steps/dispatch",
                    step_time,
                    max_chunk,
                )
        if getattr(args, "debug", False):
            # reference --debug NaN scan (train.py:191-194), applied to the
            # updated params instead of per-step grads (grads live on-device
            # inside the scan)
            for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
                if not bool(jnp.all(jnp.isfinite(leaf))):
                    name = "/".join(str(getattr(p, "key", p)) for p in path)
                    logging.debug(
                        "iter %d: found non-finite values in %s", done, name
                    )
        for k in losses:
            # feed the EMA with the per-step history of this chunk
            for val in losses[k]:
                average(k, float(val))
        if train_logger is None:
            train_logger = TrainLogger("time", "iter", *list(losses.keys()), "lr")
        import datetime

        train_logger.log(
            datetime.timedelta(seconds=int(time.time() - start)),
            done,
            *[average[k] for k in losses],
            float(schedule(done)),
        )

    if ckpt_path:
        # the run completed: the mid-run state has served its purpose (the
        # trained model is the output); a stale file would make a rerun of
        # the same command resume instead of retrain
        import os

        if os.path.exists(ckpt_path):
            os.remove(ckpt_path)

    if getattr(args, "report_cost_analysis", False):
        # XLA cost analysis of the steady-state chunk program, normalized
        # per step — feeds the bench MFU / HBM-bandwidth diagnostic
        # (VERDICT r05 item 8). With the persistent compile cache on, the
        # .lower().compile() below is a cache hit, not a recompile.
        try:
            key, k_ca = jax.random.split(key)
            ca = (
                run_chunk.jitted.lower(
                    params, opt_state, consts, data, k_ca,
                    jnp.asarray(0, jnp.int32), n_steps=max_chunk,
                )
                .compile()
                .cost_analysis()
            )
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            if ca:
                LAST_RUN_STATS["cost_per_step"] = {
                    "flops": float(ca.get("flops", 0.0)) / max_chunk,
                    "bytes_accessed": float(ca.get("bytes accessed", 0.0))
                    / max_chunk,
                }
        except Exception as e:  # cost analysis is best-effort diagnostics
            logging.debug("cost analysis unavailable: %s", e)

    # outputs (reference train.py:223-232)
    transformation = RigidTransform(
        jax.lax.stop_gradient(params["axisangle"]), trans_first=True
    )
    dataset.transformation = transformation
    _t0 = _time.time()
    mask = dataset.mask
    jax.block_until_ready(mask.image)
    logging.debug("train teardown: occupancy mask %.1f s", _time.time() - _t0)
    LAST_RUN_STATS["mask_s"] = _time.time() - _t0
    output_slices = []
    for i in range(len(slices)):
        s = slices[i].clone()
        s.transformation = transformation[i]
        output_slices.append(s)

    inr_model = INRModel(
        params=params["inr"], cfg=inr_cfg, bounding_box=bounding_box
    )
    LAST_PARAMS.clear()
    LAST_PARAMS.update(params)
    return inr_model, output_slices, mask
