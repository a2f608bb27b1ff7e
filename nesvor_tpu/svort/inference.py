"""SVoRT registration pipeline orchestration (rebuild of reference
nesvor/svort/inference.py:17-593).

Host-side orchestration around jitted device ops: stack preprocessing
(resample to 1 mm, 128x128 ROI crop, z-crop, 99-percentile normalization —
reference parse_data :176-247), SVoRT-vs-stack pose correction by simulated
NCC (:250-286), mapping cropped poses back to full stacks (:289-305),
multi-init VVR stack-to-stack registration (:308-367), PSF+CG stack
reconstruction (:370-406), and the final svort-vs-vvr selection (:540-550).

``average_rotation`` stays host-side scipy (quaternion mean + Karcher
refinement, reference :32-64) — tiny and cold.

Pretrained SVoRT weights: the reference downloads torch checkpoints from
Zenodo (:565-593). In a no-egress environment the checkpoint must already
exist under ``nesvor_tpu/checkpoints`` (converted via
``nesvor_tpu.svort.convert``); if SVoRT is requested but unavailable, the
pipeline falls back to stack registration with a warning.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import __checkpoint_dir, __pretrained_svort
from ..image import Slice, Stack
from ..ops.slice_acq import slice_acquisition
from ..transform import RigidTransform, mat_update_resolution
from ..utils import get_PSF, ncc_loss
from .registration import VVR, resample
from .srr import SRR, PSFreconstruction


# Pipeline working resolutions. Slices are resampled to 1 mm in-plane
# (reference :449-450). The reference reconstructs its SRR *working*
# volumes (pose-scoring / model conditioning only — never the final
# output) at 0.8 mm; here the default is 1 mm, for two reasons:
#   * res_slice/res_recon == 1 engages the exact slab factorization of
#     the PSF projector (ops/slice_acq.py) — at ratio 1.25 every
#     projector call inside the CG solves falls to the tap-scan path,
#     ~40x slower, and the composed CG programs exceed the remote
#     executor's device-program limit;
#   * the shipped checkpoints are TRAINED with a 1 mm conditioning
#     volume (svort/train.py res_s == res_r == 1.0), so 1 mm at
#     inference removes a train/test mismatch.
# Converted reference Zenodo checkpoints (trained at 0.8 mm) can restore
# the reference behavior with NESVOR_TPU_SVORT_RES_RECON=0.8.
_RES_SLICE_MM = 1.0
_RES_RECON_MM = float(os.environ.get("NESVOR_TPU_SVORT_RES_RECON", "1.0"))

# Classical VVR schedule used for stack-to-stack registration
# (reference :320-330): 3-level coarse-to-fine pyramid, 4 step-halvings of
# initial step size 2, ≤20 iterations per level, momentum-0.1 gradient
# descent on global NCC with analytic (finite-difference) gradients.
_VVR_SCHEDULE = dict(
    num_levels=3,
    num_steps=4,
    step_size=2,
    max_iter=20,
    optimizer={"name": "gd", "momentum": 0.1},
    auto_grad=False,
)

# Masked-grid point budget per pyramid level for the inference-path VVR
# (see make_vvr in stack_registration); 0 (the default) disables the cap.
# Measured on the composed pipeline: a 200k cap (stride-8 subsample of the
# ~1.5e6-point fine grid) cuts VVR 312 -> 107 s but moves the converged
# poses enough to cost 1.2 dB (21.08 -> 19.89) — stack registration is
# quality-critical and its objective does not tolerate approximation
# (same lesson as the multi-init pruning). Opt-in for speed-over-quality
# use via NESVOR_TPU_VVR_MAX_POINTS=<n>.
_VVR_MAX_POINTS = int(os.environ.get("NESVOR_TPU_VVR_MAX_POINTS", "0"))

# Working volume for the quick stack-level SRR used only for scoring
# (reference :394): generous fixed bound so any padded stack fits —
# the reference's 256 voxels at 0.8 mm (204.8 mm cube), re-derived at
# the working resolution (rounded up to a 32-voxel bucket).
def svort_volume_shape(res_r: float) -> Tuple[int, int, int]:
    n = -(-int(np.ceil(256 * 0.8 / res_r)) // 32) * 32
    return (n, n, n)


_SRR_SCORING_VOLUME = svort_volume_shape(_RES_RECON_MM)

# Projector slice-block size inside inference-scale programs (CG solves and
# simulated-NCC forwards over hundreds of slices): bounds each program's
# transient gather working set so composed solves fit HBM alongside the
# model parameters and earlier phases' buffers. 64 balances the adjoint's
# per-chunk volume-side overhead against transient size (sweep in
# scripts/bench_proj_chunk.py: adj 3.0 s @32 -> 2.4 s @64 -> 2.1 s @128;
# fwd flat; transients scale linearly with the chunk).
_SLICE_CHUNK = 64


def compute_score(ncc, ncc_weight) -> float:
    ncc_weight = ncc_weight.reshape(ncc.shape)
    return -float((ncc * ncc_weight).sum() / ncc_weight.sum())


def average_rotation(R: jnp.ndarray) -> jnp.ndarray:
    """Quaternion-mean + iterative Karcher-mean refinement on SO(3)
    (reference inference.py:32-64). Host-side scipy."""
    import scipy.linalg
    from scipy.spatial.transform import Rotation

    R = np.asarray(R, dtype=np.float64)
    Rmat = Rotation.from_rotvec(R).as_matrix()
    q = Rotation.from_rotvec(R).as_quat()
    for i in range(q.shape[0]):
        if np.linalg.norm(q[i] + q[0]) < np.linalg.norm(q[i] - q[0]):
            q[i] *= -1
    barq = np.mean(q, 0)
    barq = barq / np.linalg.norm(barq)

    S_new = S = Rotation.from_quat(barq).as_matrix()
    i = 0
    while np.all(np.isreal(S_new)) and i < 10:
        S = S_new
        i += 1
        sum_vmatrix_normed = np.zeros((3, 3))
        sum_inv_norm_vmatrix = 0.0
        for j in range(Rmat.shape[0]):
            vmatrix = scipy.linalg.logm(Rmat[j] @ np.linalg.inv(S))
            norm = np.linalg.norm(vmatrix, ord=2, axis=(0, 1))
            if norm == 0:
                continue
            sum_vmatrix_normed += vmatrix / norm
            sum_inv_norm_vmatrix += 1 / norm
        if sum_inv_norm_vmatrix == 0:
            break
        delta = sum_vmatrix_normed / sum_inv_norm_vmatrix
        S_new = scipy.linalg.expm(delta) @ S

    rotvec = Rotation.from_matrix(S).as_rotvec()
    return jnp.asarray(rotvec[None], dtype=jnp.float32)


def get_transform_diff_mean(
    transform_out: RigidTransform, transform_in: RigidTransform, mean_r: int = 3
) -> Tuple[RigidTransform, RigidTransform]:
    """Rotation-averaged mean stack correction (reference inference.py:22-29)."""
    transform_diff = transform_out.compose(transform_in.inv())
    ax = transform_diff.axisangle()
    mid = ax.shape[0] // 2
    meanT = ax[mid - mean_r : mid + mean_r, 3:].mean(0, keepdims=True)
    meanR = average_rotation(ax[mid - 3 : mid + 3, :3])
    return RigidTransform(jnp.concatenate((meanR, meanT), -1)), transform_diff


def parse_data(dataset: List[Stack], res_s: float):
    """Resample stacks to res_s, crop to 128x128 ROI (64 px margin), z-crop
    empty slices, 99-percentile normalize, reset transforms
    (reference inference.py:176-247)."""
    stacks = []
    stacks_ori = []
    transforms = []
    transforms_full = []
    transforms_ori = []
    crop_idx = []

    for data in dataset:
        slices = resample(
            data.slices * data.mask.astype(data.slices.dtype),
            (data.resolution_x, data.resolution_y),
            (res_s, res_s),
        )
        stacks_ori.append(slices)
        # crop x, y around the ROI of the fullest slice
        occupancy = np.asarray((slices > 0).sum((1, 2, 3)))
        s = np.asarray(slices[int(np.argmax(occupancy)), 0])
        nz_rows = np.nonzero(s.sum(1))[0]
        nz_cols = np.nonzero(s.sum(0))[0]
        if nz_rows.size == 0 or nz_cols.size == 0:
            i1, i2 = 0, s.shape[0] - 1
            j1, j2 = 0, s.shape[1] - 1
        else:
            i1, i2 = int(nz_rows[0]), int(nz_rows[-1])
            j1, j2 = int(nz_cols[0]), int(nz_cols[-1])
        if (i2 - i1) > 128 or (j2 - j1) > 128:
            logging.warning("ROI in the data is too large for SVoRT")
        pad = 64
        padded = jnp.pad(slices, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
        ci = pad + (i1 + i2) // 2
        cj = pad + (j1 + j2) // 2
        cropped = padded[:, :, ci - 64 : ci + 64, cj - 64 : cj + 64]
        # crop z: keep the contiguous band of nonempty slices
        nnz = np.asarray((cropped > 0).sum((1, 2, 3)))
        nz = np.nonzero(nnz > 0)[0]
        idx = np.zeros(len(nnz), dtype=bool)
        if nz.size:
            idx[nz[0] : nz[-1] + 1] = True
        crop_idx.append(jnp.asarray(idx))
        cropped = cropped[jnp.asarray(np.nonzero(idx)[0])]
        # normalize by q99 of nonzero values — computed host-side: a device
        # boolean gather has a data-dependent output shape, so every stack
        # (distinct nonzero count) would trigger a fresh remote compile
        cr_np = np.asarray(cropped)
        pos = cr_np[cr_np > 0]
        q99 = float(np.quantile(pos, 0.99)) if pos.size else 1.0
        stacks.append(cropped / q99)
        # transformations: reset rotations, recenter
        transform = data.transformation
        transforms_ori.append(transform)
        ax_full = np.asarray(transform.axisangle()).copy()
        ax_crop = ax_full[idx].copy()

        ax_full[:, :-1] = 0
        ax_full[:, 3] = -((j1 + j2) // 2 - stacks_ori[-1].shape[-1] / 2) * res_s
        ax_full[:, 4] = -((i1 + i2) // 2 - stacks_ori[-1].shape[-2] / 2) * res_s
        ax_full[:, -1] -= ax_crop[:, -1].mean()

        ax_crop[:, :-1] = 0
        ax_crop[:, -1] -= ax_crop[:, -1].mean()

        transforms.append(RigidTransform(jnp.asarray(ax_crop)))
        transforms_full.append(RigidTransform(jnp.asarray(ax_full)))

    return (
        stacks,
        stacks_ori,
        transforms,
        transforms_full,
        transforms_ori,
        crop_idx,
        float(np.mean([data.thickness for data in dataset])),
    )


def simulated_ncc(
    transforms: List[RigidTransform],
    stacks: List[jnp.ndarray],
    volume: jnp.ndarray,
    res_s: float,
    s_thick: float,
    res_r: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-slice NCC of simulated vs real slices (reference :409-444)."""
    ncc = []
    ncc_weight = []
    psf = jnp.asarray(
        get_PSF(res_ratio=(res_s / res_r, res_s / res_r, s_thick / res_r))
    )
    for j in range(len(stacks)):
        stack = stacks[j]
        transform = transforms[j]
        stack_mask = stack > 0
        simulated = slice_acquisition(
            mat_update_resolution(transform.matrix(), 1, res_r),
            volume,
            None,
            stack_mask,
            psf,
            stack.shape[-2:],
            res_s / res_r,
            False,
            False,
            slice_chunk=_SLICE_CHUNK,
        )
        ncc_weight.append(stack_mask.sum((1, 2, 3)))
        ncc.append(
            ncc_loss(simulated, stack, stack_mask, win=None, reduction="none")
        )
    ncc_all = jnp.concatenate(ncc)
    weight_all = jnp.concatenate(ncc_weight).reshape(ncc_all.shape)
    return ncc_all, weight_all


def correct_svort(
    transforms_out, transforms_in, stacks, volume, res_s, s_thick, res_r
):
    """Per-slice choice between the SVoRT pose and the mean stack pose by
    simulated NCC (reference :250-286)."""
    logging.debug("Correcting SVoRT results with stack transformations ...")
    transforms_stack = []
    for j in range(len(stacks)):
        diff_mean, _ = get_transform_diff_mean(transforms_out[j], transforms_in[j])
        transforms_stack.append(diff_mean.compose(transforms_in[j]))

    ncc_stack, weight = simulated_ncc(
        transforms_stack, stacks, volume, res_s, s_thick, res_r
    )
    ncc_svort, _ = simulated_ncc(transforms_out, stacks, volume, res_s, s_thick, res_r)
    logging.debug(
        "%d out of %d slices are replaced with the stack transformation",
        int(jnp.count_nonzero(ncc_svort > ncc_stack)),
        ncc_svort.size,
    )
    transforms_corrected = []
    idx = 0
    for j in range(len(stacks)):
        ns = stacks[j].shape[0]
        t_out = jnp.where(
            (ncc_svort[idx : idx + ns] <= ncc_stack[idx : idx + ns]).reshape(-1, 1, 1),
            transforms_out[j].matrix(),
            transforms_stack[j].matrix(),
        )
        idx += ns
        transforms_corrected.append(RigidTransform(t_out))
    ncc_min = jnp.minimum(ncc_svort, ncc_stack)
    return transforms_corrected, compute_score(ncc_min, weight)


def get_transforms_full(transforms_out, transforms_in, transforms_full, crop_idx):
    """Map cropped poses back to full stacks (reference :289-305)."""
    transforms_svort_full = []
    transforms_stack_full = []
    for j in range(len(transforms_in)):
        diff_mean, diff = get_transform_diff_mean(transforms_out[j], transforms_in[j])
        stack_full = diff_mean.compose(transforms_full[j])
        svort_full_mat = np.asarray(stack_full.matrix()).copy()
        idx = np.asarray(crop_idx[j])
        svort_full_mat[idx] = np.asarray(
            diff.compose(transforms_full[j][jnp.asarray(np.nonzero(idx)[0])]).matrix()
        )
        transforms_svort_full.append(RigidTransform(jnp.asarray(svort_full_mat)))
        transforms_stack_full.append(stack_full)
    return transforms_svort_full, transforms_stack_full


def stack_registration(transforms_list, transform_target, stacks, res_s, s_thick):
    """VVR stack-to-stack registration with multi-init over candidate
    transform sets (reference :308-367)."""

    def t_mean(t: RigidTransform) -> RigidTransform:
        return RigidTransform(t.axisangle().mean(0, keepdims=True))

    t_target = t_mean(transform_target)
    ts_in = [[t_mean(t) for t in transforms] for transforms in transforms_list]
    params = {"res_s": res_s, "s_thick": s_thick}
    trans_first = False

    def make_vvr(levels=None):
        # global NCC is computed per batch row, so every (stack, candidate)
        # problem can share one optimizer run (the VVR optimizer is batched
        # with per-sample accept/freeze masks). max_points caps the masked
        # grid each level's NCC is evaluated over (deterministic stride):
        # a 6-DOF rigid problem does not need the finest level's ~1.5e6
        # points, and warping them through the 13-row FD stencil made
        # level 0 compute-bound (PERF.md round-5 measurements + quality
        # gate). NESVOR_TPU_VVR_MAX_POINTS=0 restores the full grid.
        return VVR(
            loss=lambda s, x, y: ncc_loss(x, y, win=None, reduction="none"),
            levels=levels,
            max_points=_VVR_MAX_POINTS or None,
            **_VVR_SCHEDULE,
        )

    # One BATCHED multi-init problem: a sample per (stack j>=1, candidate
    # set), grouped by source-volume shape so each group is one VVR run.
    # The reference (and rounds <=5 here) optimized each sample in its own
    # sequential run — ~10 single-sample optimizations whose host-synced
    # iteration loops cost ~500 s through the dispatch tunnel; batched,
    # the same iterations run once over all samples (~10x fewer
    # dispatches, per-sample results unchanged — each sample keeps its own
    # accept mask and the target/grid are shared by construction).
    target = stacks[0][:, 0][None, None]
    entries = []  # (stack index j, init pose)
    for j in range(1, len(stacks)):
        for cands in ts_in:
            ax0 = (
                t_target.compose(cands[0].inv())
                .compose(cands[j])
                .axisangle(trans_first=trans_first)
            )
            entries.append((j, ax0))
    by_shape: dict = {}
    for i, (j, _) in enumerate(entries):
        by_shape.setdefault(tuple(stacks[j].shape), []).append(i)
    # Multi-init pruning (round 5): run the coarse pyramid levels with ALL
    # candidates, keep only the best candidate per stack for the finest
    # level. Default OFF — measured on the composed pipeline it loses
    # 0.55 dB (21.08 -> 20.53): the losing candidate sometimes OVERTAKES
    # after fine-level polish, so neither the coarse-level NCC nor a
    # fine-resolution pre-polish ranking picks the true winner (both were
    # measured; they choose identical rows). With the device-loop stage +
    # masked-grid point cap the unpruned fine level is cheap enough that
    # the quality trade is not worth it; NESVOR_TPU_VVR_PRUNE=1 re-enables
    # the pruned (faster, -0.55 dB) behavior.
    n_levels = _VVR_SCHEDULE["num_levels"]
    prune = (
        os.environ.get("NESVOR_TPU_VVR_PRUNE", "0") != "0"
        and len(ts_in) > 1
        and n_levels > 1
    )
    from .registration import LAST_VVR_STATS

    LAST_VVR_STATS.clear()
    best: dict = {}  # j -> (ncc, ax row)
    for idxs in by_shape.values():
        ax_b = jnp.concatenate([entries[i][1] for i in idxs], 0)
        src = jnp.concatenate(
            [stacks[entries[i][0]][:, 0][None, None] for i in idxs], 0
        )
        if prune:
            coarse = make_vvr(levels=list(range(n_levels - 1, 0, -1)))
            ax_mid, _ = coarse(
                ax_b, src, target, params, t_target, trans_first
            )
            # Rank the survivors at the FINE resolution (one loss-only
            # batched warp over all rows, a few dispatches) — choosing by
            # the coarse level's final NCC mis-picks: measured 0.55 dB
            # loss on the composed pipeline (PERF.md round-5), while the
            # fine-res pre-polish ranking reproduces the unpruned
            # winner's quality at ~the pruned run's cost.
            ncc_mid_np = np.asarray(
                make_vvr(levels=[0]).evaluate_at(
                    ax_mid, src, target, params, t_target, trans_first,
                    level=0,
                )
            ).reshape(-1)
            keep: dict = {}  # j -> row index of its best coarse candidate
            for row, i in enumerate(idxs):
                j = entries[i][0]
                if j not in keep or ncc_mid_np[row] < ncc_mid_np[keep[j]]:
                    keep[j] = row
            rows = sorted(keep.values())
            fine = make_vvr(levels=[0])
            ax_out, ncc = fine(
                ax_mid[jnp.asarray(rows)],
                src[jnp.asarray(rows)],
                target, params, t_target, trans_first,
            )
            ncc_np = np.asarray(ncc).reshape(-1)
            for k, row in enumerate(rows):
                j = entries[idxs[row]][0]
                cand = (float(ncc_np[k]), ax_out[k : k + 1])
                if j not in best or cand[0] < best[j][0]:
                    best[j] = cand
        else:
            vvr = make_vvr()
            ax_out, ncc = vvr(ax_b, src, target, params, t_target, trans_first)
            ncc_np = np.asarray(ncc).reshape(-1)
            for row, i in enumerate(idxs):
                j = entries[i][0]
                cand = (float(ncc_np[row]), ax_out[row : row + 1])
                if j not in best or cand[0] < best[j][0]:
                    best[j] = cand

    ts_registered = [t_target] + [
        RigidTransform(best[j][1], trans_first=trans_first)
        for j in range(1, len(stacks))
    ]

    t_center_ax = np.asarray(
        ts_registered[0].axisangle(trans_first=False)
    ).copy()
    t_center_ax[..., :3] = 0
    t_center_ax[..., 3:] *= -1
    t_center = RigidTransform(jnp.asarray(t_center_ax))

    transforms_out = []
    for j in range(len(stacks)):
        n_slice = stacks[j].shape[0]
        t = np.zeros((n_slice, 6), dtype=np.float32)
        t[:, -1] = (np.arange(n_slice, dtype=np.float32) - (n_slice - 1) / 2) * s_thick
        t = t_center.compose(ts_registered[j]).compose(
            RigidTransform(jnp.asarray(t))
        )
        transforms_out.append(t)
    return transforms_out


def _pad_square(stack: jnp.ndarray, size: int) -> jnp.ndarray:
    """Center-pad a (n, 1, h, w) stack to (n, 1, size, size)."""
    pad_y = size - stack.shape[-2]
    pad_x = size - stack.shape[-1]
    return jnp.pad(
        stack,
        (
            (0, 0), (0, 0),
            (pad_y // 2, pad_y - pad_y // 2),
            (pad_x // 2, pad_x - pad_x // 2),
        ),
    )


def _projector_params(slice_shape, res_s, s_thick, res_r) -> dict:
    """Slice-acquisition parameter dict shared by the scoring SRR paths
    (reference :381-391): anisotropic PSF at the slice→volume resolution
    ratio over the fixed scoring working volume."""
    return {
        "psf": jnp.asarray(
            get_PSF(res_ratio=(res_s / res_r, res_s / res_r, s_thick / res_r))
        ),
        "slice_shape": tuple(slice_shape),
        "interp_psf": False,
        "res_s": res_s,
        "res_r": res_r,
        "s_thick": s_thick,
        "volume_shape": _SRR_SCORING_VOLUME,
        "slice_chunk": _SLICE_CHUNK,
    }


def reconstruct_from_stacks(transforms, stacks, res_s, s_thick, res_r, n_stack_recon):
    """Pad stacks, PSF reconstruct + 1-iteration CG SRR (reference :370-406)."""
    size_max = max(max(s.shape[-2:]) for s in stacks)
    if n_stack_recon is None:
        n_stack_recon = len(stacks)
    ss = jnp.concatenate(
        [_pad_square(stacks[j], size_max) for j in range(n_stack_recon)]
    )
    params = _projector_params(ss.shape[-2:], res_s, s_thick, res_r)
    mat = mat_update_resolution(
        RigidTransform.cat(list(transforms[:n_stack_recon])).matrix(), 1, res_r
    )
    volume = PSFreconstruction(mat, ss, None, None, params)
    srr = SRR(n_iter=1, use_CG=True)
    return srr(mat, ss, volume, params, slices_mask=ss > 0)


def _svort_register(data, model, model_params, res_s, res_r):
    """SVoRT branch of the pipeline: per-slice pose prediction (v1 runs on
    stack triplets, v2 on all stacks at once), NCC-based per-slice fallback
    to the mean stack pose, then mapping cropped poses back to the full
    stacks. Returns (full-stack transforms, stack-level transforms, score)."""
    from .models import run_model, run_model_all_stack

    time_start = time.time()
    predict = run_model if model.version == "v1" else run_model_all_stack
    transforms_svort, volume_svort = predict(
        data["transforms_cropped_reset"], data["stacks_cropped"],
        model, model_params, res_s, data["s_thick"], res_r,
    )
    logging.debug("time for running SVoRT: %f s", time.time() - time_start)

    transforms_corrected, score = correct_svort(
        transforms_svort, data["transforms_cropped_reset"],
        data["stacks_cropped"], volume_svort, res_s, data["s_thick"], res_r,
    )
    transforms_full, transforms_stack_full = get_transforms_full(
        transforms_corrected, data["transforms_cropped_reset"],
        data["transforms_ori_reset"], data["crop_idx"],
    )
    return transforms_full, transforms_stack_full, score


def _vvr_register(data, transforms_stack_full, n_stack_recon, res_s, res_r):
    """Classical branch: stack-to-stack VVR (multi-init with the SVoRT
    stack-level result as an extra candidate when available), then — only
    when there is a SVoRT score to compare against — a quick stack-level
    SRR to score the VVR result on the same simulated-NCC scale. Returns
    (per-stack transforms, score)."""
    time_start = time.time()
    candidate_sets = [data["transforms_ori"]]
    if transforms_stack_full is not None:
        candidate_sets.append(transforms_stack_full)
        target = transforms_stack_full[0]
    else:
        target = data["transforms_ori"][0]
    transforms_vvr = stack_registration(
        candidate_sets, target, data["stacks_ori"], res_s, data["s_thick"]
    )
    from .registration import LAST_VVR_STATS

    LAST_REGISTER_STATS["vvr_levels"] = [dict(d) for d in LAST_VVR_STATS]
    logging.debug("time for stack registration: %f s", time.time() - time_start)

    if transforms_stack_full is None:
        # no SVoRT competitor: VVR wins by default, no need to score it
        return transforms_vvr, float("inf")

    volume_vvr = reconstruct_from_stacks(
        transforms_vvr, data["stacks_ori"], res_s, data["s_thick"], res_r,
        n_stack_recon,
    )

    def cropped(seq):
        return [
            x[jnp.asarray(np.nonzero(np.asarray(keep))[0])]
            for x, keep in zip(seq, data["crop_idx"])
        ]

    score = compute_score(
        *simulated_ncc(
            cropped(transforms_vvr), cropped(data["stacks_ori"]),
            volume_vvr, res_s, data["s_thick"], res_r,
        )
    )
    return transforms_vvr, score


# per-phase telemetry of the most recent run_svort call (svort / vvr branch
# walls, similarity scores, which branch won) — consumed by the driver bench
# (bench.py pipeline block) and the severity-crossover study
LAST_REGISTER_STATS: Dict[str, float] = {}


def run_svort(dataset: List[Stack], model, model_params, svort, vvr, force_vvr,
              free_params: bool = False):
    """Full registration pipeline + svort-vs-vvr scoring (reference :447-562).

    ``free_params=True`` (the CLI path) releases the model weights from
    device memory once the SVoRT branch has produced its transforms.
    NOTE: this MUTATES the caller-owned ``model_params`` dict in place
    (``dict.clear()``) — clearing the shared dict is the only way to drop
    the device buffers while the caller's frame still holds a reference.
    Pass ``free_params=False`` (the default) to reuse the dict afterwards."""
    res_s = _RES_SLICE_MM
    res_r = _RES_RECON_MM
    LAST_REGISTER_STATS.clear()

    if svort or vvr:
        keys = (
            "stacks_cropped", "stacks_ori", "transforms_cropped_reset",
            "transforms_ori_reset", "transforms_ori", "crop_idx", "s_thick",
        )
        data = dict(zip(keys, parse_data(dataset, res_s)))

    transforms_svort_full = transforms_stack_full = None
    score_svort = score_vvr = float("-inf")
    if svort:
        _t = time.time()
        transforms_svort_full, transforms_stack_full, score_svort = (
            _svort_register(data, model, model_params, res_s, res_r)
        )
        LAST_REGISTER_STATS["svort_s"] = time.time() - _t
        LAST_REGISTER_STATS["score_svort"] = float(score_svort)
        logging.info("similarity score for SVoRT = %f", score_svort)
        if free_params:
            # the transformer weights (hundreds of MB on device) are not
            # needed by the VVR branch; drop them before its SRR scoring
            # solves so both phases' peaks don't stack up in HBM
            model_params.clear()
            import gc

            gc.collect()
    if vvr:
        _t = time.time()
        transforms_vvr, score_vvr = _vvr_register(
            data, transforms_stack_full,
            (3 if model.version == "v1" else None) if svort else None,
            res_s, res_r,
        )
        LAST_REGISTER_STATS["vvr_s"] = time.time() - _t
        LAST_REGISTER_STATS["score_vvr"] = float(score_vvr)
        if np.isfinite(score_vvr):
            logging.info("similarity score for stack registration = %f", score_vvr)

    if svort or vvr:
        if score_svort < score_vvr or force_vvr:
            logging.info("use stack transformation")
            transforms_out = transforms_vvr
            LAST_REGISTER_STATS["chosen"] = "vvr"
        else:
            logging.info("use slice transformation")
            transforms_out = transforms_svort_full
            LAST_REGISTER_STATS["chosen"] = "svort"
        for stack, t in zip(dataset, transforms_out):
            stack.transformation = t

    # final per-slice normalization -> Slice list (reference :555-562)
    slices: List[Slice] = []
    for stack in dataset:
        mask_np = np.asarray(stack.mask)
        idx_nonempty = mask_np.reshape(mask_np.shape[0], -1).any(1)
        # q99 host-side (data-dependent boolean gather recompiles per count)
        vals = np.asarray(stack.slices)[mask_np.astype(bool)]
        q99 = float(np.quantile(vals, 0.99)) if vals.size else 1.0
        stack.slices = stack.slices / q99
        for i in np.nonzero(idx_nonempty)[0]:
            slices.append(stack[int(i)])
    return slices


def load_svort_model(svort_version: str):
    """Build the SVoRT model + load converted weights if available.

    Reference downloads torch checkpoints from Zenodo (inference.py:565-591);
    here weights must be pre-converted to .npz by ``nesvor_tpu.svort.convert``
    (no network egress). Returns (model, params) or (None, None)."""
    from .models import SVoRT, SVoRTv2

    if svort_version not in __pretrained_svort:
        raise ValueError("unknown SVoRT version!")
    path = os.path.join(__checkpoint_dir, f"SVoRT_{svort_version}.npz")
    if svort_version == "v1":
        model = SVoRT(n_iter=3)
    else:
        model = SVoRTv2(n_iter=4)
    if not os.path.exists(path):
        # try converting a locally-available torch checkpoint
        torch_path = os.path.join(__checkpoint_dir, f"SVoRT_{svort_version}.pt")
        if os.path.exists(torch_path):
            from .convert import convert_torch_checkpoint

            params = convert_torch_checkpoint(torch_path, svort_version)
            return model, params
        return None, None
    from .convert import load_converted

    return model, load_converted(path)


def svort_predict(
    dataset: List[Stack],
    svort_version: str,
    svort: bool,
    vvr: bool,
    force_vvr: bool,
) -> List[Slice]:
    """Entry point (reference inference.py:565-593)."""
    from .._precision import ensure_f32_matmul_semantics

    ensure_f32_matmul_semantics()
    model = None
    model_params = None
    if svort:
        model, model_params = load_svort_model(svort_version)
        if model is None:
            logging.warning(
                "SVoRT checkpoint not available (no network egress and no local "
                "copy under %s); falling back to stack registration.",
                __checkpoint_dir,
            )
            svort = False
            vvr = True
    return run_svort(
        dataset, model, model_params, svort, vvr, force_vvr, free_params=True
    )
