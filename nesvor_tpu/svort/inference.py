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
from typing import List, Optional, Tuple

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
        # normalize by q99 of nonzero values
        pos = cropped[cropped > 0]
        q99 = jnp.quantile(pos, 0.99) if pos.size else jnp.asarray(1.0)
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
    vvr = VVR(
        num_levels=3,
        num_steps=4,
        step_size=2,
        max_iter=20,
        optimizer={"name": "gd", "momentum": 0.1},
        loss=lambda s, x, y: ncc_loss(x[None], y[None], win=None, reduction="none"),
        auto_grad=False,
    )
    trans_first = False
    ts_registered = [t_target]
    for j in range(1, len(stacks)):
        source = stacks[j][:, 0][None, None]
        target = stacks[0][:, 0][None, None]
        ncc_min = float("inf")
        ax_out = None
        for k in range(len(ts_in)):
            ax = (
                t_target.compose(ts_in[k][0].inv())
                .compose(ts_in[k][j])
                .axisangle(trans_first=trans_first)
            )
            ax, ncc = vvr(ax, source, target, params, t_target, trans_first)
            ncc_val = float(ncc.reshape(-1)[0])
            if ncc_val < ncc_min:
                ncc_min, ax_out = ncc_val, ax
        ts_registered.append(RigidTransform(ax_out, trans_first=trans_first))

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


def reconstruct_from_stacks(transforms, stacks, res_s, s_thick, res_r, n_stack_recon):
    """Pad stacks, PSF reconstruct + 1-iteration CG SRR (reference :370-406)."""
    size_max = max(max(s.shape[-2:]) for s in stacks)
    stacks_pad = []
    for s in stacks:
        dx1 = (size_max - s.shape[-1]) // 2
        dx2 = (size_max - s.shape[-1]) - dx1
        dy1 = (size_max - s.shape[-2]) // 2
        dy2 = (size_max - s.shape[-2]) - dy1
        stacks_pad.append(jnp.pad(s, ((0, 0), (0, 0), (dy1, dy2), (dx1, dx2))))
    params = {
        "psf": jnp.asarray(
            get_PSF(res_ratio=(res_s / res_r, res_s / res_r, s_thick / res_r))
        ),
        "slice_shape": stacks_pad[0].shape[-2:],
        "interp_psf": False,
        "res_s": res_s,
        "res_r": res_r,
        "s_thick": s_thick,
        "volume_shape": (256, 256, 256),
    }
    if n_stack_recon is None:
        n_stack_recon = len(stacks_pad)
    mat = mat_update_resolution(
        RigidTransform.cat([transforms[j] for j in range(n_stack_recon)]).matrix(),
        1,
        res_r,
    )
    ss = jnp.concatenate([stacks_pad[j] for j in range(n_stack_recon)])
    mask_ss = ss > 0
    volume = PSFreconstruction(mat, ss, None, None, params)
    srr = SRR(n_iter=1, use_CG=True)
    return srr(mat, ss, volume, params, slices_mask=mask_ss)


def run_svort(dataset: List[Stack], model, model_params, svort, vvr, force_vvr):
    """Full registration pipeline + svort-vs-vvr scoring (reference :447-562)."""
    res_s = 1.0
    res_r = 0.8

    if svort or vvr:
        (
            stacks_cropped,
            stacks_ori,
            transforms_cropped_reset,
            transforms_ori_reset,
            transforms_ori,
            crop_idx,
            s_thick,
        ) = parse_data(dataset, res_s)

    transforms_stack_full = None
    if svort:
        from .models import run_model, run_model_all_stack

        time_start = time.time()
        if model.version == "v1":
            transforms_svort, volume_svort = run_model(
                transforms_cropped_reset,
                stacks_cropped,
                model,
                model_params,
                res_s,
                s_thick,
                res_r,
            )
        else:
            transforms_svort, volume_svort = run_model_all_stack(
                transforms_cropped_reset,
                stacks_cropped,
                model,
                model_params,
                res_s,
                s_thick,
                res_r,
            )
        logging.debug("time for running SVoRT: %f s", time.time() - time_start)

        transforms_corrected, score_svort = correct_svort(
            transforms_svort,
            transforms_cropped_reset,
            stacks_cropped,
            volume_svort,
            res_s,
            s_thick,
            res_r,
        )
        transforms_svort_full, transforms_stack_full = get_transforms_full(
            transforms_corrected,
            transforms_cropped_reset,
            transforms_ori_reset,
            crop_idx,
        )
    else:
        score_svort = float("-inf")

    if vvr:
        time_start = time.time()
        transforms_vvr = stack_registration(
            [transforms_ori, transforms_stack_full] if svort else [transforms_ori],
            transforms_stack_full[0] if svort else transforms_ori[0],
            stacks_ori,
            res_s,
            s_thick,
        )
        logging.debug("time for stack registration: %f s", time.time() - time_start)

        if svort:
            volume_vvr = reconstruct_from_stacks(
                transforms_vvr,
                stacks_ori,
                res_s,
                s_thick,
                res_r,
                3 if model.version == "v1" else None,
            )
            score_vvr = compute_score(
                *simulated_ncc(
                    [
                        t[jnp.asarray(np.nonzero(np.asarray(i))[0])]
                        for t, i in zip(transforms_vvr, crop_idx)
                    ],
                    [
                        s[jnp.asarray(np.nonzero(np.asarray(i))[0])]
                        for s, i in zip(stacks_ori, crop_idx)
                    ],
                    volume_vvr,
                    res_s,
                    s_thick,
                    res_r,
                )
            )
        else:
            score_vvr = float("inf")
    else:
        score_vvr = float("-inf")

    if svort or vvr:
        if score_svort > float("-inf"):
            logging.info("similarity score for SVoRT = %f", score_svort)
        if score_vvr > float("-inf"):
            logging.info("similarity score for stack registration = %f", score_vvr)
        if score_svort < score_vvr or force_vvr:
            logging.info("use stack transformation")
            transforms_out = transforms_vvr
        else:
            logging.info("use slice transformation")
            transforms_out = transforms_svort_full

        for j in range(len(dataset)):
            dataset[j].transformation = transforms_out[j]

    # final per-slice normalization -> Slice list (reference :555-562)
    slices: List[Slice] = []
    for stack in dataset:
        mask_np = np.asarray(stack.mask)
        idx_nonempty = mask_np.reshape(mask_np.shape[0], -1).any(1)
        q99 = jnp.quantile(stack.slices[stack.mask], 0.99)
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
    return run_svort(dataset, model, model_params, svort, vvr, force_vvr)
