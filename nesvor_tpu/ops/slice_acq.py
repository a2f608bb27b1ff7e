"""PSF slice-acquisition projector: volume -> slices (forward) and its
adjoint splat (slices -> volume), fully differentiable.

TPU-native rebuild of the reference CUDA extension
``nesvor/slice_acquisition/slice_acq_cuda_kernel.cu``:

  * forward (reference :17-171): per slice pixel, map through the rigid
    transform, iterate the PSF support box, trilinearly gather the masked
    volume, normalize by the accumulated weight.
  * adjoint forward (reference :472-670): two passes — a weight pass that
    drops border pixels with ``weight < 0.5`` (reference :560), then a splat
    of ``psf/weight``-weighted slice values into the volume; optional
    ``equalize`` divides by the accumulated weight volume (reference
    :672-693) with the gradient clamp at 1e-3 (reference :683-687,
    equalize_cuda_kernel is_grad branch).

Design: instead of one CUDA thread per pixel with ``atomicAdd`` scatter
(which makes the reference nondeterministic), each PSF tap is processed as
a fully vectorized gather/scatter over all pixels inside a ``lax.scan``;
XLA's scatter-add is deterministic. The scan body is ``jax.checkpoint``-ed
so autodiff recomputes taps instead of storing 8 corner weights per tap.
Gradients w.r.t. both the volume and the 3x4 transforms come from plain JAX
autodiff through the branchless formulation (the reference needed ~900
lines of hand-derived backward kernels, :173-470 and :695-950).

TPU fast path (``res_slice == 1``, the entire SVoRT/SRR pipeline — the
reference resamples everything to a common 1 mm grid, inference.py:176-247):
pixel centers and PSF taps then lie on ONE rotated unit grid ("slab"), so

  out(pix) = sum_off psf(off) * trilerp(vol, R(p_pix + off + t))
           = (psf correlated-with S)(p_pix),   S(u) = trilerp(vol, R(u+t))

exactly — sampling the volume once per *slab* point instead of once per
(pixel, tap) pair (~T/overlap = 25-80x fewer random accesses), then applying
the PSF as a dense depthwise 3D convolution on the MXU. The 8 trilinear
corners of each sample are fetched with ONE 32/64-byte gather from a
corner-packed volume (``_corner_pack``: row i = the 8 cell corners of voxel
i; XLA's gather is latency-bound and width-independent up to 64 B). The
adjoint runs the same slab in reverse: conv-transpose of the weighted slice
values onto the slab, one 16-wide row scatter per slab point into the
corner-packed accumulator (sort + MXU window-reduce on TPU), and an 8-shift
unpack. Both paths remain pure jnp (autodiff provides vol/transform grads);
the scatter is wrapped in a custom_vjp whose backward is a gather.

Shapes follow the reference API: ``vol`` (1, 1, D, H, W) or (D, H, W);
``slices`` (n, 1, h, w); ``transforms`` (n, 3, 4) trans-first in
volume-voxel units (callers apply ``mat_update_resolution`` beforehand);
``res_slice`` = slice-pixel size in volume-voxel units.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


def _tap_offsets(psf_shape: Tuple[int, int, int]) -> np.ndarray:
    """Static (T, 3) array of (ox, oy, oz) PSF-tap offsets, x fastest —
    matching the reference loop order (slice_acq_cuda_kernel.cu:61-63)."""
    d_p, h_p, w_p = psf_shape
    zs = np.arange(-(d_p // 2), (d_p + 1) // 2)
    ys = np.arange(-(h_p // 2), (h_p + 1) // 2)
    xs = np.arange(-(w_p // 2), (w_p + 1) // 2)
    oz, oy, ox = np.meshgrid(zs, ys, xs, indexing="ij")
    return np.stack([ox, oy, oz], -1).reshape(-1, 3).astype(np.float32)


def _pixel_centers(
    transforms: jnp.ndarray,
    slice_shape: Tuple[int, int],
    vol_shape: Tuple[int, int, int],
    res_slice: float,
) -> jnp.ndarray:
    """Volume-voxel coordinates of slice-pixel centers, (n, h*w, 3)
    (reference :42-56)."""
    n = transforms.shape[0]
    h, w = slice_shape
    D, H, W = vol_shape
    R = transforms[:, :, :3]
    t = transforms[:, :, 3]
    ix = jnp.arange(w, dtype=transforms.dtype)
    iy = jnp.arange(h, dtype=transforms.dtype)
    px = (ix - (w - 1) / 2.0) * res_slice
    py = (iy - (h - 1) / 2.0) * res_slice
    gx, gy = jnp.meshgrid(px, py, indexing="xy")  # (h, w)
    p = jnp.stack([gx, gy, jnp.zeros_like(gx)], -1).reshape(-1, 3)  # (h*w, 3)
    # x' = R @ (p + t)  (trans_first)
    xyz = jnp.einsum("nij,npj->npi", R, p[None] + t[:, None, :])
    offset = jnp.array(
        [(W - 1) / 2.0, (H - 1) / 2.0, (D - 1) / 2.0], dtype=transforms.dtype
    )
    return xyz + offset


def _trilinear_weights(pos):
    """pos (..., 3) -> (base int coords, list of (corner_index_offset fns))."""
    p0 = jnp.floor(pos)
    frac = pos - p0
    return p0.astype(jnp.int32), frac


def _corner_iter(frac):
    """Yields (dx, dy, dz, weight) for the 8 trilinear corners."""
    wx, wy, wz = frac[..., 0], frac[..., 1], frac[..., 2]
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                w = (
                    (wx if dx else 1.0 - wx)
                    * (wy if dy else 1.0 - wy)
                    * (wz if dz else 1.0 - wz)
                )
                yield dx, dy, dz, w


def _resample_psf(psf_flat, psf_shape, rel, R):
    """Trilinear resample of the PSF at back-rotated offsets ``rel`` (n, P, 3)
    (reference :79-105 — the interp_psf branch)."""
    d_p, h_p, w_p = psf_shape
    # back-rotate: psf coords = R^T @ rel
    loc = jnp.einsum("nji,npj->npi", R, rel)
    loc = loc + jnp.array(
        [(w_p - 1) / 2.0, (h_p - 1) / 2.0, (d_p - 1) / 2.0], dtype=rel.dtype
    )
    valid = (
        (loc[..., 0] >= 0)
        & (loc[..., 1] >= 0)
        & (loc[..., 2] >= 0)
        & (loc[..., 0] < w_p - 1)
        & (loc[..., 1] < h_p - 1)
        & (loc[..., 2] < d_p - 1)
    )
    loc = jnp.clip(loc, 0.0, jnp.array([w_p - 1, h_p - 1, d_p - 1], dtype=rel.dtype) - 1e-6)
    base, frac = _trilinear_weights(loc)
    val = jnp.zeros(rel.shape[:-1], dtype=psf_flat.dtype)
    for dx, dy, dz, w in _corner_iter(frac):
        idx = (
            (base[..., 2] + dz) * (h_p * w_p)
            + (base[..., 1] + dy) * w_p
            + (base[..., 0] + dx)
        )
        val = val + w * jnp.take(psf_flat, idx)
    return jnp.where(valid, val, 0.0)


def _as_vol3d(vol):
    return vol.reshape(vol.shape[-3:])


def _normalize_masks(vol_mask, slices_mask):
    if vol_mask is not None and vol_mask.size == 0:
        vol_mask = None
    if slices_mask is not None and slices_mask.size == 0:
        slices_mask = None
    return vol_mask, slices_mask


@partial(
    jax.jit,
    static_argnames=("slice_shape", "res_slice", "need_weight", "interp_psf", "psf_shape"),
)
def _forward_impl(
    transforms,
    vol3d,
    vol_mask3d,
    slices_mask,
    psf_flat,
    taps,
    slice_shape,
    res_slice,
    need_weight,
    interp_psf,
    psf_shape,
):
    n = transforms.shape[0]
    h, w = slice_shape
    D, H, W = vol3d.shape
    P = h * w
    dtype = vol3d.dtype

    centers = _pixel_centers(transforms, slice_shape, (D, H, W), res_slice)  # (n, P, 3)
    R = transforms[:, :, :3]
    vol_flat = vol3d.reshape(-1)
    vmask_flat = None if vol_mask3d is None else vol_mask3d.reshape(-1)

    def tap_body(carry, tap):
        val, wt = carry
        off = tap[:3]
        pv = tap[3]
        rot_off = jnp.einsum("nij,j->ni", R, off)  # (n, 3)
        pos = centers + rot_off[:, None, :]  # (n, P, 3)
        valid = (
            (pos[..., 0] >= 0)
            & (pos[..., 1] >= 0)
            & (pos[..., 2] >= 0)
            & (pos[..., 0] < W - 1)
            & (pos[..., 1] < H - 1)
            & (pos[..., 2] < D - 1)
        )
        pos_c = jnp.clip(
            pos, 0.0, jnp.array([W - 1, H - 1, D - 1], dtype=dtype) - 1e-6
        )
        if interp_psf:
            # NN volume sample, trilinear PSF resample (reference :71-109)
            idx_nn = (
                jnp.round(pos_c[..., 2]).astype(jnp.int32) * (H * W)
                + jnp.round(pos_c[..., 1]).astype(jnp.int32) * W
                + jnp.round(pos_c[..., 0]).astype(jnp.int32)
            )
            rel = jnp.round(pos) - centers  # (n, P, 3)
            pv_eff = _resample_psf(psf_flat, psf_shape, rel, R)
            cmask = 1.0 if vmask_flat is None else jnp.take(vmask_flat, idx_nn).astype(dtype)
            contrib_w = jnp.where(valid, pv_eff * cmask, 0.0)
            val = val + contrib_w * jnp.take(vol_flat, idx_nn)
            wt = wt + contrib_w
        else:
            base, frac = _trilinear_weights(pos_c)
            for dx, dy, dz, cw in _corner_iter(frac):
                idx = (
                    (base[..., 2] + dz) * (H * W)
                    + (base[..., 1] + dy) * W
                    + (base[..., 0] + dx)
                )
                cm = 1.0 if vmask_flat is None else jnp.take(vmask_flat, idx).astype(dtype)
                contrib_w = jnp.where(valid, pv * cw * cm, 0.0)
                val = val + contrib_w * jnp.take(vol_flat, idx)
                wt = wt + contrib_w
        return (val, wt), None

    init = (jnp.zeros((n, P), dtype), jnp.zeros((n, P), dtype))
    (val, wt), _ = jax.lax.scan(jax.checkpoint(tap_body), init, taps)

    out = jnp.where(wt > 0, val / jnp.where(wt > 0, wt, 1.0), 0.0)
    if slices_mask is not None:
        sm = slices_mask.reshape(n, P)
        out = jnp.where(sm, out, 0.0)
        wt = jnp.where(sm, wt, 0.0)
    return out.reshape(n, 1, h, w), wt.reshape(n, 1, h, w)


# ---------------------------------------------------------------------------
# slab fast path (res_slice == 1): one gather per slab point + depthwise conv
# ---------------------------------------------------------------------------


def _corner_shifts(W: int, HW: int):
    """Flat-index offsets of the 8 cell corners, order matching _corner_iter
    (dx fastest: c = dx + 2*dy + 4*dz)."""
    return (0, 1, W, W + 1, HW, HW + 1, HW + W, HW + W + 1)


def _corner_pack(flat: jnp.ndarray, W: int, HW: int) -> jnp.ndarray:
    """(DHW,) -> (DHW, 8): row i holds the 8 corners of cell i (one 32-byte
    gather row; the analog of ops/cell_grid's cell-block layout)."""
    DHW = flat.shape[0]
    pad = jnp.pad(flat, (0, HW + W + 1))
    return jnp.stack(
        [
            jax.lax.dynamic_slice_in_dim(pad, s, DHW)
            for s in _corner_shifts(W, HW)
        ],
        axis=1,
    )


def _corner_unpack(acc: jnp.ndarray, W: int, HW: int) -> jnp.ndarray:
    """Transpose of _corner_pack: (DHW, 8) per-cell corner contributions ->
    (DHW,) volume (vol[i + shift_c] += acc[i, c])."""
    DHW = acc.shape[0]
    out = 0.0
    for c, s in enumerate(_corner_shifts(W, HW)):
        out = out + jnp.pad(acc[:, c], (s, HW + W + 1 - s))[:DHW]
    return out


def _slab_geometry(transforms, slice_shape, vol_shape, psf_shape, dtype):
    """Positions of the rotated slab grid (pixel grid ⊕ PSF tap grid at unit
    spacing) in volume-voxel coords. Returns (idx (n, Np) int32 cell keys,
    corner_w (8, n, Np), valid (n, Np), slab dims (Zs, Ys, Xs))."""
    n = transforms.shape[0]
    h, w = slice_shape
    D, H, W = vol_shape
    d_p, h_p, w_p = psf_shape
    Zs, Ys, Xs = d_p, h + h_p - 1, w + w_p - 1
    R = transforms[:, :, :3]
    t = transforms[:, :, 3]
    # slab point (uz, uy, ux) sits at pixel/tap position
    # ((ux - w_p//2) - (w-1)/2, (uy - h_p//2) - (h-1)/2, uz - d_p//2):
    # identical float arithmetic to _pixel_centers + _tap_offsets (exact for
    # |coords| < 2^23, so the slab decomposition is bit-consistent)
    ux = jnp.arange(Xs, dtype=dtype) - (w_p // 2) - (w - 1) / 2.0
    uy = jnp.arange(Ys, dtype=dtype) - (h_p // 2) - (h - 1) / 2.0
    uz = jnp.arange(Zs, dtype=dtype) - (d_p // 2)
    gz, gy, gx = jnp.meshgrid(uz, uy, ux, indexing="ij")
    p = jnp.stack([gx, gy, gz], -1).reshape(-1, 3)  # (Np, 3)
    xyz = jnp.einsum("nij,npj->npi", R, p[None] + t[:, None, :])
    offset = jnp.array(
        [(W - 1) / 2.0, (H - 1) / 2.0, (D - 1) / 2.0], dtype=dtype
    )
    pos = xyz + offset  # (n, Np, 3)
    valid = (
        (pos[..., 0] >= 0)
        & (pos[..., 1] >= 0)
        & (pos[..., 2] >= 0)
        & (pos[..., 0] < W - 1)
        & (pos[..., 1] < H - 1)
        & (pos[..., 2] < D - 1)
    )
    pos_c = jnp.clip(pos, 0.0, jnp.array([W - 1, H - 1, D - 1], dtype=dtype) - 1e-6)
    base, frac = _trilinear_weights(pos_c)
    idx = base[..., 2] * (H * W) + base[..., 1] * W + base[..., 0]  # (n, Np)
    corner_w = jnp.stack(
        [cw for _, _, _, cw in _corner_iter(frac)], axis=0
    )  # (8, n, Np)
    return idx, corner_w, valid, (Zs, Ys, Xs)


def _depthwise_corr3d(x: jnp.ndarray, psf: jnp.ndarray, padding) -> jnp.ndarray:
    """x (n, C, Z, Y, X) correlated per-channel with psf (d_p, h_p, w_p)."""
    C = x.shape[1]
    kern = jnp.broadcast_to(psf[None, None], (C, 1) + psf.shape).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x,
        kern,
        window_strides=(1, 1, 1),
        padding=padding,
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
        feature_group_count=C,
        precision=jax.lax.Precision.HIGHEST,
    )


def _pad_chunk_transforms(transforms, slice_chunk):
    """Pad (n, 3, 4) transforms to a multiple of ``slice_chunk`` with
    far-out-of-volume dummies (translation 1e6 -> every slab point invalid),
    so padded slices contribute/receive nothing. Returns (padded, n_pad)."""
    n = transforms.shape[0]
    n_pad = -(-n // slice_chunk) * slice_chunk - n
    if n_pad == 0:
        return transforms, 0
    dummy = jnp.zeros((n_pad, 3, 4), transforms.dtype)
    dummy = dummy.at[:, :, 3].set(1e6)
    dummy = dummy.at[:, 0, 0].set(1.0).at[:, 1, 1].set(1.0).at[:, 2, 2].set(1.0)
    return jnp.concatenate([transforms, dummy], axis=0), n_pad


@partial(jax.jit, static_argnames=("slice_shape", "psf_shape", "slice_chunk"))
def _forward_slab_impl(
    transforms, vol3d, vol_mask3d, slices_mask, psf, slice_shape, psf_shape,
    slice_chunk=None,
):
    n = transforms.shape[0]
    h, w = slice_shape
    D, H, W = vol3d.shape
    HW = H * W
    dtype = vol3d.dtype

    vol8 = _corner_pack(vol3d.reshape(-1), W, HW)  # (DHW, 8)
    mask8 = (
        None
        if vol_mask3d is None
        else _corner_pack(vol_mask3d.reshape(-1).astype(dtype), W, HW)
    )

    def chunk_fwd(tr):
        """Project one block of slices against the shared packed volume.
        Peak transient is the block's (nc*Np, 8/16) gather — bounding the
        program's working set when the block is small (inference-scale
        problems: hundreds of slices x 224^3 volumes otherwise exhaust HBM
        in the composed CG programs)."""
        nc = tr.shape[0]
        idx, corner_w, valid, (Zs, Ys, Xs) = _slab_geometry(
            tr, slice_shape, (D, H, W), psf_shape, dtype
        )
        validf = valid.astype(dtype)
        if mask8 is not None:
            packed = jnp.take(
                jnp.concatenate([vol8, mask8], axis=1), idx.reshape(-1), axis=0
            )  # (nc*Np, 16) — one 64 B row per slab point
            v8 = packed[:, :8].reshape(nc, -1, 8)
            m8 = packed[:, 8:].reshape(nc, -1, 8)
            cw = jnp.moveaxis(corner_w, 0, -1)  # (nc, Np, 8)
            s_val = jnp.sum(cw * m8 * v8, axis=-1) * validf  # (nc, Np)
            s_wt = jnp.sum(cw * m8, axis=-1) * validf
        else:
            v8 = jnp.take(vol8, idx.reshape(-1), axis=0).reshape(nc, -1, 8)
            cw = jnp.moveaxis(corner_w, 0, -1)
            s_val = jnp.sum(cw * v8, axis=-1) * validf
            s_wt = validf  # trilinear weights sum to 1

        slab = jnp.stack([s_val, s_wt], axis=1).reshape(nc, 2, Zs, Ys, Xs)
        out = _depthwise_corr3d(slab, psf, "VALID")  # (nc, 2, 1, h, w)
        val = out[:, 0, 0]
        wt = out[:, 1, 0]
        res = jnp.where(wt > 0, val / jnp.where(wt > 0, wt, 1.0), 0.0)
        return res.reshape(nc, h * w), wt.reshape(nc, h * w)

    if slice_chunk is None or n <= slice_chunk:
        res, wt = chunk_fwd(transforms)
    else:
        tr_p, _ = _pad_chunk_transforms(transforms, slice_chunk)
        res, wt = jax.lax.map(
            chunk_fwd, tr_p.reshape(-1, slice_chunk, 3, 4)
        )
        res = res.reshape(-1, h * w)[:n]
        wt = wt.reshape(-1, h * w)[:n]

    if slices_mask is not None:
        sm = slices_mask.reshape(n, h * w)
        res = jnp.where(sm, res, 0.0)
        wt = jnp.where(sm, wt, 0.0)
    return res.reshape(n, 1, h, w), wt.reshape(n, 1, h, w)


def slice_acquisition(
    transforms: jnp.ndarray,
    vol: jnp.ndarray,
    vol_mask: Optional[jnp.ndarray],
    slices_mask: Optional[jnp.ndarray],
    psf: jnp.ndarray,
    slice_shape: Tuple[int, int],
    res_slice: float,
    need_weight: bool,
    interp_psf: bool,
    slice_chunk: Optional[int] = None,
):
    """Forward projection volume -> slices (reference slice_acq.py:166-190).

    ``slice_chunk``: process slices in blocks of this size inside the
    program (slab path only) — bounds the peak transient working set for
    inference-scale problems; None (default) keeps the single-block
    behavior used by training.
    """
    vol_mask, slices_mask = _normalize_masks(vol_mask, slices_mask)
    vol3d = _as_vol3d(vol)
    vol_mask3d = None if vol_mask is None else _as_vol3d(vol_mask)
    psf_shape = tuple(psf.shape)
    # Remat boundary: when something differentiates *through* the projector
    # (only SVoRT training does — inference/VVR/SRR-CG-at-inference never
    # do), save just the inputs and recompute the slab/tap gathers in the
    # backward pass. Without this, AD saves ~1.3 GB of gathered corner
    # values + indices per application (measured: a 3-stack SVoRT train
    # step needs >21 GB of HBM; with it, it fits one v5e). Forward-only
    # use is unaffected by jax.checkpoint.
    if not interp_psf and abs(float(res_slice) - 1.0) < 1e-9:
        ss = tuple(int(s) for s in slice_shape)

        def _fwd_slab(transforms, vol3d, vol_mask3d, slices_mask, psf):
            return _forward_slab_impl(
                transforms, vol3d, vol_mask3d, slices_mask, psf, ss, psf_shape,
                slice_chunk,
            )

        out, wt = jax.checkpoint(_fwd_slab)(
            transforms, vol3d, vol_mask3d, slices_mask, psf
        )
        if need_weight:
            return out, wt
        return out
    taps = jnp.concatenate(
        [jnp.asarray(_tap_offsets(psf_shape)), psf.reshape(-1, 1)], axis=1
    )
    ss = tuple(int(s) for s in slice_shape)

    def _fwd_tap(transforms, vol3d, vol_mask3d, slices_mask, psf_flat, taps):
        return _forward_impl(
            transforms,
            vol3d,
            vol_mask3d,
            slices_mask,
            psf_flat,
            taps,
            ss,
            float(res_slice),
            bool(need_weight),
            bool(interp_psf),
            psf_shape,
        )

    out, wt = jax.checkpoint(_fwd_tap)(
        transforms, vol3d, vol_mask3d, slices_mask, psf.reshape(-1), taps
    )
    if need_weight:
        return out, wt
    return out


@jax.custom_vjp
def _equalize(num: jnp.ndarray, den: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(den > 0, num / jnp.where(den > 0, den, 1.0), num)


def _equalize_fwd(num, den):
    return _equalize(num, den), den


def _equalize_bwd(den, g):
    # reference equalize_cuda_kernel is_grad branch (:672-693): divide the
    # incoming gradient by the weight clamped at 1e-3; no gradient w.r.t. den.
    gnum = jnp.where(den > 0, g / jnp.maximum(den, 1e-3), g)
    return gnum, None


_equalize.defvjp(_equalize_fwd, _equalize_bwd)


# --- differentiable row scatter (sort + window-reduce on TPU) --------------


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _segment_sum_rows(rows: jnp.ndarray, keys: jnp.ndarray, num_rows: int):
    """Sum ``rows`` (M, C) into (num_rows, C) by int key; d/drows = gather."""
    return _segment_sum_rows_fwd(rows, keys, num_rows)[0]


def _segment_sum_rows_fwd(rows, keys, num_rows: int):
    keys = keys.astype(jnp.int32)
    if jax.default_backend() == "tpu" and rows.shape[-1] * 8 == 128:
        from .window_reduce import window_reduce_sorted

        order = jnp.argsort(keys)
        out = window_reduce_sorted(keys[order], rows[order], num_rows)
    else:
        out = jnp.zeros((num_rows, rows.shape[-1]), rows.dtype).at[keys].add(rows)
    return out, keys


def _segment_sum_rows_bwd(num_rows: int, keys, g):
    return jnp.take(g, keys, axis=0), None


_segment_sum_rows.defvjp(_segment_sum_rows_fwd, _segment_sum_rows_bwd)


@partial(
    jax.jit,
    static_argnames=("vol_shape", "psf_shape", "equalize", "return_weight",
                     "slice_chunk"),
)
def _adjoint_slab_impl(
    transforms,
    psf,
    slices,
    slices_mask,
    vol_mask3d,
    vol_shape,
    psf_shape,
    equalize,
    return_weight,
    slice_chunk=None,
):
    n = transforms.shape[0]
    h, w = slices.shape[-2], slices.shape[-1]
    D, H, W = vol_shape
    HW = H * W
    dtype = slices.dtype
    d_p, h_p, w_p = psf_shape

    mask8 = (
        None
        if vol_mask3d is None
        else _corner_pack(vol_mask3d.reshape(-1).astype(dtype), W, HW)
    )

    def chunk_adj(tr, s, sm):
        """Splat one block of slices into (DHW,) value/weight accumulators.
        Same working-set rationale as the forward's chunk_fwd."""
        nc = tr.shape[0]
        idx, corner_w, valid, (Zs, Ys, Xs) = _slab_geometry(
            tr, (h, w), (D, H, W), psf_shape, dtype
        )
        validf = valid.astype(dtype)

        # pass 1: per-pixel PSF weight = psf ⊛ valid (reference :517-560
        # adds the raw tap weight, no trilinear/mask factors)
        wt = _depthwise_corr3d(
            validf.reshape(nc, 1, Zs, Ys, Xs), psf, "VALID"
        )[:, 0, 0].reshape(nc, h * w)
        keep = wt >= 0.5
        sf = s.reshape(nc, h * w)
        if sm is not None:
            keep = keep & sm.reshape(nc, h * w)
        inv_wt = jnp.where(keep, 1.0 / jnp.where(keep, wt, 1.0), 0.0)
        inv_wt = jax.lax.stop_gradient(inv_wt)
        y = jnp.stack([jnp.where(keep, sf, 0.0) * inv_wt, inv_wt], axis=1)

        # pass 2: conv-transpose the pixel fields onto the slab — true conv
        # (kernel flipped on all axes) with FULL padding; the z-axis selects
        # psf[uz] since the pixel plane sits at a single uz
        G = jax.lax.conv_general_dilated(
            y.reshape(nc, 2, 1, h, w),
            jnp.broadcast_to(
                psf[::-1, ::-1, ::-1][None, None], (2, 1) + psf_shape
            ).astype(dtype),
            window_strides=(1, 1, 1),
            padding=[(d_p - 1, d_p - 1), (h_p - 1, h_p - 1), (w_p - 1, w_p - 1)],
            dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
            feature_group_count=2,
            precision=jax.lax.Precision.HIGHEST,
        )  # (nc, 2, Zs, Ys, Xs)
        G = G.reshape(nc, 2, -1)

        cw = jnp.moveaxis(corner_w, 0, -1)  # (nc, Np, 8)
        if mask8 is not None:
            cm = jnp.take(mask8, idx.reshape(-1), axis=0).reshape(cw.shape)
            cw = cw * cm
        cwv = cw * validf[..., None]  # (nc, Np, 8)
        rows = jnp.concatenate(
            [cwv * G[:, 0][..., None], cwv * G[:, 1][..., None]], axis=-1
        ).reshape(-1, 16)
        acc = _segment_sum_rows(rows, idx.reshape(-1), D * H * W)  # (DHW, 16)
        return (
            _corner_unpack(acc[:, :8].astype(dtype), W, HW),
            _corner_unpack(acc[:, 8:].astype(dtype), W, HW),
        )

    if slice_chunk is None or n <= slice_chunk:
        vol_acc, vw_acc = chunk_adj(transforms, slices, slices_mask)
    else:
        tr_p, n_pad = _pad_chunk_transforms(transforms, slice_chunk)
        s_p = jnp.concatenate(
            [slices.reshape(n, h * w),
             jnp.zeros((n_pad, h * w), dtype)], axis=0
        ).reshape(-1, slice_chunk, h * w)
        if slices_mask is not None:
            sm_p = jnp.concatenate(
                [slices_mask.reshape(n, h * w),
                 jnp.zeros((n_pad, h * w), slices_mask.dtype)], axis=0
            ).reshape(-1, slice_chunk, h * w)

        def body(carry, xs):
            if slices_mask is not None:
                tr, s, sm = xs
            else:
                (tr, s), sm = xs, None
            dv, dw = chunk_adj(tr, s, sm)
            return (carry[0] + dv, carry[1] + dw), None

        init = (jnp.zeros(D * H * W, dtype), jnp.zeros(D * H * W, dtype))
        xs = (
            (tr_p.reshape(-1, slice_chunk, 3, 4), s_p, sm_p)
            if slices_mask is not None
            else (tr_p.reshape(-1, slice_chunk, 3, 4), s_p)
        )
        (vol_acc, vw_acc), _ = jax.lax.scan(body, init, xs)

    if equalize:
        vol_acc = _equalize(vol_acc, vw_acc)
    vol_out = vol_acc.reshape(1, 1, D, H, W)
    if return_weight:
        return vol_out, vw_acc.reshape(1, 1, D, H, W)
    return vol_out


@partial(
    jax.jit,
    static_argnames=("vol_shape", "res_slice", "interp_psf", "equalize", "psf_shape", "return_weight"),
)
def _adjoint_impl(
    transforms,
    psf_flat,
    taps,
    slices,
    slices_mask,
    vol_mask3d,
    vol_shape,
    res_slice,
    interp_psf,
    equalize,
    psf_shape,
    return_weight,
):
    n = transforms.shape[0]
    h, w = slices.shape[-2], slices.shape[-1]
    D, H, W = vol_shape
    P = h * w
    dtype = slices.dtype

    centers = _pixel_centers(transforms, (h, w), (D, H, W), res_slice)
    R = transforms[:, :, :3]
    vmask_flat = None if vol_mask3d is None else vol_mask3d.reshape(-1)

    # ---- pass 1: per-pixel PSF weight (reference :517-560) ----
    def weight_body(wt, tap):
        off = tap[:3]
        pv = tap[3]
        rot_off = jnp.einsum("nij,j->ni", R, off)
        pos = centers + rot_off[:, None, :]
        valid = (
            (pos[..., 0] >= 0)
            & (pos[..., 1] >= 0)
            & (pos[..., 2] >= 0)
            & (pos[..., 0] < W - 1)
            & (pos[..., 1] < H - 1)
            & (pos[..., 2] < D - 1)
        )
        if interp_psf:
            rel = jnp.round(pos) - centers
            pv_eff = _resample_psf(psf_flat, psf_shape, rel, R)
            wt = wt + jnp.where(valid, pv_eff, 0.0)
        else:
            wt = wt + jnp.where(valid, pv, 0.0)
        return wt, None

    wt, _ = jax.lax.scan(
        jax.checkpoint(weight_body), jnp.zeros((n, P), dtype), taps
    )
    # border rule (reference :560)
    keep = wt >= 0.5
    s = slices.reshape(n, P)
    if slices_mask is not None:
        keep = keep & slices_mask.reshape(n, P)
    s_eff = jnp.where(keep, s, 0.0)
    inv_wt = jnp.where(keep, 1.0 / jnp.where(keep, wt, 1.0), 0.0)
    inv_wt = jax.lax.stop_gradient(inv_wt)  # weight normalization is data-independent

    # ---- pass 2: splat (reference :564-665) ----
    def splat_body(carry, tap):
        vol_acc, vw_acc = carry
        off = tap[:3]
        pv = tap[3]
        rot_off = jnp.einsum("nij,j->ni", R, off)
        pos = centers + rot_off[:, None, :]
        valid = (
            (pos[..., 0] >= 0)
            & (pos[..., 1] >= 0)
            & (pos[..., 2] >= 0)
            & (pos[..., 0] < W - 1)
            & (pos[..., 1] < H - 1)
            & (pos[..., 2] < D - 1)
        )
        pos_c = jnp.clip(pos, 0.0, jnp.array([W - 1, H - 1, D - 1], dtype=dtype) - 1e-6)
        if interp_psf:
            rel = jnp.round(pos) - centers
            pv_eff = _resample_psf(psf_flat, psf_shape, rel, R) * inv_wt
            idx = (
                jnp.round(pos_c[..., 2]).astype(jnp.int32) * (H * W)
                + jnp.round(pos_c[..., 1]).astype(jnp.int32) * W
                + jnp.round(pos_c[..., 0]).astype(jnp.int32)
            )
            cm = 1.0 if vmask_flat is None else jnp.take(vmask_flat, idx).astype(dtype)
            contrib = jnp.where(valid, pv_eff * cm, 0.0)
            vol_acc = vol_acc.at[idx.reshape(-1)].add((contrib * s_eff).reshape(-1))
            vw_acc = vw_acc.at[idx.reshape(-1)].add(contrib.reshape(-1))
        else:
            base, frac = _trilinear_weights(pos_c)
            pv_eff = pv * inv_wt  # (n, P)
            for dx, dy, dz, cw in _corner_iter(frac):
                idx = (
                    (base[..., 2] + dz) * (H * W)
                    + (base[..., 1] + dy) * W
                    + (base[..., 0] + dx)
                )
                cm = 1.0 if vmask_flat is None else jnp.take(vmask_flat, idx).astype(dtype)
                contrib = jnp.where(valid, pv_eff * cw * cm, 0.0)
                vol_acc = vol_acc.at[idx.reshape(-1)].add((contrib * s_eff).reshape(-1))
                vw_acc = vw_acc.at[idx.reshape(-1)].add(contrib.reshape(-1))
        return (vol_acc, vw_acc), None

    init = (
        jnp.zeros(D * H * W, dtype),
        jnp.zeros(D * H * W, dtype),
    )
    (vol_acc, vw_acc), _ = jax.lax.scan(jax.checkpoint(splat_body), init, taps)

    if equalize:
        vol_acc = _equalize(vol_acc, vw_acc)

    vol_out = vol_acc.reshape(1, 1, D, H, W)
    vw_out = vw_acc.reshape(1, 1, D, H, W)
    if return_weight:
        return vol_out, vw_out
    return vol_out


def slice_acquisition_adjoint(
    transforms: jnp.ndarray,
    psf: jnp.ndarray,
    slices: jnp.ndarray,
    slices_mask: Optional[jnp.ndarray],
    vol_mask: Optional[jnp.ndarray],
    vol_shape: Tuple[int, int, int],
    res_slice: float,
    interp_psf: bool,
    equalize: bool,
    return_weight: bool = False,
    slice_chunk: Optional[int] = None,
):
    """Adjoint splat slices -> volume (reference slice_acq.py:193-211).
    ``slice_chunk`` as in :func:`slice_acquisition` (slab path only)."""
    vol_mask, slices_mask = _normalize_masks(vol_mask, slices_mask)
    vol_mask3d = None if vol_mask is None else _as_vol3d(vol_mask)
    psf_shape = tuple(psf.shape)
    # same remat rationale as slice_acquisition: recompute the splat in the
    # backward pass instead of saving per-point gather/scatter intermediates
    vs = tuple(int(s) for s in vol_shape)
    if not interp_psf and abs(float(res_slice) - 1.0) < 1e-9:

        def _adj_slab(transforms, psf, slices, slices_mask, vol_mask3d):
            return _adjoint_slab_impl(
                transforms,
                psf,
                slices,
                slices_mask,
                vol_mask3d,
                vs,
                psf_shape,
                bool(equalize),
                bool(return_weight),
                slice_chunk,
            )

        return jax.checkpoint(_adj_slab)(
            transforms, psf, slices, slices_mask, vol_mask3d
        )
    taps = jnp.concatenate(
        [jnp.asarray(_tap_offsets(psf_shape)), psf.reshape(-1, 1)], axis=1
    )

    def _adj_tap(transforms, psf_flat, taps, slices, slices_mask, vol_mask3d):
        return _adjoint_impl(
            transforms,
            psf_flat,
            taps,
            slices,
            slices_mask,
            vol_mask3d,
            vs,
            float(res_slice),
            bool(interp_psf),
            bool(equalize),
            psf_shape,
            bool(return_weight),
        )

    return jax.checkpoint(_adj_tap)(
        transforms, psf.reshape(-1), taps, slices, slices_mask, vol_mask3d
    )
