"""Fused Pallas TPU MLP: the whole layer stack in one kernel pass.

Replaces the chain of XLA dots in ``models.mlp_apply`` for the training
hot path. Even with bf16 activations, the unfused MLP stack moves
~22 GB/step at the default batch (1M points x width 256: every hidden
activation makes an HBM round trip between layers, and the backward reads
them all again) — profiled at ~32 of 49 ms/step. This kernel keeps all
activations in VMEM per row-tile:

  * forward: x tile -> h1 -> h2 -> ... -> out, one MXU dot per layer,
    nothing but x and out touch HBM;
  * backward: recomputes the forward inside the kernel (FLOPs are ~free
    next to the saved bandwidth), then walks the delta chain back,
    accumulating dW/db in f32 VMEM scratch across the sequential grid
    (flushed once) and writing the dX tile.

This is the same strategy as tiny-cuda-nn's fully-fused fp16 MLP
(reference nesvor/nesvor/models.py:27-41 uses tcnn.Network "CutlassMLP"),
expressed as a Pallas kernel with bf16 compute / f32 parameter gradients.

Weights are passed bf16 (pre-cast by the caller); gradients return f32.
The public entry ``fused_mlp`` pads N to the tile size and hides the
custom_vjp; it falls back to plain XLA on non-TPU backends.
"""

from __future__ import annotations

import functools
import os
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = int(os.environ.get("NESVOR_TPU_FUSED_TILE", "2048"))

# the forward grid has no cross-tile dependencies: declare it parallel.
# the backward grid revisits the dW/db accumulator outputs every step, so
# its grid dimension must be sequential ("arbitrary"); Mosaic still
# pipelines the blocked x/g/dx tiles along it.
_FWD_PARAMS = pltpu.CompilerParams(dimension_semantics=("parallel",))
_BWD_SEQ_PARAMS = pltpu.CompilerParams(dimension_semantics=("arbitrary",))

# Save the hidden activations in the forward and feed them to the backward
# instead of recomputing them there. The kernel regime is MXU-compute-bound
# (microbench_mlp: ~2.5 GB/step of tile traffic vs ~1.6 TFLOP/step), so
# trading HBM bytes (2 extra hidden-activation round trips) for the
# recompute's 232 GFLOP is the right direction on this chip. Opt-in: the
# first attempt to compile this variant wedged the remote Mosaic compile
# helper (2026-08-17); do not enable by default until it has compiled and
# measured faster on the target toolchain.
SAVE_HS = os.environ.get("NESVOR_TPU_FUSED_SAVE_HS", "0") != "0"


def _interpret() -> bool:
    # CPU tests run the kernel in interpreter mode
    return jax.default_backend() != "tpu"


def _dot(a, b, prec_out):
    # explicit DEFAULT: entry points set jax_default_matmul_precision=highest
    # for f32 semantics (_precision.py), but a bf16 Mosaic matmul with fp32 contract
    # precision crashes this toolchain's compile helper (and bf16 needs no
    # multi-pass anyway)
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=prec_out,
        precision=jax.lax.Precision.DEFAULT,
    )


def _dot_t(a, b):
    """a (T, d_out) x b (d_in, d_out) contracted on d_out -> (T, d_in) f32
    (Mosaic requires 32-bit matmul accumulators)."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


def _dot_tt(h, delta):
    """h (T, d_in) x delta (T, d_out) contracted on T -> (d_in, d_out) f32."""
    return jax.lax.dot_general(
        h, delta, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


def _fwd_kernel(x_ref, *refs, n_layers, save_hs):
    # refs: w0, b0, ..., out_ref [, h1_ref, ..., h_{n-1}_ref]
    out_ref = refs[2 * n_layers]
    hs_refs = refs[2 * n_layers + 1 :]
    h = x_ref[:]
    for i in range(n_layers):
        w = refs[2 * i][:]
        b = refs[2 * i + 1][:]
        last = i == n_layers - 1
        z = _dot(h, w, jnp.float32) + b.astype(jnp.float32)
        if last:
            out_ref[:] = z
        else:
            h = jnp.maximum(z, 0.0).astype(x_ref.dtype)
            if save_hs:
                hs_refs[i][:] = h


def _bwd_kernel(x_ref, g_ref, *refs, n_layers, n_hs):
    # refs: [h1, ..., h_{n_hs},] w0, b0, ..., dx_ref, dw0, db0, dw1, db1, ...
    hs_refs = refs[:n_hs]
    refs = refs[n_hs:]
    dx_ref = refs[2 * n_layers]
    dparam_refs = refs[2 * n_layers + 1 :]
    i_prog = pl.program_id(0)

    @pl.when(i_prog == 0)
    def _():
        for r in dparam_refs:
            r[:] = jnp.zeros_like(r)

    hs = [x_ref[:]]
    if n_hs:
        # post-relu activations saved by the forward
        hs += [r[:] for r in hs_refs]
    else:
        # forward recompute, stashing post-relu activations
        h = hs[0]
        for i in range(n_layers - 1):
            w = refs[2 * i][:]
            b = refs[2 * i + 1][:]
            z = _dot(h, w, jnp.float32) + b.astype(jnp.float32)
            h = jnp.maximum(z, 0.0).astype(x_ref.dtype)
            hs.append(h)

    delta = g_ref[:].astype(x_ref.dtype)  # (T, d_last)
    for i in range(n_layers - 1, -1, -1):
        w = refs[2 * i][:]
        dw_ref = dparam_refs[2 * i]
        db_ref = dparam_refs[2 * i + 1]
        dw_ref[:] += _dot_tt(hs[i], delta)
        db_ref[:] += jnp.sum(delta.astype(jnp.float32), axis=0, keepdims=True)
        if i == 0:
            dx_ref[:] = _dot_t(delta, w).astype(dx_ref.dtype)
        else:
            dprev = _dot_t(delta, w)  # (T, d_in) f32
            # compare in f32: Mosaic lacks bf16 cmpf in this toolchain
            mask = hs[i].astype(jnp.float32) > 0.0
            delta = jnp.where(mask, dprev, 0.0).astype(x_ref.dtype)


def _pad_rows(x, tile):
    n = x.shape[0]
    pad = (-n) % tile
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), x.dtype)], 0)
    return x, n


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_mlp_core(dims: Tuple[Tuple[int, int], ...], x, ws, bs):
    return _fused_fwd_impl(dims, x, ws, bs)


def _w_b_specs(n_layers):
    return [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(2 * n_layers)]


def _fused_fwd_impl(dims, x, ws, bs, save_hs=False):
    """Returns out (or (out, hs) when ``save_hs``): hs are the post-relu
    hidden activations, saved for the no-recompute backward."""
    n_layers = len(dims)
    xp, n = _pad_rows(x, TILE)
    grid = xp.shape[0] // TILE
    d_last = dims[-1][1]
    out_specs = [pl.BlockSpec((TILE, d_last), lambda i: (i, 0))]
    out_shapes = [jax.ShapeDtypeStruct((xp.shape[0], d_last), jnp.float32)]
    if save_hs:
        for d_in, d_out in dims[:-1]:
            out_specs.append(pl.BlockSpec((TILE, d_out), lambda i: (i, 0)))
            out_shapes.append(
                jax.ShapeDtypeStruct((xp.shape[0], d_out), x.dtype)
            )
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, n_layers=n_layers, save_hs=save_hs),
        grid=(grid,),
        in_specs=[pl.BlockSpec((TILE, dims[0][0]), lambda i: (i, 0))]
        + _w_b_specs(n_layers),
        out_specs=out_specs if save_hs else out_specs[0],
        out_shape=out_shapes if save_hs else out_shapes[0],
        interpret=_interpret(),
        compiler_params=None if _interpret() else _FWD_PARAMS,
    )(xp, *[r for pair in zip(ws, bs) for r in pair])
    if save_hs:
        return outs[0][:n], outs[1:]  # hs stay row-padded (kernel-internal)
    return outs[:n]


def _fused_vjp_fwd(dims, x, ws, bs):
    if SAVE_HS:
        out, hs = _fused_fwd_impl(dims, x, ws, bs, save_hs=True)
        return out, (x, ws, bs, hs)
    return _fused_fwd_impl(dims, x, ws, bs), (x, ws, bs, ())


def _fused_vjp_bwd(dims, res, g):
    x, ws, bs, hs = res
    n_layers = len(dims)
    n_hs = len(hs)
    xp, n = _pad_rows(x, TILE)
    gp, _ = _pad_rows(g.astype(jnp.float32), TILE)
    grid = xp.shape[0] // TILE
    out_shapes = [jax.ShapeDtypeStruct(xp.shape, x.dtype)]
    out_specs = [pl.BlockSpec((TILE, dims[0][0]), lambda i: (i, 0))]
    for d_in, d_out in dims:
        out_shapes.append(jax.ShapeDtypeStruct((d_in, d_out), jnp.float32))
        out_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((1, d_out), jnp.float32))
        out_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    hs_specs = [
        pl.BlockSpec((TILE, dims[i][1]), lambda i_: (i_, 0))
        for i in range(n_hs)
    ]
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, n_layers=n_layers, n_hs=n_hs),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((TILE, dims[0][0]), lambda i: (i, 0)),
            pl.BlockSpec((TILE, dims[-1][1]), lambda i: (i, 0)),
        ]
        + hs_specs
        + _w_b_specs(n_layers),
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=_interpret(),
        compiler_params=None if _interpret() else _BWD_SEQ_PARAMS,
    )(xp, gp, *hs, *[r for pair in zip(ws, bs) for r in pair])
    dx = outs[0][:n]
    dws = [outs[1 + 2 * i] for i in range(n_layers)]
    dbs = [outs[2 + 2 * i] for i in range(n_layers)]
    return dx, dws, dbs


_fused_mlp_core.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)


def _r128(d: int) -> int:
    return -(-d // 128) * 128


def fused_mlp(params, x: jnp.ndarray, compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Drop-in fused replacement for ``models.mlp_apply`` (TPU only; the
    caller falls back to the XLA chain elsewhere). ``params`` is the
    standard {"layers": [{"w", "b"}, ...]} pytree with f32 leaves.

    All layer dims are zero-padded to multiples of 128 (Mosaic's matmul
    lowering crashes on ragged contraction tiles in this toolchain);
    padding is exact — padded activations stay 0 through relu, and the
    padding slices transpose to zero-grad regions automatically."""
    layers = params["layers"]
    d_out_true = int(layers[-1]["w"].shape[1])
    ws = []
    bs = []
    dims = []
    for l in layers:
        w = l["w"].astype(compute_dtype)
        b = l["b"].reshape(1, -1).astype(compute_dtype)
        di, do = int(w.shape[0]), int(w.shape[1])
        dip, dop = _r128(di), _r128(do)
        if (dip, dop) != (di, do):
            w = jnp.pad(w, ((0, dip - di), (0, dop - do)))
            b = jnp.pad(b, ((0, 0), (0, dop - do)))
        ws.append(w)
        bs.append(b)
        dims.append((dip, dop))
    xc = x.astype(compute_dtype)
    d0 = int(x.shape[1])
    if dims[0][0] != d0:
        xc = jnp.pad(xc, ((0, 0), (0, dims[0][0] - d0)))
    out = _fused_mlp_core(tuple(dims), xc, ws, bs)
    return out[:, :d_out_true]
