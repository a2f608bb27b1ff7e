"""Pallas TPU kernel: segment-sum of a key-sorted row stream.

The hash-grid backward needs sum-by-table-row of ~12.6M gradient rows per
step. XLA's scatter-add on TPU is serialized (~40-80 ns/row; ~33 ns even
with sorted indices — measured, PERF.md), i.e. ~600 ms/step. This kernel
exploits sortedness: the grid walks the stream in fixed blocks; each block's
keys span a narrow contiguous range of output rows, so the reduction is a
one-hot matmul on the MXU plus a read-modify-write DMA of that window.

Replaces the reference's CUDA ``atomicAdd`` grid-gradient accumulation
(tiny-cuda-nn backward; also slice_acq_cuda_kernel.cu:384-391) with a
deterministic reduction.

Packing: Mosaic requires DMA-sliced buffers to have 128-aligned lane
extents, so a C=16 output cannot be windowed directly. The output is packed
8 table rows per 128-lane buffer row (out2[t // 8, (t % 8)*C + c]); the
matmul produces that layout in one shot:

  packed[wb, s*C + c] = sum_r [quot_r == wb] * valsE[r, s*C + c]
  where q = key - base, quot = q >> 3, rem = q & 7,
        valsE[r, s*C + c] = vals[r, c] * [rem_r == s]

i.e. the remainder one-hot folds into the RHS (an elementwise mask of the
8x lane-tiled values) and the quotient one-hot is the LHS — both rank-2, so
one (R, W/8) x (R, 128) dot_general per window.

Algorithm per grid block (the TPU grid is sequential on a core, so
read-modify-write of overlapping windows between adjacent blocks is
race-free):
  base = align8(min key in block)
  while base <= max key in block:
      packed = quot_onehot^T @ masked_tiled_vals      # MXU
      out2[base/8 : base/8 + W/8] += packed           # DMA RMW via VMEM
      base = align8(smallest key > base + W - 1)      # skip empty gaps

Keys MUST be sorted ascending; rows with equal keys may span blocks. Cost
scales with n_blocks + total_key_span/W, not with the output size, and
duplicate-heavy (skewed) keys collapse into fewer windows — the worst case
of XLA scatter is the best case here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INT_MAX = np.int32(2**31 - 1)


def _kernel(
    keys_ref, vals_ref, _out_in, out_ref, scratch, sem_in, sem_out, *, window, c, mxu_bf16
):
    R = keys_ref.shape[0]
    W = window
    WB = W // 8
    keys = keys_ref[:, 0]  # (R,)
    kmax = jnp.max(keys)
    base0 = jnp.min(keys) & ~7

    vals = vals_ref[:]  # (R, C)
    if mxu_bf16:
        # single-pass MXU: bf16 per-row contributions, f32 accumulation.
        # Strictly tighter than the reference path (tiny-cuda-nn accumulates
        # grid gradients in fp16 atomicAdds, both operand AND accumulator).
        vals = vals.astype(jnp.bfloat16)
    vals_tiled = jnp.concatenate([vals] * 8, axis=1)  # (R, 8C)
    lane8c = jax.lax.broadcasted_iota(jnp.int32, (R, 8 * c), 1) // c  # s per lane
    laneq = jax.lax.broadcasted_iota(jnp.int32, (R, WB), 1)

    def cond(base):
        return base <= kmax

    def body(base):
        q = keys - base
        # negative q (keys below the window) gets quot < 0 -> no lane match
        quot = jax.lax.shift_right_arithmetic(q, 3)
        rem = jnp.bitwise_and(q, 7)
        onehot_q = (quot[:, None] == laneq).astype(vals.dtype)  # (R, WB)
        vals_e = jnp.where(rem[:, None] == lane8c, vals_tiled, 0)  # (R, 8C)
        packed = jax.lax.dot_general(
            onehot_q,
            vals_e,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            # f32 path: without HIGHEST the f32 dot is lowered as a single
            # bf16 pass (~0.4% error on the sums). HIGHEST = 3-pass.
            precision=jax.lax.Precision.DEFAULT if mxu_bf16 else jax.lax.Precision.HIGHEST,
        )  # (WB, 8C)
        wb = jax.lax.shift_right_arithmetic(base, 3)
        copy_in = pltpu.make_async_copy(
            out_ref.at[pl.ds(wb, WB)], scratch, sem_in
        )
        copy_in.start()
        copy_in.wait()
        scratch[:] = scratch[:] + packed.astype(scratch.dtype)
        copy_out = pltpu.make_async_copy(
            scratch, out_ref.at[pl.ds(wb, WB)], sem_out
        )
        copy_out.start()
        copy_out.wait()
        # skip to the next populated window (handles sparse gaps/level jumps)
        above = jnp.where(keys > base + (W - 1), keys, _INT_MAX)
        return jnp.min(above) & ~7

    jax.lax.while_loop(cond, body, base0)


@functools.partial(
    jax.jit, static_argnames=("num_rows", "block_rows", "window", "mxu_bf16")
)
def window_reduce_sorted(
    sorted_keys: jnp.ndarray,
    sorted_vals: jnp.ndarray,
    num_rows: int,
    block_rows: int = 2048,
    window: int = 1024,
    mxu_bf16: bool = False,
) -> jnp.ndarray:
    """Sum rows of ``sorted_vals`` (M, C) by ``sorted_keys`` (M,) ascending
    into a dense (num_rows, C) f32 output. C must be 16 (8C = one 128-lane
    row) or another divisor of 128/8."""
    M, C = sorted_vals.shape
    R, W = block_rows, window
    assert W % 8 == 0
    n_blocks = -(-M // R)
    pad = n_blocks * R - M
    # 8 table rows pack into one 8C-lane buffer row
    t_pad8 = (num_rows + 2 * W + 7) // 8 + 1
    keys2 = jnp.concatenate(
        [sorted_keys.astype(jnp.int32), jnp.full((pad,), num_rows, jnp.int32)]
    ).reshape(n_blocks * R, 1)
    vals2 = jnp.concatenate(
        [sorted_vals, jnp.zeros((pad, C), sorted_vals.dtype)], axis=0
    )
    out_init = jnp.zeros((t_pad8, 8 * C), jnp.float32)

    out = pl.pallas_call(
        functools.partial(_kernel, window=W, c=C, mxu_bf16=mxu_bf16),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        out_shape=jax.ShapeDtypeStruct((t_pad8, 8 * C), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((W // 8, 8 * C), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(keys2, vals2, out_init)
    return out.reshape(t_pad8 * 8, C)[:num_rows]


# ---------------------------------------------------------------------------
# v2: persistent VMEM accumulator
# ---------------------------------------------------------------------------
#
# v1 performs a read-modify-write DMA round-trip per window (~9 us/block,
# ~110 ms total at 12.6M rows). v2 keeps a WACC-row accumulator in VMEM
# (scratch persists across the sequential grid): windows add into it with a
# plain VMEM store, and it is flushed to HBM write-only as the sorted stream
# advances past it. Each output region is flushed at most once (keys are
# sorted and acc_base only advances past fully-accumulated rows), so no HBM
# read is ever needed. Alignment: Mosaic dynamic sublane slices want whole
# (8,128) tiles, so all bases are 64-row aligned (8 buffer rows).


def _kernel_v2(
    keys_ref, vals_ref, _out_in, out_ref, acc, state, sem, *, window, wacc, c
):
    R = keys_ref.shape[0]
    W = window
    WB = W // 8
    FC = wacc // 2  # partial-flush chunk (table rows); W <= FC required
    keys = keys_ref[:, 0]
    kmax = jnp.max(keys)
    i = pl.program_id(0)
    last = pl.num_programs(0) - 1

    @pl.when(i == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
        state[0] = jnp.min(keys) & ~63

    vals = vals_ref[:]
    vals_tiled = jnp.concatenate([vals] * 8, axis=1)
    lane8c = jax.lax.broadcasted_iota(jnp.int32, (R, 8 * c), 1) // c
    laneq = jax.lax.broadcasted_iota(jnp.int32, (R, WB), 1)

    def flush(n_rows_b, zero_all):
        """DMA acc[:n_rows_b] -> out at acc_base, then shift/zero. Static."""
        ab = jax.lax.shift_right_arithmetic(state[0], 3)
        copy = pltpu.make_async_copy(
            acc.at[pl.ds(0, n_rows_b)], out_ref.at[pl.ds(ab, n_rows_b)], sem
        )
        copy.start()
        copy.wait()
        if zero_all:
            acc[:] = jnp.zeros_like(acc)
        else:
            acc[0 : acc.shape[0] - n_rows_b] = acc[n_rows_b:]
            acc[acc.shape[0] - n_rows_b :] = jnp.zeros(
                (n_rows_b, acc.shape[1]), acc.dtype
            )

    def body(base):
        # make room: full jump -> flush everything; else partial flush(es)
        @pl.when(base >= state[0] + wacc)
        def _():
            flush(wacc // 8, zero_all=True)
            state[0] = base

        def need_room(_):
            return base + W > state[0] + wacc

        def make_room(_):
            flush(FC // 8, zero_all=False)
            state[0] = state[0] + FC
            return 0

        jax.lax.while_loop(need_room, make_room, 0)

        q = keys - base
        quot = jax.lax.shift_right_arithmetic(q, 3)
        rem = jnp.bitwise_and(q, 7)
        onehot_q = (quot[:, None] == laneq).astype(vals.dtype)
        vals_e = jnp.where(rem[:, None] == lane8c, vals_tiled, 0)
        packed = jax.lax.dot_general(
            onehot_q,
            vals_e,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        off = jax.lax.shift_right_arithmetic(base - state[0], 3)
        acc[pl.ds(off, WB)] = acc[pl.ds(off, WB)] + packed.astype(acc.dtype)
        above = jnp.where(keys > base + (W - 1), keys, _INT_MAX)
        return jnp.min(above) & ~63

    jax.lax.while_loop(lambda b: b <= kmax, body, jnp.min(keys) & ~63)

    @pl.when(i == last)
    def _():
        flush(wacc // 8, zero_all=True)


@functools.partial(
    jax.jit, static_argnames=("num_rows", "block_rows", "window", "acc_rows")
)
def window_reduce_sorted_v2(
    sorted_keys: jnp.ndarray,
    sorted_vals: jnp.ndarray,
    num_rows: int,
    block_rows: int = 2048,
    window: int = 1024,
    acc_rows: int = 8192,
) -> jnp.ndarray:
    """v1 semantics, VMEM-accumulator implementation. C*8 must be 128."""
    M, C = sorted_vals.shape
    R, W = block_rows, window
    assert W % 64 == 0 and acc_rows % 64 == 0 and W <= acc_rows // 2
    n_blocks = -(-M // R)
    pad = n_blocks * R - M
    t_pad8 = (num_rows + 2 * acc_rows) // 8 + 8
    keys2 = jnp.concatenate(
        [sorted_keys.astype(jnp.int32), jnp.full((pad,), num_rows, jnp.int32)]
    ).reshape(n_blocks * R, 1)
    vals2 = jnp.concatenate(
        [sorted_vals, jnp.zeros((pad, C), sorted_vals.dtype)], axis=0
    )
    out_init = jnp.zeros((t_pad8, 8 * C), jnp.float32)

    out = pl.pallas_call(
        functools.partial(_kernel_v2, window=W, wacc=acc_rows, c=C),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        out_shape=jax.ShapeDtypeStruct((t_pad8, 8 * C), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((acc_rows // 8, 8 * C), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(keys2, vals2, out_init)
    return out.reshape(t_pad8 * 8, C)[:num_rows]
