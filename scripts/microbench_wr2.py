"""Ablate window_reduce v1 to find the per-block cost driver.

v3 ablation: exploit sortedness for scalar queries (block min = keys[0],
max = keys[-1], sequential window advance, no cross-sublane reductions).
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nesvor_tpu.ops.window_reduce import window_reduce_sorted

_INT_MAX = np.int32(2**31 - 1)


def _kernel_v3(keys_ref, vals_ref, _out_in, out_ref, scratch, sem_in, sem_out,
               *, window, c, mxu_bf16, do_matmul):
    R = keys_ref.shape[0]
    W = window
    WB = W // 8
    keys = keys_ref[:, 0]
    # sorted stream: scalar loads, no reductions
    kmax = keys_ref[R - 1, 0]
    base0 = keys_ref[0, 0] & ~7

    vals = vals_ref[:]
    if mxu_bf16:
        vals = vals.astype(jnp.bfloat16)
    vals_tiled = jnp.concatenate([vals] * 8, axis=1)
    lane8c = jax.lax.broadcasted_iota(jnp.int32, (R, 8 * c), 1) // c
    laneq = jax.lax.broadcasted_iota(jnp.int32, (R, WB), 1)

    def body(base):
        if do_matmul:
            q = keys - base
            quot = jax.lax.shift_right_arithmetic(q, 3)
            rem = jnp.bitwise_and(q, 7)
            onehot_q = (quot[:, None] == laneq).astype(vals.dtype)
            vals_e = jnp.where(rem[:, None] == lane8c, vals_tiled, 0)
            packed = jax.lax.dot_general(
                onehot_q, vals_e,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=None if mxu_bf16 else jax.lax.Precision.HIGHEST,
            )
        else:
            packed = jnp.zeros((WB, 8 * c), jnp.float32)
        wb = jax.lax.shift_right_arithmetic(base, 3)
        copy_in = pltpu.make_async_copy(out_ref.at[pl.ds(wb, WB)], scratch, sem_in)
        copy_in.start()
        copy_in.wait()
        scratch[:] = scratch[:] + packed.astype(scratch.dtype)
        copy_out = pltpu.make_async_copy(scratch, out_ref.at[pl.ds(wb, WB)], sem_out)
        copy_out.start()
        copy_out.wait()
        return base + W  # sequential advance (no skip-scan)

    jax.lax.while_loop(lambda b: b <= kmax, body, base0)


@functools.partial(jax.jit, static_argnames=("num_rows", "block_rows", "window",
                                             "mxu_bf16", "do_matmul"))
def wr_v3(sorted_keys, sorted_vals, num_rows, block_rows=2048, window=1024,
          mxu_bf16=False, do_matmul=True):
    M, C = sorted_vals.shape
    R, W = block_rows, window
    n_blocks = -(-M // R)
    pad = n_blocks * R - M
    t_pad8 = (num_rows + 2 * W + 7) // 8 + 1
    keys2 = jnp.concatenate(
        [sorted_keys.astype(jnp.int32), jnp.full((pad,), num_rows, jnp.int32)]
    ).reshape(n_blocks * R, 1)
    vals2 = jnp.concatenate(
        [sorted_vals, jnp.zeros((pad, C), sorted_vals.dtype)], axis=0)
    out_init = jnp.zeros((t_pad8, 8 * C), jnp.float32)
    out = pl.pallas_call(
        functools.partial(_kernel_v3, window=W, c=C, mxu_bf16=mxu_bf16,
                          do_matmul=do_matmul),
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


def main():
    M = int(12.6e6)
    C = 16
    T = 12 * 2**19
    rng = np.random.default_rng(0)
    keys = np.sort(rng.integers(0, T, size=M).astype(np.int32))
    vals = rng.normal(size=(M, C)).astype(np.float32)
    sk = jnp.asarray(keys)
    sv = jnp.asarray(vals)

    # correctness of v3 on small range
    Ms, Ts = 200_000, 65536
    ks = jnp.asarray(np.sort(keys[:Ms] % Ts))
    r = np.asarray(jnp.zeros((Ts, C)).at[ks].add(sv[:Ms], indices_are_sorted=True))
    o = np.asarray(wr_v3(ks, sv[:Ms], Ts))
    print(f"v3 rel err {np.abs(o - r).max() / np.abs(r).max():.2e}", flush=True)

    @functools.partial(jax.jit, static_argnames=("mxu_bf16", "do_matmul"))
    def v3_s(k, v, mxu_bf16=False, do_matmul=True):
        return jnp.sum(wr_v3(k, v, T, mxu_bf16=mxu_bf16, do_matmul=do_matmul))

    for name, fn in [
        ("v3 f32", lambda: v3_s(sk, sv)),
        ("v3 bf16", lambda: v3_s(sk, sv, mxu_bf16=True)),
        ("v3 no-matmul (DMA floor)", lambda: v3_s(sk, sv, do_matmul=False)),
    ]:
        np.asarray(fn())
        t0 = time.time()
        np.asarray(fn())
        dt = time.time() - t0
        print(f"{name}: {dt*1e3:.1f} ms ({dt/M*1e9:.1f} ns/row)", flush=True)


if __name__ == "__main__":
    main()
