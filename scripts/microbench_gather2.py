"""Microbench part 2: sort, sorted-reduce building blocks, small-table
gather, and MXU matmul throughput (for a gather-free encoder option)."""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def fetch(x):
    return float(np.asarray(x.ravel()[0]))


def timeit(fn, *args, label="", reps=1):
    t0 = time.time()
    fetch(fn(*args))
    compile_s = time.time() - t0
    t0 = time.time()
    fetch(fn(*args))
    run_s = time.time() - t0
    print(f"{label}: {run_s*1e3/reps:.1f} ms ({compile_s:.1f}s first)", flush=True)
    return run_s / reps


T = 2**19
R = 4


@partial(jax.jit, static_argnames=("reps",))
def argsort_loop(idx, reps):
    def body(acc, r):
        order = jnp.argsort(idx ^ r)
        return acc + order[0], 0.0
    acc, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(reps, dtype=jnp.int32))
    return acc


@partial(jax.jit, static_argnames=("reps",))
def sort_keys_loop(idx, reps):
    def body(acc, r):
        sk = jnp.sort(idx ^ r)
        return acc + sk[0], 0.0
    acc, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(reps, dtype=jnp.int32))
    return acc


@partial(jax.jit, static_argnames=("reps",))
def sorted_scatter_loop(sorted_idx, vals, reps):
    def body(acc, r):
        tab = jnp.zeros((T, vals.shape[1]), vals.dtype)
        tab = tab.at[sorted_idx].add(vals, indices_are_sorted=True, unique_indices=False)
        return acc + tab.sum(), 0.0
    acc, _ = jax.lax.scan(body, 0.0, jnp.arange(reps, dtype=jnp.int32))
    return acc


@partial(jax.jit, static_argnames=("reps",))
def cumsum_diff_reduce(sorted_idx, vals, reps):
    # sorted segment reduce without scatter: cumsum + boundary gather
    def body(acc, r):
        cs = jnp.cumsum(vals, axis=0)
        # boundaries: for each table row, last position with idx <= t
        ends = jnp.searchsorted(sorted_idx, jnp.arange(T, dtype=sorted_idx.dtype), side="right")
        csz = jnp.concatenate([jnp.zeros((1, vals.shape[1]), vals.dtype), cs], 0)
        seg = csz[ends] - csz[jnp.concatenate([jnp.zeros(1, ends.dtype), ends[:-1]])]
        return acc + seg.sum(), 0.0
    acc, _ = jax.lax.scan(body, 0.0, jnp.arange(reps, dtype=jnp.int32))
    return acc


@partial(jax.jit, static_argnames=("reps", "t"))
def gather_small(table, idx, reps, t):
    def body(carry, r):
        acc, tab = carry
        rows = jnp.take(tab, (idx ^ r) % t, axis=0)
        return (acc + rows.sum(), tab), 0.0
    (acc, _), _ = jax.lax.scan(body, (0.0, table), jnp.arange(reps, dtype=jnp.int32))
    return acc


@partial(jax.jit, static_argnames=("reps",))
def mlp_loop(x, ws, reps):
    def body(carry, _):
        acc, x = carry
        h = x
        for w in ws:
            h = jnp.maximum(jnp.dot(h, w, preferred_element_type=jnp.float32), 0.0).astype(jnp.bfloat16)
        return (acc + h.sum(), x), 0.0
    (acc, _), _ = jax.lax.scan(body, (0.0, x), jnp.arange(reps))
    return acc


def main():
    key = jax.random.PRNGKey(0)
    N = 12 * 2**20  # ~12.6M: one full step's rows (12 levels x 1M)
    idx = jax.random.randint(key, (N,), 0, T, dtype=jnp.int32)
    print(f"N={N}", flush=True)

    timeit(sort_keys_loop, idx, R, label=f"sort {N} int32 keys", reps=R)
    timeit(argsort_loop, idx, R, label=f"argsort {N} int32", reps=R)

    sorted_idx = jnp.sort(idx)
    vals16 = jnp.ones((N, 16), jnp.float32)
    timeit(sorted_scatter_loop, sorted_idx, vals16, 2, label="scatter-add sorted f32x16", reps=2)
    timeit(cumsum_diff_reduce, sorted_idx, vals16, 2, label="cumsum-diff reduce f32x16", reps=2)

    # gather rate vs table size (does a VMEM-size table gather faster?)
    N2 = 4 * 2**20
    idx2 = jax.random.randint(key, (N2,), 0, T, dtype=jnp.int32)
    for t in (2**12, 2**15, 2**19):
        table = jnp.ones((t, 16), jnp.float32)
        dt = timeit(gather_small, table, idx2, 8, t, label=f"gather f32x16 T={t}", reps=8)
        print(f"  -> {dt/N2*1e9:.2f} ns/row")

    # MXU: 1M x (64->256->256->256->256->16) bf16 MLP fwd
    x = jnp.ones((2**20, 64), jnp.bfloat16)
    ws = [jnp.ones((64, 256), jnp.bfloat16)] + [jnp.ones((256, 256), jnp.bfloat16)] * 3 + [jnp.ones((256, 16), jnp.bfloat16)]
    dt = timeit(mlp_loop, x, ws, 4, label="MLP 1M x [64,256x4,16] bf16 fwd", reps=4)
    flops = 2 * 2**20 * (64 * 256 + 3 * 256 * 256 + 256 * 16)
    print(f"  -> {flops/dt/1e12:.1f} TFLOP/s")


if __name__ == "__main__":
    main()
