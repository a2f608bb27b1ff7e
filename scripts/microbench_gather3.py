"""Microbench part 3: the 'placement' step of a sorted scatter-free segment
reduce, plus forward-gather variants (big fused table, bf16, sorted idx)."""

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


N = 12 * 2**20
T4 = 4 * 2**20


@partial(jax.jit, static_argnames=("reps",))
def searchsorted_loop(sk, reps):
    q = jnp.arange(T4, dtype=sk.dtype)
    def body(acc, r):
        ends = jnp.searchsorted(sk, q + r, side="right")
        return acc + ends[0], 0.0
    acc, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(reps, dtype=jnp.int32))
    return acc


@partial(jax.jit, static_argnames=("reps", "mode"))
def scatter_set_loop(sk, vals, reps, mode):
    def body(acc, r):
        tab = jnp.zeros((T4 + 1, vals.shape[1]), vals.dtype)
        if mode == "set":
            tab = tab.at[sk].set(vals, indices_are_sorted=True)
        else:
            tab = tab.at[sk].add(vals, indices_are_sorted=True)
        return acc + tab.sum(), 0.0
    acc, _ = jax.lax.scan(body, 0.0, jnp.arange(reps, dtype=jnp.int32))
    return acc


@partial(jax.jit, static_argnames=("reps", "mode"))
def scatter_unique_loop(uk, vals, reps, mode):
    def body(acc, r):
        tab = jnp.zeros((T4 + 1, vals.shape[1]), vals.dtype)
        if mode == "set":
            tab = tab.at[uk].set(vals, indices_are_sorted=True, unique_indices=True)
        else:
            tab = tab.at[uk].add(vals, indices_are_sorted=True, unique_indices=True)
        return acc + tab.sum(), 0.0
    acc, _ = jax.lax.scan(body, 0.0, jnp.arange(reps, dtype=jnp.int32))
    return acc


@partial(jax.jit, static_argnames=("reps",))
def cumsum_loop(vals, reps):
    def body(acc, r):
        cs = jnp.cumsum(vals, axis=0)
        return acc + cs[-1, 0], 0.0
    acc, _ = jax.lax.scan(body, 0.0, jnp.arange(reps, dtype=jnp.int32))
    return acc


@partial(jax.jit, static_argnames=("reps",))
def cummax_loop(pos, reps):
    def body(acc, r):
        cm = jax.lax.associative_scan(jnp.maximum, pos + r)
        return acc + cm[-1], 0.0
    acc, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(reps, dtype=jnp.int32))
    return acc


@partial(jax.jit, static_argnames=("reps", "sorted_"))
def gather_big_loop(table, idx, reps, sorted_):
    def body(carry, r):
        acc, tab = carry
        rows = jnp.take(tab, idx, axis=0, indices_are_sorted=sorted_)
        return (acc + rows.sum(), tab), 0.0
    (acc, _), _ = jax.lax.scan(body, (jnp.float32(0.0), table), jnp.arange(reps, dtype=jnp.int32))
    return acc


def main():
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (N,), 0, T4, dtype=jnp.int32)
    sk = jnp.sort(idx)
    vals = jnp.ones((N, 16), jnp.float32)

    timeit(searchsorted_loop, sk, 2, label=f"searchsorted {T4} queries in {N} sorted", reps=2)
    timeit(cumsum_loop, vals, 2, label="cumsum 12.6M x16 f32", reps=2)
    pos = jnp.arange(N, dtype=jnp.int32)
    timeit(cummax_loop, pos, 2, label="associative_scan max 12.6M int32", reps=2)
    timeit(scatter_set_loop, sk, vals, 2, "set", label="scatter-SET sorted 12.6M x16", reps=2)

    # unique sorted scatter: T4 rows, all distinct
    uk = jnp.arange(T4, dtype=jnp.int32)
    uvals = jnp.ones((T4, 16), jnp.float32)
    timeit(scatter_unique_loop, uk, uvals, 2, "set", label="scatter-SET unique+sorted 4M x16", reps=2)
    timeit(scatter_unique_loop, uk, uvals, 2, "add", label="scatter-ADD unique+sorted 4M x16", reps=2)

    # forward-gather variants on the fused-table shape
    tab4 = jnp.ones((T4, 16), jnp.float32)
    dt = timeit(gather_big_loop, tab4, idx, 4, False, label="gather f32x16 T=4M random", reps=4)
    print(f"  -> {dt/N*1e9:.2f} ns/row")
    dt = timeit(gather_big_loop, tab4, sk, 4, True, label="gather f32x16 T=4M sorted idx", reps=4)
    print(f"  -> {dt/N*1e9:.2f} ns/row")
    tab4b = jnp.ones((T4, 16), jnp.bfloat16)
    dt = timeit(gather_big_loop, tab4b, idx, 4, False, label="gather bf16x16 T=4M random", reps=4)
    print(f"  -> {dt/N*1e9:.2f} ns/row")


if __name__ == "__main__":
    main()
