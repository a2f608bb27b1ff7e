"""Microbenchmark: gather/scatter/sort primitives on the real TPU.

Measures the per-row cost of the hash-grid hot ops at the row widths that
matter for the cell-block redesign (PERF.md):
  * gather of F-wide f32 rows from a 2^19-row table, F in {2, 8, 16, 32}
  * scatter-add of the same
  * sort+segment_sum alternative for the backward

Axon platform notes (WORKLOG.md): block_until_ready does not block; force a
host fetch instead. Keep each dispatch well under 30 s.
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

T = 2**19
REPS = 8  # in-graph repetitions to amortize dispatch overhead


def fetch(x):
    return float(np.asarray(x.ravel()[0]))


@partial(jax.jit, static_argnames=("reps",))
def gather_loop(table, idx, reps: int):
    def body(carry, r):
        acc, tab = carry
        rows = jnp.take(tab, idx ^ r, axis=0)
        return (acc + rows.sum(), tab), 0.0

    (acc, _), _ = jax.lax.scan(body, (0.0, table), jnp.arange(reps, dtype=jnp.uint32))
    return acc


@partial(jax.jit, static_argnames=("reps",))
def scatter_loop(table, idx, vals, reps: int):
    def body(carry, r):
        tab = carry
        tab = tab.at[idx ^ r].add(vals)
        return tab, 0.0

    tab, _ = jax.lax.scan(body, table, jnp.arange(reps, dtype=jnp.uint32))
    return tab.sum()


@partial(jax.jit, static_argnames=("reps",))
def sort_segsum_loop(idx, vals, reps: int):
    def body(carry, r):
        acc = carry
        keys = idx ^ r
        order = jnp.argsort(keys)
        sk = keys[order]
        sv = vals[order]
        seg = jax.ops.segment_sum(sv, sk, num_segments=T)
        return acc + seg.sum(), 0.0

    acc, _ = jax.lax.scan(body, 0.0, jnp.arange(reps, dtype=jnp.uint32))
    return acc


def timeit(fn, *args, label=""):
    t0 = time.time()
    r = fetch(fn(*args))
    compile_s = time.time() - t0
    t0 = time.time()
    r = fetch(fn(*args))
    run_s = time.time() - t0
    print(f"{label}: {run_s*1e3:.1f} ms ({compile_s:.1f}s first)", flush=True)
    return run_s


def main():
    key = jax.random.PRNGKey(0)
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 4 * 2**20  # 4M rows
    print(f"N={N} rows, table {T} rows, reps={REPS}", flush=True)
    idx = jax.random.randint(key, (N,), 0, T, dtype=jnp.uint32)

    for F in (2, 8, 16, 32):
        table = jnp.ones((T, F), jnp.float32)
        dt = timeit(gather_loop, table, idx, REPS, label=f"gather f32x{F}")
        print(f"  -> {dt/REPS/N*1e9:.2f} ns/row, {dt and N*REPS*F*4/dt/1e9:.1f} GB/s")

    for F in (2, 16):
        table = jnp.zeros((T, F), jnp.float32)
        vals = jnp.ones((N, F), jnp.float32)
        dt = timeit(scatter_loop, table, idx, vals, REPS, label=f"scatter-add f32x{F}")
        print(f"  -> {dt/REPS/N*1e9:.2f} ns/row")

    vals = jnp.ones((N, 16), jnp.float32)
    dt = timeit(sort_segsum_loop, idx, vals, 2, label="sort+segment_sum f32x16 (reps=2)")
    print(f"  -> {dt/2/N*1e9:.2f} ns/row")


if __name__ == "__main__":
    main()
