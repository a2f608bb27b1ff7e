"""Validate + time window_reduce_sorted v1 vs v2 on the TPU.

Usage: python scripts/microbench_wr.py [n_rows_millions]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from nesvor_tpu.ops.window_reduce import (
    window_reduce_sorted,
    window_reduce_sorted_v2,
)


def ref_reduce(sk, sv, num_rows):
    out = jnp.zeros((num_rows, sv.shape[-1]), jnp.float32)
    return out.at[sk].add(sv.astype(jnp.float32), indices_are_sorted=True)


def fetch(x):
    return np.asarray(x)  # block_until_ready doesn't block on axon


def main():
    mrows = float(sys.argv[1]) if len(sys.argv) > 1 else 12.6
    M = int(mrows * 1e6)
    C = 16
    T = 12 * 2**19  # ~ fused table rows at bench scale

    rng = np.random.default_rng(0)
    # key distribution like the encoder backward: L blocks of N keys, each
    # uniform within its level's row range -> globally sorted stream has
    # long runs + gaps
    keys = np.sort(rng.integers(0, T, size=M).astype(np.int32))
    vals = rng.normal(size=(M, C)).astype(np.float32)
    sk = jnp.asarray(keys)
    sv = jnp.asarray(vals)

    # correctness on a small slice (fetch only the populated prefix; the
    # full output is ~400 MB and tunnel fetches run ~16 MB/s)
    Ms = 200_000
    Ts = 65536
    ks = jnp.asarray(np.sort(keys[:Ms] % Ts))
    r = fetch(ref_reduce(ks, sv[:Ms], Ts))
    for name, fn in [
        ("v1", lambda: window_reduce_sorted(ks, sv[:Ms], Ts)),
        ("v2", lambda: window_reduce_sorted_v2(ks, sv[:Ms], Ts)),
    ]:
        try:
            o = fetch(fn())
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
            continue
        err = np.abs(o - r).max() / max(np.abs(r).max(), 1e-9)
        print(f"{name}: rel err {err:.2e}", flush=True)

    # timing: fetch only a scalar (the full output is ~400 MB -> tunnel-bound)
    import functools

    @functools.partial(jax.jit, static_argnames=("window", "mxu_bf16"))
    def v1_s(k, v, window=1024, mxu_bf16=False):
        return jnp.sum(
            window_reduce_sorted(k, v, T, window=window, mxu_bf16=mxu_bf16)
        )

    @functools.partial(jax.jit, static_argnames=("window", "acc_rows", "block_rows"))
    def v2_s(k, v, window=1024, acc_rows=8192, block_rows=2048):
        return jnp.sum(
            window_reduce_sorted_v2(
                k, v, T, window=window, acc_rows=acc_rows, block_rows=block_rows
            )
        )

    for name, fn in [
        ("v1", lambda: v1_s(sk, sv)),
        ("v1 bf16", lambda: v1_s(sk, sv, mxu_bf16=True)),
        ("v1 bf16 w512", lambda: v1_s(sk, sv, window=512, mxu_bf16=True)),
        ("v2", lambda: v2_s(sk, sv)),
    ]:
        try:
            fetch(fn())  # compile
            t0 = time.time()
            fetch(fn())
            dt = time.time() - t0
            print(f"{name}: {dt*1e3:.1f} ms ({dt/M*1e9:.1f} ns/row)", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
