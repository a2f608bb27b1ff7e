"""VERDICT r02 #6: kernel-verify the gather floor of the grid encoders.

The cell-block encoder's forward is bound by random row gathers from the
HBM-resident feature table (~90 ms of the 427 ms cellhash step; XLA gather
measured at ~5-7 ns/row for 64 B rows, PERF.md). The round-2 plan named a
"DMA-pipelined Pallas gather" as the untried alternative. This bench tries
it: a Pallas kernel that scalar-prefetches the row indices and issues one
HBM->VMEM async copy per row, keeping DEPTH copies in flight (the ring
pattern from ops/window_reduce.py), vs the XLA gather on identical shapes.

Expectation going in (recorded for honesty): each DMA descriptor costs
O(0.5-1 us) to issue + latency, so per-64B-row DMA should be 1-2 orders
WORSE than XLA's gather unless Mosaic batches descriptors. The experiment
exists to replace that expectation with a measured number either way.

Usage: python scripts/microbench_dma_gather.py [n_rows_log2] [table_log2]
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    n_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    t_log2 = int(sys.argv[2]) if len(sys.argv) > 2 else 18

    from nesvor_tpu._precision import ensure_f32_matmul_semantics

    ensure_f32_matmul_semantics()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = 2**n_log2
    rng = np.random.default_rng(0)

    def fetch(x):
        return float(np.asarray(x.ravel()[0]))

    def timeit(fn, *args, label=""):
        t0 = time.time()
        fetch(fn(*args))
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(3):
            fetch(fn(*args))
        run_s = (time.time() - t0) / 3
        print(
            f"{label}: {run_s*1e3:.1f} ms = {run_s/N*1e9:.2f} ns/row "
            f"({compile_s:.1f}s first)",
            flush=True,
        )
        return run_s

    def dma_gather(idx, table, block, depth):
        # Toolchain constraints found while getting this to compile at all
        # (each violation = remote Mosaic compile-helper HTTP 500):
        #  - semaphore indices must be STATIC (ring via unrolled depth chunk)
        #  - scalar-prefetch idx arrays must fit SMEM (~1 MB): idx stays in
        #    HBM and each program DMAs its own B-index block into SMEM
        #  - DMA-sliced rows need 128-multiple lane extents: C=16 (64 B
        #    rows, the hash-encoder case) does not compile, only C>=128
        B = block
        C = table.shape[1]

        def kern(idx_hbm, table_ref, out_ref, idx_smem, sems, isem):
            base = pl.program_id(0) * B
            icp = pltpu.make_async_copy(
                idx_hbm.at[pl.ds(base, B)], idx_smem, isem
            )
            icp.start()
            icp.wait()

            def copy(k, j):
                return pltpu.make_async_copy(
                    table_ref.at[pl.ds(idx_smem[k], 1), :],
                    out_ref.at[pl.ds(k, 1), :],
                    sems.at[j],
                )

            def body(c, _):
                k0 = c * depth
                for j in range(depth):

                    @pl.when(c > 0)
                    def _(j=j):
                        copy(k0 - depth + j, j).wait()

                    copy(k0 + j, j).start()
                return ()

            jax.lax.fori_loop(0, B // depth, body, (), unroll=False)
            for j in range(depth):
                copy(B - depth + j, j).wait()

        return pl.pallas_call(
            kern,
            grid=(N // B,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((B, C), lambda i: (i, 0)),
            scratch_shapes=[
                pltpu.SMEM((B,), jnp.int32),
                pltpu.SemaphoreType.DMA((depth,)),
                pltpu.SemaphoreType.DMA,
            ],
            out_shape=jax.ShapeDtypeStruct((N, C), table.dtype),
        )(idx, table)

    for C, t_log2_c in ((16, t_log2 + 2), (128, t_log2)):
        T = 2**t_log2_c
        table = jnp.asarray(
            rng.normal(size=(T, C)).astype(np.float32)
        )
        idx = jnp.asarray(rng.integers(0, T, size=(N,)).astype(np.int32))
        rowb = C * 4
        print(f"--- rows of {rowb} B, table {T} rows ({T*rowb/2**20:.0f} MB) ---")

        xla = jax.jit(lambda t, i: t[i])
        timeit(xla, table, idx, label=f"XLA gather C={C}")

        for depth in (8, 32):
            try:
                fn = jax.jit(
                    functools.partial(dma_gather, block=1024, depth=depth)
                )
                timeit(fn, idx, table, label=f"pallas ring-DMA C={C} depth={depth}")
                # correctness spot check
                out = np.asarray(fn(idx, table)[:64])
                ref = np.asarray(table)[np.asarray(idx[:64])]
                assert np.array_equal(out, ref), "MISMATCH"
            except Exception as e:  # record Mosaic rejections as data
                print(
                    f"pallas ring-DMA C={C} depth={depth}: FAILED "
                    f"{type(e).__name__}: {str(e)[:300]}",
                    flush=True,
                )


if __name__ == "__main__":
    main()
