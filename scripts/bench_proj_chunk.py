"""Slab-projector slice_chunk sweep + gather-layout refutation probe at
register-pipeline shapes (3 stacks x 77 slices of 128^2 at canonical
orientations, 224^3 volume). Run on the TPU.

Two questions:
  1. What slice_chunk minimizes wall-clock while bounding memory? (The
     single-block program OOMs HBM at this scale.)
  2. Does permuting the volume layout so each stack's slab-x direction
     maps to the stride-1 axis speed up the gathers? (It does NOT —
     measured ~14% SLOWER with the grouped-permutation implementation;
     XLA's TPU gather cost is source-size/row-count-bound, not
     index-locality-bound. The round-5 "orientation-dependent gather
     locality" reading of bench_proj_shapes conflated orientation with
     valid-fraction/shape effects. The probe here reproduces the check
     by manually permuting one canonical stack.)

Usage: python scripts/bench_proj_chunk.py [reps]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5

    from nesvor_tpu._precision import ensure_f32_matmul_semantics

    ensure_f32_matmul_semantics()

    import jax
    import jax.numpy as jnp

    from nesvor_tpu.ops.slice_acq import (
        slice_acquisition,
        slice_acquisition_adjoint,
    )
    from nesvor_tpu.transform import axisangle2mat
    from nesvor_tpu.utils import get_psf

    psf = jnp.asarray(get_psf(res_ratio=(1.0, 1.0, 1.5)))

    def timeit(fn, n=reps, warmup=2):
        for _ in range(warmup):
            np.asarray(jax.tree_util.tree_leaves(fn())[0])
        ts = []
        for _ in range(n):
            t = time.time()
            np.asarray(jax.tree_util.tree_leaves(fn())[0])
            ts.append(time.time() - t)
        return float(np.median(ts))

    rng = np.random.default_rng(0)
    ns_per, hw, vs = 77, 128, 224
    ax = []
    for base in [(0, 0, 0), (0, np.pi / 2, 0), (np.pi / 2, 0, 0)]:
        a = np.tile(np.asarray(base, np.float32), (ns_per, 1))
        a += rng.normal(0, 0.05, (ns_per, 3)).astype(np.float32)
        t = rng.normal(0, 3.0, (ns_per, 3)).astype(np.float32)
        t[:, 2] += (np.arange(ns_per) - ns_per // 2) * 1.5
        ax.append(np.concatenate([a, t], -1))
    ax = np.concatenate(ax).astype(np.float32)
    n = ax.shape[0]
    mats = axisangle2mat(jnp.asarray(ax))
    vol = jnp.asarray(rng.random((vs, vs, vs), np.float32))
    slc = jnp.asarray(rng.random((n, 1, hw, hw), np.float32))

    for chunk in (16, 32, 64, 128):
        t_f = timeit(lambda: slice_acquisition(
            mats, vol, None, None, psf, (hw, hw), 1.0, False, False,
            slice_chunk=chunk))
        t_a = timeit(lambda: slice_acquisition_adjoint(
            mats, psf, slc, None, None, (vs, vs, vs), 1.0, False, True,
            slice_chunk=chunk))
        print(f"chunk {chunk:3d}: fwd {t_f*1e3:8.1f} ms   "
              f"adj {t_a*1e3:8.1f} ms", flush=True)

    # layout probe: one 90-deg-about-y stack, naive vs manually permuted
    # (rows of R swapped + volume transposed so slab-x walks stride-1)
    ax1 = ax[ns_per : 2 * ns_per].copy()
    m1 = axisangle2mat(jnp.asarray(ax1))
    m1_np = np.asarray(m1)
    perm = (2, 1, 0)  # slab-x (column 0) dominant along volume z
    m1_perm = np.concatenate(
        [m1_np[:, list(perm), :3], m1_np[:, :, 3:]], axis=2
    )
    vol_perm = jnp.transpose(vol, (2, 1, 0))
    t_n = timeit(lambda: slice_acquisition(
        m1, vol, None, None, psf, (hw, hw), 1.0, False, False,
        slice_chunk=32))
    t_p = timeit(lambda: slice_acquisition(
        jnp.asarray(m1_perm), vol_perm, None, None, psf, (hw, hw), 1.0,
        False, False, slice_chunk=32))
    print(f"layout probe (90deg stack): naive fwd {t_n*1e3:.1f} ms, "
          f"permuted fwd {t_p*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
