"""Projector (slab path) cost vs shape: reconcile the SVoRT-trainer
numbers with the slab bench (VERDICT r04 item 5 / weak-#4).

profile_svort_step measured fwd/adjoint 234/377 ms at the TRAINER shapes
(87 slices of 85x85, 96^3 volume) while the slab bench reports 125/540 ms
at LARGER shapes (96 slices of 128x128, 128^3). Per slab point the trainer
forward is ~4x slower — hypothesis: the odd 85/87-extent slab dims
(Ys=Xs=87) defeat the 8x128 tile layout, while 128-ish extents align.
This script measures fwd+adjoint across a shape grid, normalizing to
ns/slab-point, to locate the cliff.

Usage: python scripts/bench_proj_shapes.py [reps]   (run on the TPU)
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

    psf = jnp.asarray(get_psf(res_ratio=(1.0, 1.0, 3.0)))  # (9, 3, 3)
    d_p, h_p, w_p = psf.shape

    def timeit(fn, n=reps, warmup=1):
        for _ in range(warmup):
            np.asarray(jax.tree_util.tree_leaves(fn())[0])
        ts = []
        for _ in range(n):
            t = time.time()
            np.asarray(jax.tree_util.tree_leaves(fn())[0])
            ts.append(time.time() - t)
        return float(np.median(ts))

    # (label, n_slices, ss, vol)
    cases = [
        ("trainer  (87 sl, 85^2, 96^3)", 87, 85, 96),
        ("pad-ss96 (87 sl, 96^2, 96^3)", 87, 96, 96),
        ("pad-ss126(87 sl, 126^2, 96^3)", 87, 126, 96),
        ("bench    (96 sl, 128^2, 128^3)", 96, 128, 128),
    ]
    rng = np.random.default_rng(0)
    print(f"psf {tuple(psf.shape)}; reps={reps}", flush=True)
    for label, n, ss, vs in cases:
        ax = np.concatenate(
            [rng.normal(0, 0.5, (n, 3)), rng.normal(0, 2.0, (n, 3))], -1
        ).astype(np.float32)
        mats = axisangle2mat(jnp.asarray(ax))
        vol = jnp.asarray(rng.random((1, 1, vs, vs, vs), np.float32))
        slc = jnp.asarray(rng.random((n, 1, ss, ss), np.float32))
        np_pts = n * d_p * (ss + h_p - 1) * (ss + w_p - 1)

        t_f = timeit(lambda: slice_acquisition(
            mats, vol, None, None, psf, (ss, ss), 1.0, False, False))
        t_a = timeit(lambda: slice_acquisition_adjoint(
            mats, psf, slc, None, None, (vs, vs, vs), 1.0, False, False,
            True))
        print(
            f"{label}: fwd {t_f*1e3:7.1f} ms ({t_f/np_pts*1e9:5.1f} ns/pt)"
            f"   adj {t_a*1e3:7.1f} ms ({t_a/np_pts*1e9:5.1f} ns/pt)"
            f"   [{np_pts/1e6:.2f}M slab pts]",
            flush=True,
        )


if __name__ == "__main__":
    main()
