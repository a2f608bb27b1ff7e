"""Time one jitted train step at bench scale (4096 px x 256 MC) on the TPU,
for each encoder. Usage: python scripts/bench_step.py [cellhash|hash] [steps]"""

import os
import sys
import time
from argparse import Namespace

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    enc = sys.argv[1] if len(sys.argv) > 1 else "cellhash"
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    width = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    depth = int(sys.argv[4]) if len(sys.argv) > 4 else 1

    from tests.synth import make_phantom_stacks, stacks_to_slices
    import importlib
    T = importlib.import_module("nesvor_tpu.nesvor.train")

    stacks, _ = make_phantom_stacks(
        vs=64, n_stacks=8, gap=3.0, res=1.0, res_s=1.0, intensity=1.0
    )
    slices = stacks_to_slices(stacks)
    args = Namespace(
        n_features_per_level=2, log2_hashmap_size=19, level_scale=1.3819,
        coarsest_resolution=16.0, finest_resolution=0.5, n_levels_bias=0,
        depth=depth, width=width, fourier_dirs=8, head_width=64, head_depth=1, n_features_z=15, n_features_slice=16,
        no_transformation_optimization=False, no_slice_scale=False,
        no_pixel_variance=False, no_slice_variance=False, single_precision=False,
        weight_transformation=0.1, weight_bias=100.0,
        image_regularization="edge", weight_image=2.0, delta=0.2,
        learning_rate=5e-3, gamma=0.33, milestones=[0.5, 0.75, 0.9],
        n_iter=10 * n_steps, batch_size=4096, n_samples=256,
        seed=0, mask_threshold=1.0, encoder=enc,
    )

    ds = T.Dataset(slices, args)
    bb = ds.bounding_box
    inr_cfg = T.build_inr_config(bb, args)
    print(f"encoder={enc} n_levels={inr_cfg.n_levels} "
          f"resolutions={inr_cfg.level_resolutions}", flush=True)
    if enc == "cellhash":
        spec = inr_cfg.cell_spec
        print(f"fused rows={spec.total_rows} dense={spec.dense}", flush=True)
    cfg = T.NeSVoRConfig(
        inr=inr_cfg, n_slices=len(slices), n_samples=args.n_samples,
        n_features_slice=args.n_features_slice, n_levels_bias=args.n_levels_bias,
        no_transformation_optimization=False, no_slice_scale=False,
        no_pixel_variance=False, no_slice_variance=False,
        image_regularization="edge", delta=args.delta,
        head_width=int(os.environ.get("BENCH_HEAD_WIDTH", "0")),
        head_depth=int(os.environ.get("BENCH_HEAD_DEPTH", "0")),
    )
    key = jax.random.PRNGKey(0)
    params, consts = T.init_nesvor(
        key, cfg, ds.transformation, ds.resolution, ds.mean
    )
    tx, _ = T.build_optimizer(params, cfg, args)
    opt_state = tx.init(params)
    lw = {T.D_LOSS: 1.0, T.S_LOSS: 1.0, T.T_REG: 0.1, T.B_REG: 100.0, T.I_REG: 2.0}
    n_pixels = int(ds.v.shape[0])
    data = {"xyz": ds.xyz, "v": ds.v, "slice_idx": ds.slice_idx}
    run_chunk = T.make_train_step(cfg, bb, lw, tx, args.batch_size, n_pixels)

    t0 = time.time()
    params, opt_state, names, stack = run_chunk(params, opt_state, consts, data, key, 0, n_steps)
    l0 = np.asarray(stack)[names.index(T.D_LOSS)]
    print(f"compile+first chunk ({n_steps} steps): {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    params, opt_state, names, stack = run_chunk(params, opt_state, consts, data, key, 0, n_steps)
    l1 = np.asarray(stack)[names.index(T.D_LOSS)]
    dt = time.time() - t0
    print(f"steady chunk: {dt:.2f}s -> {dt/n_steps*1e3:.0f} ms/step "
          f"(loss {float(l1[-1]):.4f})", flush=True)


if __name__ == "__main__":
    main()
