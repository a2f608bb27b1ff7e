"""Step-by-step TPU-vs-CPU training comparison from identical init.

Usage: debug_tpu_train.py [cpu|tpu] [n_iter]
Prints per-chunk losses and final param stats for diffing.
"""

import sys
from argparse import Namespace

sys.path.insert(0, ".")

import jax

if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    n_iter = int(sys.argv[2]) if len(sys.argv) > 2 else 60

    from tests.synth import make_phantom_stacks, stacks_to_slices
    import importlib

    T = importlib.import_module("nesvor_tpu.nesvor.train")
    M = importlib.import_module("nesvor_tpu.nesvor.models")

    stacks, gt = make_phantom_stacks(
        vs=32, n_stacks=4, gap=3.0, res=1.0, res_s=1.0, intensity=700.0
    )
    slices = stacks_to_slices(stacks)
    args = Namespace(
        n_features_per_level=2, log2_hashmap_size=19, level_scale=1.3819,
        coarsest_resolution=16.0, finest_resolution=0.5, n_levels_bias=0,
        encoder="fourier", fourier_dirs=8, depth=3, width=256,
        head_width=64, head_depth=1, n_features_z=15, n_features_slice=16,
        no_transformation_optimization=False, no_slice_scale=False,
        no_pixel_variance=False, no_slice_variance=False, single_precision=False,
        weight_transformation=0.1, weight_bias=100.0,
        image_regularization="edge", weight_image=2.0, delta=0.2,
        learning_rate=5e-3, gamma=0.33, milestones=[0.5, 0.75, 0.9],
        n_iter=n_iter, batch_size=512, n_samples=16,
        seed=0, mask_threshold=1.0, max_chunk_steps=10,
    )
    ds = T.Dataset(slices, args)
    print("backend:", jax.default_backend())
    print("bag:", ds.v.shape, "v mean/min/max:",
          float(ds.v.mean()), float(ds.v.min()), float(ds.v.max()))
    print("xyz min/max:", np.asarray(ds.xyz.min(0)), np.asarray(ds.xyz.max(0)))
    bb = ds.bounding_box
    print("bbox:", np.asarray(bb))
    print("ds.mean:", ds.mean)

    cfg_inr = T.build_inr_config(bb, args)
    cfg = T.NeSVoRConfig(
        inr=cfg_inr, n_slices=len(slices), n_samples=args.n_samples,
        n_features_slice=16, n_levels_bias=0,
        image_regularization="edge", delta=0.2, head_width=64, head_depth=1,
    )
    key = jax.random.PRNGKey(0)
    params, consts = T.init_nesvor(key, cfg, ds.transformation, ds.resolution, ds.mean)
    print("psf_sigma[0]:", np.asarray(consts["psf_sigma"])[0],
          "delta:", float(consts["delta"]))
    tx, _ = T.build_optimizer(params, cfg, args)
    opt_state = tx.init(params)
    lw = {M.D_LOSS: 1.0, M.S_LOSS: 1.0, M.T_REG: 0.1, M.B_REG: 100.0, M.I_REG: 2.0}
    data = {"xyz": ds.xyz, "v": ds.v, "slice_idx": ds.slice_idx}
    run = T.make_train_step(cfg, bb, lw, tx, args.batch_size, int(ds.v.shape[0]))

    k = jax.random.PRNGKey(42)
    for chunk in range(n_iter // 10):
        k, kc = jax.random.split(k)
        params, opt_state, losses = run(params, opt_state, consts, data, kc, chunk * 10, 10)
        msg = " ".join(
            f"{kk}={float(np.asarray(losses[kk])[-1]):.4f}" for kk in sorted(losses)
        )
        print(f"iter {(chunk+1)*10}: {msg}", flush=True)

    # forward eval at fixed points for cross-platform diff
    pts = jnp.asarray(
        np.random.default_rng(7).uniform(-12, 12, size=(512, 3)).astype(np.float32)
    )
    density, _, _ = M.inr_forward(params["inr"], cfg.inr, bb, pts)
    d = np.asarray(density)
    print("density@fixed pts: mean", d.mean(), "std", d.std(), "max", d.max())
    ax = np.asarray(params["axisangle"])
    ax0 = np.asarray(consts["axisangle_init"])
    print("pose drift: max|d_rot|", np.abs(ax - ax0)[:, :3].max(),
          "max|d_t|", np.abs(ax - ax0)[:, 3:].max())
    print("logit_coef std:", float(np.asarray(params["logit_coef"]).std()),
          "log_var_slice mean:", float(np.asarray(params["log_var_slice"]).mean()))


if __name__ == "__main__":
    main()
