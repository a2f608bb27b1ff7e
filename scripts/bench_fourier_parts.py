"""Decompose the fourier train step cost at bench scale (4096 px x 256 MC).

Times each pipeline stage in isolation (scan of n_steps inside one jit,
scalar fetch): sampling+transform, encode, density MLP, heads, full fwd
loss, fwd+grad, full optimizer step.
"""

import sys
import time
from argparse import Namespace
from functools import partial

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *a, **k):
    fn(*a, **k)  # compile
    t0 = time.time()
    r = fn(*a, **k)
    np.asarray(r)
    return time.time() - t0


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    width = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    depth = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from tests.synth import make_phantom_stacks, stacks_to_slices
    import importlib

    T = importlib.import_module("nesvor_tpu.nesvor.train")
    M = importlib.import_module("nesvor_tpu.nesvor.models")
    from nesvor_tpu.transform import ax_transform_points

    stacks, _ = make_phantom_stacks(
        vs=64, n_stacks=8, gap=3.0, res=1.0, res_s=1.0, intensity=1.0
    )
    slices = stacks_to_slices(stacks)
    args = Namespace(
        n_features_per_level=2, log2_hashmap_size=19, level_scale=1.3819,
        coarsest_resolution=16.0, finest_resolution=0.5, n_levels_bias=0,
        depth=depth, width=width, fourier_dirs=8, head_width=64, head_depth=1,
        n_features_z=15, n_features_slice=16,
        no_transformation_optimization=False, no_slice_scale=False,
        no_pixel_variance=False, no_slice_variance=False, single_precision=False,
        weight_transformation=0.1, weight_bias=100.0,
        image_regularization="edge", weight_image=2.0, delta=0.2,
        learning_rate=5e-3, gamma=0.33, milestones=[0.5, 0.75, 0.9],
        n_iter=1000, batch_size=4096, n_samples=256,
        seed=0, mask_threshold=1.0, encoder="fourier",
    )
    B, S = args.batch_size, args.n_samples

    ds = T.Dataset(slices, args)
    bb = ds.bounding_box
    inr_cfg = T.build_inr_config(bb, args)
    cfg = T.NeSVoRConfig(
        inr=inr_cfg, n_slices=len(slices), n_samples=S,
        n_features_slice=args.n_features_slice, n_levels_bias=args.n_levels_bias,
        image_regularization="edge", delta=args.delta,
        head_width=args.head_width, head_depth=args.head_depth,
    )
    print(f"n_levels={inr_cfg.n_levels} feat={inr_cfg.n_encoding_features_actual} "
          f"mlp={width}x{depth}", flush=True)
    key = jax.random.PRNGKey(0)
    params, consts = T.init_nesvor(key, cfg, ds.transformation, ds.resolution, ds.mean)
    tx, _ = T.build_optimizer(params, cfg, args)
    opt_state = tx.init(params)
    lw = {M.D_LOSS: 1.0, M.S_LOSS: 1.0, M.T_REG: 0.1, M.B_REG: 100.0, M.I_REG: 2.0}
    n_pixels = int(ds.v.shape[0])
    data = {"xyz": ds.xyz, "v": ds.v, "slice_idx": ds.slice_idx}

    def get_batch(data, k):
        idx = jax.random.randint(k, (B,), 0, n_pixels)
        return {"xyz": data["xyz"][idx], "v": data["v"][idx],
                "slice_idx": data["slice_idx"][idx]}

    def scan_over(fn):
        # data passed as an argument: closure-captured device arrays become
        # jit constants re-uploaded per dispatch through the tunnel
        @jax.jit
        def run(params, data, key):
            def one(c, k):
                return c, fn(params, data, k)
            _, outs = jax.lax.scan(one, 0, jax.random.split(key, n_steps))
            return jnp.sum(outs)
        return run

    # --- stage fns (each returns a scalar) ---
    def f_batch(params, data, k):
        k1, _ = jax.random.split(k)
        batch = get_batch(data, k1)
        return jnp.sum(batch["xyz"]) + jnp.sum(batch["v"])

    def f_rng(params, data, k):
        _, k2 = jax.random.split(k)
        return jnp.sum(jax.random.normal(k2, (B, S, 3), jnp.float32))

    def f_sample(params, data, k):
        k1, k2 = jax.random.split(k)
        batch = get_batch(data, k1)
        xyz_psf = jax.random.normal(k2, (B, S, 3), jnp.float32)
        psf = consts["psf_sigma"][batch["slice_idx"]][:, None]
        t = params["axisangle"][batch["slice_idx"]][:, None]
        xyz_t = ax_transform_points(t, batch["xyz"][:, None] + xyz_psf * psf, True)
        return jnp.sum(xyz_t.astype(jnp.float32))

    def f_encode(params, data, k):
        k1, k2 = jax.random.split(k)
        batch = get_batch(data, k1)
        xyz_psf = jax.random.normal(k2, (B, S, 3), jnp.float32)
        psf = consts["psf_sigma"][batch["slice_idx"]][:, None]
        t = params["axisangle"][batch["slice_idx"]][:, None]
        xyz_t = ax_transform_points(t, batch["xyz"][:, None] + xyz_psf * psf, True)
        density, pe, z = M.inr_forward(params["inr"], cfg.inr, bb, xyz_t)
        return jnp.sum(density)

    def f_loss(params, data, k):
        k1, k2 = jax.random.split(k)
        batch = get_batch(data, k1)
        losses = M.nesvor_loss(params, consts, cfg, bb, batch, k2)
        return sum(w * losses[kk] for kk, w in lw.items() if kk in losses)

    def f_grad(params, data, k):
        g = jax.grad(f_loss)(params, data, k)
        return sum(jnp.sum(jnp.abs(l)) for l in jax.tree_util.tree_leaves(g))

    run_chunk = T.make_train_step(cfg, bb, lw, tx, B, n_pixels)

    def full_step():
        p, o, names, stack = run_chunk(params, opt_state, consts, data,
                                       jax.random.PRNGKey(1), n_steps)
        return stack[names.index(M.D_LOSS)]

    for name, fn in [
        ("batch draw", scan_over(f_batch)),
        ("mc rng", scan_over(f_rng)),
        ("sample+transform", scan_over(f_sample)),
        ("  +encode+mlp fwd", scan_over(f_encode)),
        ("full loss fwd", scan_over(f_loss)),
        ("fwd+grad", scan_over(f_grad)),
    ]:
        dt = timed(fn, params, data, jax.random.PRNGKey(1))
        print(f"{name}: {dt/n_steps*1e3:.1f} ms/step", flush=True)

    full_step()
    t0 = time.time()
    np.asarray(full_step())
    dt = time.time() - t0
    print(f"full train step: {dt/n_steps*1e3:.1f} ms/step", flush=True)


if __name__ == "__main__":
    main()
