"""Profile the SVoRT training step: where do the ~11-12.6 s/step go?

Times, at the exact scripts/train_svort.py config (vs=48, 3 stacks,
volume_weight=1, refresh_every=4):
  1. make_training_example (the host-side pool refresh, amortized /4)
  2. the full jitted train step (fwd+bwd+adam), post-compile
  3. model FORWARD only (jitted)
  4. pose-only step (volume_weight=0: drops the differentiable-SRR backward)
  5. the raw projector ops at step shapes (slice_acquisition fwd+adjoint)

Usage: python scripts/profile_svort_step.py [version] [vs] [reps]
Writes a summary to stdout; run on the TPU (the numbers that matter are
device numbers).
"""

import logging
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    logging.basicConfig(level=logging.WARNING, stream=sys.stderr)
    version = sys.argv[1] if len(sys.argv) > 1 else "v1"
    vs = int(sys.argv[2]) if len(sys.argv) > 2 else 48
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    from nesvor_tpu._precision import ensure_f32_matmul_semantics

    ensure_f32_matmul_semantics()

    import jax
    import jax.numpy as jnp
    import optax

    from nesvor_tpu.svort.models import SVoRT, SVoRTv2
    from nesvor_tpu.svort.train import SVoRTTrainConfig, make_training_example

    vol_vs = -(-int(np.sqrt(3) * vs + 12) // 32) * 32
    cfg = SVoRTTrainConfig(
        version=version, steps=1, lr=2e-4, n_examples=1, vs=vs, n_stacks=3,
        gap=3.0, motion_rot=0.06, motion_trans=2.0, motion_jitter=0.5,
        volume_shape=(vol_vs, vol_vs, vol_vs), volume_weight=1.0, seed=0,
    )

    def timeit(fn, n=reps, warmup=1):
        for _ in range(warmup):
            r = fn()
            jax.block_until_ready(r) if r is not None else None
            np.asarray(jax.tree_util.tree_leaves(r)[0]) if r is not None else None
        ts = []
        for _ in range(n):
            t = time.time()
            r = fn()
            if r is not None:
                np.asarray(jax.tree_util.tree_leaves(r)[0])  # fetch = sync
            ts.append(time.time() - t)
        return float(np.median(ts))

    # --- 1. pool refresh: first (compile) and warm; the simulator is one
    # async device dispatch, so block on the result for an honest number ---
    t = time.time()
    ex = make_training_example(cfg, seed=0)
    np.asarray(ex["data"]["stacks"])  # fetch = sync
    print(f"make_training_example cold (incl. sim compile): "
          f"{time.time() - t:.2f} s", flush=True)
    t = time.time()
    ex = make_training_example(cfg, seed=1)
    np.asarray(ex["data"]["stacks"])
    t_example = time.time() - t
    ex = make_training_example(cfg, seed=0)  # keep profile inputs at seed 0
    print(f"make_training_example warm (blocking): {t_example:.2f} s "
          f"(amortized /4 refresh cadence: {t_example / 4:.2f} s/step; "
          f"training never blocks on it — the dispatch is async)",
          flush=True)

    n_it = 3 if version == "v1" else 4
    model = (SVoRT if version == "v1" else SVoRTv2)(
        n_iter=n_it, differentiable_srr=True
    )
    params = model.init(jax.random.PRNGKey(0))
    tx = optax.adam(2e-4)
    opt_state = tx.init(params)

    static = {
        k: ex["data"][k]
        for k in ("psf_rec", "slice_shape", "resolution_slice",
                  "resolution_recon", "slice_thickness", "volume_shape")
    }
    arrs = (ex["data"]["transforms"], ex["data"]["stacks"],
            ex["data"]["positions"], ex["theta_gt"], ex["vol_gt"])

    def loss_fn(params, transforms, stacks, positions, theta_gt, vol_gt, vw):
        data = {**static, "transforms": transforms, "stacks": stacks,
                "positions": positions}
        _, volumes, thetas = model(params, data)
        loss = sum(jnp.mean((t - theta_gt) ** 2) for t in thetas) / len(thetas)
        if vw:
            loss = loss + vw * jnp.mean(
                (volumes[-1].reshape(vol_gt.shape) - vol_gt) ** 2
            )
        return loss

    import functools

    @functools.partial(jax.jit, static_argnames=("vw",))
    def step(params, opt_state, transforms, stacks, positions, theta_gt,
             vol_gt, vw):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, transforms, stacks, positions, theta_gt, vol_gt, vw
        )
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    @jax.jit
    def fwd(params, transforms, stacks, positions):
        data = {**static, "transforms": transforms, "stacks": stacks,
                "positions": positions}
        _, volumes, thetas = model(params, data)
        return thetas[-1]

    t = time.time()
    np.asarray(jax.tree_util.tree_leaves(
        step(params, opt_state, *arrs, vw=1.0))[0])
    print(f"step compile+first run: {time.time() - t:.1f} s", flush=True)

    t_full = timeit(lambda: step(params, opt_state, *arrs, vw=1.0)[2])
    print(f"full step (fwd+bwd+adam, volume loss): {t_full:.2f} s", flush=True)

    t_pose = timeit(lambda: step(params, opt_state, *arrs, vw=0.0)[2])
    print(f"pose-only step (no volume-loss backward): {t_pose:.2f} s",
          flush=True)

    t_fwd = timeit(lambda: fwd(params, *arrs[:3]))
    print(f"model forward only: {t_fwd:.2f} s", flush=True)

    # --- raw projector at step shapes ---
    from nesvor_tpu.ops.slice_acq import (
        slice_acquisition, slice_acquisition_adjoint,
    )
    from nesvor_tpu.transform import axisangle2mat

    n_slices = ex["data"]["stacks"].shape[0] * ex["data"]["stacks"].shape[1] \
        if ex["data"]["stacks"].ndim == 5 else ex["data"]["transforms"].shape[0]
    mats = axisangle2mat(
        jnp.zeros((ex["data"]["transforms"].shape[0], 6), jnp.float32)
    )
    vol = jnp.zeros((1, 1) + tuple(static["volume_shape"]), jnp.float32)
    ss = static["slice_shape"]
    psf = static["psf_rec"]
    slc = jnp.ones(
        (ex["data"]["transforms"].shape[0], 1, ss[0], ss[1]), jnp.float32
    )

    t_proj = timeit(lambda: slice_acquisition(
        mats, vol, None, None, psf, tuple(ss), 1.0, False, False))
    print(f"slice_acquisition fwd ({mats.shape[0]} slices, "
          f"{tuple(static['volume_shape'])} vol): {t_proj * 1e3:.0f} ms",
          flush=True)
    t_adj = timeit(lambda: slice_acquisition_adjoint(
        mats, psf, slc, None, None, tuple(static["volume_shape"]), 1.0,
        False, False, True))
    print(f"slice_acquisition adjoint: {t_adj * 1e3:.0f} ms", flush=True)

    print(
        f"\nsummary: step {t_full:.2f} s = fwd {t_fwd:.2f} + bwd/opt "
        f"{t_full - t_fwd:.2f}; volume-loss backward costs "
        f"{t_full - t_pose:.2f} s; pool refresh adds {t_example / 4:.2f} "
        f"s/step at /4 cadence", flush=True,
    )


if __name__ == "__main__":
    main()
