"""Encoder quality study on a high-res, fine-structure phantom.

VERDICT r01 asked for an honest hash-vs-fourier comparison beyond the
band-limited 64-voxel bench phantom: a >=128^3 phantom with structure at
the resolution limit, both encoders at equal iterations, gauge-fixed PSNR.

usage: python scripts/exp_quality_128.py <encoder> [n_iter] [--cpu]
           [--dirs N] [--width N] [--depth N]
  encoder: fourier | cellhash | hash
Results are documented in PERF.md.
"""

import sys

sys.path.insert(0, ".")


def _opt(name, default):
    if name in sys.argv:
        return int(sys.argv[sys.argv.index(name) + 1])
    return default


def main():
    encoder = sys.argv[1] if len(sys.argv) > 1 else "fourier"
    n_iter = int(sys.argv[2]) if len(sys.argv) > 2 else 2000

    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    from nesvor_tpu._precision import ensure_f32_matmul_semantics

    ensure_f32_matmul_semantics()  # also enables the compile cache

    import numpy as np
    import jax.numpy as jnp
    from argparse import Namespace

    from tests.synth import make_phantom_stacks, stacks_to_slices, psnr
    from nesvor_tpu.image import Stack
    from nesvor_tpu.nesvor.train import train, LAST_RUN_STATS
    from nesvor_tpu.nesvor.sample import sample_points
    from nesvor_tpu.svort.inference import average_rotation
    from nesvor_tpu.transform import RigidTransform, transform_points

    import os
    import time

    # 128^3 at 0.5 mm: 64 mm FOV, acquisitions at 0.5 mm in-plane / 1.5 mm
    # gap, multiplicative fine texture at ~1.2-voxel scale. Simulation costs
    # ~10 min through the remote tunnel, so cache the stacks on disk.
    cache = "/tmp/q128_stacks.npz"
    t0 = time.time()
    if os.path.exists(cache):
        data = np.load(cache)
        gt_volume = jnp.asarray(data["gt"])
        stacks = [
            Stack(
                slices=jnp.asarray(data[f"s{i}"]),
                mask=jnp.asarray(data[f"s{i}"]) > 0,
                transformation=RigidTransform(
                    jnp.asarray(data[f"ax{i}"]), trans_first=True
                ),
                resolution_x=0.5, resolution_y=0.5,
                thickness=1.5, gap=1.5,
            )
            for i in range(int(data["n"]))
        ]
        print(f"loaded {len(stacks)} cached stacks in {time.time()-t0:.1f} s")
    else:
        stacks, gt_volume = make_phantom_stacks(
            vs=128, n_stacks=8, gap=1.5, res=0.5, res_s=0.5, intensity=700.0,
            texture_amp=0.25, texture_sigma=1.2,
        )
        payload = {"gt": np.asarray(gt_volume), "n": len(stacks)}
        for i, st in enumerate(stacks):
            payload[f"s{i}"] = np.asarray(st.slices)
            payload[f"ax{i}"] = np.asarray(st.transformation.axisangle())
        np.savez_compressed(cache, **payload)
    slices = stacks_to_slices(stacks)
    n_px = sum(int(np.asarray(s.mask).sum()) for s in slices)
    print(f"simulated {len(slices)} slices, {n_px} masked px "
          f"in {time.time()-t0:.1f} s")

    args = Namespace(
        n_features_per_level=2, log2_hashmap_size=19, level_scale=1.3819,
        coarsest_resolution=16.0, finest_resolution=0.5, n_levels_bias=0,
        encoder=encoder, fourier_dirs=_opt("--dirs", 8),
        depth=_opt("--depth", 3 if encoder == "fourier" else 1),
        width=_opt("--width", 256 if encoder == "fourier" else 64),
        # 0 = heads follow --width/--depth (the study's original rows);
        # pass --head-width 64 --head-depth 1 --warmup 100 for the bench
        # flagship head config
        head_width=_opt("--head-width", 0), head_depth=_opt("--head-depth", 0),
        var_warmup_iters=_opt("--warmup", 0),
        n_features_z=15, n_features_slice=16,
        no_transformation_optimization=False, no_slice_scale=False,
        no_pixel_variance=False, no_slice_variance=False, single_precision=False,
        weight_transformation=0.1, weight_bias=100.0,
        image_regularization="edge", weight_image=2.0, delta=0.2,
        learning_rate=5e-3, gamma=0.33, milestones=[0.5, 0.75, 0.9],
        n_iter=n_iter, batch_size=4096, n_samples=256,
        seed=0, mask_threshold=1.0,
    )

    t0 = time.time()
    model, out_slices, mask = train(slices, args)
    jax.block_until_ready(model.params)
    train_s = time.time() - t0

    # gauge-fixed PSNR on the phantom grid (see bench.py)
    ax_opt = np.asarray(
        jnp.concatenate([s.transformation.axisangle() for s in out_slices], 0)
    )
    ax_init = np.asarray(
        jnp.concatenate([s.transformation.axisangle() for s in slices], 0)
    )
    diff = RigidTransform(jnp.asarray(ax_opt)).compose(
        RigidTransform(jnp.asarray(ax_init)).inv()
    )
    diff_ax = np.asarray(diff.axisangle())
    mean_r = np.asarray(average_rotation(diff_ax[:, :3]))[0]
    mean_t = diff_ax[:, 3:].mean(0)
    drift = RigidTransform(
        jnp.asarray(np.concatenate([mean_r, mean_t])[None], jnp.float32)
    )

    vs = gt_volume.shape[0]
    res = 0.5
    coords = ((np.stack(
        np.meshgrid(np.arange(vs), np.arange(vs), np.arange(vs), indexing="ij"),
        -1,
    )[..., ::-1] - (vs - 1) / 2) * res).astype(np.float32)
    gt = np.asarray(gt_volume).reshape(-1)
    inside = gt > 0.05 * gt.max()

    args.no_output_psf = True
    args.output_resolution = res
    args.inference_batch_size = 32768
    args.n_inference_samples = 32

    def eval_psnr(points):
        pred = np.asarray(sample_points(model, points, args))
        pr = pred * (gt[inside].mean() / max(pred[inside].mean(), 1e-9))
        return psnr(pr, gt, inside)

    grid = jnp.asarray(coords.reshape(-1, 3))
    p_raw = eval_psnr(grid)
    p_fix = eval_psnr(transform_points(drift, grid))
    print(f"encoder={encoder} iters={n_iter} train_s={train_s:.1f} "
          f"steady_ms={LAST_RUN_STATS.get('steady_ms_per_step', -1):.1f}")
    print(f"PSNR raw={p_raw:.2f} gauge_fixed={p_fix:.2f} "
          f"drift_rot_mrad={np.linalg.norm(mean_r)*1e3:.1f}")


if __name__ == "__main__":
    main()
