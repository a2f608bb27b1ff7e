"""Head-size collapse investigation.

Decoupled w64d1 sigma heads train ~30% faster than full-size heads at the
bench config but collapsed the fourier model into the zero-density optimum
in round-1 experiments (and bench r02: 10.94 dB at 600 iters vs ~19.9
full-heads), while a small-scale CPU repro (w128d2, 4 stacks, 32 phantom)
shows NO collapse (19.19 vs 19.30 dB). This script sweeps the axis between
those configs and reports density/variance telemetry.

usage: python scripts/exp_heads.py [options]
  --head W,D      sigma/bias head size (default 0,0 = follow density net)
  --width N --depth N --samples N --batch N --iters N --vs N --stacks N
  --tpu           run on the default backend instead of forcing CPU
"""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--head", default="0,0")
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--samples", type=int, default=256)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=600)
    ap.add_argument("--vs", type=int, default=64)
    ap.add_argument("--stacks", type=int, default=8)
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--var-warmup", type=int, default=0)
    ap.add_argument("--no-pixel-var", action="store_true")
    ap.add_argument("--no-slice-var", action="store_true")
    opts = ap.parse_args()
    head_width, head_depth = (int(x) for x in opts.head.split(","))

    import jax

    if not opts.tpu:
        jax.config.update("jax_platforms", "cpu")

    from nesvor_tpu._precision import ensure_f32_matmul_semantics

    ensure_f32_matmul_semantics()  # also enables the compile cache

    import numpy as np
    import jax.numpy as jnp
    from argparse import Namespace

    from tests.synth import make_phantom_stacks, stacks_to_slices, psnr
    from nesvor_tpu.nesvor.train import train, LAST_PARAMS
    from nesvor_tpu.nesvor.sample import sample_points

    stacks, gt_volume = make_phantom_stacks(
        vs=opts.vs, n_stacks=opts.stacks, gap=3.0, res=1.0, res_s=1.0,
        intensity=700.0,
    )
    slices = stacks_to_slices(stacks)

    args = Namespace(
        n_features_per_level=2, log2_hashmap_size=19, level_scale=1.3819,
        coarsest_resolution=16.0, finest_resolution=0.5, n_levels_bias=0,
        encoder="fourier", fourier_dirs=8, depth=opts.depth, width=opts.width,
        head_width=head_width, head_depth=head_depth,
        n_features_z=15, n_features_slice=16,
        no_transformation_optimization=False, no_slice_scale=False,
        no_pixel_variance=opts.no_pixel_var,
        no_slice_variance=opts.no_slice_var,
        single_precision=False,
        var_warmup_iters=opts.var_warmup,
        weight_transformation=0.1, weight_bias=100.0,
        image_regularization="edge", weight_image=2.0, delta=0.2,
        learning_rate=5e-3, gamma=0.33, milestones=[0.5, 0.75, 0.9],
        n_iter=opts.iters, batch_size=opts.batch, n_samples=opts.samples,
        seed=0, mask_threshold=1.0,
    )

    model, out_slices, mask = train(slices, args)

    if "log_var_slice" in LAST_PARAMS:
        lvs = np.asarray(LAST_PARAMS["log_var_slice"])
        print("log_var_slice mean/min/max:", lvs.mean(), lvs.min(), lvs.max())
    if "logit_coef" in LAST_PARAMS:
        c = np.asarray(jax.nn.softmax(LAST_PARAMS["logit_coef"])) * len(slices)
        print("coef min/max:", c.min(), c.max())

    vs = gt_volume.shape[0]
    coords = (np.stack(
        np.meshgrid(np.arange(vs), np.arange(vs), np.arange(vs), indexing="ij"),
        -1,
    )[..., ::-1] - (vs - 1) / 2).astype(np.float32)
    args.no_output_psf = True
    args.output_resolution = 1.0
    args.inference_batch_size = 32768
    args.n_inference_samples = 32
    pred = np.asarray(sample_points(model, jnp.asarray(coords.reshape(-1, 3)), args))
    gt = np.asarray(gt_volume).reshape(-1)
    inside = gt > 0.05 * gt.max()
    pr = pred * (gt[inside].mean() / max(pred[inside].mean(), 1e-9))
    print(f"head=({head_width},{head_depth}) w{opts.width}d{opts.depth} "
          f"S{opts.samples} B{opts.batch} iters={opts.iters}")
    print("PSNR", round(psnr(pr, gt, inside), 2))
    print("pred mean/max inside:", pred[inside].mean(), pred[inside].max())


if __name__ == "__main__":
    main()
