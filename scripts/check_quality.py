"""Train on the phantom at a given config and print PSNR — for TPU-vs-CPU
quality parity checks. Usage: check_quality.py [n_iter] [vs] [n_stacks]"""

import sys
import time
from argparse import Namespace

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    n_iter = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    vs = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    n_stacks = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    encoder = sys.argv[4] if len(sys.argv) > 4 else "fourier"
    batch = int(sys.argv[5]) if len(sys.argv) > 5 else 4096
    n_samples = int(sys.argv[6]) if len(sys.argv) > 6 else 256
    if len(sys.argv) > 7 and sys.argv[7] == "cpu":
        jax.config.update("jax_platforms", "cpu")
    head_width = int(sys.argv[8]) if len(sys.argv) > 8 else 64
    head_depth = int(sys.argv[9]) if len(sys.argv) > 9 else 1
    width = int(sys.argv[10]) if len(sys.argv) > 10 else (
        256 if encoder == "fourier" else 64
    )
    depth = int(sys.argv[11]) if len(sys.argv) > 11 else (
        3 if encoder == "fourier" else 1
    )
    # variance-head LR warmup: needed by small decoupled heads (PERF.md
    # "decoupled-head collapse"); reference behavior (grid encoders, full
    # heads) is 0
    var_warmup = int(sys.argv[12]) if len(sys.argv) > 12 else (
        100 if (encoder == "fourier" and head_width) else 0
    )

    from tests.synth import make_phantom_stacks, stacks_to_slices, psnr
    from nesvor_tpu.nesvor.train import train
    from nesvor_tpu.nesvor.sample import sample_points

    stacks, gt = make_phantom_stacks(
        vs=vs, n_stacks=n_stacks, gap=3.0, res=1.0, res_s=1.0, intensity=700.0
    )
    slices = stacks_to_slices(stacks)
    args = Namespace(
        n_features_per_level=2, log2_hashmap_size=19, level_scale=1.3819,
        coarsest_resolution=16.0, finest_resolution=0.5, n_levels_bias=0,
        encoder=encoder, fourier_dirs=8,
        depth=depth, width=width,
        head_width=head_width, head_depth=head_depth,
        var_warmup_iters=var_warmup,
        n_features_z=15, n_features_slice=16,
        no_transformation_optimization=False, no_slice_scale=False,
        no_pixel_variance=False, no_slice_variance=False, single_precision=False,
        weight_transformation=0.1, weight_bias=100.0,
        image_regularization="edge", weight_image=2.0, delta=0.2,
        learning_rate=5e-3, gamma=0.33, milestones=[0.5, 0.75, 0.9],
        n_iter=n_iter, batch_size=batch, n_samples=n_samples,
        seed=0, mask_threshold=1.0,
    )
    t0 = time.time()
    model, out_slices, mask = train(slices, args)
    print(f"train {time.time()-t0:.0f}s", flush=True)

    coords = (np.stack(
        np.meshgrid(np.arange(vs), np.arange(vs), np.arange(vs), indexing="ij"),
        -1,
    )[..., ::-1] - (vs - 1) / 2).astype(np.float32)
    args.inference_batch_size = 32768
    args.n_inference_samples = 128
    args.no_output_psf = True
    args.output_resolution = 1.0
    pred = np.asarray(
        sample_points(model, jnp.asarray(coords.reshape(-1, 3)), args)
    )
    g = np.asarray(gt).reshape(-1)
    inside = g > 0.05 * g.max()
    print("pred nan:", int(np.isnan(pred).sum()))
    pred = pred * (g[inside].mean() / max(pred[inside].mean(), 1e-9))
    print(f"PSNR: {psnr(pred, g, inside):.2f} dB  ({jax.default_backend()})",
          flush=True)


if __name__ == "__main__":
    main()
