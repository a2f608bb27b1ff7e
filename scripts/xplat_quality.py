"""Cross-platform fault isolation: train on one platform, eval on another.

Usage:
  xplat_quality.py train {cpu|tpu} out.pkl [n_iter] [batch] [n_samples]
  xplat_quality.py eval  {cpu|tpu} out.pkl
"""

import pickle
import sys
from argparse import Namespace

sys.path.insert(0, ".")

import jax

mode, plat, path = sys.argv[1], sys.argv[2], sys.argv[3]
if plat == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def get_args(n_iter, batch, n_samples):
    return Namespace(
        n_features_per_level=2, log2_hashmap_size=19, level_scale=1.3819,
        coarsest_resolution=16.0, finest_resolution=0.5, n_levels_bias=0,
        encoder="fourier", fourier_dirs=8, depth=3, width=256,
        head_width=64, head_depth=1, n_features_z=15, n_features_slice=16,
        no_transformation_optimization=False, no_slice_scale=False,
        no_pixel_variance=False, no_slice_variance=False, single_precision=False,
        weight_transformation=0.1, weight_bias=100.0,
        image_regularization="edge", weight_image=2.0, delta=0.2,
        learning_rate=5e-3, gamma=0.33, milestones=[0.5, 0.75, 0.9],
        n_iter=n_iter, batch_size=batch, n_samples=n_samples,
        seed=0, mask_threshold=1.0,
    )


def main():
    from tests.synth import make_phantom_stacks, stacks_to_slices, psnr

    print("backend:", jax.default_backend(), flush=True)
    if mode == "train":
        n_iter = int(sys.argv[4]) if len(sys.argv) > 4 else 300
        batch = int(sys.argv[5]) if len(sys.argv) > 5 else 512
        n_samples = int(sys.argv[6]) if len(sys.argv) > 6 else 16
        from nesvor_tpu.nesvor.train import train

        stacks, gt = make_phantom_stacks(
            vs=32, n_stacks=4, gap=3.0, res=1.0, res_s=1.0, intensity=700.0
        )
        slices = stacks_to_slices(stacks)
        args = get_args(n_iter, batch, n_samples)
        model, _, _ = train(slices, args)
        from dataclasses import asdict

        payload = {
            "params": jax.tree_util.tree_map(np.asarray, model.params),
            "cfg": asdict(model.cfg),
            "bb": np.asarray(model.bounding_box),
            "gt": np.asarray(gt),
        }
        payload["cfg"]["compute_dtype"] = np.dtype(model.cfg.compute_dtype).name
        with open(path, "wb") as f:
            pickle.dump(payload, f)
        print("saved", path, flush=True)
    else:
        from nesvor_tpu.nesvor.models import INRConfig
        from nesvor_tpu.nesvor.train import INRModel
        from nesvor_tpu.nesvor.sample import sample_points

        with open(path, "rb") as f:
            p = pickle.load(f)
        cfg_d = dict(p["cfg"])
        cfg_d["compute_dtype"] = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
            cfg_d["compute_dtype"]
        ]
        cfg_d["level_resolutions"] = tuple(cfg_d["level_resolutions"])
        model = INRModel(
            params=jax.tree_util.tree_map(jnp.asarray, p["params"]),
            cfg=INRConfig(**cfg_d),
            bounding_box=jnp.asarray(p["bb"]),
        )
        gt = p["gt"]
        vs = gt.shape[0]
        coords = (np.stack(
            np.meshgrid(np.arange(vs), np.arange(vs), np.arange(vs), indexing="ij"),
            -1,
        )[..., ::-1] - (vs - 1) / 2).astype(np.float32)
        args = Namespace(
            inference_batch_size=32768, n_inference_samples=128,
            no_output_psf=True, output_resolution=1.0, seed=0,
        )
        pred = np.asarray(
            sample_points(model, jnp.asarray(coords.reshape(-1, 3)), args)
        )
        g = gt.reshape(-1)
        inside = g > 0.05 * g.max()
        pred = pred * (g[inside].mean() / max(pred[inside].mean(), 1e-9))
        print(f"PSNR: {psnr(pred, g, inside):.2f} dB", flush=True)


if __name__ == "__main__":
    main()
