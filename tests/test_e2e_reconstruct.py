"""End-to-end CLI test: phantom stacks -> NIfTI -> `nesvor reconstruct` ->
output volume PSNR + model checkpoint round-trip through `sample-volume`.

The reference has no end-to-end tests (SURVEY.md §4: "no golden-file or
end-to-end CLI tests"); this closes that gap with the phantom PSNR
north-star metric at a CPU-friendly size.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from nesvor_tpu.cli.main import main as cli_main
from nesvor_tpu.image import load_volume, save_nii_volume
from nesvor_tpu.image.image_utils import transformation2affine
from tests.synth import make_phantom_stacks, psnr

pytestmark = pytest.mark.slow


def _save_stacks(stacks, folder):
    paths = []
    for i, stack in enumerate(stacks):
        path = os.path.join(folder, f"stack{i}.nii.gz")
        # bake per-stack affine: all slices share rotation; mid-slice transform
        # with z-gap encoded via the affine's third column
        from nesvor_tpu.transform import RigidTransform

        ax = np.asarray(stack.transformation.axisangle())
        vol = np.asarray(stack.slices[:, 0])  # (n, h, w)
        # volume-level transform: shared rotation + mean translation (the
        # per-slice tz offsets are symmetric around 0, so the mean recovers
        # the stack-center pose exactly)
        ax_vol = np.concatenate([ax[:1, :3], ax[:, 3:].mean(0, keepdims=True)], -1)
        affine = transformation2affine(
            (vol.shape[0], vol.shape[1], vol.shape[2]),
            RigidTransform(jnp.asarray(ax_vol.astype(np.float32))),
            stack.resolution_x,
            stack.resolution_y,
            stack.gap,
        )
        save_nii_volume(path, jnp.asarray(vol), affine)
        paths.append(path)
    return paths


@pytest.mark.medium
def test_reconstruct_cli(tmp_path):
    stacks, gt = make_phantom_stacks(
        vs=32, n_stacks=4, gap=3.0, res=1.0, res_s=1.0, intensity=700.0
    )
    folder = str(tmp_path)
    paths = _save_stacks(stacks, folder)
    out_vol = os.path.join(folder, "out.nii.gz")
    out_model = os.path.join(folder, "model.pt")

    cli_main(
        [
            "reconstruct",
            "--input-stacks", *paths,
            "--registration", "none",
            "--output-volume", out_vol,
            "--output-model", out_model,
            "--n-iter", "300",
            "--batch-size", "512",
            "--n-samples", "16",
            "--output-resolution", "1.0",
            "--output-intensity-mean", "700.0",
            "--inference-batch-size", "8192",
            "--n-inference-samples", "32",
            "--no-output-psf",
            "--seed", "0",
            "--verbose", "0",
        ]
    )
    assert os.path.exists(out_vol)
    assert os.path.exists(out_model)

    recon = load_volume(out_vol)
    # compare on the phantom grid: sample recon at ground-truth voxel centers
    vs = gt.shape[0]
    grid = (
        np.stack(
            np.meshgrid(np.arange(vs), np.arange(vs), np.arange(vs), indexing="ij"),
            -1,
        )[..., ::-1]
        - (vs - 1) / 2
    ).astype(np.float32)
    vals = recon.sample_points(jnp.asarray(grid.reshape(-1, 3)))
    gt_flat = np.asarray(gt).reshape(-1)
    inside = gt_flat > 0.05 * gt_flat.max()
    # rescaled output: normalize both to unit mean before PSNR
    v = np.asarray(vals)
    v = v * (gt_flat[inside].mean() / max(v[inside].mean(), 1e-6))
    p = psnr(v, gt_flat, inside)
    assert p > 14.0, f"PSNR too low: {p:.2f} dB"

    # sample-volume from the saved model must also work
    out_vol2 = os.path.join(folder, "out2.nii.gz")
    cli_main(
        [
            "sample-volume",
            "--input-model", out_model,
            "--output-volume", out_vol2,
            "--output-resolution", "1.5",
            "--inference-batch-size", "8192",
            "--n-inference-samples", "32",
            "--verbose", "0",
        ]
    )
    assert os.path.exists(out_vol2)

    # sample-slices: simulate the motion-corrected slices from the model
    # (reference cli flow: README.md simulated-slices QA path)
    slices_dir = os.path.join(folder, "slices")
    sim_dir = os.path.join(folder, "sim_slices")
    cli_main(
        [
            "register",
            "--input-stacks", *paths,
            "--registration", "none",
            "--output-slices", slices_dir,
            "--verbose", "0",
        ]
    )
    n_slices = len(os.listdir(slices_dir))
    assert n_slices > 0
    # (inference batch/samples are hidden defaults for sample-slices, not
    # flags — reference cli/main.py:399-416 parity)
    cli_main(
        [
            "sample-slices",
            "--input-model", out_model,
            "--input-slices", slices_dir,
            "--simulated-slices", sim_dir,
            "--verbose", "0",
        ]
    )
    assert len(os.listdir(sim_dir)) == n_slices


def test_reconstruct_from_slices_cli(tmp_path):
    """The register->reconstruct interchange: `register --output-slices`
    writes one {i}.nii.gz per slice with the pose baked into the affine
    (reference cli/io.py:9-30, image.py:296-324); `reconstruct
    --input-slices <folder>` must reload them and reconstruct to the same
    PSNR band as the stacks path (VERDICT r03 item 6 — this leg was never
    driven end-to-end)."""
    stacks, gt = make_phantom_stacks(
        vs=32, n_stacks=4, gap=3.0, res=1.0, res_s=1.0, intensity=700.0
    )
    folder = str(tmp_path)
    paths = _save_stacks(stacks, folder)

    slices_dir = os.path.join(folder, "slices")
    cli_main(
        [
            "register",
            "--input-stacks", *paths,
            "--registration", "none",
            "--output-slices", slices_dir,
            "--verbose", "0",
        ]
    )
    assert len(os.listdir(slices_dir)) > 0

    out_vol = os.path.join(folder, "out_from_slices.nii.gz")
    cli_main(
        [
            "reconstruct",
            "--input-slices", slices_dir,
            "--output-volume", out_vol,
            "--n-iter", "300",
            "--batch-size", "512",
            "--n-samples", "16",
            "--output-resolution", "1.0",
            "--output-intensity-mean", "700.0",
            "--inference-batch-size", "8192",
            "--n-inference-samples", "32",
            "--no-output-psf",
            "--seed", "0",
            "--verbose", "0",
        ]
    )
    assert os.path.exists(out_vol)

    recon = load_volume(out_vol)
    vs = gt.shape[0]
    grid = (
        np.stack(
            np.meshgrid(np.arange(vs), np.arange(vs), np.arange(vs), indexing="ij"),
            -1,
        )[..., ::-1]
        - (vs - 1) / 2
    ).astype(np.float32)
    vals = recon.sample_points(jnp.asarray(grid.reshape(-1, 3)))
    gt_flat = np.asarray(gt).reshape(-1)
    inside = gt_flat > 0.05 * gt_flat.max()
    v = np.asarray(vals)
    v = v * (gt_flat[inside].mean() / max(v[inside].mean(), 1e-6))
    p = psnr(v, gt_flat, inside)
    assert p > 14.0, f"PSNR too low via --input-slices: {p:.2f} dB"
