"""CLI entry point: the same four-command surface as the reference
(nesvor/cli/main.py:329-434) — reconstruct, register, sample-volume,
sample-slices — with identical flags and defaults (reference :27-326)."""

from __future__ import annotations

import argparse
import random
import string
import sys

import numpy as np

from ..utils import setup_logger


class Formatter(
    argparse.ArgumentDefaultsHelpFormatter,
    argparse.RawDescriptionHelpFormatter,
):
    def __init__(self, prog: str) -> None:
        super().__init__(prog, max_help_position=50, width=None)


class FormatterMetavar(Formatter, argparse.MetavarTypeHelpFormatter):
    pass


def update_defaults(parser, **kwargs):
    parser.set_defaults(**kwargs)


def build_parser_training() -> argparse.ArgumentParser:
    _parser = argparse.ArgumentParser(add_help=False)
    parser = _parser.add_argument_group("model architecture")
    parser.add_argument(
        "--encoder", default="fourier", type=str,
        choices=["cellhash", "hash", "fourier"],
        help="INR encoding layout: 'fourier' = gather-free random Fourier "
        "features, one octave per grid level (all-MXU; the benchmarked "
        "TPU flagship, default), 'cellhash' = fused cell-block grid "
        "(one 64B gather per point per level), 'hash' = reference "
        "Instant-NGP vertex hash (exact tiny-cuda-nn semantics). The grid "
        "encoders are the reference-parity options; at equal wall-clock "
        "fourier matches or beats them on quality (PERF.md).",
    )
    parser.add_argument(
        "--fourier-dirs", default=8, type=int,
        help="Random directions per frequency octave for --encoder fourier.",
    )
    parser.add_argument(
        "--head-width", default=64, type=int,
        help="Width of the sigma/bias head MLPs (0 = same as --width; "
        "default 64 = the reference's head sizing, decoupled from a wider "
        "density net).",
    )
    parser.add_argument(
        "--head-depth", default=1, type=int,
        help="Depth of the sigma/bias head MLPs (0 = same as --depth; "
        "default 1 = the reference's head sizing).",
    )
    parser.add_argument(
        "--n-features-per-level", default=2, type=int,
        help="Feature-vector width stored per grid level.",
    )
    parser.add_argument(
        "--log2-hashmap-size", default=19, type=int,
        help="log2 of the per-level hash-table row budget.",
    )
    parser.add_argument(
        "--level-scale", default=1.3819, type=float,
        help="Geometric growth of grid resolution from one level to the next.",
    )
    parser.add_argument(
        "--coarsest-resolution", default=16.0, type=float,
        help="Grid spacing (mm) of the coarsest encoding level.",
    )
    parser.add_argument(
        "--finest-resolution", default=0.5, type=float,
        help="Grid spacing (mm) of the finest encoding level.",
    )
    parser.add_argument(
        "--n-levels-bias", default=0, type=int,
        help="How many low-frequency encoding levels feed the bias-field "
        "head (0 disables bias-field estimation).",
    )
    parser.add_argument(
        "--depth", default=0, type=int,
        help="Hidden-layer count of the density MLP. 0 = auto per encoder: "
        "3 for fourier (the benchmarked flagship), 1 for the grid encoders "
        "(reference sizing).",
    )
    parser.add_argument(
        "--width", default=0, type=int,
        help="Hidden-layer width of the density MLP. 0 = auto per encoder: "
        "256 for fourier (the benchmarked flagship), 64 for the grid "
        "encoders (reference sizing).",
    )
    parser.add_argument(
        "--n-features-z", default=15, type=int,
        help="Width of the intermediate feature vector z passed to the heads.",
    )
    parser.add_argument(
        "--n-features-slice", default=16, type=int,
        help="Width of the per-slice learned embedding e.",
    )
    parser.add_argument(
        "--no-transformation-optimization", action="store_true",
        help="Keep the rigid slice poses fixed at their input values instead "
        "of optimizing them jointly with the INR.",
    )
    parser.add_argument(
        "--no-slice-scale", action="store_true",
        help="Do not learn a per-slice intensity scale.",
    )
    parser.add_argument(
        "--no-pixel-variance", action="store_true",
        help="Drop the per-pixel noise-variance head.",
    )
    parser.add_argument(
        "--no-slice-variance", action="store_true",
        help="Drop the per-slice noise-variance term.",
    )
    parser.add_argument(
        "--single-precision", action="store_true",
        help="Run all compute in float32 (default: bfloat16 mixed precision).",
    )
    parser = _parser.add_argument_group("loss function")
    parser.add_argument(
        "--weight-transformation", default=0.1, type=float,
        help="Strength of the pose-deviation regularizer.",
    )
    parser.add_argument(
        "--weight-bias", default=100.0, type=float,
        help="Strength of the bias-field regularizer.",
    )
    parser.add_argument(
        "--image-regularization", default="edge", type=str,
        choices=["TV", "edge", "L2"],
        help="Smoothness prior on the reconstructed image: total variation "
        "('TV'), edge-preserving Charbonnier ('edge'), or plain L2 on the "
        "image gradient ('L2').",
    )
    parser.add_argument(
        "--weight-image", default=2.0, type=float,
        help="Strength of the image smoothness prior.",
    )
    parser.add_argument(
        "--delta", type=float, default=0.2,
        help="Edge scale of the edge-preserving prior, as a fraction of the "
        "mean image intensity.",
    )
    parser = _parser.add_argument_group("training")
    parser.add_argument(
        "--learning-rate", default=5e-3, type=float,
        help="AdamW peak learning rate.",
    )
    parser.add_argument(
        "--gamma", default=0.33, type=float,
        help="LR decay factor applied at each milestone.",
    )
    parser.add_argument(
        "--milestones", nargs="+", type=float, default=[0.5, 0.75, 0.9],
        help="LR decay points as increasing fractions of --n-iter in (0, 1).",
    )
    parser.add_argument(
        "--n-iter", default=6000, type=int,
        help="Training iterations.",
    )
    parser.add_argument(
        "--no-gauge-anchor", action="store_true",
        help="Disable the per-chunk pose gauge anchoring that removes the "
        "mean SE(3) deviation-from-init (a coherent drift of all slices + "
        "density that the data term cannot see but that rotates the output "
        "volume against the scanner frame). Disabling reproduces the "
        "reference's (unanchored) pose behavior.",
    )
    parser.add_argument(
        "--var-warmup-iters", default=100, type=int,
        help="Hold the variance/bias heads at zero LR for this many "
        "iterations so the density net latches onto the signal before the "
        "noise model starts down-weighting pixels. Needed (~100) when "
        "the heads are much smaller than the density net (--head-width), "
        "whose slower-adapting variance otherwise suppresses early density "
        "gradients. 0 = off (reference behavior).",
    )
    parser.add_argument(
        "--pose-lr-mult", default=1.0, type=float,
        help="Learning-rate multiplier for the slice-pose (axisangle) "
        "parameters relative to the shared LR schedule. >1 speeds up "
        "absorption of registration residual on the composed "
        "register->reconstruct path; 1.0 = shared LR (reference behavior).",
    )
    parser.add_argument(
        "--trans-reg-decay-frac", default=0.0, type=float,
        help="Linearly anneal the transformation regularizer's weight from "
        "--weight-transformation to 0 over this fraction of --n-iter. On "
        "registered inputs the init poses carry the registration's "
        "residual error, and a constant transReg pins the joint pose "
        "refinement to them. 0 = constant weight (reference behavior).",
    )
    parser.add_argument(
        "--batch-size", default=1024 * 4, type=int,
        help="Pixels sampled per training step.",
    )
    parser.add_argument(
        "--n-samples", default=128 * 2, type=int,
        help="Monte-Carlo PSF samples per pixel during training.",
    )
    parser.add_argument(
        "--dp-devices", default=0, type=int,
        help="Data-parallel training over this many devices (mesh over the "
        "pixel-batch axis, gradients all-reduced over ICI). 0/1 = single "
        "device (the reference is strictly single-GPU; this is additive).",
    )
    parser.add_argument(
        "--train-checkpoint", default=None, type=str,
        help="Path for mid-training state checkpoints (params + optimizer + "
        "RNG + iteration). If the file exists and matches the run, training "
        "resumes from it (additive; the reference has no mid-run resume).",
    )
    parser.add_argument(
        "--checkpoint-every", default=0, type=int,
        help="Write --train-checkpoint every N iterations "
        "(0 = after every dispatch chunk).",
    )
    return _parser


def build_parser_inputs(
    input_stacks=False, input_slices=False, input_model=False
) -> argparse.ArgumentParser:
    _parser = argparse.ArgumentParser(add_help=False)
    parser = _parser.add_argument_group("input")
    if input_stacks:
        parser.add_argument(
            "--input-stacks", nargs="+", type=str,
            required=input_stacks == "required",
            help="Input stack NIfTI files, one per acquisition.",
        )
        parser.add_argument(
            "--thicknesses", nargs="+", type=float,
            help="Per-stack slice thickness (mm); defaults to each stack's "
            "slice gap when omitted.",
        )
        parser.add_argument(
            "--stack-masks", nargs="+", type=str,
            help="Per-stack ROI mask NIfTI files.",
        )
    if input_slices:
        parser.add_argument(
            "--input-slices", type=str, required=input_slices == "required",
            help="Folder holding motion-corrected slices (one NIfTI each).",
        )
    if input_model:
        parser.add_argument(
            "--input-model", type=str, required=input_model == "required",
            help="Trained NeSVoR model checkpoint to load.",
        )
        parser.add_argument(
            "--allow-pickle-model", action="store_true",
            help="Permit loading legacy pickle checkpoints (pre-npz "
            "format). Unpickling executes code embedded in the file — "
            "only enable for checkpoints you created yourself.",
        )
    return _parser


def build_parser_outputs(
    output_volume=False,
    output_slices=False,
    simulate_slices=False,
    output_model=False,
    **kwargs,
) -> argparse.ArgumentParser:
    _parser = argparse.ArgumentParser(add_help=False)
    parser = _parser.add_argument_group("output")
    if output_volume:
        parser.add_argument(
            "--output-volume", type=str, required=output_volume == "required",
            help="Where to write the reconstructed volume (NIfTI).",
        )
        parser.add_argument(
            "--output-resolution", default=0.8, type=float,
            help="Isotropic voxel size (mm) of the output volume.",
        )
        parser.add_argument(
            "--output-intensity-mean", default=700.0, type=float,
            help="Rescale the output so its mean intensity matches this.",
        )
        parser.add_argument(
            "--inference-batch-size", type=int,
            help="Voxels evaluated per device dispatch at inference.",
        )
        parser.add_argument(
            "--n-inference-samples", type=int,
            help="Monte-Carlo PSF samples per voxel at inference.",
        )
        parser.add_argument(
            "--no-output-psf", action="store_true",
            help="Sample the INR directly, without the output-resolution PSF.",
        )
    if output_slices:
        parser.add_argument(
            "--output-slices", required=output_slices == "required", type=str,
            help="Folder for the motion-corrected slices.",
        )
    if simulate_slices:
        parser.add_argument(
            "--simulated-slices", required=simulate_slices == "required", type=str,
            help="Folder for slices re-simulated from the reconstruction "
            "(for QA against the inputs).",
        )
    if output_model:
        parser.add_argument(
            "--output-model", type=str, required=output_model == "required",
            help="Where to save the trained model checkpoint (.pt).",
        )
    parser.add_argument("--mask-threshold", type=float, default=1.0)
    update_defaults(_parser, **kwargs)
    return _parser


def build_parser_svort() -> argparse.ArgumentParser:
    _parser = argparse.ArgumentParser(add_help=False)
    parser = _parser.add_argument_group("registration")
    parser.add_argument(
        "--registration", default="svort", type=str,
        choices=["svort", "svort-stack", "stack", "none"],
        help="Motion-correction mode run before reconstruction: 'svort' = "
        "full per-slice SVoRT poses, 'svort-stack' = keep only SVoRT's "
        "stack-level alignment, 'stack' = classical stack-to-stack rigid "
        "registration, 'none' = trust the input poses.",
    )
    parser.add_argument(
        "--svort-version", default="v1", type=str, choices=["v1", "v2"],
        help="Which pretrained SVoRT model to use.",
    )
    return _parser


def build_parser_common() -> argparse.ArgumentParser:
    _parser = argparse.ArgumentParser(add_help=False)
    parser = _parser.add_argument_group("common")
    parser.add_argument(
        "--verbose", type=int, default=1, choices=[0, 1, 2],
        help="Log level: 0 = warnings only, 1 = info, 2 = debug.",
    )
    parser.add_argument(
        "--output-log", type=str, help="Also write the log to this file."
    )
    parser.add_argument("--seed", type=int, default=None, help="RNG seed.")
    parser.add_argument("--debug", action="store_true", help="Debug mode.")
    return _parser


def build_main_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="nesvor",
        description="nesvor_tpu: TPU-native neural slice-to-volume reconstruction",
        epilog="Run 'nesvor COMMAND --help' for more information on a command.",
        formatter_class=Formatter,
        add_help=False,
    )
    parser.add_argument("-h", "--help", action="help", help=argparse.SUPPRESS)
    subparsers = parser.add_subparsers(title="commands", metavar=None, dest="command")
    parser_common = build_parser_common()
    parser_svort = build_parser_svort()
    parser_reconstruct = subparsers.add_parser(
        "reconstruct",
        help="reconstruct a volume from motion-corrupted stacks (NeSVoR)",
        description="reconstruct a volume from motion-corrupted stacks (NeSVoR)",
        parents=[
            build_parser_inputs(input_stacks=True, input_slices=True),
            build_parser_outputs(
                output_volume=True,
                output_slices=True,
                simulate_slices=True,
                output_model=True,
            ),
            parser_svort,
            build_parser_training(),
            parser_common,
        ],
        formatter_class=FormatterMetavar,
        add_help=False,
    )
    parser_reconstruct.add_argument(
        "-h", "--help", action="help", help=argparse.SUPPRESS
    )
    parser_sample_volume = subparsers.add_parser(
        "sample-volume",
        help="render a volume from a trained NeSVoR model",
        description="render a volume from a trained NeSVoR model",
        parents=[
            build_parser_inputs(input_model="required"),
            build_parser_outputs(
                output_volume="required",
                inference_batch_size=1024 * 4 * 8,
                n_inference_samples=128 * 2 * 2,
            ),
            parser_common,
        ],
        formatter_class=FormatterMetavar,
        add_help=False,
    )
    parser_sample_volume.add_argument(
        "--dp-devices", default=0, type=int,
        help="Shard inference voxel batches over this many devices "
        "(replicated model; bit-identical to single-device when "
        "--inference-batch-size divides evenly). 0/1 = single device.",
    )
    parser_sample_volume.add_argument(
        "-h", "--help", action="help", help=argparse.SUPPRESS
    )
    parser_sample_slices = subparsers.add_parser(
        "sample-slices",
        help="re-simulate input slices from a trained NeSVoR model",
        description="re-simulate input slices from a trained NeSVoR model",
        parents=[
            build_parser_inputs(input_slices="required", input_model="required"),
            build_parser_outputs(
                simulate_slices="required",
                inference_batch_size=1024 * 4 * 8,
                n_inference_samples=128 * 2 * 2,
            ),
            parser_common,
        ],
        formatter_class=FormatterMetavar,
        add_help=False,
    )
    parser_sample_slices.add_argument(
        "--dp-devices", default=0, type=int,
        help="Shard inference point batches over this many devices "
        "(replicated model; bit-identical to single-device when "
        "--inference-batch-size divides evenly). 0/1 = single device.",
    )
    parser_sample_slices.add_argument(
        "-h", "--help", action="help", help=argparse.SUPPRESS
    )
    parser_register = subparsers.add_parser(
        "register",
        help="motion-correct slices with SVoRT / rigid registration",
        description="motion-correct slices with SVoRT / rigid registration",
        parents=[
            build_parser_inputs(input_stacks="required"),
            build_parser_outputs(output_slices="required"),
            parser_svort,
            parser_common,
        ],
        formatter_class=FormatterMetavar,
        add_help=False,
    )
    parser_register.add_argument("-h", "--help", action="help", help=argparse.SUPPRESS)
    return parser


def main(argv=None) -> None:
    import os

    from .._precision import ensure_f32_matmul_semantics

    ensure_f32_matmul_semantics()
    if os.environ.get("NESVOR_TPU_COORDINATOR"):
        # multi-host launch: one CLI process per host (see parallel/dp.py);
        # run with --dp-devices = global device count
        from ..parallel.dp import init_multihost

        init_multihost()
    parser = build_main_parser()
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) == 0:
        parser.print_help(sys.stdout)
        return
    args = parser.parse_args(argv)
    if args.seed is not None:
        np.random.seed(args.seed)
        random.seed(args.seed)

    setup_logger(args.output_log, args.verbose)

    from . import commands

    command_class = "".join(string.capwords(w) for w in args.command.split("-"))
    getattr(commands, command_class)(args).main()


if __name__ == "__main__":
    main()
