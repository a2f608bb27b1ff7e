"""CLI surface parity guard: every reference flag must stay accepted.

The reference parser surface (nesvor/cli/main.py:27-326) is the compat
contract for users switching toolkits (MIGRATION.md); this test pins the
full flag list per subcommand so a refactor cannot silently drop one.
"""

from nesvor_tpu.cli.main import build_main_parser

# reference flags by subcommand (reference nesvor/cli/main.py:340-416)
COMMON = {"--verbose", "--output-log", "--seed", "--debug"}
TRAINING = {
    "--n-features-per-level", "--log2-hashmap-size", "--level-scale",
    "--coarsest-resolution", "--finest-resolution", "--n-levels-bias",
    "--depth", "--width", "--n-features-z", "--n-features-slice",
    "--no-transformation-optimization", "--no-slice-scale",
    "--no-pixel-variance", "--no-slice-variance", "--single-precision",
    "--weight-transformation", "--weight-bias", "--image-regularization",
    "--weight-image", "--delta", "--learning-rate", "--gamma",
    "--milestones", "--n-iter", "--batch-size", "--n-samples",
}
REFERENCE_FLAGS = {
    "reconstruct": TRAINING | COMMON | {
        "--input-stacks", "--thicknesses", "--stack-masks", "--input-slices",
        "--output-volume", "--output-resolution", "--output-intensity-mean",
        "--inference-batch-size", "--n-inference-samples", "--no-output-psf",
        "--output-model", "--output-slices", "--simulated-slices",
        "--mask-threshold", "--registration", "--svort-version",
    },
    "register": COMMON | {
        "--input-stacks", "--thicknesses", "--stack-masks",
        "--output-slices", "--registration", "--svort-version",
    },
    "sample-volume": COMMON | {
        "--input-model", "--output-volume", "--output-resolution",
        "--output-intensity-mean", "--inference-batch-size",
        "--n-inference-samples", "--no-output-psf", "--mask-threshold",
    },
    # NOTE: the reference's sample-slices exposes no inference flags either
    # (reference cli/main.py:387-398 builds outputs with simulate_slices
    # only); values come from stored checkpoint args + derived defaults
    "sample-slices": COMMON | {
        "--input-model", "--input-slices", "--simulated-slices",
    },
}


def _flags_of(parser):
    out = set()
    for action in parser._actions:
        out.update(o for o in action.option_strings if o.startswith("--"))
    return out


def test_reference_flags_accepted():
    parser = build_main_parser()
    sub = next(
        a for a in parser._actions
        if a.__class__.__name__ == "_SubParsersAction"
    )
    for cmd, want in REFERENCE_FLAGS.items():
        have = _flags_of(sub.choices[cmd])
        missing = want - have
        assert not missing, f"{cmd} lost reference flags: {sorted(missing)}"


def test_default_config_is_benchmarked_flagship():
    """The out-of-the-box `nesvor reconstruct` config must be the config
    bench.py measures (VERDICT r02 #3): gather-free fourier encoder with a
    256x3 density MLP, decoupled 64x1 sigma/bias heads, and the 100-iter
    variance-head LR warmup. Grid encoders keep reference sizing via the
    width/depth=0 auto rule."""
    from nesvor_tpu.nesvor.models import build_inr_config

    parser = build_main_parser()
    args = parser.parse_args(
        ["reconstruct", "--input-stacks", "x.nii", "--output-volume", "y.nii"]
    )
    assert args.encoder == "fourier"
    assert args.head_width == 64 and args.head_depth == 1
    assert args.var_warmup_iters == 100

    bbox = [[0.0, 0.0, 0.0], [64.0, 64.0, 64.0]]
    cfg = build_inr_config(bbox, args)
    assert cfg.width == 256 and cfg.depth == 3

    args.encoder = "cellhash"
    cfg = build_inr_config(bbox, args)
    assert cfg.width == 64 and cfg.depth == 1
