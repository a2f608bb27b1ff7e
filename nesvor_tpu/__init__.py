"""nesvor_tpu: TPU-native neural slice-to-volume reconstruction.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of NeSVoR
(reference: daviddmc/NeSVoR): SVoRT transformer slice registration,
classical rigid registration, implicit-neural-representation volume
reconstruction with joint slice-pose / scale / bias-field / variance
optimization, and volume/slice sampling — exposed through the same
four-command CLI (reconstruct, register, sample-volume, sample-slices).

Layout mirrors the reference's layer map (see SURVEY.md §1) but the
implementation is TPU-first: pure-functional models, one jit-compiled
train step, Pallas kernels for the hash-grid encoder and PSF projector,
and deterministic segment-sum scatter in place of CUDA atomics.
"""

import os

import jax

from .version import __version__

# f32 must mean f32. This TPU stack runs XLA with
# --xla_allow_excess_precision=true, under which an unannotated f32
# dot/einsum/conv is lowered as a SINGLE bf16 MXU pass (~0.4% error).
# That silently corrupts geometry (rigid-transform point matmuls: ~0.4-voxel
# position error) and the Fourier encoder's phases (2.5 rad at the finest
# octave — measured catastrophic PSNR loss). Making 3-pass ("highest") the
# default restores f32 semantics for every dot that does not opt out;
# the hot-path MLP/encoder matmuls cast to bf16 explicitly and are
# unaffected (bf16 inputs are a single MXU pass at any precision setting).
jax.config.update("jax_default_matmul_precision", "highest")

# Pretrained SVoRT checkpoint registry (reference: nesvor/__init__.py:1-9).
# The reference downloads torch state dicts from Zenodo; this build converts
# them to JAX pytrees when a local copy is available (no-egress environments
# cannot download).
__checkpoint_dir = os.path.join(os.path.dirname(__file__), "checkpoints")
__pretrained_svort = {
    "v1": "https://zenodo.org/record/7486938/files/checkpoint.pt?download=1",
    "v2": "https://zenodo.org/record/7486938/files/checkpoint_v2.pt?download=1",
}
