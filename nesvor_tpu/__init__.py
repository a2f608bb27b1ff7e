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

from ._precision import ensure_f32_matmul_semantics  # noqa: F401
from .version import __version__

# f32 must mean f32 on this stack — but mutating global JAX config on import
# would leak into any application that merely imports the package, so the
# setting is applied from the entry points (CLI main / train / sample /
# svort_predict) via ensure_f32_matmul_semantics(); see _precision.py for
# the measured rationale.

# Pretrained SVoRT checkpoint registry (reference: nesvor/__init__.py:1-9).
# The reference downloads torch state dicts from Zenodo; this build converts
# them to JAX pytrees when a local copy is available (no-egress environments
# cannot download).
__checkpoint_dir = os.path.join(os.path.dirname(__file__), "checkpoints")
__pretrained_svort = {
    "v1": "https://zenodo.org/record/7486938/files/checkpoint.pt?download=1",
    "v2": "https://zenodo.org/record/7486938/files/checkpoint_v2.pt?download=1",
}
