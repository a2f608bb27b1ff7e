"""Torch -> JAX SVoRT checkpoint conversion.

The reference fetches pretrained torch state dicts from Zenodo
(reference nesvor/svort/inference.py:565-591). This build keeps its SVoRT
parameters in a flat dict keyed by the *same* torch state_dict names
(attention.py layer convention), so conversion is a pure re-serialization:
every tensor is stored as-is (conv OIHW, linear (out, in)).

Usage (requires a locally downloaded checkpoint — this environment has no
network egress):

    python -m nesvor_tpu.svort.convert SVoRT_v1.pt v1
"""

from __future__ import annotations

import os
import sys
from typing import Dict

import jax.numpy as jnp
import numpy as np

from .. import __checkpoint_dir


def convert_torch_checkpoint(path: str, version: str) -> Dict[str, jnp.ndarray]:
    """Load a torch SVoRT checkpoint and return (and cache) the flat JAX
    param dict."""
    import torch

    cp = torch.load(path, map_location="cpu", weights_only=False)
    state = cp["model"] if isinstance(cp, dict) and "model" in cp else cp
    params = {}
    for k, v in state.items():
        arr = np.asarray(v.detach().cpu().numpy())
        params[k] = arr
    out_path = os.path.join(__checkpoint_dir, f"SVoRT_{version}.npz")
    os.makedirs(__checkpoint_dir, exist_ok=True)
    # reference Zenodo checkpoints train with 0.8 mm SRR working volumes
    # (reference svort/inference.py parse args); record it so the inference
    # layer can warn when running them at a different working resolution
    np.savez(out_path, **params, __train_res_recon__=np.float32(0.8))
    return {k: jnp.asarray(v) for k, v in params.items()}


_RESERVED_KEYS = ("__train_res_recon__",)


def load_converted(path: str) -> Dict[str, jnp.ndarray]:
    """Load a converted/trained .npz params dict. Checkpoints may be stored
    f16 to halve their size (svort/train.py save_params); compute runs f32,
    so upcast on load. Converted reference checkpoints carry
    ``__train_res_recon__`` metadata: if it disagrees with the active
    working resolution (``NESVOR_TPU_SVORT_RES_RECON``, default 1.0), warn
    about the train/test mismatch and how to restore reference behavior."""
    import logging

    data = np.load(path)
    if "__train_res_recon__" in data.files:
        from .inference import _RES_RECON_MM

        train_res = float(data["__train_res_recon__"])
        if abs(train_res - _RES_RECON_MM) > 1e-6:
            logging.warning(
                "SVoRT checkpoint %s was trained with %.2f mm working "
                "volumes but inference is configured for %.2f mm "
                "(train/test mismatch). Set NESVOR_TPU_SVORT_RES_RECON=%g "
                "to match the checkpoint.",
                path, train_res, _RES_RECON_MM, train_res,
            )
    return {
        k: jnp.asarray(
            data[k].astype(np.float32)
            if data[k].dtype == np.float16
            else data[k]
        )
        for k in data.files
        if k not in _RESERVED_KEYS
    }


if __name__ == "__main__":
    convert_torch_checkpoint(sys.argv[1], sys.argv[2])
    print("converted.")
