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
    np.savez(out_path, **params)
    return {k: jnp.asarray(v) for k, v in params.items()}


def load_converted(path: str) -> Dict[str, jnp.ndarray]:
    """Load a converted/trained .npz params dict. Checkpoints may be stored
    f16 to halve their size (svort/train.py save_params); compute runs f32,
    so upcast on load."""
    data = np.load(path)
    return {
        k: jnp.asarray(
            data[k].astype(np.float32)
            if data[k].dtype == np.float16
            else data[k]
        )
        for k in data.files
    }


if __name__ == "__main__":
    convert_torch_checkpoint(sys.argv[1], sys.argv[2])
    print("converted.")
