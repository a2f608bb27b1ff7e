"""Arg-driven I/O (rebuild of reference nesvor/cli/io.py:9-59).

Checkpoints are pickled dicts of numpy arrays ({model: {params, cfg,
bounding_box}, mask, args}) — the JAX equivalent of the reference's
torch.save payload (reference cli/io.py:38-46), loadable without a device.
"""

from __future__ import annotations

import pickle
from argparse import Namespace
from dataclasses import asdict
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..image import Volume, load_slices, load_stack, save_slices
from ..nesvor.models import INRConfig
from ..nesvor.train import INRModel
from ..transform import RigidTransform
from ..utils import merge_args


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _to_jax(tree):
    return jax.tree_util.tree_map(lambda x: jnp.asarray(x), tree)


def save_model(path: str, model: INRModel, mask: Volume, args: Namespace) -> None:
    cfg_dict = asdict(model.cfg)
    cfg_dict["compute_dtype"] = np.dtype(model.cfg.compute_dtype).name
    payload = {
        "model": {
            "params": _to_numpy(model.params),
            "cfg": cfg_dict,
            "bounding_box": np.asarray(model.bounding_box),
        },
        "mask": {
            "image": np.asarray(mask.image),
            "mask": np.asarray(mask.mask),
            "axisangle": np.asarray(mask.transformation.axisangle()),
            "resolution": [mask.resolution_x, mask.resolution_y, mask.resolution_z],
        },
        "args": {k: v for k, v in vars(args).items() if k != "device"},
    }
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def _migrate_fourier_layout(params: Dict, cfg_dict: Dict) -> Dict:
    """Permute a pre-``feature_layout`` fourier checkpoint's density-net
    input layer from the old per-level [sin_l|cos_l] block order to the
    current [sin|cos] halves order (ops/fourier.py). Only the first layer
    consumes the encoding, so this permutation is the whole migration."""
    L, D = int(cfg_dict["n_levels"]), int(cfg_dict.get("fourier_dirs", 8))
    old_row = np.empty(2 * L * D, dtype=np.int64)
    for j in range(L * D):
        old_row[j] = (j // D) * 2 * D + (j % D)  # sin half
        old_row[L * D + j] = (j // D) * 2 * D + D + (j % D)  # cos half
    params = dict(params)
    net = dict(params["density_net"])
    layers = list(net["layers"])
    l0 = dict(layers[0])
    l0["w"] = np.asarray(l0["w"])[old_row]
    layers[0] = l0
    net["layers"] = layers
    params["density_net"] = net
    return params


def load_model(path: str, args: Namespace) -> Tuple[INRModel, Volume, Namespace]:
    with open(path, "rb") as f:
        cp = pickle.load(f)
    cfg_dict = dict(cp["model"]["cfg"])
    cfg_dict["compute_dtype"] = {
        "bfloat16": jnp.bfloat16,
        "float32": jnp.float32,
        "float16": jnp.float16,
    }[str(cfg_dict["compute_dtype"])]
    cfg_dict["level_resolutions"] = tuple(cfg_dict["level_resolutions"])
    params = cp["model"]["params"]
    if cfg_dict.get("encoder") == "fourier" and "feature_layout" not in cfg_dict:
        params = _migrate_fourier_layout(params, cfg_dict)
    cfg = INRConfig(**cfg_dict)
    model = INRModel(
        params=_to_jax(params),
        cfg=cfg,
        bounding_box=jnp.asarray(cp["model"]["bounding_box"]),
    )
    m = cp["mask"]
    mask = Volume(
        jnp.asarray(m["image"]),
        jnp.asarray(m["mask"]),
        RigidTransform(jnp.asarray(m["axisangle"])),
        *m["resolution"],
    )
    args = merge_args(Namespace(**cp["args"]), args)
    return model, mask, args


def inputs(args: Namespace) -> Tuple[Dict[str, Any], Namespace]:
    """Load stacks / slice folders / model checkpoint per args
    (reference cli/io.py:9-30)."""
    input_dict: Dict[str, Any] = dict()
    if getattr(args, "input_stacks", None) is not None:
        input_dict["input_stacks"] = []
        for i, f in enumerate(args.input_stacks):
            stack = load_stack(
                f,
                args.stack_masks[i] if getattr(args, "stack_masks", None) else None,
            )
            if getattr(args, "thicknesses", None) is not None:
                stack.thickness = args.thicknesses[i]
            input_dict["input_stacks"].append(stack)
    if getattr(args, "input_slices", None) is not None:
        input_dict["input_slices"] = load_slices(args.input_slices)
    if getattr(args, "input_model", None) is not None:
        model, mask, args = load_model(args.input_model, args)
        input_dict["model"] = model
        input_dict["mask"] = mask
    return input_dict, args


def outputs(data: Dict, args: Namespace) -> None:
    """Save volume / model / slices / simulated slices per args
    (reference cli/io.py:33-50)."""
    if getattr(args, "output_volume", None) and "output_volume" in data:
        if getattr(args, "output_intensity_mean", None):
            data["output_volume"].rescale(args.output_intensity_mean)
        data["output_volume"].save(args.output_volume)
    if getattr(args, "output_model", None) and "output_model" in data:
        save_model(args.output_model, data["output_model"], data["mask"], args)
    if getattr(args, "output_slices", None) and "output_slices" in data:
        save_slices(args.output_slices, data["output_slices"])
    if getattr(args, "simulated_slices", None) and "simulated_slices" in data:
        save_slices(args.simulated_slices, data["simulated_slices"])
