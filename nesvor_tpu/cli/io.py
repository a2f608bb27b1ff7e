"""Arg-driven I/O (rebuild of reference nesvor/cli/io.py:9-59).

Checkpoints carry {model: {params, cfg, bounding_box}, mask, args} — the
payload semantics of the reference's torch.save (reference cli/io.py:38-46),
loadable without a device. The on-disk format is a **non-executable**
npz + JSON manifest (save path always writes it): loading never runs
arbitrary code, unlike torch.load / pickle. Legacy pickle checkpoints from
earlier rounds are still readable, but only behind the explicit
``--allow-pickle-model`` flag (loading a pickle executes code from the
file — only enable it for files you created yourself).
"""

from __future__ import annotations

import json
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


def _flatten_arrays(tree, arrays: Dict[str, np.ndarray]):
    """Recursively split a params pytree (nested dict/list/tuple of arrays
    and JSON scalars) into npz-able arrays plus a JSON structure template.
    The structure lives in the manifest; array leaves are referenced by
    sequential npz keys, so no path-encoding collisions are possible."""
    if isinstance(tree, dict):
        return {"t": "d", "k": {str(k): _flatten_arrays(v, arrays) for k, v in tree.items()}}
    if isinstance(tree, (list, tuple)):
        return {
            "t": "l" if isinstance(tree, list) else "u",
            "v": [_flatten_arrays(v, arrays) for v in tree],
        }
    if isinstance(tree, (np.ndarray, jnp.ndarray)):
        key = f"a{len(arrays)}"
        arrays[key] = np.asarray(tree)
        return {"t": "a", "key": key}
    if tree is None or isinstance(tree, (bool, int, float, str)):
        return {"t": "j", "v": tree}
    # numpy scalars etc.
    return {"t": "j", "v": np.asarray(tree).item()}


def _unflatten_arrays(struct, arrays):
    t = struct["t"]
    if t == "d":
        return {k: _unflatten_arrays(v, arrays) for k, v in struct["k"].items()}
    if t == "l":
        return [_unflatten_arrays(v, arrays) for v in struct["v"]]
    if t == "u":
        return tuple(_unflatten_arrays(v, arrays) for v in struct["v"])
    if t == "a":
        return arrays[struct["key"]]
    return struct["v"]


def _json_safe(obj):
    """args values that survive a JSON round trip; the rest stringified."""
    try:
        json.dumps(obj)
        return obj
    except (TypeError, ValueError):
        return str(obj)


_NPZ_FORMAT = "nesvor_tpu-model-npz-v1"


def save_model(path: str, model: INRModel, mask: Volume, args: Namespace) -> None:
    cfg_dict = asdict(model.cfg)
    cfg_dict["compute_dtype"] = np.dtype(model.cfg.compute_dtype).name
    arrays: Dict[str, np.ndarray] = {}
    params_struct = _flatten_arrays(_to_numpy(model.params), arrays)
    manifest = {
        "format": _NPZ_FORMAT,
        "cfg": cfg_dict,
        "params_struct": params_struct,
        "mask_resolution": [
            float(mask.resolution_x),
            float(mask.resolution_y),
            float(mask.resolution_z),
        ],
        "args": {
            k: _json_safe(v) for k, v in vars(args).items() if k != "device"
        },
    }
    arrays["bounding_box"] = np.asarray(model.bounding_box)
    arrays["mask_image"] = np.asarray(mask.image)
    arrays["mask_mask"] = np.asarray(mask.mask)
    arrays["mask_axisangle"] = np.asarray(mask.transformation.axisangle())
    arrays["__manifest__"] = np.frombuffer(
        json.dumps(manifest).encode("utf-8"), np.uint8
    )
    # np.savez appends ".npz" to bare paths but honors file objects — the
    # checkpoint lands exactly at the user's path regardless of extension
    with open(path, "wb") as f:
        np.savez(f, **arrays)


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


def _load_payload(path: str, args: Namespace) -> Dict:
    """Read a checkpoint into the {model, mask, args} payload dict.

    npz (the current format) is detected by the zip magic; anything else is
    treated as a legacy pickle and refused unless ``--allow-pickle-model``
    is set (unpickling executes code embedded in the file)."""
    with open(path, "rb") as f:
        magic = f.read(4)
    if magic[:2] == b"PK":  # npz = zip archive
        with np.load(path, allow_pickle=False) as data:
            manifest = json.loads(bytes(data["__manifest__"]).decode("utf-8"))
            if manifest.get("format") != _NPZ_FORMAT:
                raise ValueError(
                    f"{path}: unknown checkpoint format "
                    f"{manifest.get('format')!r}"
                )
            arrays = {k: data[k] for k in data.files if k != "__manifest__"}
        return {
            "model": {
                "params": _unflatten_arrays(manifest["params_struct"], arrays),
                "cfg": manifest["cfg"],
                "bounding_box": arrays["bounding_box"],
            },
            "mask": {
                "image": arrays["mask_image"],
                "mask": arrays["mask_mask"],
                "axisangle": arrays["mask_axisangle"],
                "resolution": manifest["mask_resolution"],
            },
            "args": manifest["args"],
        }
    if not getattr(args, "allow_pickle_model", False):
        raise ValueError(
            f"{path} is a legacy pickle checkpoint; loading it executes "
            "code from the file. Re-run with --allow-pickle-model if you "
            "created this file yourself (it will be re-saved in the safe "
            "npz format by any command with --output-model)."
        )
    with open(path, "rb") as f:
        return pickle.load(f)


def load_model(path: str, args: Namespace) -> Tuple[INRModel, Volume, Namespace]:
    cp = _load_payload(path, args)
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
