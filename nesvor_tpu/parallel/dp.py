"""Data-parallel training over a JAX device mesh.

The reference is strictly single-GPU (SURVEY.md §2.3: no torch.distributed
anywhere; device hard-coded at reference cli/main.py:425). This module adds
the one parallelism strategy that pays for NeSVoR's model size (~tens of MB
of hash table): **data parallelism over the pixel-batch axis** with
replicated parameters and gradient all-reduce over ICI.

Design: ``shard_map`` over a 1-D ``Mesh(("dp",))``. The pixel bag is
sharded along axis 0; each device draws its per-device batch from its local
shard, computes gradients, and ``lax.pmean`` reduces them (lowers to a
psum over ICI). The optax update then runs replicated. The same code path
scales from the 8-virtual-device CPU test mesh to a real multi-chip slice —
multi-host would only add ``jax.distributed.initialize``.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..nesvor.models import NeSVoRConfig, nesvor_loss


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    import numpy as np

    return Mesh(np.asarray(devices), ("dp",))


def shard_pixel_bag(data: Dict[str, jnp.ndarray], mesh: Mesh) -> Dict[str, jnp.ndarray]:
    """Pad the pixel bag to a multiple of the mesh size and shard axis 0."""
    n_dev = mesh.devices.size
    out = {}
    n = data["v"].shape[0]
    pad = (-n) % n_dev
    sharding = NamedSharding(mesh, P("dp"))
    for k, v in data.items():
        if pad:
            v = jnp.concatenate([v, v[:pad]], 0)
        out[k] = jax.device_put(v, sharding)
    return out


def make_dp_train_step(
    cfg: NeSVoRConfig,
    bounding_box,
    loss_weights: Dict[str, float],
    tx,
    batch_size: int,
    n_pixels_local: int,
    mesh: Mesh,
):
    """Returns a jitted sharded train step: (params, opt_state, consts,
    data_sharded, key) -> (params, opt_state, losses). Params/opt state are
    replicated; gradients are pmean-reduced across ``dp``."""
    n_dev = mesh.devices.size
    per_device_batch = batch_size // n_dev
    assert per_device_batch > 0

    def loss_fn(params, consts, batch, key):
        losses = nesvor_loss(params, consts, cfg, bounding_box, batch, key)
        total = 0.0
        for k, w in loss_weights.items():
            if k in losses and w:
                total = total + w * losses[k]
        return total, losses

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P("dp"), P()),
        out_specs=(P(), P(), P()),
        # the cellhash backward contains a pallas_call, whose output avals
        # carry no varying-mesh-axes info; skip the vma check
        check_vma=False,
    )
    def step(params, opt_state, consts, data, key):
        dev = jax.lax.axis_index("dp")
        key = jax.random.fold_in(key, dev)
        k_batch, k_mc = jax.random.split(key)
        idx = jax.random.randint(
            k_batch, (per_device_batch,), 0, data["v"].shape[0]
        )
        batch = {
            "xyz": data["xyz"][idx],
            "v": data["v"][idx],
            "slice_idx": data["slice_idx"][idx],
        }
        grads, losses = jax.grad(loss_fn, has_aux=True)(params, consts, batch, k_mc)
        grads = jax.lax.pmean(grads, "dp")
        losses = jax.lax.pmean(losses, "dp")
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, losses

    return jax.jit(step)
