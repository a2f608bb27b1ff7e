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

from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..nesvor.models import NeSVoRConfig


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
    """Jitted sharded train step: (params, opt_state, consts, data_sharded,
    key) -> (params, opt_state, losses). Thin wrapper over the integrated
    ``train.make_train_step(mesh=...)`` path (the one ``train()`` itself uses
    with --dp-devices), specialized to a single step per dispatch."""
    from ..nesvor.train import make_train_step

    run_chunk = make_train_step(
        cfg, bounding_box, loss_weights, tx, batch_size, n_pixels_local, mesh=mesh
    )

    def step(params, opt_state, consts, data, key):
        params, opt_state, names, stack = run_chunk(
            params, opt_state, consts, data, key, 1
        )
        return params, opt_state, dict(zip(names, stack[:, -1]))

    return step
