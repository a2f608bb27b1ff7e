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
scales from the 8-virtual-device CPU test mesh to a real multi-chip slice.

Multi-host: ``init_multihost()`` wires ``jax.distributed.initialize`` (one
process per host; coordinator via args or NESVOR_TPU_COORDINATOR /
NESVOR_TPU_NUM_PROCESSES / NESVOR_TPU_PROCESS_ID env); after that
``make_mesh()`` spans the global device set and ``shard_pixel_bag``
distributes each process's identically-loaded pixel bag so every host
materializes only its addressable rows. Gradient pmean then rides ICI
within a host slice and DCN across hosts — same program, no code change.
Exercised by a real 2-process CPU launch in tests/test_parallel.py.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..nesvor.models import NeSVoRConfig


def init_multihost(
    coordinator_address=None, num_processes=None, process_id=None
) -> None:
    """Join (or start) a multi-process JAX cluster.

    One call per host process, before any backend use. Arguments fall back
    to NESVOR_TPU_COORDINATOR / NESVOR_TPU_NUM_PROCESSES /
    NESVOR_TPU_PROCESS_ID, and from there to jax.distributed's own
    auto-detection (cloud TPU metadata). Idempotent."""
    import os

    from jax._src import distributed as _dist

    if _dist.global_state.client is not None:  # already initialized
        return
    coordinator_address = coordinator_address or os.environ.get(
        "NESVOR_TPU_COORDINATOR"
    )
    if num_processes is None and os.environ.get("NESVOR_TPU_NUM_PROCESSES"):
        num_processes = int(os.environ["NESVOR_TPU_NUM_PROCESSES"])
    if process_id is None and os.environ.get("NESVOR_TPU_PROCESS_ID"):
        process_id = int(os.environ["NESVOR_TPU_PROCESS_ID"])
    jax.distributed.initialize(coordinator_address, num_processes, process_id)


def barrier(name: str, timeout_s: float = 600.0) -> None:
    """Block until every process in the cluster reaches this barrier.

    Runs over the jax.distributed coordination service (gRPC to the
    coordinator), whose timeout we control — unlike the Gloo CPU-collective
    context bootstrap, whose key-value rendezvous has a hardcoded ~30 s
    timeout inside XLA. On a loaded host, per-process compile-time skew
    easily exceeds 30 s, so the first collective *execution* must be
    preceded by an explicit barrier: AOT-compile the program in every
    process, ``barrier()``, then execute — all processes then enter the
    Gloo bootstrap within milliseconds of each other. No-op when
    single-process."""
    from jax._src import distributed as _dist

    client = _dist.global_state.client
    if client is None or jax.process_count() < 2:
        return
    client.wait_at_barrier(name, int(timeout_s * 1000))


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    import numpy as np

    return Mesh(np.asarray(devices), ("dp",))


def shard_pixel_bag(data: Dict[str, jnp.ndarray], mesh: Mesh) -> Dict[str, jnp.ndarray]:
    """Pad the pixel bag to a multiple of the mesh size and shard axis 0.

    Works single- and multi-process: every process passes the same full
    bag (all hosts load the same NIfTI inputs); under multi-process each
    host materializes on device only the rows its addressable shards own."""
    n_dev = mesh.devices.size
    out = {}
    n = data["v"].shape[0]
    pad = (-n) % n_dev
    sharding = NamedSharding(mesh, P("dp"))
    multiprocess = jax.process_count() > 1
    import numpy as np

    for k, v in data.items():
        if pad:
            v = jnp.concatenate([v, v[:pad]], 0)
        if multiprocess:
            host = np.asarray(v)
            out[k] = jax.make_array_from_callback(
                host.shape, sharding, lambda idx, host=host: host[idx]
            )
        else:
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
            params, opt_state, consts, data, key, 0, 1
        )
        return params, opt_state, dict(zip(names, stack[:, -1]))

    return step
