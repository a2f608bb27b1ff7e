"""Multiresolution hash-grid encoding (TPU replacement for tiny-cuda-nn).

The reference imports NVlabs tiny-cuda-nn (`tcnn.Encoding(otype="HashGrid")`,
reference nesvor/nesvor/models.py:22-41,102-111). This module implements the
same multiresolution spatial-hash encoding (Instant-NGP, Müller et al. 2022)
natively for XLA/TPU:

  * per level: scale coords by the level resolution, gather the 8 corner
    feature vectors (dense indexing when the level grid fits in the table,
    spatial hash with the standard primes otherwise), trilinearly interpolate,
    concatenate across levels.
  * gradients w.r.t. the feature table lower to XLA scatter-add —
    deterministic, unlike tiny-cuda-nn's atomicAdd accumulation.
  * the level loop is unrolled at trace time (dense-vs-hash is a static
    per-level choice), so XLA sees one fused gather/FMA graph.

Table layout: (n_levels, table_size, n_features). Level resolutions are
computed host-side (they are data-dependent via the bounding box — reference
nesvor/nesvor/models.py:78-101 — and must be static under jit).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Instant-NGP spatial-hash primes (pi1 = 1 keeps x-major locality)
_PRIMES = (1, 2654435761, 805459861)


def compute_level_resolutions(
    base_resolution: int, level_scale: float, n_levels: int
) -> Tuple[int, ...]:
    """N_l = floor(base * scale^l) — the Instant-NGP growth schedule."""
    return tuple(
        int(np.floor(base_resolution * level_scale**l)) for l in range(n_levels)
    )


def init_hash_table(
    key: jax.Array,
    n_levels: int,
    table_size: int,
    n_features: int,
    dtype=jnp.float32,
    scale: float = 1e-4,
) -> jnp.ndarray:
    """Uniform(-1e-4, 1e-4) init, as in Instant-NGP / tiny-cuda-nn."""
    return jax.random.uniform(
        key, (n_levels, table_size, n_features), dtype, minval=-scale, maxval=scale
    )


def _corner_indices(coord: jnp.ndarray, res: int, table_size: int) -> jnp.ndarray:
    """Map integer grid coords (N, 3) to table indices for one level."""
    n_grid = res + 1
    if n_grid**3 <= table_size:
        # dense indexing: the level grid fits entirely in the table
        return (
            coord[:, 0] + n_grid * (coord[:, 1] + n_grid * coord[:, 2])
        ).astype(jnp.uint32) % jnp.uint32(table_size)
    c = coord.astype(jnp.uint32)
    h = (
        c[:, 0] * jnp.uint32(_PRIMES[0])
        ^ c[:, 1] * jnp.uint32(_PRIMES[1])
        ^ c[:, 2] * jnp.uint32(_PRIMES[2])
    )
    return h % jnp.uint32(table_size)


@partial(jax.jit, static_argnames=("level_resolutions",))
def hash_encode(
    table: jnp.ndarray,
    x: jnp.ndarray,
    level_resolutions: Tuple[int, ...],
) -> jnp.ndarray:
    """Encode points ``x`` (N, 3) in [0, 1]^3 -> features (N, L*F).

    ``table`` is (L, T, F); ``level_resolutions`` a static tuple of ints.
    """
    L, T, F = table.shape
    assert len(level_resolutions) == L
    N = x.shape[0]
    outs = []
    for l, res in enumerate(level_resolutions):
        pos = x * res
        p0 = jnp.floor(pos)
        frac = (pos - p0).astype(table.dtype)
        p0 = jnp.clip(p0.astype(jnp.int32), 0, res)
        tab_l = table[l]
        feat = jnp.zeros((N, F), dtype=table.dtype)
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    coord = jnp.stack(
                        [
                            jnp.minimum(p0[:, 0] + dx, res),
                            jnp.minimum(p0[:, 1] + dy, res),
                            jnp.minimum(p0[:, 2] + dz, res),
                        ],
                        -1,
                    )
                    idx = _corner_indices(coord, res, T)
                    w = (
                        (frac[:, 0] if dx else 1 - frac[:, 0])
                        * (frac[:, 1] if dy else 1 - frac[:, 1])
                        * (frac[:, 2] if dz else 1 - frac[:, 2])
                    )
                    feat = feat + w[:, None] * jnp.take(tab_l, idx, axis=0)
        outs.append(feat)
    return jnp.concatenate(outs, axis=-1)
