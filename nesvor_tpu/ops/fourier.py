"""Fourier-feature INR encoding — the gather-free TPU-native option.

Third encoder behind ``INRConfig.encoder`` (alongside "hash" and
"cellhash", see ops/hash_grid.py, ops/cell_grid.py). Replaces tiny-cuda-nn's
HashGrid (reference nesvor/nesvor/models.py:22-41) not structurally but
functionally: random-access table lookups are the one primitive this TPU
stack executes far from speed-of-light (XLA gather ~5-7 ns/row; tiny-cuda-nn
~0.08 ns/row out of L2 on A100 — PERF.md), while dense matmuls run at
hundreds of TFLOP/s on the MXU. Random Fourier features (Tancik et al. 2020,
"Fourier Features Let Networks Learn High Frequency Functions") turn the
encoding into two small matmuls + sin/cos — zero gathers in either pass —
at the cost of a wider density MLP (still MXU-friendly).

Band placement mirrors the hash grid exactly: one frequency octave per grid
level, f_l = level_resolution_l / 2 cycles per normalized unit (a trilinear
grid with r cells per axis represents ~r/2 cycles), with ``n_dirs`` fixed
random unit directions per level. Features are ordered low -> high frequency
in per-level blocks so the bias-field head's "first n_levels_bias levels"
semantics (reference models.py:248-258) carry over unchanged.

Phases are computed in f32 regardless of compute dtype: at the finest level
(~100 cycles/unit) a bf16 coordinate error of 0.4% is ~2.5 rad of phase.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def init_fourier_basis(
    key: jax.Array,
    level_resolutions: Sequence[int],
    n_dirs: int,
) -> jnp.ndarray:
    """(3, L * n_dirs) frequency matrix: per level, ``n_dirs`` random unit
    directions scaled by 2*pi*f_l with f_l = res_l / 2. Fixed (non-trainable)
    at init, like the hash function of the grid encoders."""
    cols = []
    for res in level_resolutions:
        key, sub = jax.random.split(key)
        d = jax.random.normal(sub, (3, n_dirs), jnp.float32)
        d = d / jnp.linalg.norm(d, axis=0, keepdims=True)
        cols.append(d * (2 * math.pi * res / 2.0))
    return jnp.concatenate(cols, axis=1)


def fourier_encode(
    basis: jnp.ndarray,
    x: jnp.ndarray,
    n_dirs: int,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Encode points ``x`` (N, 3) in [0,1]^3 -> (N, L * 2 * n_dirs).

    Per-level feature block: [sin(x B_l), cos(x B_l)]."""
    ang = jnp.dot(
        x.astype(jnp.float32), basis, preferred_element_type=jnp.float32
    )  # (N, L*D)
    L = basis.shape[1] // n_dirs
    outs = []
    for l in range(L):
        a = ang[:, l * n_dirs : (l + 1) * n_dirs]
        outs.append(jnp.sin(a))
        outs.append(jnp.cos(a))
    return jnp.concatenate(outs, axis=1).astype(compute_dtype)
