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
random unit directions per level.

Feature layout: ``[sin(x B) | cos(x B)]`` — two full-width halves, levels
ascending (low -> high frequency) within each half. An earlier revision
emitted per-level ``[sin_l | cos_l]`` blocks via a 2L-piece concatenate;
profiling the train step showed XLA lowering that concat as 2L sequential
(N, n_dirs)-sliver fusions costing ~5 ms/step at the bench batch (1M
points), plus two more awkward multi-output fusions in the backward. The
two-half layout is a single well-tiled elementwise pair; the bias-field
head's "first n_levels_bias levels" selection (reference models.py:248-258)
is layout-aware (see models.bias_features).

Phases are computed in f32 regardless of compute dtype: at the finest level
(~100 cycles/unit) a bf16 coordinate error of 0.4% is ~2.5 rad of phase.
"""

from __future__ import annotations

import math
from functools import partial
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

    Layout: ``[sin(ang) | cos(ang)]`` with ang = x @ basis (levels ascending
    within each half). ``n_dirs`` is unused here (kept for call-site clarity
    and so the signature states the layout contract)."""
    del n_dirs
    return _encode(basis, x, jnp.dtype(compute_dtype))


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _encode(basis, x, out_dtype):
    ang = jnp.dot(
        x.astype(jnp.float32), basis, preferred_element_type=jnp.float32
    )  # (N, L*D) — phases in f32 (see module docstring)
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=1).astype(
        out_dtype
    )


def _encode_fwd(basis, x, out_dtype):
    pe = _encode(basis, x, out_dtype)
    # sin/cos are each other's derivatives: the rounded output itself is the
    # only residual. XLA's native vjp instead saves BOTH halves in f32 and
    # re-converts them for the MLP (profiled at ~4.5 ms/step extra HBM
    # traffic at the 1M-point bench batch); gradient math in compute dtype
    # loses only ~0.4% relative on an already-noisy gradient.
    return pe, (basis, pe)


def _encode_bwd(out_dtype, res, g):
    basis, pe = res
    H = basis.shape[1]
    d_ang = g[..., :H] * pe[..., H:] - g[..., H:] * pe[..., :H]
    dx = jnp.dot(
        d_ang,
        basis.T.astype(out_dtype),
        preferred_element_type=jnp.float32,
    )
    return jnp.zeros_like(basis), dx.astype(jnp.float32)


# x is differentiable (pose gradients flow through the encoding); the basis
# is frozen (stop_gradient at the call site) so its cotangent is zero.
_encode.defvjp(_encode_fwd, _encode_bwd)
