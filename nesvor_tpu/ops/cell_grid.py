"""Cell-block multiresolution grid encoding — the TPU-fast hash-grid layout.

Drop-in alternative to ``ops.hash_grid`` (the tiny-cuda-nn replacement, see
reference nesvor/nesvor/models.py:22-41). The Instant-NGP layout gathers the
8 corner features of a cell separately (8 narrow random gathers per point per
level). On TPU, XLA's gather is issue-latency-bound at ~5-7 ns/row *regardless
of row width up to 64 B* (measured, PERF.md), so the dominant cost is the
number of gathered rows, not bytes. This module restructures the table so one
point/level needs ONE 64-byte row:

  * every level stores, per *cell*, the 8 corner feature vectors contiguously
    (a (cells, 8*F) row — 64 B at F=2 fp32);
  * levels whose vertex grid fits the table budget ("dense" levels, same rule
    as the reference's dense indexing) keep a canonical shared-vertex
    parameterization (exact Instant-NGP semantics): the cell-block table is
    rebuilt each step from the vertex grid by 8 shifted slices (a few MB,
    bandwidth-trivial), and vertex gradients fall out of the slicing
    transpose (pad+add, no scatter);
  * finer ("hashed") levels store cell-block rows directly at
    ``hash(cell) % table_size`` — corners are per-cell parameters (unshared).
    This is a deliberate TPU-first deviation from Instant-NGP's vertex hash:
    same capacity, one gather instead of 8; C0 continuity across cell faces
    at sub-PSF scales is recovered statistically by the PSF Monte-Carlo
    averaging and the image regularizer (validated by the phantom PSNR gate
    in tests/bench);
  * all levels' tables are concatenated into one fused (T_total, 8F) buffer
    so the whole encoder forward is a single XLA gather;
  * the backward replaces XLA's serialized scatter-add (measured 40-80
    ns/row) with sort + permute + sorted scatter (staging point for a Pallas
    window-reduce kernel).

Shape discipline (TPU layout): every materialized intermediate keeps a large
minor dimension — per-level data is (L, N) / (L, 3, N) / (L*N, C), never
(N, L, 3): XLA pads small trailing dims to the 128-lane tile (measured 128x
memory blowups -> HBM OOM at the default batch).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Instant-NGP spatial-hash primes (applied to cell coords here)
_PRIMES = (1, 2654435761, 805459861)


@dataclass(frozen=True)
class CellGridSpec:
    """Static (host-side) geometry of the fused cell-block table."""

    level_resolutions: Tuple[int, ...]  # cells per axis, per level
    n_features: int  # F, features per vertex per level
    table_size: int  # rows of each hashed level
    dense: Tuple[bool, ...]  # per level: shared-vertex dense?
    level_rows: Tuple[int, ...]  # rows of each level's cell table
    level_offsets: Tuple[int, ...]  # start row of each level in fused table
    total_rows: int

    @property
    def n_levels(self) -> int:
        return len(self.level_resolutions)


def make_cell_grid_spec(
    level_resolutions: Sequence[int], n_features: int, table_size: int
) -> CellGridSpec:
    """A level is dense when its *vertex* grid fits the table (the same rule
    as the reference's dense indexing, ops/hash_grid._corner_indices)."""
    dense = []
    rows = []
    offsets = []
    total = 0
    for res in level_resolutions:
        d = (res + 1) ** 3 <= table_size
        r = res**3 if d else table_size
        dense.append(d)
        rows.append(r)
        offsets.append(total)
        total += r
    return CellGridSpec(
        level_resolutions=tuple(int(r) for r in level_resolutions),
        n_features=int(n_features),
        table_size=int(table_size),
        dense=tuple(dense),
        level_rows=tuple(rows),
        level_offsets=tuple(offsets),
        total_rows=total,
    )


def init_cell_grid(
    key: jax.Array, spec: CellGridSpec, dtype=jnp.float32, scale: float = 1e-4
) -> Dict:
    """Uniform(-1e-4, 1e-4) init (as Instant-NGP / ops.hash_grid).

    Dense levels: vertex grid (n, n, n, F) indexed [z, y, x].
    Hashed levels: cell table (table_size, 8*F)."""
    levels: List[jnp.ndarray] = []
    for l, res in enumerate(spec.level_resolutions):
        key, sub = jax.random.split(key)
        if spec.dense[l]:
            n = res + 1
            shape: Tuple[int, ...] = (n, n, n, spec.n_features)
        else:
            shape = (spec.table_size, 8 * spec.n_features)
        levels.append(
            jax.random.uniform(sub, shape, dtype, minval=-scale, maxval=scale)
        )
    return {"levels": levels}


def build_fused_table(params: Dict, spec: CellGridSpec, dtype=None) -> jnp.ndarray:
    """Concatenate all levels into one (total_rows, 8F) cell-block buffer.

    Dense levels are broadcast from the shared vertex grid: row of cell
    (cx,cy,cz) = concat over corners c=0..7 (bits dx=c&1, dy, dz) of
    V[cz+dz, cy+dy, cx+dx]. The transpose of this op (for the backward) is
    8 shifted pad+adds, which XLA derives from the slicing automatically."""
    F = spec.n_features
    parts = []
    for l, res in enumerate(spec.level_resolutions):
        p = params["levels"][l]
        if dtype is not None:
            p = p.astype(dtype)
        if spec.dense[l]:
            corners = []
            for c in range(8):
                dx, dy, dz = c & 1, (c >> 1) & 1, (c >> 2) & 1
                corners.append(
                    p[dz : dz + res, dy : dy + res, dx : dx + res, :]
                )
            cell = jnp.concatenate(corners, axis=-1)  # (res,res,res,8F)
            parts.append(cell.reshape(res**3, 8 * F))
        else:
            parts.append(p)
    return jnp.concatenate(parts, axis=0)


def _cell_keys_fracs(x: jnp.ndarray, spec: CellGridSpec):
    """(N, 3) coords -> fused-table row keys (L, N) int32 and effective
    fractions (L, 3, N).

    Replicates the reference's boundary behavior exactly (see
    ops/hash_grid.hash_encode): in-range trilerp; below 0 -> lerp inside cell
    0 with the fractional part; at/above res -> constant edge value (frac
    pinned to 1 in cell res-1). Gradient w.r.t. x is 0 above the top edge,
    matching the clamped reference."""
    xt = x.T  # (3, N)
    keys = []
    fracs = []
    for l, res in enumerate(spec.level_resolutions):
        pos = xt * res  # (3, N)
        p0f = jnp.floor(pos)
        c0 = jnp.clip(p0f.astype(jnp.int32), 0, res - 1)
        frac = jnp.where(p0f >= res, 1.0, pos - p0f).astype(x.dtype)
        if spec.dense[l]:
            key = c0[0] + res * (c0[1] + res * c0[2])
        else:
            c = c0.astype(jnp.uint32)
            h = (
                c[0] * jnp.uint32(_PRIMES[0])
                ^ c[1] * jnp.uint32(_PRIMES[1])
                ^ c[2] * jnp.uint32(_PRIMES[2])
            )
            key = (h % jnp.uint32(spec.table_size)).astype(jnp.int32)
        keys.append(key + spec.level_offsets[l])
        fracs.append(frac)
    return jnp.stack(keys, 0), jnp.stack(fracs, 0)  # (L, N), (L, 3, N)


def _corner_weight(fracs: jnp.ndarray, c: int) -> jnp.ndarray:
    """(L, 3, N) fractions -> (L, N) trilinear weight of corner ``c`` (bit
    order dx=c&1, dy=(c>>1)&1, dz=(c>>2)&1, matching build_fused_table)."""
    fx, fy, fz = fracs[:, 0], fracs[:, 1], fracs[:, 2]
    wx = fx if (c & 1) else 1 - fx
    wy = fy if (c >> 1) & 1 else 1 - fy
    wz = fz if (c >> 2) & 1 else 1 - fz
    return wx * wy * wz


def segment_reduce_rows(
    keys: jnp.ndarray, rows: jnp.ndarray, num_rows: int
) -> jnp.ndarray:
    """Deterministic sum of ``rows`` (N, C) into (num_rows, C) by key.

    TPU: sort + Pallas window-reduce (MXU one-hot matmul over the sorted
    stream, ops/window_reduce.py) — XLA's scatter-add is serialized at
    ~40-80 ns/row (measured), ~6x slower even with sorted indices. Other
    backends (CPU tests): sorted XLA scatter. Either way the reduction is
    deterministic, unlike the reference's CUDA atomicAdd accumulation."""
    order = jnp.argsort(keys)
    sk = keys[order]
    sv = rows[order]
    if jax.default_backend() == "tpu" and rows.shape[-1] * 8 == 128:
        from .window_reduce import window_reduce_sorted

        return window_reduce_sorted(sk, sv, num_rows, mxu_bf16=True)
    out = jnp.zeros((num_rows, rows.shape[-1]), rows.dtype)
    return out.at[sk].add(sv, indices_are_sorted=True, unique_indices=False)


def _table_grad_sorted(
    spec: CellGridSpec, x: jnp.ndarray, g: jnp.ndarray, keys: jnp.ndarray
) -> jnp.ndarray:
    """d_fused (total_rows, 8F) from points x (N,3) and feature cotangent
    g (N, L*F), via sort-by-key + sorted-stream reconstruction + reduce."""
    F = spec.n_features
    L = spec.n_levels
    N = x.shape[0]
    M = L * N
    iota = jnp.arange(M, dtype=jnp.int32)
    sk, order = jax.lax.sort_key_val(keys.reshape(-1), iota)
    n_idx = jnp.remainder(order, N)
    l_idx = order // N

    # two separate gathers: a fused (3 + L*F)-wide row crosses the ~100-byte
    # row-width cliff where XLA's gather slows ~6x (measured)
    xs = jnp.take(x.astype(jnp.float32), n_idx, axis=0)  # (M, 3)
    gs = jnp.take(g, n_idx, axis=0)  # (M, L*F)

    # per-element level resolution and g slice via unrolled one-hot over L
    # (a 12-row table gather here would cost ~40 ms; the unroll is ~1 ms VPU)
    r_e = 0.0
    g_e = 0.0
    for l, r in enumerate(spec.level_resolutions):
        sel = (l_idx == l).astype(jnp.float32)[:, None]
        r_e = r_e + sel * r
        g_e = g_e + sel * gs[:, l * F : (l + 1) * F]

    pos = xs * r_e
    p0f = jnp.floor(pos)
    frac = jnp.where(p0f >= r_e, 1.0, pos - p0f)  # (M, 3)
    fx, fy, fz = frac[:, 0:1], frac[:, 1:2], frac[:, 2:3]
    parts = []
    for c in range(8):
        wx = fx if (c & 1) else 1 - fx
        wy = fy if (c >> 1) & 1 else 1 - fy
        wz = fz if (c >> 2) & 1 else 1 - fz
        parts.append(wx * wy * wz * g_e)
    d_rows_sorted = jnp.concatenate(parts, axis=1)  # (M, 8F)

    if jax.default_backend() == "tpu" and 8 * F == 16:
        import os

        from .window_reduce import window_reduce_sorted

        # bf16 contributions / f32 accumulation: the accumulator is tighter
        # than tiny-cuda-nn's fp16 atomics but each contribution is coarser
        # (bf16 has 8 mantissa bits vs fp16's 11) — net precision comparable,
        # not strictly better. NESVOR_TPU_GRID_GRAD_F32=1 forces full-f32
        # contributions for quality debugging.
        f32 = os.environ.get("NESVOR_TPU_GRID_GRAD_F32", "") == "1"
        return window_reduce_sorted(
            sk, d_rows_sorted, spec.total_rows, mxu_bf16=not f32
        )
    out = jnp.zeros((spec.total_rows, 8 * F), d_rows_sorted.dtype)
    return out.at[sk].add(
        d_rows_sorted, indices_are_sorted=True, unique_indices=False
    )


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _gather_interp(fused: jnp.ndarray, x: jnp.ndarray, spec: CellGridSpec):
    """(T, 8F) fused table + (N, 3) normalized coords -> (N, L*F) features."""
    out, _ = _gather_interp_fwd(fused, x, spec)
    return out


def _gather_interp_fwd(fused, x, spec: CellGridSpec):
    F = spec.n_features
    L = spec.n_levels
    N = x.shape[0]
    keys, fracs = _cell_keys_fracs(x, spec)
    rows = jnp.take(fused, keys.reshape(-1), axis=0)  # (L*N, 8F), l-major
    feat = 0.0
    for c in range(8):
        w = _corner_weight(fracs, c).reshape(L * N, 1).astype(rows.dtype)
        feat = feat + w * rows[:, c * F : (c + 1) * F]
    # (L*N, F) -> (N, L*F)
    feat = jnp.swapaxes(feat.reshape(L, N, F), 0, 1).reshape(N, L * F)
    return feat, (x, rows)


def _gather_interp_bwd(spec: CellGridSpec, res, g):
    x, rows = res
    F = spec.n_features
    L = spec.n_levels
    N = x.shape[0]
    # (N, L*F) -> (L*N, F), l-major to match rows
    gf = jnp.swapaxes(g.reshape(N, L, F), 0, 1).reshape(L * N, F)
    gf = gf.astype(jnp.float32)
    keys, fracs = _cell_keys_fracs(x, spec)  # recompute (cheap VPU math)

    # ---- table gradient ----
    # Sorted-side reconstruction: sorting carries only the 4-byte source id;
    # the 64-byte gradient rows are rebuilt IN SORTED ORDER from (x, g)
    # gathered out of small N-row sources. Permuting prebuilt (L*N, 8F) rows
    # instead costs ~3x (gather time grows with source row count; measured).
    d_fused = _table_grad_sorted(spec, x, g.astype(jnp.float32), keys)

    # coordinate gradient: s_c = <rows_c, g>; d_frac via weight partials
    rf = rows.astype(jnp.float32)
    s = [
        jnp.sum(rf[:, c * F : (c + 1) * F] * gf, axis=-1).reshape(L, N)
        for c in range(8)
    ]
    fx, fy, fz = (fracs[:, a].astype(jnp.float32) for a in range(3))
    d_frac = []
    for axis in range(3):
        acc = 0.0
        for c in range(8):
            bits = (c & 1, (c >> 1) & 1, (c >> 2) & 1)
            term = s[c]
            for other in range(3):
                if other == axis:
                    continue
                fo = (fx, fy, fz)[other]
                term = term * (fo if bits[other] else 1 - fo)
            acc = acc + (term if bits[axis] else -term)
        d_frac.append(acc)  # (L, N)

    # d pos -> d x: frac = pos - floor(pos) (d=1) except pinned top edge (d=0)
    xt = x.T.astype(jnp.float32)  # (3, N)
    d_axes = []
    for a in range(3):
        acc = 0.0
        for l, r in enumerate(spec.level_resolutions):
            live = (jnp.floor(xt[a] * r) < r).astype(jnp.float32)
            acc = acc + d_frac[a][l] * live * r
        d_axes.append(acc)  # (N,)
    d_x = jnp.stack(d_axes, 0).T  # (N, 3)
    return d_fused.astype(rows.dtype), d_x.astype(x.dtype)


_gather_interp.defvjp(_gather_interp_fwd, _gather_interp_bwd)


def cell_encode(
    params: Dict, x: jnp.ndarray, spec: CellGridSpec, compute_dtype=None
) -> jnp.ndarray:
    """Encode points ``x`` (N, 3) in [0,1]^3 -> (N, L*F) features."""
    fused = build_fused_table(params, spec, dtype=compute_dtype)
    return _gather_interp(fused, x, spec)
