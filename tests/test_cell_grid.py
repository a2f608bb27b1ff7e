"""Cell-block grid encoder tests: numpy oracle, dense-level equivalence with
the Instant-NGP vertex-hash encoder, and finite-difference gradient checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nesvor_tpu.ops.cell_grid import (
    build_fused_table,
    cell_encode,
    init_cell_grid,
    make_cell_grid_spec,
    segment_reduce_rows,
)
from nesvor_tpu.ops.hash_grid import hash_encode, init_hash_table

PRIMES = (1, 2654435761, 805459861)


def numpy_cell_encode(params, x, spec):
    """Straightforward numpy oracle of the cell-block encoding."""
    N = x.shape[0]
    F = spec.n_features
    out = np.zeros((N, spec.n_levels * F), np.float64)
    for l, res in enumerate(spec.level_resolutions):
        tab = np.asarray(params["levels"][l], np.float64)
        for n in range(N):
            pos = np.asarray(x[n], np.float64) * res
            p0f = np.floor(pos)
            c0 = np.clip(p0f.astype(np.int64), 0, res - 1)
            frac = np.where(p0f >= res, 1.0, pos - p0f)
            feat = np.zeros(F)
            for c in range(8):
                dx, dy, dz = c & 1, (c >> 1) & 1, (c >> 2) & 1
                w = (
                    (frac[0] if dx else 1 - frac[0])
                    * (frac[1] if dy else 1 - frac[1])
                    * (frac[2] if dz else 1 - frac[2])
                )
                if spec.dense[l]:
                    corner = tab[c0[2] + dz, c0[1] + dy, c0[0] + dx]
                else:
                    h = (
                        (np.uint32(c0[0]) * np.uint32(PRIMES[0]))
                        ^ (np.uint32(c0[1]) * np.uint32(PRIMES[1]))
                        ^ (np.uint32(c0[2]) * np.uint32(PRIMES[2]))
                    )
                    row = tab[int(h % np.uint32(spec.table_size))]
                    corner = row[c * F : (c + 1) * F]
                feat = feat + w * corner
            out[n, l * F : (l + 1) * F] = feat
    return out


def test_cell_encode_matches_numpy_oracle():
    spec = make_cell_grid_spec([3, 5, 11], n_features=2, table_size=256)
    assert spec.dense == (True, True, False)
    key = jax.random.PRNGKey(0)
    params = init_cell_grid(key, spec, scale=1.0)
    x = jax.random.uniform(jax.random.PRNGKey(1), (37, 3), minval=-0.1, maxval=1.1)
    got = np.asarray(cell_encode(params, x, spec))
    want = numpy_cell_encode(params, np.asarray(x), spec)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_dense_levels_match_vertex_hash_encoder():
    """Dense levels keep exact shared-vertex Instant-NGP semantics: the
    cell-block encoding must equal ops.hash_grid.hash_encode when the
    vertex tables hold the same values."""
    resolutions = (4, 7)
    F = 2
    T = 2**12  # both levels dense under either rule
    key = jax.random.PRNGKey(2)
    table = init_hash_table(key, 2, T, F, scale=1.0)

    spec = make_cell_grid_spec(resolutions, n_features=F, table_size=T)
    assert all(spec.dense)
    levels = []
    for l, res in enumerate(resolutions):
        n = res + 1
        # hash_grid dense layout: flat idx x + n*(y + n*z) -> [z,y,x] grid
        levels.append(table[l, : n**3].reshape(n, n, n, F))
    params = {"levels": levels}

    x = jax.random.uniform(jax.random.PRNGKey(3), (50, 3), minval=-0.2, maxval=1.2)
    got = np.asarray(cell_encode(params, x, spec))
    want = np.asarray(hash_encode(table, x, resolutions))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_segment_reduce_rows():
    keys = jnp.asarray([3, 1, 3, 0, 1, 3])
    rows = jnp.arange(12, dtype=jnp.float32).reshape(6, 2)
    out = np.asarray(segment_reduce_rows(keys, rows, 5))
    want = np.zeros((5, 2), np.float32)
    for k, r in zip(np.asarray(keys), np.asarray(rows)):
        want[k] += r
    np.testing.assert_allclose(out, want)


def test_cell_encode_grads_finite_difference():
    spec = make_cell_grid_spec([3, 9], n_features=2, table_size=128)
    assert spec.dense == (True, False)
    params = init_cell_grid(jax.random.PRNGKey(4), spec, scale=1.0)
    x = jax.random.uniform(jax.random.PRNGKey(5), (9, 3), minval=0.05, maxval=0.95)
    v = jax.random.normal(jax.random.PRNGKey(6), (9, spec.n_levels * 2))

    def loss_params(params):
        return jnp.sum(cell_encode(params, x, spec) * v)

    def loss_x(x):
        return jnp.sum(cell_encode(params, x, spec) * v)

    g_params = jax.grad(loss_params)(params)
    g_x = jax.grad(loss_x)(x)

    eps = 1e-3
    # table grads: spot-check a handful of entries per level
    rng = np.random.default_rng(0)
    for l in range(spec.n_levels):
        arr = np.asarray(params["levels"][l], np.float64)
        flat_idx = rng.choice(arr.size, size=8, replace=False)
        for fi in flat_idx:
            p_p = [jnp.asarray(a) for a in (params["levels"])]
            p_m = [jnp.asarray(a) for a in (params["levels"])]
            bump = np.zeros(arr.size)
            bump[fi] = eps
            p_p[l] = params["levels"][l] + bump.reshape(arr.shape)
            p_m[l] = params["levels"][l] - bump.reshape(arr.shape)
            fd = (loss_params({"levels": p_p}) - loss_params({"levels": p_m})) / (
                2 * eps
            )
            got = np.asarray(g_params["levels"][l]).reshape(-1)[fi]
            np.testing.assert_allclose(got, float(fd), rtol=2e-3, atol=2e-4)

    # coordinate grads
    for n in (0, 3, 8):
        for a in range(3):
            bump = np.zeros(x.shape)
            bump[n, a] = eps
            fd = (loss_x(x + bump) - loss_x(x - bump)) / (2 * eps)
            np.testing.assert_allclose(
                np.asarray(g_x)[n, a], float(fd), rtol=2e-3, atol=2e-4
            )


def test_fused_table_layout():
    spec = make_cell_grid_spec([2, 20], n_features=2, table_size=256)
    assert spec.dense == (True, False)
    assert spec.level_rows == (8, 256)
    assert spec.level_offsets == (0, 8)
    params = init_cell_grid(jax.random.PRNGKey(7), spec)
    fused = build_fused_table(params, spec)
    assert fused.shape == (264, 16)
    # dense broadcast: cell (0,0,0) corner c=7 (dx=dy=dz=1) == vertex [1,1,1]
    v = params["levels"][0]
    np.testing.assert_allclose(
        np.asarray(fused[0, 14:16]), np.asarray(v[1, 1, 1]), rtol=0, atol=0
    )
