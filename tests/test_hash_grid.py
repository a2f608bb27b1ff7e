"""Hash-grid encoder tests: numpy oracle for the trilinear hashed gather,
gradient checks (the reference's tiny-cuda-nn encoder had no tests at all)."""

import jax
import jax.numpy as jnp
import numpy as np

from nesvor_tpu.ops.hash_grid import (
    _PRIMES,
    compute_level_resolutions,
    hash_encode,
    init_hash_table,
)
from tests.helpers import assert_close


def _numpy_encode(table, x, level_res):
    L, T, F = table.shape
    N = x.shape[0]
    out = np.zeros((N, L * F), dtype=np.float64)
    for l, res in enumerate(level_res):
        pos = x * res
        p0 = np.clip(np.floor(pos).astype(np.int64), 0, res)
        frac = pos - np.floor(pos)
        n_grid = res + 1
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    cx = np.minimum(p0[:, 0] + dx, res)
                    cy = np.minimum(p0[:, 1] + dy, res)
                    cz = np.minimum(p0[:, 2] + dz, res)
                    if n_grid**3 <= T:
                        idx = (cx + n_grid * (cy + n_grid * cz)) % T
                    else:
                        idx = (
                            cx.astype(np.uint32) * np.uint32(_PRIMES[0])
                            ^ cy.astype(np.uint32) * np.uint32(_PRIMES[1])
                            ^ cz.astype(np.uint32) * np.uint32(_PRIMES[2])
                        ) % np.uint32(T)
                    w = (
                        (frac[:, 0] if dx else 1 - frac[:, 0])
                        * (frac[:, 1] if dy else 1 - frac[:, 1])
                        * (frac[:, 2] if dz else 1 - frac[:, 2])
                    )
                    out[:, l * F : (l + 1) * F] += w[:, None] * table[l][idx]
    return out


def test_hash_encode_matches_numpy():
    key = jax.random.PRNGKey(0)
    L, T, F = 4, 2**10, 2
    level_res = compute_level_resolutions(5, 1.5, L)  # includes hashed levels
    assert any((r + 1) ** 3 > T for r in level_res)
    assert any((r + 1) ** 3 <= T for r in level_res)
    table = init_hash_table(key, L, T, F)
    x = jax.random.uniform(jax.random.PRNGKey(1), (257, 3))
    got = hash_encode(table, x, level_res)
    want = _numpy_encode(np.asarray(table), np.asarray(x), level_res)
    assert_close(got, want, atol=1e-6, rtol=1e-4)


def test_hash_encode_grads():
    key = jax.random.PRNGKey(0)
    L, T, F = 3, 2**8, 2
    level_res = compute_level_resolutions(4, 1.6, L)
    table = init_hash_table(key, L, T, F)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))

    def f(t):
        return (hash_encode(t, x, level_res) ** 2).sum()

    g = jax.grad(f)(table)
    assert bool(jnp.all(jnp.isfinite(g)))
    # finite difference on a few random table entries
    rng = np.random.default_rng(0)
    with jax.enable_x64(True):
        t64 = jnp.asarray(np.asarray(table), jnp.float64)
        x64 = jnp.asarray(np.asarray(x), jnp.float64)

        def f64(t):
            return (hash_encode(t, x64, level_res) ** 2).sum()

        g64 = jax.grad(f64)(t64)
        for _ in range(5):
            l = rng.integers(L)
            i = rng.integers(T)
            j = rng.integers(F)
            eps = 1e-6
            tp = t64.at[l, i, j].add(eps)
            tm = t64.at[l, i, j].add(-eps)
            fd = (f64(tp) - f64(tm)) / (2 * eps)
            assert_close(g64[l, i, j], fd, atol=1e-6, rtol=1e-4)


def test_level_resolutions():
    res = compute_level_resolutions(5, 1.3819, 12)
    assert res[0] == 5
    assert all(b > a for a, b in zip(res, res[1:]))
