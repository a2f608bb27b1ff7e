"""CG solver test vs scipy (port of reference tests/svort/test_cg.py:9-20)."""

import jax.numpy as jnp
import numpy as np
import scipy.linalg
from scipy.sparse.linalg import cg

from nesvor_tpu.svort.srr import CG
from tests.helpers import assert_close


def test_cg():
    A = jnp.asarray(
        scipy.linalg.hankel([1, 2, 3, 4, 5], [4, 7, 7, 8, 9]), dtype=jnp.float32
    )
    n = n_iter = A.shape[0]
    b = jnp.arange(n, dtype=A.dtype).reshape(-1, 1)
    x0 = jnp.zeros_like(b)
    funcA = lambda x: A @ x
    x_ = CG(funcA, b, x0, n_iter)
    x, _ = cg(np.asarray(A), np.asarray(b), rtol=0, maxiter=n_iter, atol=0)
    assert_close(x_, x.reshape(x_.shape), atol=1e-3, rtol=1e-3)


def test_cg_unrolled_matches_while_and_differentiates():
    import jax

    from nesvor_tpu.svort.srr import CG_unrolled

    A = jnp.asarray(
        scipy.linalg.hankel([1, 2, 3, 4, 5], [4, 7, 7, 8, 9]), dtype=jnp.float32
    )
    n = A.shape[0]
    b = jnp.arange(n, dtype=A.dtype).reshape(-1, 1)
    funcA = lambda x: A @ x
    x_w = CG(funcA, b, None, n)
    x_u = CG_unrolled(funcA, b, None, n)
    assert_close(x_u, x_w, atol=1e-4, rtol=1e-4)

    # reverse-mode must work through the unrolled solve (while_loop has no
    # reverse rule); check against finite differences wrt b
    def f(b):
        return jnp.sum(CG_unrolled(funcA, b, None, 3) ** 2)

    g = jax.grad(f)(b)
    eps = 1e-3
    for i in range(n):
        db = jnp.zeros_like(b).at[i, 0].set(eps)
        fd = (f(b + db) - f(b - db)) / (2 * eps)
        np.testing.assert_allclose(float(g[i, 0]), float(fd), rtol=2e-2)
