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
