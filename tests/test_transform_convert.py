"""Transform-conversion tests vs the scipy oracle.

Port of reference tests/transform/test_transform_convert.py:13-33, plus
gradient finite-difference checks the reference never had (SURVEY.md §4:
"transform_convert backward kernels — only forward values are checked").
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nesvor_tpu.transform import (
    axisangle2mat,
    mat2axisangle,
    mat2point,
    point2mat,
    mat2euler,
    euler2mat,
)
from tests.helpers import assert_close, get_transform_test_data


def test_axisangle2mat():
    for ax, mat in get_transform_test_data():
        assert_close(axisangle2mat(jnp.asarray(ax)), mat, atol=1e-5, rtol=1.3e-6)


def test_mat2axisangle():
    for ax, mat in get_transform_test_data():
        assert_close(mat2axisangle(jnp.asarray(mat)), ax, atol=1e-5, rtol=1.3e-5)


def test_mat2point_point2mat():
    for i, (_, mat) in enumerate(get_transform_test_data()):
        p = mat2point(jnp.asarray(mat), 128 + 2 * i, 128 + 4 * i, 0.5 + 0.1 * i)
        mat_ = point2mat(p)
        assert_close(mat_, mat, atol=2e-5, rtol=1e-4)


def test_mat2euler_euler2mat():
    for _, mat in get_transform_test_data():
        euler = mat2euler(jnp.asarray(mat))
        mat_ = euler2mat(euler)
        assert_close(mat_, mat, atol=1e-5, rtol=1e-4)


@pytest.mark.slow
def test_axisangle2mat_grad_finite_diff():
    """Finite-difference check of d(mat)/d(ax), incl. near-zero rotation."""
    rng = np.random.default_rng(0)
    for ax0 in [
        np.array([0.3, -0.2, 0.5, 1.0, -2.0, 3.0]),
        np.array([1e-5, -2e-5, 1e-5, 0.5, 0.1, -0.3]),
        np.array([0.0, 0.0, 0.0, 0.5, 0.1, -0.3]),
    ]:
        with jax.enable_x64(True):
            ax0 = jnp.asarray(ax0, dtype=jnp.float64)
            jac = jax.jacobian(lambda a: axisangle2mat(a[None])[0])(ax0)
            eps = 1e-6
            for k in range(6):
                da = jnp.zeros(6, dtype=jnp.float64).at[k].set(eps)
                fd = (axisangle2mat((ax0 + da)[None])[0] - axisangle2mat((ax0 - da)[None])[0]) / (
                    2 * eps
                )
                assert_close(jac[..., k], fd, atol=1e-5, rtol=1e-4)
            assert bool(jnp.all(jnp.isfinite(jac)))


@pytest.mark.slow
def test_mat2axisangle_grad_finite():
    """Gradients through mat2axisangle must be finite (incl. identity)."""
    for ax, mat in get_transform_test_data():
        g = jax.jacobian(mat2axisangle)(jnp.asarray(mat))
        assert bool(jnp.all(jnp.isfinite(g)))
