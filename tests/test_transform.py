"""RigidTransform algebra tests (port of reference tests/transform/test_transform.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from nesvor_tpu.transform import RigidTransform
from tests.helpers import assert_close, get_transform_test_data


def test_compose_inv():
    zeros = np.zeros((1, 6), dtype=np.float32)
    data = get_transform_test_data()
    for i in range(len(data)):
        ax_a, mat_a = data[i]
        ax_b, mat_b = data[-i - 1]
        ab = RigidTransform(jnp.asarray(ax_a), trans_first=i % 2 == 0).compose(
            RigidTransform(jnp.asarray(mat_b), trans_first=i % 2 == 1)
        )
        inv_b_inv_a = (
            RigidTransform(jnp.asarray(ax_b), trans_first=i % 2 == 1)
            .inv()
            .compose(RigidTransform(jnp.asarray(mat_a), trans_first=i % 2 == 0).inv())
        )
        assert_close(
            ab.compose(inv_b_inv_a).axisangle(), zeros, atol=2e-4, rtol=1e-3
        )


def test_pytree_roundtrip():
    """RigidTransform must cross jit boundaries as a pytree."""
    ax = jnp.asarray(get_transform_test_data()[1][0])
    t = RigidTransform(ax)

    @jax.jit
    def f(tr: RigidTransform) -> RigidTransform:
        return tr.inv().inv()

    t2 = f(t)
    assert_close(t2.axisangle(), t.axisangle(), atol=1e-5, rtol=1e-4)
