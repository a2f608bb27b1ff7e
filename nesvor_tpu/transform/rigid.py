"""SE(3) rigid-transform container + free functions (pure JAX).

TPU-native rebuild of the reference ``nesvor/transform/transform.py``
(RigidTransform :8-116, free functions :119-289). The container is a
registered pytree so it can cross jit boundaries; all math is jnp and
differentiable. The dual lazily-cached representation of the reference is
kept (axis-angle ``(N, 6)`` or matrix ``(N, 3, 4)``), as is the
``trans_first`` convention flag:

  * trans_first=True:  x' = R @ (x + t)
  * trans_first=False: x' = R @ x + t
"""

from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp

from .convert import axisangle2mat, mat2axisangle


class RigidTransform:
    """Batch of SE(3) transforms. Mirrors reference transform.py:8-116."""

    def __init__(self, data: jnp.ndarray, trans_first: bool = True) -> None:
        self.trans_first = trans_first
        self._axisangle = None
        self._matrix = None
        data = jnp.asarray(data)
        if data.ndim == 2 and data.shape[1] == 6:
            self._axisangle = data
        elif data.ndim == 3 and data.shape[1] == 3 and data.shape[2] == 4:
            self._matrix = data
        else:
            raise ValueError("Unknown format for rigid transform!")

    # ---- representation access -------------------------------------------------
    def matrix(self, trans_first: bool = True) -> jnp.ndarray:
        mat = self._matrix if self._matrix is not None else axisangle2mat(self._axisangle)
        if self.trans_first and not trans_first:
            mat = mat_first2last(mat)
        elif (not self.trans_first) and trans_first:
            mat = mat_last2first(mat)
        return mat

    def axisangle(self, trans_first: bool = True) -> jnp.ndarray:
        ax = self._axisangle if self._axisangle is not None else mat2axisangle(self._matrix)
        if self.trans_first and not trans_first:
            ax = ax_first2last(ax)
        elif (not self.trans_first) and trans_first:
            ax = ax_last2first(ax)
        return ax

    # ---- algebra ----------------------------------------------------------------
    def inv(self) -> "RigidTransform":
        mat = self.matrix(trans_first=True)
        R = mat[:, :, :3]
        t = mat[:, :, 3:]
        inv_mat = jnp.concatenate([jnp.swapaxes(R, -2, -1), -jnp.matmul(R, t)], -1)
        return RigidTransform(inv_mat, trans_first=True)

    def compose(self, other: "RigidTransform") -> "RigidTransform":
        """self ∘ other in the reference's convention (transform.py:53-63):
        result(x) = self(other(x)) with trans-first matrices."""
        mat1 = self.matrix(trans_first=True)
        mat2 = other.matrix(trans_first=True)
        R1, t1 = mat1[:, :, :3], mat1[:, :, 3:]
        R2, t2 = mat2[:, :, :3], mat2[:, :, 3:]
        R = jnp.matmul(R1, R2)
        t = t2 + jnp.matmul(jnp.swapaxes(R2, -2, -1), t1)
        return RigidTransform(jnp.concatenate([R, t], -1), trans_first=True)

    # ---- container ops ----------------------------------------------------------
    def __getitem__(self, idx) -> "RigidTransform":
        if self._axisangle is not None:
            data = self._axisangle[idx]
            if data.ndim < 2:
                data = data[None]
        else:
            data = self._matrix[idx]
            if data.ndim < 3:
                data = data[None]
        return RigidTransform(data, self.trans_first)

    def detach(self) -> "RigidTransform":
        data = self._axisangle if self._axisangle is not None else self._matrix
        return RigidTransform(jax.lax.stop_gradient(data), self.trans_first)

    def clone(self) -> "RigidTransform":
        data = self._axisangle if self._axisangle is not None else self._matrix
        return RigidTransform(jnp.array(data), self.trans_first)

    @staticmethod
    def cat(transforms: Iterable["RigidTransform"]) -> "RigidTransform":
        mats = [t.matrix(trans_first=True) for t in transforms]
        return RigidTransform(jnp.concatenate(mats, 0), trans_first=True)

    def __len__(self) -> int:
        data = self._axisangle if self._axisangle is not None else self._matrix
        return data.shape[0]

    # ---- pytree protocol ----------------------------------------------------------
    def tree_flatten(self):
        if self._axisangle is not None:
            return (self._axisangle,), ("ax", self.trans_first)
        return (self._matrix,), ("mat", self.trans_first)

    @classmethod
    def tree_unflatten(cls, aux, children):
        kind, trans_first = aux
        obj = cls.__new__(cls)
        obj.trans_first = trans_first
        obj._axisangle = children[0] if kind == "ax" else None
        obj._matrix = children[0] if kind == "mat" else None
        return obj


jax.tree_util.register_pytree_node(
    RigidTransform, RigidTransform.tree_flatten, RigidTransform.tree_unflatten
)


# ---- free functions (reference transform.py:119-289) -----------------------------


def mat_first2last(mat: jnp.ndarray) -> jnp.ndarray:
    R = mat[..., :3]
    t = mat[..., 3:]
    return jnp.concatenate([R, jnp.matmul(R, t)], -1)


def mat_last2first(mat: jnp.ndarray) -> jnp.ndarray:
    R = mat[..., :3]
    t = mat[..., 3:]
    return jnp.concatenate([R, jnp.matmul(jnp.swapaxes(R, -2, -1), t)], -1)


def ax_first2last(ax: jnp.ndarray) -> jnp.ndarray:
    return mat2axisangle(mat_first2last(axisangle2mat(ax)))


def ax_last2first(ax: jnp.ndarray) -> jnp.ndarray:
    return mat2axisangle(mat_last2first(axisangle2mat(ax)))


def mat_update_resolution(mat: jnp.ndarray, res_from, res_to) -> jnp.ndarray:
    """Rescale the translation column when changing voxel units
    (reference transform.py:147-152)."""
    assert mat.ndim == 3
    fac = jnp.ones((1, 1, 4), dtype=mat.dtype).at[..., 3].set(res_from / res_to)
    return mat * fac


def ax_update_resolution(ax: jnp.ndarray, res_from, res_to) -> jnp.ndarray:
    assert ax.ndim == 2
    fac = jnp.ones((1, 6), dtype=ax.dtype).at[:, 3:].set(res_from / res_to)
    return ax * fac


def mat_transform_points(
    mat: jnp.ndarray, x: jnp.ndarray, trans_first: bool
) -> jnp.ndarray:
    """Apply ``(*, 3, 4)`` to points ``(*, 3)`` (reference transform.py:259-272)."""
    R = mat[..., :-1]
    T = mat[..., -1:]
    x = x[..., None]
    if trans_first:
        x = jnp.matmul(R, x + T)
    else:
        x = jnp.matmul(R, x) + T
    return x[..., 0]


def ax_transform_points(ax: jnp.ndarray, x: jnp.ndarray, trans_first: bool) -> jnp.ndarray:
    mat = axisangle2mat(ax.reshape(-1, 6)).reshape(ax.shape[:-1] + (3, 4))
    return mat_transform_points(mat, x, trans_first)


def transform_points(transform: RigidTransform, x: jnp.ndarray) -> jnp.ndarray:
    """transform (N) applied to x (N, 3), or transform (1) to x (*, 3)."""
    assert x.ndim == 2 and x.shape[-1] == 3
    trans_first = transform.trans_first
    mat = transform.matrix(trans_first)
    return mat_transform_points(mat, x, trans_first)
