"""Shared small ops: meshgrid, separable gaussian blur, EMA, arg merging.

Rebuild of reference nesvor/utils/misc.py:29-145 in JAX. Convolutions use
lax.conv_general_dilated (XLA lowers separable 1-D convs efficiently on TPU).
"""

from __future__ import annotations

import os
from argparse import Namespace
from typing import Any, Collection, Dict, Iterable, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np


def makedirs(path: Union[str, Iterable[str], None]) -> None:
    if isinstance(path, str):
        path = [path]
    if path is None:
        return
    for p in path:
        if p:
            os.makedirs(p, exist_ok=True)


def merge_args(args_old: Namespace, args_new: Namespace) -> Namespace:
    """Checkpoint args overridden by CLI args (reference misc.py:22-26)."""
    dict_old = vars(args_old).copy()
    dict_old.update(vars(args_new))
    return Namespace(**dict_old)


def meshgrid(
    shape_xyz: Collection,
    resolution_xyz: Collection,
    min_xyz: Optional[Collection] = None,
    stack_output: bool = True,
):
    """Centered world-coordinate grid (reference misc.py:29-60).

    Returns array of shape (*shape_zyx, 3) with xyz coordinates, i.e. the
    leading axes are ordered (z, y, x) like the volume layout while the last
    axis holds (x, y, z) coordinates — identical to the reference.
    """
    assert len(shape_xyz) == len(resolution_xyz)
    shape_xyz = [int(s) for s in shape_xyz]
    resolution_xyz = [float(r) for r in np.asarray(resolution_xyz).reshape(-1)]
    if min_xyz is None:
        min_xyz = tuple(-(s - 1) * r / 2 for s, r in zip(shape_xyz, resolution_xyz))
    else:
        assert len(shape_xyz) == len(min_xyz)
        min_xyz = [float(m) for m in np.asarray(min_xyz).reshape(-1)]

    arr_xyz = [
        jnp.arange(s, dtype=jnp.float32) * r + m
        for s, r, m in zip(shape_xyz, resolution_xyz, min_xyz)
    ]
    grid_xyz = jnp.meshgrid(*arr_xyz[::-1], indexing="ij")[::-1]
    if stack_output:
        return jnp.stack(grid_xyz, -1)
    return grid_xyz


def gaussian_1d_kernel(sigma: float, truncated: float) -> jnp.ndarray:
    """Erf-integrated 1-D gaussian kernel (reference misc.py:84-88, from MONAI)."""
    tail = int(max(float(sigma) * truncated, 0.5) + 0.5)
    x = jnp.arange(-tail, tail + 1, dtype=jnp.float32)
    t = 0.70710678 / float(sigma)
    kernel = 0.5 * (jax.scipy.special.erf(t * (x + 0.5)) - jax.scipy.special.erf(t * (x - 0.5)))
    return jnp.clip(kernel, min=0)


def gaussian_blur(
    x: jnp.ndarray, sigma: Union[float, Iterable], truncated: float
) -> jnp.ndarray:
    """Separable gaussian blur over the spatial dims of (N, C, *spatial)
    (reference misc.py:63-81)."""
    spatial_dims = x.ndim - 2
    if not isinstance(sigma, Iterable):
        sigma = [sigma] * spatial_dims
    sigma = [float(s) for s in sigma]
    kernels = [gaussian_1d_kernel(s, truncated) for s in sigma]
    for d in range(spatial_dims):
        k = kernels[d]
        shape = [1, 1] + [1] * spatial_dims
        shape[d + 2] = k.shape[0]
        kernel = k.reshape(shape).astype(x.dtype)
        pad = (k.shape[0] - 1) // 2
        padding = [(0, 0)] * spatial_dims
        padding[d] = (pad, pad)
        c = x.shape[1]
        x = jax.lax.conv_general_dilated(
            x,
            jnp.tile(kernel, (c, 1) + (1,) * spatial_dims),
            window_strides=[1] * spatial_dims,
            padding=padding,
            feature_group_count=c,
        )
    return x


class MovingAverage:
    """EMA with bias correction (reference misc.py:91-145). Host-side."""

    def __init__(self, alpha: float) -> None:
        assert 0 <= alpha < 1
        self.alpha = alpha
        self._value: Dict[str, Any] = dict()

    def to_dict(self) -> Dict[str, Any]:
        return {"alpha": self.alpha, "value": self._value}

    def from_dict(self, d: Dict) -> None:
        self.alpha = d["alpha"]
        self._value = d["value"]

    def __getitem__(self, key: str):
        if key not in self._value:
            return 0
        num, v = self._value[key]
        if self.alpha:
            return v / (1 - self.alpha**num)
        return v / num

    def __call__(self, key: str, value) -> None:
        if key not in self._value:
            self._value[key] = (0, 0)
        num, v = self._value[key]
        num += 1
        if self.alpha:
            v = v * self.alpha + value * (1 - self.alpha)
        else:
            v += value
        self._value[key] = (num, v)

    def __str__(self) -> str:
        s = ""
        key = None
        for key in self._value:
            s += "%s = %.3e  " % (key, self[key])
        if key is not None:
            return ("iter = %d  " % self._value[key][0]) + s
        return s

    @property
    def header(self) -> str:
        return "iter," + ",".join(self._value.keys())

    @property
    def value(self) -> List:
        values = [self[key] for key in self._value]
        if values:
            first_key = next(iter(self._value))
            return [self._value[first_key][0]] + values
        return values
