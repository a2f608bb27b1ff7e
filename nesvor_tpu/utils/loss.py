"""Normalized cross-correlation loss (rebuild of reference nesvor/utils/loss.py:6-71).

Global (win=None) or windowed local NCC via box-filter convolutions;
masked variant; returns negative squared NCC. All jnp/lax, jit-safe.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def ncc_loss(
    I: jnp.ndarray,
    J: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    win: Optional[int] = 9,
    level: int = 0,
    eps: float = 1e-6,
    reduction: str = "none",
) -> jnp.ndarray:
    spatial_dims = I.ndim - 2

    if mask is not None:
        mask = mask.astype(I.dtype)
        I = I * mask
        J = J * mask

    c = I.shape[1]

    if win is None:
        I = I.reshape(I.shape[0], -1)
        J = J.reshape(J.shape[0], -1)
        if mask is not None:
            mask = mask.reshape(mask.shape[0], -1)
            N = mask.sum(-1) + eps
            I_mean = I.sum(-1) / N
            J_mean = J.sum(-1) / N
            I2_mean = (I * I).sum(-1) / N
            J2_mean = (J * J).sum(-1) / N
            IJ_mean = (I * J).sum(-1) / N
        else:
            I_mean = I.mean(-1)
            J_mean = J.mean(-1)
            I2_mean = (I * I).mean(-1)
            J2_mean = (J * J).mean(-1)
            IJ_mean = (I * J).mean(-1)
    else:
        I = I.reshape(-1, 1, *I.shape[2:])
        J = J.reshape(-1, 1, *J.shape[2:])

        win = 2 * int(win / 2**level / 2) + 1

        kernel = jnp.ones((1, 1) + (win,) * spatial_dims, dtype=I.dtype) / (
            win**spatial_dims
        )
        pad = [(win // 2, win // 2)] * spatial_dims

        def conv(x):
            return jax.lax.conv_general_dilated(
                x, kernel, window_strides=[1] * spatial_dims, padding=pad
            )

        I_mean = conv(I)
        J_mean = conv(J)
        I2_mean = conv(I * I)
        J2_mean = conv(J * J)
        IJ_mean = conv(I * J)

    cross = IJ_mean - I_mean * J_mean
    I_var = I2_mean - I_mean * I_mean
    J_var = J2_mean - J_mean * J_mean

    cc = cross * cross / (I_var * J_var + eps)

    if reduction == "mean":
        return -cc.mean()
    if reduction == "sum":
        return -cc.sum()
    if win is None:
        return -cc.reshape(-1, c)
    return -cc.reshape(-1, c, *I.shape[2:])
