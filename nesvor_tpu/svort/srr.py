"""Classical super-resolution reconstruction: matrix-free CG + PSF adjoint.

Rebuild of reference nesvor/svort/srr.py:12-160. The CG solver is a
``lax.while_loop`` (jit-compiled end-to-end on TPU, instead of the
reference's eager Python loop with device syncs); the A/At operators wrap
the slice-acquisition projector.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.slice_acq import slice_acquisition, slice_acquisition_adjoint
from ..transform import axisangle2mat


def dot(x, y):
    return jnp.vdot(x.reshape(-1), y.reshape(-1))


def CG(A, b, x0, n_iter, tol=0.0):
    """Matrix-free conjugate gradient (reference srr.py:12-34).

    ``A`` must be traceable; the loop runs as ``lax.while_loop`` so the whole
    solve compiles to one XLA program.
    """
    if x0 is None:
        x = jnp.zeros_like(b)
        r = b
    else:
        x = x0
        r = b - A(x0)
    p = r
    rr = dot(r, r)

    def cond(state):
        x, r, p, rr, i, done = state
        return jnp.logical_and(i < n_iter, jnp.logical_not(done))

    def body(state):
        x, r, p, rr, i, done = state
        Ap = A(p)
        pAp = dot(p, Ap)
        # guard: with deterministic ops and a consistent system the residual
        # can be exactly 0 (the reference's atomicAdd noise hid this), so
        # 0/0 must not produce NaN.
        safe = pAp != 0
        alpha = jnp.where(safe, rr / jnp.where(safe, pAp, 1.0), 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        rr_new = dot(r, r)
        done = jnp.logical_or(rr_new <= tol, jnp.logical_not(safe))
        beta = jnp.where(rr != 0, rr_new / jnp.where(rr != 0, rr, 1.0), 0.0)
        p = r + beta * p
        return (x, r, p, rr_new, i + 1, done)

    state = (x, r, p, rr, jnp.asarray(0), rr <= tol)
    x, *_ = jax.lax.while_loop(cond, body, state)
    return x


def PSFreconstruction(transforms, slices, slices_mask, vol_mask, params):
    """Adjoint splat with equalize=True (reference srr.py:37-48)."""
    return slice_acquisition_adjoint(
        transforms,
        params["psf"],
        slices,
        slices_mask,
        vol_mask,
        params["volume_shape"],
        params["res_s"] / params["res_r"],
        params["interp_psf"],
        True,
    )


class SRR:
    """Iterative SRR solving AᵗA x = Aᵗ y, optional per-slice weights p,
    Tikhonov-style mu·z term, or gradient-descent branch with edge-preserving
    prior (reference srr.py:51-160)."""

    def __init__(
        self, n_iter=10, use_CG=False, alpha=0.5, beta=0.02, delta=0.1, tol=0.0
    ):
        self.n_iter = n_iter
        self.alpha = alpha
        self.beta = beta * delta * delta
        self.delta = delta
        self.use_CG = use_CG
        self.tol = tol

    def __call__(
        self,
        theta,
        slices,
        volume,
        params,
        p: Optional[jnp.ndarray] = None,
        mu: float = 0,
        z: Optional[jnp.ndarray] = None,
        vol_mask=None,
        slices_mask=None,
    ):
        if theta.ndim == 2:
            transforms = axisangle2mat(theta)
        else:
            transforms = theta

        A = lambda x: self.A(transforms, x, vol_mask, slices_mask, params)
        At = lambda x: self.At(transforms, x, slices_mask, vol_mask, params)
        AtA = lambda x: self.AtA(
            transforms, x, vol_mask, slices_mask, p, params, mu, z
        )

        x = volume
        y = slices

        if self.use_CG:
            b = At(y * p if p is not None else y)
            if mu and z is not None:
                b = b + mu * z
            x = CG(AtA, b, volume, self.n_iter, self.tol)
        else:
            for _ in range(self.n_iter):
                err = A(x) - y
                if p is not None:
                    err = p * err
                g = At(err)
                if self.beta:
                    g = g + self.beta * self.dR(x, self.delta)
                x = x - self.alpha * g
        return jax.nn.relu(x)

    def A(self, transforms, x, vol_mask, slices_mask, params):
        return slice_acquisition(
            transforms,
            x,
            vol_mask,
            slices_mask,
            params["psf"],
            params["slice_shape"],
            params["res_s"] / params["res_r"],
            False,
            params["interp_psf"],
        )

    def At(self, transforms, x, slices_mask, vol_mask, params):
        return slice_acquisition_adjoint(
            transforms,
            params["psf"],
            x,
            slices_mask,
            vol_mask,
            params["volume_shape"],
            params["res_s"] / params["res_r"],
            params["interp_psf"],
            False,
        )

    def AtA(self, transforms, x, vol_mask, slices_mask, p, params, mu, z):
        slices = self.A(transforms, x, vol_mask, slices_mask, params)
        if p is not None:
            slices = slices * p
        vol = self.At(transforms, slices, slices_mask, vol_mask, params)
        if mu and z is not None:
            vol = vol + mu * x
        return vol

    def dR(self, v, delta):
        """26-neighbor Charbonnier edge prior (reference srr.py:139-160)."""
        g = jnp.zeros_like(v)
        D, H, W = v.shape[-3:]
        inner = jnp.zeros_like(v[:, :, 1 : D - 1, 1 : H - 1, 1 : W - 1])
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    if dx == 0 and dy == 0 and dz == 0:
                        continue
                    v0 = v[:, :, 1 : D - 1, 1 : H - 1, 1 : W - 1]
                    v1 = v[
                        :,
                        :,
                        1 + dz : D - 1 + dz,
                        1 + dy : H - 1 + dy,
                        1 + dx : W - 1 + dx,
                    ]
                    dv = v0 - v1
                    dv_ = dv * (1 / (dx * dx + dy * dy + dz * dz) / (delta * delta))
                    inner = inner + dv_ / jnp.sqrt(1 + dv * dv_)
        return g.at[:, :, 1 : D - 1, 1 : H - 1, 1 : W - 1].set(inner)
