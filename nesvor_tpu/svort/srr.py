"""Classical super-resolution reconstruction (SRR) for the SVoRT pipeline.

Solves the slice-acquisition inverse problem: given slices y = A x acquired
from an unknown volume x through the PSF projector A, recover x. Two
solvers, both compiled to a single XLA program (the reference,
nesvor/svort/srr.py:12-160, runs an eager Python loop with a device sync
per iteration):

  * normal-equation CG: AtA x = At y via matrix-free ``lax.while_loop``
    conjugate gradient, with optional per-slice confidence weights ``p``
    (the SVoRT IQA scores) and a Tikhonov pull ``mu (x - z)``;
  * preconditioned gradient descent with a 26-neighbor Charbonnier edge
    prior (``charbonnier_grad``).

The projector pair (A, At) is built once per system by ``make_system``;
everything downstream is expressed against those closures.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.slice_acq import slice_acquisition, slice_acquisition_adjoint
from ..transform import axisangle2mat


def _vdot(x, y):
    return jnp.vdot(x.reshape(-1), y.reshape(-1))


def CG(A, b, x0, n_iter, tol=0.0):
    """Matrix-free conjugate gradient on a traceable operator ``A``.

    Whole solve is one ``lax.while_loop`` XLA program (reference
    srr.py:12-34 is an eager loop). Deterministic TPU reductions expose a
    case the reference's atomicAdd noise hid: a consistent system seeded at
    the solution has residual exactly 0, so every division is guarded
    against 0/0.
    """
    if x0 is None:
        x, r = jnp.zeros_like(b), b
    else:
        x, r = x0, b - A(x0)
    rr0 = _vdot(r, r)

    def step(state):
        x, r, p, rr, i, _ = state
        Ap = A(p)
        pAp = _vdot(p, Ap)
        ok = pAp != 0
        alpha = jnp.where(ok, rr / jnp.where(ok, pAp, 1.0), 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        rr_next = _vdot(r, r)
        beta = jnp.where(rr != 0, rr_next / jnp.where(rr != 0, rr, 1.0), 0.0)
        stop = jnp.logical_or(rr_next <= tol, jnp.logical_not(ok))
        return (x, r, r + beta * p, rr_next, i + 1, stop)

    def keep_going(state):
        *_, i, stop = state
        return jnp.logical_and(i < n_iter, jnp.logical_not(stop))

    init = (x, r, r, rr0, jnp.asarray(0), rr0 <= tol)
    return jax.lax.while_loop(keep_going, step, init)[0]


def CG_unrolled(A, b, x0, n_iter, tol=0.0):
    """CG as a fixed-trip ``lax.scan`` with a convergence mask — the
    reverse-differentiable form of ``CG`` (``lax.while_loop`` has no
    reverse-mode rule). Used when gradients must flow through the solve,
    e.g. SVoRT training with a volume loss (svort/train.py); the SVoRT
    solves run 2-3 iterations, so unrolling is cheap and exact."""
    if x0 is None:
        x, r = jnp.zeros_like(b), b
    else:
        x, r = x0, b - A(x0)
    rr0 = _vdot(r, r)

    def step(state, _):
        x, r, p, rr, stop = state
        Ap = A(p)
        pAp = _vdot(p, Ap)
        ok = jnp.logical_and(pAp != 0, jnp.logical_not(stop))
        alpha = jnp.where(ok, rr / jnp.where(pAp != 0, pAp, 1.0), 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        rr_next = jnp.where(ok, _vdot(r, r), rr)
        beta = jnp.where(
            jnp.logical_and(ok, rr != 0),
            rr_next / jnp.where(rr != 0, rr, 1.0),
            0.0,
        )
        p = jnp.where(ok, r + beta * p, p)
        stop = jnp.logical_or(stop, jnp.logical_or(rr_next <= tol, pAp == 0))
        return (x, r, p, rr_next, stop), None

    init = (x, r, r, rr0, rr0 <= tol)
    (x, *_), _ = jax.lax.scan(step, init, None, length=int(n_iter))
    return x


def make_system(transforms, params, vol_mask=None, slices_mask=None):
    """Forward/adjoint closures (A, At) of the PSF acquisition model for a
    fixed set of slice transforms (wraps ops/slice_acq; reference
    srr.py:104-137 keeps these as methods)."""
    res_ratio = params["res_s"] / params["res_r"]

    def A(x):
        return slice_acquisition(
            transforms, x, vol_mask, slices_mask,
            params["psf"], params["slice_shape"], res_ratio,
            False, params["interp_psf"],
            slice_chunk=params.get("slice_chunk"),
        )

    def At(y):
        return slice_acquisition_adjoint(
            transforms, params["psf"], y, slices_mask, vol_mask,
            params["volume_shape"], res_ratio,
            params["interp_psf"], False,
            slice_chunk=params.get("slice_chunk"),
        )

    return A, At


def PSFreconstruction(transforms, slices, slices_mask, vol_mask, params):
    """Weight-equalized adjoint splat — the pipeline's volume initializer
    (reference srr.py:37-48)."""
    return slice_acquisition_adjoint(
        transforms, params["psf"], slices, slices_mask, vol_mask,
        params["volume_shape"], params["res_s"] / params["res_r"],
        params["interp_psf"], True,
        slice_chunk=params.get("slice_chunk"),
    )


def charbonnier_grad(v, delta):
    """Gradient of the 26-neighbor edge-preserving Charbonnier prior,
    evaluated on the interior and zero on the one-voxel border (reference
    dR, srr.py:139-160). ``v`` is (..., D, H, W)."""
    D, H, W = v.shape[-3:]
    core = v[..., 1 : D - 1, 1 : H - 1, 1 : W - 1]
    offsets = [
        (dz, dy, dx)
        for dz in (-1, 0, 1)
        for dy in (-1, 0, 1)
        for dx in (-1, 0, 1)
        if (dz, dy, dx) != (0, 0, 0)
    ]
    acc = jnp.zeros_like(core)
    inv_d2 = 1.0 / (delta * delta)
    for dz, dy, dx in offsets:
        shifted = v[
            ...,
            1 + dz : D - 1 + dz,
            1 + dy : H - 1 + dy,
            1 + dx : W - 1 + dx,
        ]
        dv = core - shifted
        scaled = dv * (inv_d2 / (dz * dz + dy * dy + dx * dx))
        acc = acc + scaled * jax.lax.rsqrt(1 + dv * scaled)
    out = jnp.zeros_like(v)
    return out.at[..., 1 : D - 1, 1 : H - 1, 1 : W - 1].set(acc)


@dataclass
class SRR:
    """Iterative SRR solver (reference srr.py:51-160).

    ``use_CG=True`` solves the weighted normal equations with ``n_iter`` CG
    steps; otherwise runs ``n_iter`` gradient-descent steps with the
    Charbonnier edge prior (strength ``beta * delta**2``, step ``alpha``).
    Output is clamped nonnegative.
    """

    n_iter: int = 10
    use_CG: bool = False
    alpha: float = 0.5
    beta: float = 0.02
    delta: float = 0.1
    tol: float = 0.0
    # unroll the CG solve (reverse-differentiable; needed when a training
    # loss flows through the reconstructed volume — see CG_unrolled)
    differentiable: bool = False

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
        transforms = axisangle2mat(theta) if theta.ndim == 2 else theta
        A, At = make_system(transforms, params, vol_mask, slices_mask)
        if self.use_CG:
            x = self._solve_cg(A, At, slices, volume, p, mu, z)
        else:
            x = self._solve_gd(A, At, slices, volume, p)
        return jax.nn.relu(x)

    def _solve_cg(self, A, At, y, x0, p, mu, z):
        def AtA(x):
            s = A(x)
            v = At(s if p is None else p * s)
            return v + mu * x if (mu and z is not None) else v

        b = At(y if p is None else p * y)
        if mu and z is not None:
            b = b + mu * z
        solver = CG_unrolled if self.differentiable else CG
        return solver(AtA, b, x0, self.n_iter, self.tol)

    def _solve_gd(self, A, At, y, x, p):
        prior_w = self.beta * self.delta * self.delta
        for _ in range(self.n_iter):
            err = A(x) - y
            g = At(err if p is None else p * err)
            if prior_w:
                g = g + prior_w * charbonnier_grad(x, self.delta)
            x = x - self.alpha * g
        return x
