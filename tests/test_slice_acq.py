"""Slice-acquisition projector tests.

Ports the reference's key numerical test (tests/slice_acquisition/
test_slice_acq.py:11-81): simulate 16 stacks of a 32^3 Shepp-Logan phantom
at known rotations, then verify 20-iteration CG SRR recovers the phantom —
this only converges if At is the true adjoint of A. Adds gradient
finite-difference checks the reference never had (SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nesvor_tpu.ops.slice_acq import slice_acquisition, slice_acquisition_adjoint
from nesvor_tpu.svort.srr import SRR
from nesvor_tpu.transform import RigidTransform, mat_update_resolution
from nesvor_tpu.utils import get_psf
from tests.helpers import assert_close
from tests.phantom3d import phantom3d


def get_cg_recon_test_data():
    vs = 32
    gap = s_thick = 3
    res = 1
    res_s = 1.5
    n_slice = int((np.sqrt(3) * vs) / gap) + 4
    ss = int((np.sqrt(3) * vs) / res_s) + 4

    volume = jnp.asarray(phantom3d(n=vs), dtype=jnp.float32)[None, None]
    psf = jnp.asarray(get_psf(res_ratio=(res_s / res, res_s / res, s_thick / res)))
    angles = [
        [0, 0, 0],
        [np.pi / 2, 0, 0],
        [0, np.pi / 2, 0],
        [0, 0, np.pi / 2],
        [np.pi / 4, np.pi / 4, 0],
        [0, np.pi / 4, np.pi / 4],
        [np.pi / 4, 0, np.pi / 4],
        [np.pi / 3, np.pi / 3, 0],
        [0, np.pi / 3, np.pi / 3],
        [np.pi / 3, 0, np.pi / 3],
        [2 * np.pi / 3, 2 * np.pi / 3, 0],
        [0, 2 * np.pi / 3, 2 * np.pi / 3],
        [2 * np.pi / 3, 0, 2 * np.pi / 3],
        [np.pi / 5, np.pi / 5, 0],
        [0, np.pi / 5, np.pi / 5],
        [np.pi / 5, 0, np.pi / 5],
    ]

    stacks = []
    transforms = []
    for i in range(len(angles)):
        angle = np.tile(np.asarray(angles[i], dtype=np.float32), (n_slice, 1))
        tz = (np.arange(n_slice, dtype=np.float32) - (n_slice - 1) / 2.0) * gap
        tx = ty = np.ones_like(tz) * 0.5
        t = np.stack((tx, ty, tz), -1)
        transform = RigidTransform(
            jnp.asarray(np.concatenate((angle, t), -1)), trans_first=True
        )
        mat = mat_update_resolution(transform.matrix(), 1, res)
        slices = slice_acquisition(
            mat, volume, None, None, psf, (ss, ss), res_s / res, False, False
        )
        stacks.append(slices)
        transforms.append(transform)
    params = {
        "psf": psf,
        "slice_shape": (ss, ss),
        "res_s": res_s,
        "res_r": res,
        "interp_psf": False,
        "volume_shape": (vs, vs, vs),
    }
    return jnp.concatenate(stacks, 0), RigidTransform.cat(transforms), volume, params


@pytest.mark.slow
def test_cg_recon():
    slices, transforms, volume, params = get_cg_recon_test_data()
    srr = SRR(n_iter=20, use_CG=True, tol=1e-8)
    theta = mat_update_resolution(transforms.matrix(), 1, params["res_r"])
    volume_ = srr(theta, slices, volume, params)
    assert_close(volume_, volume, atol=3e-5, rtol=1e-5)


@pytest.mark.slow
def test_cg_recon_residual_reduction():
    """Stronger than the reference test (which seeds CG with the ground truth
    so the solver exits immediately): starting from the PSF-reconstruction
    init (the pipeline's real path, svort/inference.py:370-406), 20 CG
    iterations must monotonically and substantially reduce the data residual
    ||A x - y|| — which only happens if At is consistent with A."""
    slices, transforms, volume, params = get_cg_recon_test_data()
    srr = SRR(n_iter=20, use_CG=True, tol=0.0)
    theta = mat_update_resolution(transforms.matrix(), 1, params["res_r"])
    from nesvor_tpu.svort.srr import PSFreconstruction

    v0 = PSFreconstruction(theta, slices, None, None, params)
    volume_ = srr(theta, slices, v0, params)

    from nesvor_tpu.svort.srr import make_system

    A, _ = make_system(theta, params)

    def residual(v):
        sim = A(v)
        return float(jnp.sqrt(jnp.mean((sim - slices) ** 2)))

    r0 = residual(v0)
    r1 = residual(volume_)
    assert r1 < r0 / 2, (r0, r1)
    # and the volume error must improve over the init
    err0 = float(jnp.abs(v0 - volume).mean())
    err1 = float(jnp.abs(volume_ - volume).mean())
    assert err1 < err0, (err0, err1)


def _tiny_problem():
    vs = 8
    volume = jnp.asarray(
        np.random.default_rng(0).normal(size=(vs, vs, vs)), dtype=jnp.float32
    )[None, None]
    psf = jnp.asarray(get_psf(res_ratio=(1.0, 1.0, 2.0)))
    ax = jnp.asarray(
        [[0.3, -0.1, 0.2, 0.5, -0.4, 0.3], [0.0, 0.5, -0.2, 0.1, 0.2, -0.6]],
        dtype=jnp.float32,
    )
    from nesvor_tpu.transform import axisangle2mat

    mats = axisangle2mat(ax)
    return volume, psf, mats, (6, 6)


def test_forward_grad_vol_finite_diff():
    volume, psf, mats, ss = _tiny_problem()

    def f(v):
        out = slice_acquisition(mats, v, None, None, psf, ss, 1.0, False, False)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape) * 0.1))

    g = jax.grad(f)(volume)
    rng = np.random.default_rng(1)
    for _ in range(3):
        dv = jnp.asarray(rng.normal(size=volume.shape), dtype=jnp.float32)
        eps = 1e-3
        fd = (f(volume + eps * dv) - f(volume - eps * dv)) / (2 * eps)
        an = jnp.vdot(g, dv)
        assert_close(an, fd, atol=2e-2, rtol=2e-2)


def test_forward_grad_transform_finite_diff():
    volume, psf, mats, ss = _tiny_problem()

    def f(m):
        out = slice_acquisition(m, volume, None, None, psf, ss, 1.0, False, False)
        return jnp.sum(out * jnp.sin(jnp.arange(out.size).reshape(out.shape) * 0.05))

    g = jax.grad(f)(mats)
    rng = np.random.default_rng(2)
    with jax.enable_x64(True):
        mats64 = mats.astype(jnp.float64)
        vol64 = volume.astype(jnp.float64)
        psf64 = psf.astype(jnp.float64)

        def f64(m):
            out = slice_acquisition(m, vol64, None, None, psf64, ss, 1.0, False, False)
            return jnp.sum(
                out * jnp.sin(jnp.arange(out.size).reshape(out.shape) * 0.05)
            )

        g64 = jax.grad(f64)(mats64)
        for _ in range(3):
            dm = jnp.asarray(rng.normal(size=mats.shape))
            eps = 1e-6
            fd = (f64(mats64 + eps * dm) - f64(mats64 - eps * dm)) / (2 * eps)
            an = jnp.vdot(g64, dm)
            assert_close(an, fd, atol=1e-4, rtol=1e-4)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_adjoint_grad_slices_finite_diff():
    """equalize=False: the equalize branch intentionally clamps its gradient
    like the reference (slice_acq_cuda_kernel.cu:683-687), so exact FD checks
    only apply to the unequalized splat."""
    volume, psf, mats, ss = _tiny_problem()
    vs = volume.shape[-1]
    slices = slice_acquisition(mats, volume, None, None, psf, ss, 1.0, False, False)

    def f(s):
        v = slice_acquisition_adjoint(
            mats, psf, s, None, None, (vs, vs, vs), 1.0, False, False
        )
        return jnp.sum(v * jnp.cos(jnp.arange(v.size).reshape(v.shape) * 0.07))

    g = jax.grad(f)(slices)
    rng = np.random.default_rng(3)
    for _ in range(3):
        ds = jnp.asarray(rng.normal(size=slices.shape), dtype=jnp.float32)
        eps = 1e-3
        fd = (f(slices + eps * ds) - f(slices - eps * ds)) / (2 * eps)
        an = jnp.vdot(g, ds)
        assert_close(an, fd, atol=2e-2, rtol=2e-2)


@pytest.mark.slow
def test_forward_adjoint_consistency():
    """The equalized adjoint of the simulated slices is a PSF-weighted
    average of the phantom: it cannot reproduce sharp values, but it must be
    strongly correlated with the phantom over its support."""
    slices, transforms, volume, params = get_cg_recon_test_data()
    theta = mat_update_resolution(transforms.matrix(), 1, params["res_r"])
    vol_rec = slice_acquisition_adjoint(
        theta,
        params["psf"],
        slices,
        None,
        None,
        params["volume_shape"],
        params["res_s"] / params["res_r"],
        False,
        True,
    )
    from nesvor_tpu.utils import gaussian_blur

    blurred = gaussian_blur(volume, 1.2, 3.0)
    a = np.asarray(vol_rec[0, 0]).reshape(-1)
    b = np.asarray(blurred[0, 0]).reshape(-1)
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.9, corr


# ---------------------------------------------------------------------------
# slab fast path (res_slice == 1) vs general tap-scan path equivalence
# ---------------------------------------------------------------------------


def _rand_case(seed=0, n=5, h=17, w=19, vol_shape=(20, 22, 24), masked=True):
    rng = np.random.default_rng(seed)
    vol = jnp.asarray(rng.normal(size=vol_shape).astype(np.float32))
    vol_mask = (
        jnp.asarray(rng.uniform(size=vol_shape) > 0.3) if masked else None
    )
    slices_mask = (
        jnp.asarray(rng.uniform(size=(n, 1, h, w)) > 0.2) if masked else None
    )
    ax = rng.normal(size=(n, 6)).astype(np.float32) * 0.3
    ax[:, 5] = np.linspace(-6, 6, n)
    from nesvor_tpu.transform import axisangle2mat

    mats = axisangle2mat(jnp.asarray(ax))
    psf = jnp.asarray(get_psf(res_ratio=(1.0, 1.0, 2.0)))
    slices = jnp.asarray(rng.normal(size=(n, 1, h, w)).astype(np.float32))
    return vol, vol_mask, slices, slices_mask, mats, psf, (h, w), vol_shape


def test_forward_slab_matches_taps():
    from nesvor_tpu.ops import slice_acq as sa

    for masked in (False, True):
        vol, vol_mask, _, slices_mask, mats, psf, ss, _ = _rand_case(
            seed=1, masked=masked
        )
        # public API at res 1 routes to the slab path
        out_fast, wt_fast = slice_acquisition(
            mats, vol, vol_mask, slices_mask, psf, ss, 1.0, True, False
        )
        taps = jnp.concatenate(
            [jnp.asarray(sa._tap_offsets(psf.shape)), psf.reshape(-1, 1)], 1
        )
        out_ref, wt_ref = sa._forward_impl(
            mats,
            vol,
            vol_mask,
            slices_mask,
            psf.reshape(-1),
            taps,
            ss,
            1.0,
            True,
            False,
            tuple(psf.shape),
        )
        assert_close(out_fast, out_ref, atol=2e-4, rtol=1e-4)
        assert_close(wt_fast, wt_ref, atol=2e-4, rtol=1e-4)


def test_adjoint_slab_matches_taps():
    from nesvor_tpu.ops import slice_acq as sa

    for masked in (False, True):
        for equalize in (False, True):
            vol, vol_mask, slices, slices_mask, mats, psf, ss, vshape = _rand_case(
                seed=2, masked=masked
            )
            v_fast, w_fast = slice_acquisition_adjoint(
                mats, psf, slices, slices_mask, vol_mask, vshape, 1.0,
                False, equalize, return_weight=True,
            )
            v_ref, w_ref = sa._adjoint_impl(
                mats,
                psf.reshape(-1),
                jnp.concatenate(
                    [jnp.asarray(sa._tap_offsets(psf.shape)), psf.reshape(-1, 1)], 1
                ),
                slices,
                slices_mask,
                vol_mask,
                vshape,
                1.0,
                False,
                equalize,
                tuple(psf.shape),
                True,
            )
            assert_close(v_fast, v_ref, atol=3e-4, rtol=1e-4)
            assert_close(w_fast, w_ref, atol=3e-4, rtol=1e-4)


def test_slab_grad_matches_taps():
    """vol/transform/slices grads of the slab path equal the tap path's."""
    from nesvor_tpu.ops import slice_acq as sa

    vol, _, slices, _, mats, psf, ss, vshape = _rand_case(seed=3, masked=False)
    taps = jnp.concatenate(
        [jnp.asarray(sa._tap_offsets(psf.shape)), psf.reshape(-1, 1)], 1
    )

    def loss_fast(v, m):
        out = slice_acquisition(m, v, None, None, psf, ss, 1.0, False, False)
        return jnp.sum(out * slices)

    def loss_ref(v, m):
        out, _ = sa._forward_impl(
            m, v, None, None, psf.reshape(-1), taps, ss, 1.0, False, False,
            tuple(psf.shape),
        )
        return jnp.sum(out * slices)

    gv_f, gm_f = jax.grad(loss_fast, argnums=(0, 1))(vol, mats)
    gv_r, gm_r = jax.grad(loss_ref, argnums=(0, 1))(vol, mats)
    assert_close(gv_f, gv_r, atol=5e-4, rtol=5e-4)
    assert_close(gm_f, gm_r, atol=5e-3, rtol=5e-4)

    def loss_adj_fast(s):
        v = slice_acquisition_adjoint(
            mats, psf, s, None, None, vshape, 1.0, False, True
        )
        return jnp.sum(v * vol)

    def loss_adj_ref(s):
        v = sa._adjoint_impl(
            mats, psf.reshape(-1), taps, s, None, None, vshape, 1.0,
            False, True, tuple(psf.shape), False,
        )
        return jnp.sum(v * vol)

    gs_f = jax.grad(loss_adj_fast)(slices)
    gs_r = jax.grad(loss_adj_ref)(slices)
    assert_close(gs_f, gs_r, atol=5e-4, rtol=5e-4)


def test_slab_slice_chunk_equivalence():
    """slice_chunk (block-scanned slab programs, used by SVoRT inference to
    bound HBM transients) is numerically equivalent to the single-block
    path, including a ragged final block and both mask kinds."""
    vol, vmask, slices, smask, mats, psf, ss, vshape = _rand_case(seed=7)

    a, aw = slice_acquisition(
        mats, vol, vmask, smask, psf, ss, 1.0, True, False
    )
    b, bw = slice_acquisition(
        mats, vol, vmask, smask, psf, ss, 1.0, True, False, slice_chunk=2
    )
    assert_close(a, b, atol=1e-5, rtol=1e-5)
    assert_close(aw, bw, atol=1e-5, rtol=1e-5)

    for equalize in (False, True):
        va = slice_acquisition_adjoint(
            mats, psf, slices, smask, vmask, vshape, 1.0, False, equalize
        )
        vb = slice_acquisition_adjoint(
            mats, psf, slices, smask, vmask, vshape, 1.0, False, equalize,
            slice_chunk=2,
        )
        assert_close(va, vb, atol=1e-5, rtol=1e-4)
