"""PSF / NCC / blur / meshgrid utility tests."""

import jax.numpy as jnp
import numpy as np

from nesvor_tpu.utils import (
    GAUSSIAN_FWHM,
    SINC_FWHM,
    gaussian_blur,
    get_psf,
    meshgrid,
    ncc_loss,
    resolution2sigma,
)
from tests.helpers import assert_close


def test_constants():
    # reference nesvor/utils/psf.py:5-6
    assert abs(GAUSSIAN_FWHM - 1 / (2 * np.sqrt(2 * np.log(2)))) < 1e-12
    assert abs(SINC_FWHM - 1.206709128803223 * GAUSSIAN_FWHM) < 1e-12


def test_resolution2sigma_forms():
    s = resolution2sigma(2.0, isotropic=True)
    assert abs(s - 2.0 * GAUSSIAN_FWHM) < 1e-6
    sx, sy, sz = resolution2sigma((1.0, 1.0, 3.0), isotropic=False)
    assert abs(sx - SINC_FWHM) < 1e-6
    assert abs(sz - 3 * GAUSSIAN_FWHM) < 1e-6
    arr = resolution2sigma(jnp.asarray([[1.0, 1.0, 3.0]]), isotropic=False)
    assert_close(arr, [[SINC_FWHM, SINC_FWHM, 3 * GAUSSIAN_FWHM]], atol=1e-6, rtol=1e-5)


def test_get_psf():
    psf = get_psf(res_ratio=(1.5, 1.5, 3.0))
    assert psf.ndim == 3
    assert abs(psf.sum() - 1.0) < 1e-6
    # odd support, symmetric
    assert all(s % 2 == 1 for s in psf.shape)
    assert_close(psf, psf[::-1, ::-1, ::-1], atol=1e-7, rtol=1e-6)


def test_ncc_identical_images():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(1, 1, 32, 32)).astype(np.float32))
    # global NCC of an image with itself = 1 -> loss -1
    loss = ncc_loss(img, img, win=None, reduction="mean")
    assert_close(loss, -1.0, atol=1e-4, rtol=1e-4)
    loss_w = ncc_loss(img, img, win=9, reduction="mean")
    assert float(loss_w) < -0.9


def test_meshgrid_centered():
    grid = meshgrid((4, 3, 2), (1.0, 2.0, 3.0))
    assert grid.shape == (2, 3, 4, 3)
    # centered: mean of coordinates = 0
    assert_close(grid.reshape(-1, 3).mean(0), [0.0, 0.0, 0.0], atol=1e-6, rtol=1e-5)
    assert_close(grid[0, 0, :, 0], [-1.5, -0.5, 0.5, 1.5], atol=1e-6, rtol=1e-6)


def test_gaussian_blur_preserves_mean():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(1, 2, size=(1, 1, 16, 16, 16)).astype(np.float32))
    y = gaussian_blur(x, 1.0, 3.0)
    assert y.shape == x.shape
    # interior mean approximately preserved
    assert abs(float(y[0, 0, 4:-4, 4:-4, 4:-4].mean() - x[0, 0, 4:-4, 4:-4, 4:-4].mean())) < 0.05


def test_packed_grid_sample_matches_plain():
    """Corner-packed one-gather sampling == plain 8-gather zero-pad
    sampling, including the border fade-out band and fully-outside points."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from nesvor_tpu.ops.interp import corner_pack_volume, grid_sample_3d

    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.normal(size=(9, 11, 13)).astype(np.float32))
    # coords spanning inside, border band, and far outside
    xyz = jnp.asarray(rng.uniform(-1.6, 1.6, size=(5000, 3)).astype(np.float32))
    ref = grid_sample_3d(vol, xyz)
    out = grid_sample_3d(corner_pack_volume(vol), xyz)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)

    # gradients w.r.t. coords agree too (VVR auto_grad path)
    g_ref = jax.grad(lambda p: jnp.sum(grid_sample_3d(vol, p) ** 2))(xyz)
    g_out = jax.grad(
        lambda p: jnp.sum(grid_sample_3d(corner_pack_volume(vol), p) ** 2)
    )(xyz)
    np.testing.assert_allclose(np.asarray(g_out), np.asarray(g_ref), atol=1e-4, rtol=1e-4)


def test_brain_phantom_generator():
    """Brain phantom (utils/brain_phantom.py): deterministic per seed,
    multi-tissue, bounded, and shape-jitter varies anatomy across seeds
    without breaking bounds (it doubles as SVoRT training data)."""
    import numpy as np
    from nesvor_tpu.utils.brain_phantom import bias_field, brain_phantom

    v1, tissues = brain_phantom(48, seed=3, return_tissues=True)
    v2 = brain_phantom(48, seed=3)
    assert v1.shape == (48, 48, 48)
    np.testing.assert_array_equal(v1, v2)  # seed-deterministic
    assert 0.0 <= v1.min() and v1.max() <= 1.2
    # every tissue class is present (scalp/skull shells are thin at n=48,
    # where the level-set fade width is ~0.5 level units)
    for name, frac in tissues.items():
        assert frac.max() > 0.3, name
    # jitter: different anatomy per seed, same bounds
    j1 = brain_phantom(48, seed=1, shape_jitter=0.15)
    j2 = brain_phantom(48, seed=2, shape_jitter=0.15)
    assert np.abs(j1 - j2).max() > 0.1
    assert 0.0 <= j1.min() and j1.max() <= 1.2

    b = bias_field(48, seed=0, strength=0.3)
    assert b.shape == (48, 48, 48)
    assert 0.5 < b.min() < b.max() < 2.0
    assert abs(float(np.log(b).mean())) < 0.05  # mean ~1 multiplicatively
