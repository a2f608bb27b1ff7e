"""Microbench the MC-sampling path pieces: batch gather, RNG, PSF mul,
rodrigues transform; threefry vs rbg PRNG; (B,S,3) vs (3,N) layouts."""

import sys
import time
from functools import partial

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

B, S = 4096, 256
N = B * S
n_steps = 10


def timed(name, fn, *a):
    fn(*a)
    t0 = time.time()
    np.asarray(fn(*a))
    dt = (time.time() - t0) / n_steps * 1e3
    print(f"{name}: {dt:.1f} ms/step", flush=True)


def scan_over(fn):
    @jax.jit
    def run(key, *a):
        def one(c, k):
            return c, fn(k, *a)
        _, outs = jax.lax.scan(one, 0, jax.random.split(key, n_steps))
        return jnp.sum(outs)
    return run


def main():
    from nesvor_tpu.transform import ax_transform_points

    key = jax.random.PRNGKey(0)
    n_pixels = 1_200_000
    data_xyz = jax.random.normal(key, (n_pixels, 3), jnp.float32)
    data_v = jax.random.normal(key, (n_pixels,), jnp.float32)
    data_si = jax.random.randint(key, (n_pixels,), 0, 192)
    psf = jax.random.uniform(key, (192, 3), jnp.float32)
    ax = jax.random.normal(key, (192, 6), jnp.float32) * 0.1

    def f_gather(k):
        idx = jax.random.randint(k, (B,), 0, n_pixels)
        return jnp.sum(data_xyz[idx]) + jnp.sum(data_v[idx])

    def f_norm_bs3(k):
        return jnp.sum(jax.random.normal(k, (B, S, 3), jnp.float32))

    def f_norm_flat(k):
        return jnp.sum(jax.random.normal(k, (3, B * S), jnp.float32))

    def f_unif_flat(k):
        # cheaper distribution: 2 uniforms vs erfinv
        return jnp.sum(jax.random.uniform(k, (3, B * S), jnp.float32))

    def f_bits(k):
        return jnp.sum(jax.random.bits(k, (3, B * S), jnp.uint32) >> 16)

    def f_full(k):
        k1, k2 = jax.random.split(k)
        idx = jax.random.randint(k1, (B,), 0, n_pixels)
        xyz = data_xyz[idx]
        si = data_si[idx]
        xyz_psf = jax.random.normal(k2, (B, S, 3), jnp.float32)
        p = psf[si][:, None]
        t = ax[si][:, None]
        xyz_t = ax_transform_points(t, xyz[:, None] + xyz_psf * p, True)
        return jnp.sum(xyz_t)

    def f_full_t3(k):
        # (3, N)-major layout: normals (B, 3, S), broadcast math on (B,3,S)
        k1, k2 = jax.random.split(k)
        idx = jax.random.randint(k1, (B,), 0, n_pixels)
        xyz = data_xyz[idx]  # (B, 3)
        si = data_si[idx]
        xyz_psf = jax.random.normal(k2, (B, 3, S), jnp.float32)
        p = psf[si][:, :, None]  # (B, 3, 1)
        pts = xyz[:, :, None] + xyz_psf * p  # (B, 3, S)
        from nesvor_tpu.transform import axisangle2mat

        mat = axisangle2mat(ax[si])  # (B, 3, 4) trans-first? use rot+t
        R = mat[:, :, :3]
        tvec = mat[:, :, 3:]
        out = jnp.einsum("bij,bjs->bis", R, pts + 0) + R @ tvec  # trans_first
        return jnp.sum(out)

    for name, f in [
        ("batch gather", f_gather),
        ("normal (B,S,3)", f_norm_bs3),
        ("normal (3,N)", f_norm_flat),
        ("uniform (3,N)", f_unif_flat),
        ("raw bits (3,N)", f_bits),
        ("full sample+transform (B,S,3)", f_full),
        ("full sample+transform (B,3,S)", f_full_t3),
    ]:
        timed(name, scan_over(f), key)

    # rbg PRNG
    rbg = jax.extend.random.wrap_key_data(
        jnp.zeros((4,), jnp.uint32), impl="rbg"
    )

    def f_norm_rbg(k):
        return jnp.sum(jax.random.normal(k, (B, S, 3), jnp.float32))

    def f_full_rbg(k):
        k1, k2 = jax.random.split(k)
        idx = jax.random.randint(k1, (B,), 0, n_pixels)
        xyz = data_xyz[idx]
        si = data_si[idx]
        xyz_psf = jax.random.normal(k2, (B, S, 3), jnp.float32)
        p = psf[si][:, None]
        t = ax[si][:, None]
        xyz_t = ax_transform_points(t, xyz[:, None] + xyz_psf * p, True)
        return jnp.sum(xyz_t)

    timed("normal (B,S,3) rbg", scan_over(f_norm_rbg), rbg)
    timed("full rbg", scan_over(f_full_rbg), rbg)


if __name__ == "__main__":
    main()
