"""Time slice_acquisition fwd/adjoint at SVoRT/SRR scale on the TPU.

Scale: reference run_svort parse_data crops stacks to 128x128 at 1 mm
(inference.py:176-247); a 3-stack v1 group is ~100-200 slices; SRR CG runs
2 iterations x (A, At) per CG step over a ~128^3 volume.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from nesvor_tpu.ops.slice_acq import slice_acquisition, slice_acquisition_adjoint
from nesvor_tpu.utils import get_PSF


def main():
    n, h, w = (int(x) for x in (sys.argv[1:4] or [96, 128, 128]))
    D = int(sys.argv[4]) if len(sys.argv) > 4 else 128
    vol_shape = (D, 128, 128)
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.normal(size=vol_shape).astype(np.float32))
    psf = get_PSF(r_max=None, res_ratio=(1.0, 1.0, 3.0))
    print(f"psf shape: {psf.shape}, slices ({n},{h},{w}), vol {vol_shape}", flush=True)
    ax = rng.normal(size=(n, 6)).astype(np.float32) * 0.2
    ax[:, 5] = np.linspace(-D / 3, D / 3, n)
    from nesvor_tpu.transform import axisangle2mat

    mats = axisangle2mat(jnp.asarray(ax))

    slices = jnp.asarray(rng.normal(size=(n, 1, h, w)).astype(np.float32))

    @jax.jit
    def fwd(mats, vol):
        out = slice_acquisition(
            mats, vol, None, None, psf, (h, w), 1.0, False, False
        )
        return jnp.sum(out)

    @jax.jit
    def adj(mats, slices):
        v = slice_acquisition_adjoint(
            mats, psf, slices, None, None, vol_shape, 1.0, False, True
        )
        return jnp.sum(v)

    for name, fn, args in [
        ("forward", fwd, (mats, vol)),
        ("adjoint", adj, (mats, slices)),
    ]:
        t0 = time.time()
        np.asarray(fn(*args))
        t_c = time.time() - t0
        t0 = time.time()
        np.asarray(fn(*args))
        dt = time.time() - t0
        print(f"{name}: {dt*1e3:.0f} ms (compile+run {t_c:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
