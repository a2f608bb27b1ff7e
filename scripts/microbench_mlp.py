"""Density-MLP fwd+bwd microbench: XLA chain vs fused Pallas variants.

Usage: python scripts/microbench_mlp.py [n_rows] [n_steps]
Env: NESVOR_TPU_FUSED_TILE / NESVOR_TPU_FUSED_SAVE_HS select fused-kernel
variants inside ops/fused_mlp.py.
"""

import sys
import time
from functools import partial

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from nesvor_tpu._precision import ensure_f32_matmul_semantics

ensure_f32_matmul_semantics()

from nesvor_tpu.nesvor.models import mlp_init, mlp_apply  # noqa: E402
from nesvor_tpu.ops.fused_mlp import fused_mlp  # noqa: E402


def timed_scan(fn, params, x, n_steps, label):
    @jax.jit
    def run(params, x):
        def one(p, _):
            # grad wrt params AND x: the real model propagates dX into the
            # encoding (pose gradients). Params update each step so the scan
            # body is NOT loop-invariant (XLA would hoist it otherwise).
            loss, grads = jax.value_and_grad(fn, argnums=(0, 1))(p, x)
            p = jax.tree_util.tree_map(lambda a, g: a - 1e-12 * g, p, grads[0])
            return p, loss + jnp.sum(grads[1].astype(jnp.float32)[0])

        p, losses = jax.lax.scan(one, params, None, length=n_steps)
        return jnp.sum(losses)

    r = run(params, x)
    np.asarray(r)  # compile+first
    t0 = time.time()
    r = run(params, x)
    np.asarray(r)
    dt = time.time() - t0
    print(f"{label}: {dt/n_steps*1e3:.2f} ms/step", flush=True)


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1048576
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    d_in, width, depth, d_out = 192, 256, 3, 16

    key = jax.random.PRNGKey(0)
    params = mlp_init(key, d_in, d_out, width, depth)
    x = jax.random.normal(jax.random.PRNGKey(1), (n_rows, d_in), jnp.bfloat16)

    def loss_xla(params, x):
        return jnp.sum(mlp_apply(params, x, jnp.bfloat16) ** 2)

    def loss_fused(params, x):
        return jnp.sum(fused_mlp(params, x, jnp.bfloat16) ** 2)

    def timed_fwd(apply, label):
        @jax.jit
        def run(params, x):
            def one(p, _):
                out = apply(p, x, jnp.bfloat16)
                # perturb params so the body isn't loop-invariant
                p = jax.tree_util.tree_map(
                    lambda a: a + 1e-12 * jnp.sum(out).astype(a.dtype), p
                )
                return p, jnp.sum(out)

            _, outs = jax.lax.scan(one, params, None, length=n_steps)
            return jnp.sum(outs)

        np.asarray(run(params, x))
        t0 = time.time()
        np.asarray(run(params, x))
        print(f"{label}: {(time.time()-t0)/n_steps*1e3:.2f} ms/step", flush=True)

    timed_fwd(mlp_apply, "xla fwd only  ")
    timed_fwd(fused_mlp, "fused fwd only")
    timed_scan(loss_xla, params, x, n_steps, "xla chain   ")
    timed_scan(loss_fused, params, x, n_steps, "fused pallas")


if __name__ == "__main__":
    main()
