"""End-to-end `nesvor register --registration svort` drive with the installed
checkpoint: corrupt phantom stacks with per-slice motion, run the real CLI,
and measure per-slice pose recovery (gauge-removed) vs the corrupted input.

This is the flagship registration path the reference ships pretrained weights
for (reference nesvor/svort/inference.py:565-593); here the weights are the
gated synthetic-motion checkpoint (nesvor_tpu/checkpoints/SVoRT_v1.npz).

Usage: python scripts/e2e_register_svort.py [vs] [rot_std_rad] [trans_std_mm]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

import numpy as np


def gauge_removed_errors(ax_pred, ax_true):
    """Per-slice rot (mrad) / trans (mm) error after removing the global
    SE(3) gauge (Karcher-mean deviation) — registration outputs are defined
    up to a common world motion."""
    import jax.numpy as jnp

    from nesvor_tpu.svort.inference import average_rotation
    from nesvor_tpu.transform import RigidTransform

    d = RigidTransform(jnp.asarray(ax_pred)).compose(
        RigidTransform(jnp.asarray(ax_true)).inv()
    )
    d_ax = np.asarray(d.axisangle(trans_first=False))
    mean_r = np.asarray(average_rotation(d_ax[:, :3]))[0]
    mean_t = d_ax[:, 3:].mean(0)
    g = RigidTransform(
        jnp.asarray(np.concatenate([mean_r, mean_t])[None], jnp.float32),
        trans_first=False,
    )
    resid = np.asarray(g.inv().compose(d).axisangle(trans_first=False))
    rot = float(np.linalg.norm(resid[:, :3], axis=-1).mean()) * 1e3
    trans = float(np.linalg.norm(resid[:, 3:], axis=-1).mean())
    return rot, trans


def main():
    vs = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    rot_std = float(sys.argv[2]) if len(sys.argv) > 2 else 0.04
    trans_std = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5

    from nesvor_tpu._precision import ensure_f32_matmul_semantics

    ensure_f32_matmul_semantics()

    import jax.numpy as jnp

    from nesvor_tpu.cli.main import main as cli_main
    from nesvor_tpu.image import load_slices
    from nesvor_tpu.transform import RigidTransform
    from tests.synth import make_phantom_stacks
    from tests.test_e2e_reconstruct import _save_stacks

    stacks, _ = make_phantom_stacks(
        vs=vs, n_stacks=3, gap=3.0, res=1.0, res_s=1.0, intensity=700.0
    )

    rng = np.random.default_rng(42)
    true_ax, corrupt_ax, nonempty = [], [], []
    for stack in stacks:
        ax = np.asarray(stack.transformation.axisangle())
        true_ax.append(ax.copy())
        noise = np.concatenate(
            [
                rng.normal(0, rot_std, (ax.shape[0], 3)),
                rng.normal(0, trans_std, (ax.shape[0], 3)),
            ],
            -1,
        ).astype(np.float32)
        ax = ax + noise
        corrupt_ax.append(ax)
        stack.transformation = RigidTransform(jnp.asarray(ax))
        nonempty.append(
            np.asarray(stack.mask).reshape(len(stack.mask), -1).any(1)
        )

    with tempfile.TemporaryDirectory() as folder:
        paths = _save_stacks(stacks, folder)
        out_slices = os.path.join(folder, "slices")
        t0 = time.time()
        cli_main(
            [
                "register",
                "--input-stacks", *paths,
                "--registration", "svort",
                "--output-slices", out_slices,
                "--verbose", "1",
            ]
        )
        wall = time.time() - t0
        slices = load_slices(out_slices)

    # output order = stacks in order, nonempty slices only
    rec_ax = np.concatenate(
        [np.asarray(s.transformation.axisangle()) for s in slices], 0
    )
    true_kept = np.concatenate(
        [ax[keep] for ax, keep in zip(true_ax, nonempty)], 0
    )
    corrupt_kept = np.concatenate(
        [ax[keep] for ax, keep in zip(corrupt_ax, nonempty)], 0
    )
    assert rec_ax.shape == true_kept.shape, (rec_ax.shape, true_kept.shape)

    r0, t0_ = gauge_removed_errors(corrupt_kept, true_kept)
    r1, t1_ = gauge_removed_errors(rec_ax, true_kept)
    print(
        f"e2e register --registration svort ({len(slices)} slices, "
        f"{wall:.0f} s): pose error corrupt {r0:.1f} mrad / {t0_:.2f} mm -> "
        f"registered {r1:.1f} mrad / {t1_:.2f} mm",
        flush=True,
    )
    ok = r1 < r0 and t1_ < t0_
    print("RECOVERY " + ("OK" if ok else "FAILED"), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
