"""Gate a SVoRT mid-run snapshot on held-out pose improvement and install it.

Standalone version of the gate at the end of scripts/train_svort.py, for
when a wall-clock-bounded training run saved its last mid-run snapshot but
was cut before the held-out eval could run. Same bar as
tests/test_svort_pretrained.py: mean held-out rotation AND translation
error must beat the motion-free initialization by >20%, else the weights
are saved at .ungated.npz and NOT installed.

Usage: python scripts/gate_svort.py [snapshot_path] [version] [vs]
"""

import logging
import os
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    logging.basicConfig(level=logging.INFO, stream=sys.stderr)
    snap = (
        sys.argv[1]
        if len(sys.argv) > 1
        else "nesvor_tpu/checkpoints/SVoRT_v1.training.npz"
    )
    version = sys.argv[2] if len(sys.argv) > 2 else "v1"
    vs = int(sys.argv[3]) if len(sys.argv) > 3 else 48
    vol_vs = -(-int(np.sqrt(3) * vs + 12) // 32) * 32

    from nesvor_tpu._precision import ensure_f32_matmul_semantics

    ensure_f32_matmul_semantics()

    from nesvor_tpu import __checkpoint_dir
    from nesvor_tpu.svort.convert import load_converted
    from nesvor_tpu.svort.models import SVoRT, SVoRTv2
    from nesvor_tpu.svort.train import (
        SVoRTTrainConfig,
        make_training_example,
        pose_error,
        save_params,
    )
    from nesvor_tpu.transform import mat2point

    model = SVoRT(n_iter=3) if version == "v1" else SVoRTv2(n_iter=4)
    params = load_converted(snap)

    # identical config (and so identical compiled shapes + held-out seeds)
    # to the gate block in scripts/train_svort.py
    cfg = SVoRTTrainConfig(
        version=version, vs=vs, n_stacks=3, gap=3.0,
        motion_rot=0.06, motion_trans=2.0, motion_jitter=0.5,
        volume_shape=(vol_vs, vol_vs, vol_vs),
    )
    rots0, rots1, trs0, trs1 = [], [], [], []
    for s in range(3):
        ex = make_training_example(cfg, seed=777_000 + s)
        _, _, thetas = model(params, ex["data"])
        theta_init = mat2point(
            ex["data"]["transforms"], ex["data"]["slice_shape"][1],
            ex["data"]["slice_shape"][0], cfg.res_s,
        )
        r0, t0 = pose_error(theta_init, ex["theta_gt"])
        r1, t1 = pose_error(thetas[-1], ex["theta_gt"])
        rots0.append(r0); trs0.append(t0); rots1.append(r1); trs1.append(t1)
        print(
            f"held-out {s}: init {r0:.1f} mrad / {t0:.2f} mm -> "
            f"trained {r1:.1f} mrad / {t1:.2f} mm", flush=True,
        )
    print(
        f"held-out pose error: init {np.mean(rots0):.1f} mrad / "
        f"{np.mean(trs0):.2f} mm -> trained {np.mean(rots1):.1f} mrad / "
        f"{np.mean(trs1):.2f} mm", flush=True,
    )

    out = os.path.join(__checkpoint_dir, f"SVoRT_{version}.npz")
    improved = (
        np.mean(rots1) < 0.8 * np.mean(rots0)
        and np.mean(trs1) < 0.8 * np.mean(trs0)
    )
    if improved:
        save_params(out, params)
        print(f"saved {out}", flush=True)
    else:
        ungated = out.replace(".npz", ".ungated.npz")
        save_params(ungated, params)
        print(
            f"held-out gate NOT met; weights at {ungated} (not installed)",
            flush=True,
        )


if __name__ == "__main__":
    main()
