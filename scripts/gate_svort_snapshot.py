"""Gate a mid-run SVoRT training snapshot and install it as the live
checkpoint if it beats the motion-free initialization on held-out examples.

Applies the same bar as scripts/train_svort.py's end-of-run install (>20%
held-out pose-error improvement, same seed family 777_000+), so a run cut
short by a wall-clock budget can still ship its last mid-run save.

Usage: python scripts/gate_svort_snapshot.py <snapshot.npz> [version] [vs]
"""

import os
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    import logging

    logging.basicConfig(level=logging.INFO, stream=sys.stderr)
    snapshot = sys.argv[1]
    version = sys.argv[2] if len(sys.argv) > 2 else "v1"
    vs = int(sys.argv[3]) if len(sys.argv) > 3 else 48

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

    params = load_converted(snapshot)
    model = SVoRT(n_iter=3) if version == "v1" else SVoRTv2(n_iter=4)

    cfg = SVoRTTrainConfig(
        version=version, vs=vs, n_stacks=3, gap=3.0,
        motion_rot=0.06, motion_trans=2.0,
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
            f"example {s}: init {r0:.1f} mrad / {t0:.2f} mm -> "
            f"{r1:.1f} mrad / {t1:.2f} mm", flush=True,
        )
    print(
        f"held-out pose error: init {np.mean(rots0):.1f} mrad / "
        f"{np.mean(trs0):.2f} mm -> trained {np.mean(rots1):.1f} mrad / "
        f"{np.mean(trs1):.2f} mm", flush=True,
    )
    improved = (
        np.mean(rots1) < 0.8 * np.mean(rots0)
        and np.mean(trs1) < 0.8 * np.mean(trs0)
    )
    out = os.path.join(__checkpoint_dir, f"SVoRT_{version}.npz")
    if improved:
        save_params(out, params)
        print(f"gate PASSED; installed {out}", flush=True)
    else:
        print("gate NOT met; nothing installed", flush=True)
        sys.exit(2)


if __name__ == "__main__":
    main()
