"""Evaluate an installed SVoRT checkpoint on held-out synthetic motion.

Reports per-iteration pose error (rotation mrad / translation mm) against
the motion-free initialization the model receives, on fresh examples from
the training generator family (seeds disjoint from training and from the
train-script gate). Complements tests/test_svort_pretrained.py with a
human-readable summary.

Usage: python scripts/eval_svort.py [version] [vs] [n_examples] [seed0]
"""

import logging
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    logging.basicConfig(level=logging.INFO, stream=sys.stderr)
    version = sys.argv[1] if len(sys.argv) > 1 else "v1"
    vs = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_examples = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    seed0 = int(sys.argv[4]) if len(sys.argv) > 4 else 555_000

    from nesvor_tpu._precision import ensure_f32_matmul_semantics

    ensure_f32_matmul_semantics()

    from nesvor_tpu.svort.inference import load_svort_model
    from nesvor_tpu.svort.train import (
        SVoRTTrainConfig,
        make_training_example,
        pose_error,
    )
    from nesvor_tpu.transform import mat2point

    model, params = load_svort_model(version)
    if params is None:
        print(f"no installed SVoRT_{version}.npz checkpoint", file=sys.stderr)
        sys.exit(1)

    cfg = SVoRTTrainConfig(
        version=version, vs=vs, n_stacks=3, gap=3.0,
        motion_rot=0.06, motion_trans=2.0,
        volume_shape=(128, 128, 128),
    )
    per_iter_rot = None
    per_iter_tr = None
    init_rot, init_tr = [], []
    for s in range(n_examples):
        ex = make_training_example(cfg, seed=seed0 + s)
        _, _, thetas = model(params, ex["data"])
        theta_init = mat2point(
            ex["data"]["transforms"], ex["data"]["slice_shape"][1],
            ex["data"]["slice_shape"][0], cfg.res_s,
        )
        r0, t0 = pose_error(theta_init, ex["theta_gt"])
        init_rot.append(r0)
        init_tr.append(t0)
        if per_iter_rot is None:
            per_iter_rot = [[] for _ in thetas]
            per_iter_tr = [[] for _ in thetas]
        for k, th in enumerate(thetas):
            rk, tk = pose_error(th, ex["theta_gt"])
            per_iter_rot[k].append(rk)
            per_iter_tr[k].append(tk)
        logging.info("example %d done", s)

    print(f"SVoRT {version} on {n_examples} held-out examples (vs={vs}):")
    print(
        f"  init : {np.mean(init_rot):8.1f} mrad  {np.mean(init_tr):6.2f} mm"
    )
    for k in range(len(per_iter_rot)):
        print(
            f"  iter{k}: {np.mean(per_iter_rot[k]):8.1f} mrad  "
            f"{np.mean(per_iter_tr[k]):6.2f} mm"
        )
    imp_r = np.mean(per_iter_rot[-1]) / max(np.mean(init_rot), 1e-9)
    imp_t = np.mean(per_iter_tr[-1]) / max(np.mean(init_tr), 1e-9)
    print(f"  final/init ratio: rot {imp_r:.3f}, trans {imp_t:.3f}")


if __name__ == "__main__":
    main()
