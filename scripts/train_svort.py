"""Train a SVoRT checkpoint on synthetic motion and install it under
nesvor_tpu/checkpoints/SVoRT_<version>.npz (activates `--registration svort`).

Usage: python scripts/train_svort.py [steps] [n_examples] [vs] [version] [resume_path]

With resume_path, training warm-starts from that .npz (e.g. a previous
run's installed checkpoint or its .training.npz mid-run snapshot).
"""

import logging
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    logging.basicConfig(level=logging.INFO, stream=sys.stderr)
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    n_examples = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    vs = int(sys.argv[3]) if len(sys.argv) > 3 else 48
    version = sys.argv[4] if len(sys.argv) > 4 else "v1"
    resume_path = sys.argv[5] if len(sys.argv) > 5 else ""
    # working volume: covers the sqrt(3)*vs*res FOV with margin, rounded to
    # a 32-voxel bucket. One v5e (15.75 GB HBM) fits the differentiated
    # train step up to vs=48/96^3; vs=64/128^3 needs ~21 GB even with the
    # projector+ResNet remat (XLA's compressed-remat pass then inflates
    # gather indices 128x; see WORKLOG round-2 session-4)
    vol_vs = -(-int(np.sqrt(3) * vs + 12) // 32) * 32

    from nesvor_tpu._precision import ensure_f32_matmul_semantics

    ensure_f32_matmul_semantics()

    import os

    from nesvor_tpu import __checkpoint_dir
    from nesvor_tpu.svort.train import (
        SVoRTTrainConfig,
        make_training_example,
        pose_error,
        save_params,
        train_svort,
    )
    from nesvor_tpu.transform import mat2point

    os.makedirs(__checkpoint_dir, exist_ok=True)
    out = os.path.join(__checkpoint_dir, f"SVoRT_{version}.npz")
    # mid-run saves go to a run-scoped path; the live checkpoint (what
    # `--registration svort` loads) is only installed after the held-out
    # eval below, so a fresh run never clobbers a good shipped model with
    # half-trained weights
    inprogress = os.path.join(__checkpoint_dir, f"SVoRT_{version}.training.npz")
    cfg = SVoRTTrainConfig(
        version=version, n_iter_model=0, steps=steps, lr=2e-4,
        n_examples=n_examples, vs=vs, n_stacks=3, gap=3.0,
        motion_rot=0.06, motion_trans=2.0, motion_jitter=0.5,
        volume_shape=(vol_vs, vol_vs, vol_vs), volume_weight=1.0,
        warmup_steps=min(200, max(10, steps // 10)),
        seed=1, log_every=25,
        checkpoint_path=inprogress, save_every=max(25, steps // 20),
        refresh_every=4, init_params_path=resume_path,
    )
    t0 = time.time()
    model, params, history = train_svort(cfg)
    print(f"trained {steps} steps in {time.time()-t0:.0f} s; "
          f"loss {history['loss'][0]:.3f} -> {history['loss'][-1]:.3f}",
          flush=True)

    # held-out pose-error eval
    rots0, rots1, trs0, trs1 = [], [], [], []
    for s in range(3):
        ex = make_training_example(cfg, seed=777_000 + s)
        _, _, thetas = model(params, ex["data"])
        theta_init = mat2point(
            ex["data"]["transforms"], ex["data"]["slice_shape"][1],
            ex["data"]["slice_shape"][0], cfg.res_s,
        )
        r0, t0_ = pose_error(theta_init, ex["theta_gt"])
        r1, t1_ = pose_error(thetas[-1], ex["theta_gt"])
        rots0.append(r0); trs0.append(t0_); rots1.append(r1); trs1.append(t1_)
    print(
        f"held-out pose error: init {np.mean(rots0):.1f} mrad / "
        f"{np.mean(trs0):.2f} mm -> trained {np.mean(rots1):.1f} mrad / "
        f"{np.mean(trs1):.2f} mm", flush=True,
    )

    # install at the live path (what `--registration svort` loads) only if
    # the trained model actually beats the motion-free initialization on
    # held-out examples — same bar as tests/test_svort_pretrained.py
    improved = np.mean(rots1) < 0.8 * np.mean(rots0) and np.mean(trs1) < 0.8 * np.mean(trs0)
    if improved:
        save_params(out, params)
        if os.path.exists(inprogress):
            os.remove(inprogress)
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
