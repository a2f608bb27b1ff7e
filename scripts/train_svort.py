"""Train a SVoRT checkpoint on synthetic motion and install it under
nesvor_tpu/checkpoints/SVoRT_<version>.npz (activates `--registration svort`).

Usage: python scripts/train_svort.py [steps] [n_examples] [vs] [version] [resume_path] [seed] [brain_frac] [grad_clip] [lr] [batch]

With resume_path, training warm-starts from that .npz (e.g. a previous
run's installed checkpoint or its .training.npz mid-run snapshot). Pass a
fresh seed per continuation so each session trains on NEW simulated motion
examples instead of replaying the previous run's pool/refresh stream (the
held-out gate uses seeds 777000+; any seed < 100000 is safe).
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
    seed = int(sys.argv[6]) if len(sys.argv) > 6 else 1
    brain_frac = float(sys.argv[7]) if len(sys.argv) > 7 else 0.5
    grad_clip = float(sys.argv[8]) if len(sys.argv) > 8 else 0.0
    lr = float(sys.argv[9]) if len(sys.argv) > 9 else 2e-4
    batch = int(sys.argv[10]) if len(sys.argv) > 10 else 1
    assert seed < 100_000, "seeds 777000+ are reserved for the held-out gate"
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
        gate_and_install,
        opt_state_path,
        train_svort,
    )

    os.makedirs(__checkpoint_dir, exist_ok=True)
    # mid-run saves go to a run-scoped path; the live checkpoint (what
    # `--registration svort` loads) is only installed after the held-out
    # eval below, so a fresh run never clobbers a good shipped model with
    # half-trained weights
    inprogress = os.path.join(__checkpoint_dir, f"SVoRT_{version}.training.npz")
    # continuation with optimizer state: prefer the moments saved next to
    # the resume checkpoint; fall back to the training snapshot's (the
    # installer keeps it — installed params == final snapshot params, so
    # the pair stays consistent). With restored moments the LR warmup
    # (from-scratch stability insurance) is skipped: ramping a mid-run
    # optimizer from lr=0 only wastes steps.
    init_opt = ""
    if resume_path:
        for cand in (opt_state_path(resume_path), opt_state_path(inprogress)):
            if os.path.exists(cand):
                init_opt = cand
                break
    warmup = 0 if init_opt else min(200, max(10, steps // 10))
    cfg = SVoRTTrainConfig(
        version=version, n_iter_model=0, steps=steps, lr=lr,
        n_examples=n_examples, vs=vs, n_stacks=3, gap=3.0,
        motion_rot=0.06, motion_trans=2.0, motion_jitter=0.5,
        volume_shape=(vol_vs, vol_vs, vol_vs), volume_weight=1.0,
        warmup_steps=warmup,
        seed=seed, log_every=25,
        # each save synchronously moves ~0.5 GB through the tunnel
        # (~2-3 min); ~steps/4 cadence bounds crash loss at 25% of the
        # session for ~3 saves of overhead
        checkpoint_path=inprogress, save_every=max(100, steps // 4),
        refresh_every=4, init_params_path=resume_path,
        init_opt_path=init_opt,
        # default: half the simulated examples are brain-like (folded
        # cortex, multi-tissue) rather than smooth ellipsoids — the mix
        # keeps geometric diversity while closing the feature-richness
        # domain gap with the reference's fetal-trained weights
        brain_frac=brain_frac,
        grad_clip=grad_clip,
        batch_examples=batch,
        # held-out error-vs-steps curve (fixed 888k-seed examples),
        # appended to the cumulative per-version curve file below
        eval_every=max(25, steps // 40),
    )
    t0 = time.time()
    model, params, history = train_svort(cfg)
    print(f"trained {steps} steps in {time.time()-t0:.0f} s; "
          f"loss {history['loss'][0]:.3f} -> {history['loss'][-1]:.3f}",
          flush=True)

    # append this session's held-out curve to the cumulative record; the
    # step axis continues from the last line when warm-starting so the
    # cross-session convergence curve reads as one training run
    import json

    curve_path = os.path.join(__checkpoint_dir, f"SVoRT_{version}.curve.jsonl")
    step0 = 0
    if resume_path and os.path.exists(curve_path):
        with open(curve_path) as f:
            lines = [json.loads(ln) for ln in f if ln.strip()]
        if lines:
            step0 = int(lines[-1]["step"])
    with open(curve_path, "a") as f:
        for st, ev in history["eval"]:
            rec = {"step": step0 + st, "seed": seed,
                   "brain_frac": cfg.brain_frac}
            for name, (rot, tr) in ev.items():
                rec[f"rot_mrad_{name}"] = round(rot, 2)
                rec[f"trans_mm_{name}"] = round(tr, 3)
            f.write(json.dumps(rec) + "\n")
    if history["eval"]:
        last = history["eval"][-1][1]
        print(f"held-out curve appended to {curve_path}; final: "
              + "  ".join(f"{k}: {r:.1f} mrad / {t:.2f} mm"
                          for k, (r, t) in last.items()),
              flush=True)

    # held-out pose-error eval + install decision: the single shared gate
    # (nesvor_tpu.svort.train.gate_and_install) — same config, seeds, and
    # >20% bar as scripts/gate_svort.py and tests/test_svort_pretrained.py.
    # Evaluates the inference (while_loop CG) model form, not the
    # differentiable-SRR training form.
    res = gate_and_install(params, version, vs)
    # drop the redundant snapshot only when the weights were actually
    # INSTALLED (res["path"] is the live checkpoint); a passing-but-not-
    # better candidate lands at .candidate.npz and the sidecar next to
    # the snapshot remains the continuation's optimizer source
    installed = res.get("path", "").endswith(f"SVoRT_{version}.npz")
    if installed and os.path.exists(inprogress):
        os.remove(inprogress)


if __name__ == "__main__":
    main()
