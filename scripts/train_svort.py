"""Train a SVoRT checkpoint on synthetic motion and install it under
nesvor_tpu/checkpoints/SVoRT_<version>.npz (activates `--registration svort`).

Usage: python scripts/train_svort.py [steps] [n_examples] [vs] [version] [resume_path] [seed] [brain_frac] [grad_clip] [lr] [batch] [k=v ...]

Trailing key=value pairs set the round-5 recipe levers:
  sev_start=0.3 sev_end=1.0   severity curriculum (motion multiplier,
                              annealed linearly over the session)
  milestones=0.5,0.75         within-session LR decay points (fractions)
  gamma=0.33                  LR decay factor at each milestone
  volume_every=4              volume-loss term every k-th step only
  zero_mean_jitter=1          project the unobservable across-stack mean
                              out of the stack-orientation jitter targets
  stack_jitter=0.15           stack-orientation jitter std (rad/axis)

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
    extras = {}
    for a in sys.argv[11:]:
        k, _, v = a.partition("=")
        assert k in ("sev_start", "sev_end", "milestones", "gamma",
                     "volume_every", "zero_mean_jitter", "stack_jitter"), (
            f"unknown extra {a!r}"
        )
        extras[k] = v
    sev_start = float(extras.get("sev_start", 1.0))
    sev_end = float(extras.get("sev_end", 1.0))
    milestones = tuple(
        float(x) for x in extras.get("milestones", "").split(",") if x
    )
    gamma = float(extras.get("gamma", 0.33))
    volume_every = int(extras.get("volume_every", 1))
    zero_mean_jitter = bool(int(extras.get("zero_mean_jitter", 0)))
    stack_jitter = float(extras.get("stack_jitter", 0.1))
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
        sev_start=sev_start, sev_end=sev_end,
        lr_milestones=milestones, lr_gamma=gamma,
        volume_every=volume_every,
        zero_mean_jitter=zero_mean_jitter, stack_jitter=stack_jitter,
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
    # continue the cumulative step axis only when this session resumes the
    # version's own lineage (the installed checkpoint or its training
    # snapshot); an unrelated resume source starts its own axis and each
    # record carries the resume basename so lineage is auditable
    # (ADVICE r04)
    resume_base = os.path.basename(resume_path) if resume_path else ""
    own_lineage = resume_base.startswith(f"SVoRT_{version}")
    step0 = 0
    if resume_path and own_lineage and os.path.exists(curve_path):
        with open(curve_path) as f:
            lines = [json.loads(ln) for ln in f if ln.strip()]
        if lines:
            step0 = int(lines[-1]["step"])
    with open(curve_path, "a") as f:
        for st, ev in history["eval"]:
            rec = {"step": step0 + st, "seed": seed,
                   "brain_frac": cfg.brain_frac, "resume": resume_base}
            if sev_start != 1.0 or sev_end != 1.0:
                rec["sev"] = [sev_start, sev_end]
            if milestones:
                rec["lr_milestones"] = list(milestones)
            if volume_every > 1:
                rec["volume_every"] = volume_every
            if zero_mean_jitter:
                rec["zero_mean_jitter"] = True
            if stack_jitter != 0.1:
                rec["stack_jitter"] = stack_jitter
            for name, v in ev.items():
                rec[f"rot_mrad_{name}"] = round(v[0], 2)
                rec[f"trans_mm_{name}"] = round(v[1], 3)
                if len(v) > 2:  # gauge-removed pair (r05+ records)
                    rec[f"rot_gauge_mrad_{name}"] = round(v[2], 2)
                    rec[f"trans_gauge_mm_{name}"] = round(v[3], 3)
            f.write(json.dumps(rec) + "\n")
    if history["eval"]:
        last = history["eval"][-1][1]
        print(f"held-out curve appended to {curve_path}; final: "
              + "  ".join(f"{k}: {v[0]:.1f} mrad / {v[1]:.2f} mm"
                          for k, v in last.items()),
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
