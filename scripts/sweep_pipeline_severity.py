"""SVoRT-vs-VVR severity crossover on the PIPELINE selection score
(VERDICT r05 item 3).

The register command picks between the SVoRT transformer's per-slice
transforms and classical stack VVR by simulated-NCC similarity score
(svort/inference.py run_svort; reference nesvor/svort/inference.py:447-562
— `--registration svort` is the reference's load-bearing default,
reference cli/commands.py:171-176). The round-4 severity sweep measured
pose RESIDUALS only; this study runs the actual selection at increasing
per-slice corruption severities and records, per severity:

  * score_svort / score_vvr (the numbers the selection compares),
  * which branch won,
  * gauge-removed per-slice pose error of the registered output vs truth,
  * per-phase walls.

Severity axis: per-slice N(0, rot_std) rad / N(0, trans_std) mm, spanning
realistic (0.02/0.75 — a well-behaved scan) to the held-out gate's extreme
regime (the gate corrupts ~0.3 rad per-slice + stack-level jitter; here
0.24/9.0 is the top pipeline-representable point).

Usage: python scripts/sweep_pipeline_severity.py [vs] [res]
Appends one JSON line per severity to checkpoints/pipeline_severity.jsonl;
the crossover table goes to PERF.md + user guidance to MIGRATION.md.
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")

import numpy as np

SEVERITIES = [  # (rot_std rad, trans_std mm)
    (0.02, 0.75),
    (0.04, 1.5),   # the full-pipeline bench severity
    (0.08, 3.0),
    (0.16, 6.0),
    (0.24, 9.0),
]


def main():
    vs = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    res = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5

    from nesvor_tpu._precision import ensure_f32_matmul_semantics

    ensure_f32_matmul_semantics()

    import jax.numpy as jnp

    from nesvor_tpu.cli.main import main as cli_main
    from nesvor_tpu.image import load_slices
    from nesvor_tpu.svort import inference as svort_inference
    from nesvor_tpu.transform import RigidTransform
    from scripts.bench_full_pipeline import (
        _gauge_removed_errors,
        _simulate_or_load,
    )
    from tests.test_e2e_reconstruct import _save_stacks

    out_path = os.path.join("nesvor_tpu", "checkpoints",
                            "pipeline_severity.jsonl")
    gap = 3 * res

    for rot_std, trans_std in SEVERITIES:
        stacks, gt, brain_mask = _simulate_or_load(vs, res, gap)
        rng = np.random.default_rng(42)
        true_ax, nonempty = [], []
        for stack in stacks:
            ax = np.asarray(stack.transformation.axisangle())
            true_ax.append(ax.copy())
            noise = np.concatenate(
                [rng.normal(0, rot_std, (ax.shape[0], 3)),
                 rng.normal(0, trans_std, (ax.shape[0], 3))], -1
            ).astype(np.float32)
            stack.transformation = RigidTransform(jnp.asarray(ax + noise))
            nonempty.append(
                np.asarray(stack.mask).reshape(len(stack.mask), -1).any(1)
            )

        folder = f"/tmp/sev_run_{rot_std}_{trans_std}"
        if os.path.exists(folder):
            shutil.rmtree(folder)
        os.makedirs(folder)
        paths = _save_stacks(stacks, folder)
        slices_dir = os.path.join(folder, "slices")

        t0 = time.time()
        cli_main([
            "register",
            "--input-stacks", *paths,
            "--registration", "svort",
            "--output-slices", slices_dir,
            "--verbose", "1",
        ])
        register_s = time.time() - t0
        stats = dict(svort_inference.LAST_REGISTER_STATS)

        reg_slices = load_slices(slices_dir)
        true_kept = np.concatenate(
            [ax[keep] for ax, keep in zip(true_ax, nonempty)], 0
        )
        ax_reg = np.concatenate(
            [np.asarray(s.transformation.axisangle()) for s in reg_slices], 0
        )
        _, _, rot_mrad, trans_mm = _gauge_removed_errors(ax_reg, true_kept)

        # corruption magnitude for reference: E|N(0,s^2 I3)| = s*2*sqrt(2/pi)
        rec = {
            "rot_std_rad": rot_std, "trans_std_mm": trans_std,
            "init_rot_mrad_mean": round(
                rot_std * 2 * np.sqrt(2 / np.pi) * 1e3, 1
            ),
            "score_svort": round(stats.get("score_svort", float("nan")), 6),
            "score_vvr": round(stats.get("score_vvr", float("nan")), 6),
            "chosen": stats.get("chosen"),
            "svort_s": round(stats.get("svort_s", 0.0), 1),
            "vvr_s": round(stats.get("vvr_s", 0.0), 1),
            "vvr_levels": stats.get("vvr_levels", []),
            "register_s": round(register_s, 1),
            "reg_err_rot_mrad_med": round(float(np.median(rot_mrad)), 1),
            "reg_err_trans_mm_med": round(float(np.median(trans_mm)), 2),
            "reg_err_rot_mrad_mean": round(float(rot_mrad.mean()), 1),
            "vs": vs, "res": res, "ts": time.strftime("%Y-%m-%d %H:%M:%S"),
        }
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)
        shutil.rmtree(folder)


if __name__ == "__main__":
    main()
