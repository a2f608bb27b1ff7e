"""Residual-vs-initial-severity sweep of the installed SVoRT checkpoints
(VERDICT r04 item 2).

The held-out gate corrupts examples at ONE severity (the full reset task:
init ~1112 mrad, dominated by the base stack orientations the reset input
zeroes, plus per-slice motion at motion_rot=0.06 / motion_trans=2.0).
This sweep scales the per-slice MOTION by several factors and evaluates
the installed checkpoint at each, which decides what the ~180-190 mrad
plateau is made of:

  - residual FLAT across motion scales  -> the floor is the stack-
    orientation-inference part of the task (reset rotations), and further
    motion-severity curricula cannot move it;
  - residual TRACKING the motion scale  -> the model recovers coarse
    orientation but not fine per-slice motion, and training at staged
    severities targets the right term.

Usage: python scripts/sweep_severity.py [versions] [vs] [n_examples]
  versions: comma list, default "v1,v2"

Appends one JSON line per (version, severity) to
nesvor_tpu/checkpoints/severity_sweep.jsonl and prints a table.
"""

import json
import logging
import os
import sys

sys.path.insert(0, ".")


def main():
    logging.basicConfig(level=logging.INFO, stream=sys.stderr)
    versions = (sys.argv[1] if len(sys.argv) > 1 else "v1,v2").split(",")
    vs = int(sys.argv[2]) if len(sys.argv) > 2 else 48
    n_examples = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from nesvor_tpu._precision import ensure_f32_matmul_semantics

    ensure_f32_matmul_semantics()

    from nesvor_tpu import __checkpoint_dir
    from nesvor_tpu.svort.convert import load_converted
    from nesvor_tpu.svort.train import held_out_sweep

    out_path = os.path.join(__checkpoint_dir, "severity_sweep.jsonl")
    scales = (0.1, 0.25, 0.5, 0.75, 1.0)
    for version in versions:
        ckpt = os.path.join(__checkpoint_dir, f"SVoRT_{version}.npz")
        if not os.path.exists(ckpt):
            print(f"skip {version}: {ckpt} missing", flush=True)
            continue
        params = load_converted(ckpt)
        rows = held_out_sweep(
            params, version, vs, sev_scales=scales, n_examples=n_examples
        )
        print(f"\n{version} ({ckpt}):", flush=True)
        print("  sev   init rot/trans      ->  residual rot/trans "
              "(gauge-removed)", flush=True)
        with open(out_path, "a") as f:
            for r in rows:
                print(
                    f"  {r['sev_scale']:4.2f}  {r['rot_init_mrad']:7.1f} mrad"
                    f" / {r['trans_init_mm']:5.2f} mm  ->  "
                    f"{r['rot_mrad']:7.1f} mrad / {r['trans_mm']:5.2f} mm  "
                    f"({r['rot_gauge_mrad']:6.1f} mrad / "
                    f"{r['trans_gauge_mm']:5.2f} mm)",
                    flush=True,
                )
                f.write(json.dumps({"version": version, "vs": vs, **r}) + "\n")
    print(f"\nappended to {out_path}", flush=True)


if __name__ == "__main__":
    main()
