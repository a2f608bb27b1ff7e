"""Gate a SVoRT mid-run snapshot on held-out pose improvement and install it.

Standalone entry for when a wall-clock-bounded training run saved its last
mid-run snapshot but was cut before the held-out eval could run. Thin wrapper
over nesvor_tpu.svort.train.gate_and_install — the SAME helper the end of
scripts/train_svort.py calls, so there is exactly one gate (same config, same
held-out seeds, same >20% bar as tests/test_svort_pretrained.py). The gate
evaluates the inference (while_loop CG) form of the model — what
``--registration svort`` deploys — see held_out_gate's docstring.

Usage: python scripts/gate_svort.py [snapshot_path] [version] [vs]
       python scripts/gate_svort.py --regate [version] [vs]
       python scripts/gate_svort.py --noise-band [version] [vs] [n_draws]

--regate re-evaluates the INSTALLED checkpoint for ``version`` and rewrites
its .gate.json from the live run — used when an install record predates the
machine-written artifact (VERDICT r03 item 7: v1's record was transcribed
from a run log).

--noise-band measures the gate metric's noise band on the INSTALLED
checkpoint across N fresh held-out draws and merges it into its .gate.json
(VERDICT r05 item 4a); gate_and_install then requires future candidates to
beat the incumbent by MORE than this band.
"""

import logging
import sys

sys.path.insert(0, ".")


def _noise_band(version: str, vs: int, n_draws: int) -> None:
    import json
    import os

    from nesvor_tpu import __checkpoint_dir
    from nesvor_tpu.svort.convert import load_converted
    from nesvor_tpu.svort.train import measure_gate_noise

    out = os.path.join(__checkpoint_dir, f"SVoRT_{version}.npz")
    params = load_converted(out)
    noise = measure_gate_noise(params, version, vs, n_draws=n_draws)
    print(json.dumps(noise), flush=True)
    meta = out + ".gate.json"
    rec = {}
    if os.path.exists(meta):
        with open(meta) as f:
            rec = json.load(f)
    rec["noise_band"] = noise
    with open(meta, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"merged noise band into {meta}", flush=True)


def main():
    logging.basicConfig(level=logging.INFO, stream=sys.stderr)
    if len(sys.argv) > 1 and sys.argv[1] == "--noise-band":
        version = sys.argv[2] if len(sys.argv) > 2 else "v1"
        vs = int(sys.argv[3]) if len(sys.argv) > 3 else 48
        n_draws = int(sys.argv[4]) if len(sys.argv) > 4 else 5
        from nesvor_tpu._precision import ensure_f32_matmul_semantics

        ensure_f32_matmul_semantics()
        _noise_band(version, vs, n_draws)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--regate":
        version = sys.argv[2] if len(sys.argv) > 2 else "v1"
        vs = int(sys.argv[3]) if len(sys.argv) > 3 else 48
        snap = None
    else:
        snap = (
            sys.argv[1]
            if len(sys.argv) > 1
            else "nesvor_tpu/checkpoints/SVoRT_v1.training.npz"
        )
        version = sys.argv[2] if len(sys.argv) > 2 else "v1"
        vs = int(sys.argv[3]) if len(sys.argv) > 3 else 48

    from nesvor_tpu._precision import ensure_f32_matmul_semantics

    ensure_f32_matmul_semantics()

    from nesvor_tpu.svort.convert import load_converted
    from nesvor_tpu.svort.train import gate_and_install

    if snap is None:
        import json
        import os

        from nesvor_tpu import __checkpoint_dir
        from nesvor_tpu.svort.train import (
            gate_score,
            gate_score_gauge,
            held_out_gate,
        )

        out = os.path.join(__checkpoint_dir, f"SVoRT_{version}.npz")
        params = load_converted(out)
        res = held_out_gate(params, version, vs)
        print(
            f"installed {version} held-out: init {res['rot_init_mrad']:.1f} "
            f"mrad / {res['trans_init_mm']:.2f} mm -> {res['rot_mrad']:.1f} "
            f"mrad / {res['trans_mm']:.2f} mm "
            f"(score {gate_score(res):.4f}, improved={res['improved']})",
            flush=True,
        )
        # merge: a regate refreshes the result but must not drop the
        # measured noise band / deploy leg already in the record
        meta = out + ".gate.json"
        rec = {}
        if os.path.exists(meta):
            with open(meta) as f:
                rec = json.load(f)
        rec.update(
            {
                "version": version,
                "vs": vs,
                "result": res,
                "gate_score": gate_score(res),
                "gate_score_gauge": gate_score_gauge(res),
            }
        )
        with open(meta, "w") as f:
            json.dump(rec, f, indent=1)
        print(f"rewrote {meta}", flush=True)
        return

    params = load_converted(snap)
    gate_and_install(params, version, vs)


if __name__ == "__main__":
    main()
