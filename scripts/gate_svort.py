"""Gate a SVoRT mid-run snapshot on held-out pose improvement and install it.

Standalone entry for when a wall-clock-bounded training run saved its last
mid-run snapshot but was cut before the held-out eval could run. Thin wrapper
over nesvor_tpu.svort.train.gate_and_install — the SAME helper the end of
scripts/train_svort.py calls, so there is exactly one gate (same config, same
held-out seeds, same >20% bar as tests/test_svort_pretrained.py). The gate
evaluates the inference (while_loop CG) form of the model — what
``--registration svort`` deploys — see held_out_gate's docstring.

Usage: python scripts/gate_svort.py [snapshot_path] [version] [vs]
"""

import logging
import sys

sys.path.insert(0, ".")


def main():
    logging.basicConfig(level=logging.INFO, stream=sys.stderr)
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

    params = load_converted(snap)
    gate_and_install(params, version, vs)


if __name__ == "__main__":
    main()
