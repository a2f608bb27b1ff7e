"""Capture a jax.profiler trace of the real train-step chunk and print the
top device ops by total time. Usage: python scripts/trace_step.py [encoder]
[n_steps] [width] [depth]."""

import glob
import gzip
import json
import os
import sys
import time
from argparse import Namespace
from collections import defaultdict

sys.path.insert(0, ".")

import jax
import numpy as np


def main():
    enc = sys.argv[1] if len(sys.argv) > 1 else "fourier"
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    width = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    depth = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    from tests.synth import make_phantom_stacks, stacks_to_slices
    import importlib

    T = importlib.import_module("nesvor_tpu.nesvor.train")

    stacks, _ = make_phantom_stacks(
        vs=64, n_stacks=8, gap=3.0, res=1.0, res_s=1.0, intensity=1.0
    )
    slices = stacks_to_slices(stacks)
    args = Namespace(
        n_features_per_level=2, log2_hashmap_size=19, level_scale=1.3819,
        coarsest_resolution=16.0, finest_resolution=0.5, n_levels_bias=0,
        depth=depth, width=width, fourier_dirs=8, head_width=64, head_depth=1,
        n_features_z=15, n_features_slice=16,
        no_transformation_optimization=False, no_slice_scale=False,
        no_pixel_variance=False, no_slice_variance=False, single_precision=False,
        weight_transformation=0.1, weight_bias=100.0,
        image_regularization="edge", weight_image=2.0, delta=0.2,
        learning_rate=5e-3, gamma=0.33, milestones=[0.5, 0.75, 0.9],
        n_iter=10 * n_steps, batch_size=4096, n_samples=256,
        seed=0, mask_threshold=1.0, encoder=enc,
    )
    ds = T.Dataset(slices, args)
    bb = ds.bounding_box
    inr_cfg = T.build_inr_config(bb, args)
    cfg = T.NeSVoRConfig(
        inr=inr_cfg, n_slices=len(slices), n_samples=args.n_samples,
        n_features_slice=args.n_features_slice, n_levels_bias=args.n_levels_bias,
        image_regularization="edge", delta=args.delta,
        head_width=args.head_width, head_depth=args.head_depth,
    )
    key = jax.random.PRNGKey(0)
    params, consts = T.init_nesvor(
        key, cfg, ds.transformation, ds.resolution, ds.mean
    )
    tx, _ = T.build_optimizer(params, cfg, args)
    opt_state = tx.init(params)
    lw = {T.D_LOSS: 1.0, T.S_LOSS: 1.0, T.T_REG: 0.1, T.B_REG: 100.0, T.I_REG: 2.0}
    n_pixels = int(ds.v.shape[0])
    data = {"xyz": ds.xyz, "v": ds.v, "slice_idx": ds.slice_idx}
    run_chunk = T.make_train_step(cfg, bb, lw, tx, args.batch_size, n_pixels)

    def once():
        p, o, names, stack = run_chunk(
            params, opt_state, consts, data, key, 0, n_steps
        )
        return np.asarray(stack)

    t0 = time.time()
    once()
    print(f"compile+first: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    once()
    dt = time.time() - t0
    print(f"steady: {dt/n_steps*1e3:.1f} ms/step", flush=True)

    trace_dir = "/tmp/jax_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        once()

    files = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    print("trace files:", files, flush=True)
    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for f in files:
        with gzip.open(f, "rt") as fh:
            tr = json.load(fh)
        # device-side complete events: pick pids whose track name mentions TPU/XLA Ops
        pid_name = {}
        for ev in tr.get("traceEvents", []):
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                pid_name[ev["pid"]] = ev["args"].get("name", "")
        dev_pids = {
            p for p, n in pid_name.items()
            if ("TPU" in n or "/device" in n.lower()) and "host" not in n.lower()
        }
        for ev in tr.get("traceEvents", []):
            if ev.get("ph") != "X" or "dur" not in ev:
                continue
            if ev.get("pid") not in dev_pids:
                continue
            name = ev.get("name", "?")
            agg[name] += ev["dur"]
            cnt[name] += 1
            total += ev["dur"]
    print(f"\ntotal device-op time: {total/1e3:.1f} ms over {n_steps} steps "
          f"({total/1e3/n_steps:.2f} ms/step)")
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:40]
    for name, us in rows:
        print(f"{us/1e3/n_steps:8.3f} ms/step  x{cnt[name]:<5d} {name[:110]}")


if __name__ == "__main__":
    main()
