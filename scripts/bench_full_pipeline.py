"""Timed full-pipeline benchmark on the ACTUAL reference workload
(VERDICT r04 item 3 / what's-missing #3): motion-corrupted brain stacks
driven through the real CLI —

    register --registration svort
      -> reconstruct --input-slices (flagship config)
      -> sample-volume at 0.5 mm

with per-phase wall-clock and PSNR/SSIM inside the brain mask. Unlike
bench.py (motion-free stacks at known poses, --registration none), the
headline quality here passes THROUGH the registration path: per-slice pose
errors degrade it. Ground truth is used only to (a) corrupt the inputs and
(b) remove the global SE(3) gauge at evaluation (registration +
reconstruction outputs are defined up to one world transform); per-slice
errors are NOT unwound.

Mirrors reference cli/commands.py:100-124 (register -> reconstruct) and
BASELINE.json configs[3-4].

Usage: python scripts/bench_full_pipeline.py [vs] [res] [n_iter]
           [--rot-std F] [--trans-std F] [--cpu]
Defaults: vs=128 res=0.5 n_iter=5000, rot 0.04 rad / trans 1.5 mm
(the realistic severity of scripts/e2e_register_svort.py).
Prints one JSON line with the per-phase breakdown; results go to PERF.md.
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def _opt(name, default, cast=float):
    if name in sys.argv:
        return cast(sys.argv[sys.argv.index(name) + 1])
    return default


def main():
    vs = int(sys.argv[1]) if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else 128
    res = float(sys.argv[2]) if len(sys.argv) > 2 and not sys.argv[2].startswith("--") else 0.5
    n_iter = int(sys.argv[3]) if len(sys.argv) > 3 and not sys.argv[3].startswith("--") else 5000
    rot_std = _opt("--rot-std", 0.04)
    trans_std = _opt("--trans-std", 1.5)

    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    from nesvor_tpu._precision import ensure_f32_matmul_semantics

    ensure_f32_matmul_semantics()

    import jax.numpy as jnp

    from nesvor_tpu.cli.main import main as cli_main
    from nesvor_tpu.image import load_slices, load_volume
    from nesvor_tpu.svort.inference import average_rotation
    from nesvor_tpu.transform import RigidTransform
    from tests.synth import make_brain_stacks, psnr, stacks_to_slices
    from tests.test_e2e_reconstruct import _save_stacks
    from scripts.exp_brain_quality import ssim3d

    gap = 3 * res

    # --- phase 0: simulate the brain acquisition (cached like
    # exp_brain_quality — the sim costs minutes through the tunnel) ---
    cache = f"/tmp/brainq_{vs}_{res}_{res}_{gap}_0.4.npz"
    t0 = time.time()
    if os.path.exists(cache):
        from nesvor_tpu.image import Stack

        d = np.load(cache)
        gt = np.asarray(d["gt"])
        brain_mask = d["brain_mask"]
        stacks = [
            Stack(
                slices=jnp.asarray(d[f"s{i}"]),
                mask=jnp.asarray(d[f"m{i}"] > 0.5),
                transformation=RigidTransform(
                    jnp.asarray(d[f"ax{i}"]), trans_first=True
                ),
                resolution_x=res, resolution_y=res,
                thickness=gap, gap=gap,
            )
            for i in range(int(d["n"]))
        ]
    else:
        stacks, gt, stack_masks, brain_mask = make_brain_stacks(
            vs=vs, n_stacks=6, gap=gap, res=res, res_s=res,
            intensity=700.0, rng_seed=0, bias_strength=0.4,
        )
        gt = np.asarray(gt)
        payload = {"gt": gt, "brain_mask": brain_mask, "n": len(stacks)}
        for i, st in enumerate(stacks):
            payload[f"s{i}"] = np.asarray(st.slices)
            payload[f"m{i}"] = np.asarray(st.mask, np.float32)
            payload[f"ax{i}"] = np.asarray(st.transformation.axisangle())
        np.savez_compressed(cache, **payload)
    sim_s = time.time() - t0
    print(f"[sim] {len(stacks)} stacks in {sim_s:.1f} s", flush=True)

    # --- corrupt per-slice poses (the registration workload) ---
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

    # outputs persist under /tmp so a failed eval can be re-run with
    # --eval-only against the artifacts without repeating the
    # (expensive) pipeline phases
    folder = f"/tmp/pipeline_run_{vs}_{res}"
    slices_dir = os.path.join(folder, "slices")
    out_slices_dir = os.path.join(folder, "out_slices")
    vol_path = os.path.join(folder, "volume.nii.gz")
    truth_path = os.path.join(folder, "truth.npz")
    if "--eval-only" in sys.argv:
        d = np.load(truth_path, allow_pickle=True)
        true_ax = list(d["true_ax"])
        nonempty = list(d["nonempty"])
        register_s, reconstruct_s = float(d["register_s"]), float(d["reconstruct_s"])
    elif "--skip-register" in sys.argv:
        # resume after a crash during reconstruct: registered slices and
        # the truth sidecar are already on disk
        d = np.load(truth_path, allow_pickle=True)
        true_ax = list(d["true_ax"])
        nonempty = list(d["nonempty"])
        register_s = float(d["register_s"])
        t2 = time.time()
        cli_main([
            "reconstruct",
            "--input-slices", slices_dir,
            "--output-volume", vol_path,
            "--output-slices", out_slices_dir,
            "--output-resolution", str(res),
            "--n-levels-bias", "2",
            "--n-iter", str(n_iter),
            "--verbose", "1",
        ])
        reconstruct_s = time.time() - t2
        print(f"[reconstruct+sample] {reconstruct_s:.1f} s", flush=True)
        np.savez(
            truth_path,
            true_ax=np.asarray(true_ax, dtype=object),
            nonempty=np.asarray(nonempty, dtype=object),
            register_s=register_s, reconstruct_s=reconstruct_s,
        )
    else:
        if os.path.exists(folder):
            shutil.rmtree(folder)
        os.makedirs(folder)
        paths = _save_stacks(stacks, folder)

        # --- phase 1: register (SVoRT transformer + stack registration) ---
        t1 = time.time()
        cli_main([
            "register",
            "--input-stacks", *paths,
            "--registration", "svort",
            "--output-slices", slices_dir,
            "--verbose", "2",
        ])
        register_s = time.time() - t1
        print(f"[register] {register_s:.1f} s", flush=True)
        # persist the ground-truth sidecar NOW so a crash during the
        # (long) reconstruct phase leaves a resumable state: rerun with
        # --skip-register to redo only reconstruct+eval
        np.savez(
            truth_path,
            true_ax=np.asarray(true_ax, dtype=object),
            nonempty=np.asarray(nonempty, dtype=object),
            register_s=register_s, reconstruct_s=-1.0,
        )

        # --- phase 2: reconstruct from registered slices (flagship
        # config; joint pose refinement ON, bias head ON) + 0.5 mm
        # volume sampling in the same command (the reference's composed
        # `reconstruct` does exactly this, cli/commands.py:100-124) ---
        t2 = time.time()
        cli_main([
            "reconstruct",
            "--input-slices", slices_dir,
            "--output-volume", vol_path,
            "--output-slices", out_slices_dir,
            "--output-resolution", str(res),
            "--n-levels-bias", "2",
            "--n-iter", str(n_iter),
            "--verbose", "1",
        ])
        reconstruct_s = time.time() - t2
        print(f"[reconstruct+sample] {reconstruct_s:.1f} s", flush=True)
        np.savez(
            truth_path,
            true_ax=np.asarray(true_ax, dtype=object),
            nonempty=np.asarray(nonempty, dtype=object),
            register_s=register_s, reconstruct_s=reconstruct_s,
        )

    vol = load_volume(vol_path)
    out_slices = load_slices(out_slices_dir)

    # --- evaluate: resample the output volume at the ground-truth grid
    # through the final (registered + refined) poses. Global gauge: the
    # composed pipeline output lives in SVoRT's canonical frame; remove
    # the Karcher-mean deviation of final vs true slice poses (one world
    # transform — per-slice errors remain in the metric). ---
    ax_final = np.concatenate(
        [np.asarray(s.transformation.axisangle()) for s in out_slices], 0
    )
    true_kept = np.concatenate(
        [ax[keep] for ax, keep in zip(true_ax, nonempty)], 0
    )
    assert ax_final.shape == true_kept.shape, (
        ax_final.shape, true_kept.shape,
    )
    d = RigidTransform(jnp.asarray(ax_final)).compose(
        RigidTransform(jnp.asarray(true_kept)).inv()
    )
    d_ax = np.asarray(d.axisangle())
    mean_r = np.asarray(average_rotation(d_ax[:, :3]))[0]
    mean_t = d_ax[:, 3:].mean(0)
    gauge = RigidTransform(
        jnp.asarray(np.concatenate([mean_r, mean_t])[None], jnp.float32)
    )

    from nesvor_tpu.transform import transform_points

    coords = ((np.stack(
        np.meshgrid(np.arange(vs), np.arange(vs), np.arange(vs),
                    indexing="ij"),
        -1,
    )[..., ::-1] - (vs - 1) / 2) * res).astype(np.float32).reshape(-1, 3)
    gt_flat = gt.reshape(-1)
    inside = brain_mask.reshape(-1) & (gt_flat > 0)

    def eval_at(points):
        # trilinear sample of the SAVED output volume (what the user gets)
        v = np.asarray(vol.image[0] if vol.image.ndim == 4 else vol.image)
        pos = np.asarray(points)
        # volume grid: centered, spacing = res (world frame of the saved
        # NIfTI); map world xyz -> voxel indices via the volume transform
        ax_v = np.asarray(vol.transformation.axisangle())
        tv = RigidTransform(jnp.asarray(ax_v))
        local = np.asarray(
            transform_points(tv.inv(), jnp.asarray(pos))
        )
        D, H, W = v.shape
        ijk = np.stack([
            local[:, 2] / vol.resolution_z + (D - 1) / 2,
            local[:, 1] / vol.resolution_y + (H - 1) / 2,
            local[:, 0] / vol.resolution_x + (W - 1) / 2,
        ], -1)
        from scipy.ndimage import map_coordinates

        pred = map_coordinates(
            v.astype(np.float64), ijk.T, order=1, mode="constant"
        )
        pred = pred * (
            gt_flat[inside].mean() / max(pred[inside].mean(), 1e-9)
        )
        p = psnr(pred, gt_flat, inside)
        s = ssim3d(
            pred.reshape(vs, vs, vs).astype(np.float32),
            gt_flat.reshape(vs, vs, vs),
            brain_mask & (gt_flat.reshape(vs, vs, vs) > 0),
            drange=float(gt_flat[inside].max()),
        )
        return p, s

    p_raw, s_raw = eval_at(coords)
    p_fix, s_fix = eval_at(
        np.asarray(transform_points(gauge, jnp.asarray(coords)))
    )

    result = {
        "metric": "full pipeline register->reconstruct->0.5mm volume "
                  "(motion-corrupted brain stacks)",
        "vs": vs, "res_mm": res, "n_iter": n_iter,
        "corruption": {"rot_std_rad": rot_std, "trans_std_mm": trans_std},
        "register_s": round(register_s, 1),
        "reconstruct_s": round(reconstruct_s, 1),
        "total_s": round(register_s + reconstruct_s, 1),
        "psnr_db_raw": round(p_raw, 2),
        "psnr_db_gauge_fixed": round(p_fix, 2),
        "ssim_raw": round(s_raw, 4),
        "ssim_gauge_fixed": round(s_fix, 4),
        "gauge_rot_mrad": round(float(np.linalg.norm(mean_r)) * 1e3, 1),
        "gauge_trans_mm": round(float(np.linalg.norm(mean_t)), 2),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
