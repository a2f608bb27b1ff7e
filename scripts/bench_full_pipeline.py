"""Timed full-pipeline benchmark on the ACTUAL reference workload
(VERDICT r04 item 3 / r05 item 2): motion-corrupted brain stacks driven
through the real CLI —

    register --registration svort
      -> reconstruct --input-slices (flagship config)
      -> sample-volume at 0.5 mm

with per-phase wall-clock and PSNR/SSIM inside the brain mask. Unlike
bench.py's first block (motion-free stacks at known poses,
--registration none), the headline quality here passes THROUGH the
registration path: per-slice pose errors degrade it. Ground truth is used
only to (a) corrupt the inputs and (b) remove the global SE(3) gauge at
evaluation (registration + reconstruction outputs are defined up to one
world transform); per-slice errors are NOT unwound.

Mirrors reference cli/commands.py:100-124 (register -> reconstruct) and
BASELINE.json configs[3-4]. ``run_pipeline`` is importable — bench.py
embeds its result as the driver artifact's ``pipeline`` block.

Usage: python scripts/bench_full_pipeline.py [vs] [res] [n_iter]
           [--rot-std F] [--trans-std F] [--cpu] [--skip-register]
           [--eval-only] [--recon-extra "--flag val ..."] [--tag NAME]
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


def _simulate_or_load(vs, res, gap):
    """Brain acquisition sim, cached under /tmp (the sim costs minutes
    through the tunnel). Returns (stacks, gt, brain_mask)."""
    import jax.numpy as jnp

    from nesvor_tpu.transform import RigidTransform
    from tests.synth import make_brain_stacks

    cache = f"/tmp/brainq_{vs}_{res}_{res}_{gap}_0.4.npz"
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
    return stacks, gt, brain_mask


def _gauge_removed_errors(ax, true_ax):
    """Per-slice pose errors after removing the Karcher-mean (global SE(3)
    gauge) deviation. Returns (mean_r, mean_t, per-slice rot mrad, per-slice
    trans mm)."""
    import jax.numpy as jnp

    from nesvor_tpu.svort.inference import average_rotation
    from nesvor_tpu.transform import RigidTransform

    d = RigidTransform(jnp.asarray(ax)).compose(
        RigidTransform(jnp.asarray(true_ax)).inv()
    )
    d_ax = np.asarray(d.axisangle())
    mean_r = np.asarray(average_rotation(d_ax[:, :3]))[0]
    mean_t = d_ax[:, 3:].mean(0)
    gauge = RigidTransform(
        jnp.asarray(np.concatenate([mean_r, mean_t])[None], np.float32)
    )
    resid = np.asarray(gauge.inv().compose(
        RigidTransform(jnp.asarray(d_ax))
    ).axisangle())
    rot_mrad = np.linalg.norm(resid[:, :3], axis=1) * 1e3
    trans_mm = np.linalg.norm(resid[:, 3:], axis=1)
    return mean_r, mean_t, rot_mrad, trans_mm


def run_pipeline(
    vs=128, res=0.5, n_iter=5000, rot_std=0.04, trans_std=1.5,
    skip_register=False, eval_only=False, recon_extra=(), tag="",
):
    """Run (or resume) the composed register->reconstruct pipeline and
    evaluate through the registered poses. Returns the result dict."""
    import jax
    import jax.numpy as jnp

    from nesvor_tpu.cli.main import main as cli_main
    from nesvor_tpu.image import load_slices, load_volume
    from nesvor_tpu.svort import inference as svort_inference
    from nesvor_tpu.transform import RigidTransform, transform_points
    from tests.synth import psnr
    from tests.test_e2e_reconstruct import _save_stacks
    from scripts.exp_brain_quality import ssim3d

    gap = 3 * res

    t0 = time.time()
    stacks, gt, brain_mask = _simulate_or_load(vs, res, gap)
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
    # eval_only against the artifacts without repeating the (expensive)
    # pipeline phases; ``tag`` separates reconstruct-config sweeps that
    # share one register phase
    folder = f"/tmp/pipeline_run_{vs}_{res}"
    slices_dir = os.path.join(folder, "slices")
    out_slices_dir = os.path.join(folder, f"out_slices{tag}")
    vol_path = os.path.join(folder, f"volume{tag}.nii.gz")
    truth_path = os.path.join(folder, "truth.npz")
    register_stats = {}

    def _reconstruct():
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
            *recon_extra,
        ])
        dt = time.time() - t2
        print(f"[reconstruct+sample] {dt:.1f} s", flush=True)
        return dt

    def _load_truth():
        # the sidecar stores per-stack arrays as dtype=object; homogeneous
        # stack shapes make numpy pack them into one object ndarray, whose
        # rows come back object-dtype — cast each back to its real dtype
        # (object-dtype boolean masks cannot index)
        d = np.load(truth_path, allow_pickle=True)
        return (
            [np.asarray(a, np.float32) for a in d["true_ax"]],
            [np.asarray(k, bool) for k in d["nonempty"]],
            float(d["register_s"]),
            float(d["reconstruct_s"]),
            json.loads(str(d["register_stats"]))
            if "register_stats" in d else {},
        )

    if eval_only:
        true_ax, nonempty, register_s, reconstruct_s, register_stats = (
            _load_truth()
        )
    elif skip_register:
        # resume after a crash during reconstruct (or sweep reconstruct
        # configs): registered slices + the truth sidecar are on disk
        true_ax, nonempty, register_s, _, register_stats = _load_truth()
        reconstruct_s = _reconstruct()
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
        register_stats = dict(svort_inference.LAST_REGISTER_STATS)
        print(f"[register] {register_s:.1f} s {register_stats}", flush=True)
        # persist the ground-truth sidecar NOW so a crash during the
        # (long) reconstruct phase leaves a resumable state
        np.savez(
            truth_path,
            true_ax=np.asarray(true_ax, dtype=object),
            nonempty=np.asarray(nonempty, dtype=object),
            register_s=register_s, reconstruct_s=-1.0,
            register_stats=json.dumps(register_stats),
        )
        reconstruct_s = _reconstruct()

    if not eval_only:
        np.savez(
            truth_path,
            true_ax=np.asarray(true_ax, dtype=object),
            nonempty=np.asarray(nonempty, dtype=object),
            register_s=register_s, reconstruct_s=reconstruct_s,
            register_stats=json.dumps(register_stats),
        )

    vol = load_volume(vol_path)
    out_slices = load_slices(out_slices_dir)
    reg_slices = load_slices(slices_dir)

    # --- evaluate: per-slice pose errors at BOTH stages (registered init
    # vs final refined — the decomposition VERDICT r05 item 1 asks for),
    # then resample the output volume at the ground-truth grid. Global
    # gauge: the composed pipeline output lives in SVoRT's canonical
    # frame; remove the Karcher-mean deviation of final vs true slice
    # poses (one world transform — per-slice errors remain). ---
    true_kept = np.concatenate(
        [ax[keep] for ax, keep in zip(true_ax, nonempty)], 0
    )
    ax_final = np.concatenate(
        [np.asarray(s.transformation.axisangle()) for s in out_slices], 0
    )
    ax_reg = np.concatenate(
        [np.asarray(s.transformation.axisangle()) for s in reg_slices], 0
    )
    assert ax_final.shape == true_kept.shape, (
        ax_final.shape, true_kept.shape,
    )
    mean_r, mean_t, rot_f, trans_f = _gauge_removed_errors(ax_final, true_kept)
    _, _, rot_i, trans_i = _gauge_removed_errors(ax_reg, true_kept)
    gauge = RigidTransform(
        jnp.asarray(np.concatenate([mean_r, mean_t])[None], jnp.float32)
    )

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
        **{
            # walls to 0.1 s; similarity scores keep 6 digits — the
            # svort-vs-vvr selection and the equal-objective evidence
            # (PERF.md round-5 flat-basin finding) live in those digits
            k: (
                round(v, 6) if k.startswith("score") else round(v, 1)
            ) if isinstance(v, float) else v
            for k, v in register_stats.items()
        },
        "reconstruct_s": round(reconstruct_s, 1),
        "total_s": round(register_s + reconstruct_s, 1),
        "psnr_db_raw": round(p_raw, 2),
        "psnr_db_gauge_fixed": round(p_fix, 2),
        "ssim_raw": round(s_raw, 4),
        "ssim_gauge_fixed": round(s_fix, 4),
        "gauge_rot_mrad": round(float(np.linalg.norm(mean_r)) * 1e3, 1),
        "gauge_trans_mm": round(float(np.linalg.norm(mean_t)), 2),
        # per-slice pose errors (gauge-removed): registered init vs final
        # refined — does joint pose optimization absorb the residual?
        "pose_err_registered_mrad_med": round(float(np.median(rot_i)), 1),
        "pose_err_registered_mm_med": round(float(np.median(trans_i)), 2),
        "pose_err_final_mrad_med": round(float(np.median(rot_f)), 1),
        "pose_err_final_mm_med": round(float(np.median(trans_f)), 2),
        "pose_err_final_mrad_mean": round(float(rot_f.mean()), 1),
        "pose_err_final_mm_mean": round(float(trans_f.mean()), 2),
        "device": str(jax.devices()[0]),
    }
    return result


def _opt(name, default, cast=float):
    if name in sys.argv:
        return cast(sys.argv[sys.argv.index(name) + 1])
    return default


def main():
    vs = int(sys.argv[1]) if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else 128
    res = float(sys.argv[2]) if len(sys.argv) > 2 and not sys.argv[2].startswith("--") else 0.5
    n_iter = int(sys.argv[3]) if len(sys.argv) > 3 and not sys.argv[3].startswith("--") else 5000

    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    from nesvor_tpu._precision import ensure_f32_matmul_semantics

    ensure_f32_matmul_semantics()

    result = run_pipeline(
        vs=vs, res=res, n_iter=n_iter,
        rot_std=_opt("--rot-std", 0.04),
        trans_std=_opt("--trans-std", 1.5),
        skip_register="--skip-register" in sys.argv,
        eval_only="--eval-only" in sys.argv,
        recon_extra=tuple(_opt("--recon-extra", "", str).split()),
        tag=_opt("--tag", "", str),
    )
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
