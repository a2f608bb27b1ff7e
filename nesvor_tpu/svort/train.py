"""Train SVoRT from scratch on synthetic motion (additive capability).

The reference ships only *inference* for SVoRT — pretrained weights are
downloaded from Zenodo (reference nesvor/svort/inference.py:565-591) and no
training code exists in the repo. This module implements the training
recipe of the SVoRT paper (Xu et al., MICCAI 2022: simulated multi-stack
acquisitions of 3D volumes with random rigid slice motion, supervised by
the 9-dof anchor-point pose parametrization) so users without the Zenodo
checkpoints — or with different anatomy — can train their own model.

Data generation is self-contained: random-ellipsoid volumes (varied
geometry per example, unlike the fixed test phantom), acquired at
``n_stacks`` orientations through the PSF projector with per-slice rigid
motion. The model receives the motion-free scanner geometry and must
recover the true poses; the loss is the mean squared anchor-point error
averaged over the model's refinement iterations (gradients flow through
every iteration's pose head; the volume branch is stop-gradiented inside
the model, matching reference models.py:102-107).

Typical use::

    from nesvor_tpu.svort.train import SVoRTTrainConfig, train_svort
    model, params, history = train_svort(
        SVoRTTrainConfig(steps=2000, volume_weight=1.0)
    )  # volume_weight > 0: the IQA/SRR score head trains only through it
    np.savez(".../SVoRT_v1.npz", **{k: np.asarray(v) for k, v in params.items()})

The saved .npz is what ``svort_predict`` loads (same flat torch-named
parameter dict as the Zenodo-checkpoint converter emits, svort/convert.py).
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.slice_acq import slice_acquisition
from ..transform import (
    RigidTransform,
    mat2point,
    mat_update_resolution,
    point2mat,
)
from ..utils import gaussian_blur, get_psf
from .models import SVoRT, SVoRTv2


@dataclass(frozen=True)
class SVoRTTrainConfig:
    version: str = "v1"
    n_iter_model: int = 0  # 0 = the reference/inference count (v1=3, v2=4)
    steps: int = 1000
    lr: float = 1e-4
    n_examples: int = 16  # size of the pre-simulated example pool
    vs: int = 48  # volume size (voxels) at res_r
    n_stacks: int = 3  # v1 consumes triplets; v2 can take more
    gap: float = 3.0
    res_s: float = 1.0
    res_r: float = 1.0
    motion_rot: float = 0.06  # per-slice rotation std (radians)
    motion_trans: float = 2.0  # per-slice translation std (mm)
    # relative spread of a per-example motion-magnitude factor drawn from
    # U(1-j, 1+j): the model sees both near-still and strongly corrupted
    # acquisitions instead of one fixed severity (shape-invariant, so it
    # costs no recompiles)
    motion_jitter: float = 0.0
    volume_shape: Tuple[int, int, int] = (96, 96, 96)  # PSF-recon working vol
    # weight of the reconstructed-volume MSE term. The pose loss alone
    # leaves the SRR/IQA transformer untrained (volumes are stop-gradiented
    # where they feed later iterations, so only the volume loss reaches
    # srrnet's score head). 0 disables (pose-only training).
    volume_weight: float = 0.0
    # linear LR warmup from 0 over this many steps (0 = constant LR) —
    # cheap stability insurance for a from-scratch transformer
    warmup_steps: int = 0
    seed: int = 0
    log_every: int = 50
    # long-run hygiene: save a f16 .npz of the params every ``save_every``
    # steps (0 = only via the caller), and swap one pool example for a
    # freshly simulated one every ``refresh_every`` steps (0 = fixed pool).
    # Refreshing bounds memorization of a small pool without paying the
    # per-step simulation cost of fully streamed data.
    checkpoint_path: str = ""
    save_every: int = 0
    refresh_every: int = 0
    # warm-start: load initial params from this .npz (a prior run's
    # checkpoint) instead of random init.
    init_params_path: str = ""
    # fraction of examples whose volume is a brain-like phantom (gyrified
    # cortex, multi-tissue contrast, jittered anatomy —
    # utils/brain_phantom.py) instead of smooth random ellipsoids. The
    # reference's pretrained weights were trained on real fetal anatomy;
    # feature-rich volumes close that domain gap (VERDICT r03 item 5).
    brain_frac: float = 0.0
    # restore Adam moments/step-count saved by a prior run (see
    # save_opt_state). Without it a continuation restarts the optimizer:
    # fresh zero moments mis-scale the first updates and the session
    # boundary shows up as a loss spike / transient pose-error regression
    # (the failure mode gate_and_install's incumbent check guards against).
    init_opt_path: str = ""
    # every ``eval_every`` steps, measure held-out pose error (rotation
    # mrad / translation mm) on ``eval_examples`` fixed examples from the
    # 888_000+ seed namespace (disjoint from training, refresh, and gate
    # seeds) and record (step, rot, trans) in history["eval"] — the
    # error-vs-steps convergence curve. Uses the TRAINING form of the
    # model (one jitted forward); the install gate separately measures the
    # deployed inference form.
    eval_every: int = 0
    eval_examples: int = 2
    # examples per optimizer step (gradient averaged over a scan of
    # complete fwd+bwd passes — flat HBM, ~k x step time). The plateau
    # analysis (PERF.md r04) identified single-example gradient variance
    # as a convergence lever once examples became cheap to simulate.
    batch_examples: int = 1
    # clip the global gradient norm before Adam (0 = off). Spike guard:
    # an unclipped run was measured losing ~100 steps to a single
    # gradient spike (held-out error 185 -> 568 mrad before recovering;
    # PERF.md round-4). The per-step grad norm is logged either way
    # (history["gnorm"]) so the threshold can be set from data.
    grad_clip: float = 0.0
    # --- round-5 recipe levers (VERDICT r04 items 1/5) ---
    # within-session LR decay: multiply the LR by ``lr_gamma`` when training
    # passes each fraction-of-session milestone — the reference's
    # MultiStepLR pattern (reference nesvor/train.py:154-159). Composes
    # with warmup_steps. () = constant LR after warmup (prior behavior).
    lr_milestones: Tuple[float, ...] = ()
    lr_gamma: float = 0.33
    # severity curriculum: a multiplier on (motion_rot, motion_trans)
    # annealed linearly from ``sev_start`` at step 0 to ``sev_end`` at the
    # last step, applied to every example simulated during the session
    # (initial pool at sev_start; held-out eval/gate examples are always
    # full severity, so curves stay comparable). Multiplies on top of
    # motion_jitter's per-example draw; severity only changes array
    # VALUES, so the curriculum costs no recompiles. 1.0/1.0 = off.
    sev_start: float = 1.0
    sev_end: float = 1.0
    # apply the volume-loss term only on every k-th step (1 = every step).
    # The volume-loss backward costs ~half the 4 s step (PERF.md r04); the
    # pose loss carries convergence, and the SRR score head still trains
    # through the periodic volume steps. XLA dead-code-eliminates the
    # final SRR solve in the pose-only program, so off-steps run ~2x
    # faster.
    volume_every: int = 1
    # std (rad/axis) of the per-stack orientation jitter around the
    # canonical base orientations. The r05 severity sweep located the
    # ~160 mrad residual floor at exactly E|N(0, 0.1 I3)|: the model
    # classifies the canonical orientation but does not read this jitter
    # from image content — raising it strengthens that learning signal.
    stack_jitter: float = 0.1
    # subtract the across-stack MEAN jitter from every stack's jitter when
    # simulating an example. The mean is a global SE(3) gauge the model
    # cannot observe from content (random anatomy has no canonical frame,
    # unlike the reference's atlas-aligned fetal brains), so with raw
    # jitter ~1/3 of the jitter supervision is irreducible noise;
    # zero-meaning it makes the pose targets the conditional-mean-optimal
    # labels. Inference behavior is unchanged (the gate generator keeps
    # raw jitter).
    zero_mean_jitter: bool = False


def _ellipsoid_volume_np(rng: np.random.Generator, vs: int) -> np.ndarray:
    """Host part of ``synth_volume``: the raw (pre-blur, pre-normalize)
    random multi-ellipsoid volume. Kept separate so the example simulator
    can run the blur/normalize inside its single jitted device program."""
    zyx = np.stack(
        np.meshgrid(*([np.linspace(-1, 1, vs)] * 3), indexing="ij"), -1
    )
    vol = np.zeros((vs, vs, vs), np.float32)
    for _ in range(int(rng.integers(4, 9))):
        center = rng.uniform(-0.45, 0.45, 3)
        radii = rng.uniform(0.15, 0.55, 3)
        # random orientation via a random rotation matrix (QR of a Gaussian)
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        d = (zyx - center) @ q.T / radii
        vol += rng.uniform(0.3, 1.0) * (np.sum(d * d, -1) <= 1.0)
    return np.clip(vol, 0, 1.5).astype(np.float32)


def synth_volume(rng: np.random.Generator, vs: int) -> jnp.ndarray:
    """Random smooth multi-ellipsoid volume in [0, 1] — varied geometry per
    example so the pose network cannot memorize one anatomy."""
    vol = _ellipsoid_volume_np(rng, vs)
    out = gaussian_blur(jnp.asarray(vol)[None, None], 0.8, 3.0)[0, 0]
    return out / jnp.maximum(jnp.max(out), 1e-6)


def _stack_geometry(cfg: SVoRTTrainConfig, rng: np.random.Generator,
                    sev_scale: float = 1.0):
    """Per-stack slice grids: base (motion-free) and true (with motion)
    axis-angle arrays, trans_first convention. ``sev_scale`` multiplies the
    motion magnitudes (the curriculum knob; 1.0 = the configured
    severity)."""
    fov = np.sqrt(3) * cfg.vs * cfg.res_r
    n_slice = int(fov / cfg.gap) + 2
    ss = int(fov / cfg.res_s) + 2
    base_angles = [
        [0, 0, 0], [np.pi / 2, 0, 0], [0, np.pi / 2, 0], [0, 0, np.pi / 2],
        [np.pi / 4, np.pi / 4, 0], [0, np.pi / 4, np.pi / 4],
    ]
    j = cfg.motion_jitter
    sev = float(rng.uniform(1.0 - j, 1.0 + j)) if j else 1.0
    sev *= sev_scale
    # per-stack orientation jitter, drawn up-front so the across-stack mean
    # (the unobservable global gauge of a random-anatomy example) can be
    # IMPORTANT: the rng draw ORDER below (per stack: jitter, rot noise,
    # trans noise — interleaved) is a compatibility contract: the held-out
    # gate seeds (777_000+) and every .gate.json on disk assume it. The
    # zero-mean projection therefore happens AFTER all draws, not by
    # restructuring the stream.
    draws = []
    for i in range(cfg.n_stacks):
        jit_i = rng.normal(0, cfg.stack_jitter, 3)
        rot_i = rng.normal(0, sev * cfg.motion_rot, (n_slice, 3))
        tr_i = rng.normal(0, sev * cfg.motion_trans, (n_slice, 3))
        draws.append((jit_i, rot_i, tr_i))
    if cfg.zero_mean_jitter:
        mean_j = np.mean([d[0] for d in draws], axis=0)
        draws = [(jj - mean_j, r, t) for jj, r, t in draws]
    ax_in, ax_true = [], []
    for i, (jit_i, rot_i, tr_i) in enumerate(draws):
        angle = np.asarray(base_angles[i % len(base_angles)], np.float32)
        # small random stack-level orientation jitter so orientations vary
        angle = angle + jit_i
        ax = np.tile(angle.astype(np.float32), (n_slice, 1))
        tz = (np.arange(n_slice, dtype=np.float32) - (n_slice - 1) / 2) * cfg.gap
        t = np.stack((np.zeros_like(tz), np.zeros_like(tz), tz), -1)
        true = np.concatenate([ax, t], -1).astype(np.float32)
        true[:, :3] += rot_i
        true[:, 3:] += tr_i
        # model INPUT matches inference's parse_data reset exactly
        # (svort/inference.py:144-156): rotations and in-plane translations
        # zeroed, tz = the scanner-nominal slice spacing, centered — the
        # model must infer the true orientation from image content alone
        reset = np.zeros_like(true)
        reset[:, 5] = tz - tz.mean()
        ax_in.append(reset)
        ax_true.append(true.astype(np.float32))
    return ax_in, ax_true, n_slice, ss


_SIM_CACHE: Dict[Tuple, Tuple] = {}  # cfg key -> (jitted sim, psf array)


def upload_tree(host: Dict[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
    """Move a dict of host arrays to the device as ONE transfer + one
    jitted split. Per-array uploads pay a tunnel round-trip each — a
    ~400-tensor checkpoint plus its ~800-moment sidecar was measured
    stalling a session start for 20+ minutes when the tunnel degraded to
    ~1 s/transfer; one concatenated upload is immune to that failure
    mode."""
    keys = sorted(host)
    for k in keys:
        # the concat buffer is f32: silently casting an int counter or f64
        # param would corrupt it — fail loudly instead (ADVICE r04)
        dt = np.asarray(host[k]).dtype
        if not (np.issubdtype(dt, np.floating) and dt.itemsize <= 4):
            raise ValueError(
                f"upload_tree expects f32/f16 entries; {k!r} is {dt}"
            )
    shapes = {k: np.asarray(host[k]).shape for k in keys}
    flat = np.concatenate(
        [np.asarray(host[k], np.float32).ravel() for k in keys]
    ) if keys else np.zeros((0,), np.float32)
    buf = jnp.asarray(flat)

    def split(buf):
        out, off = {}, 0
        for k in keys:
            n = int(np.prod(shapes[k], dtype=np.int64)) if shapes[k] else 1
            out[k] = jax.lax.dynamic_slice_in_dim(buf, off, n).reshape(
                shapes[k]
            )
            off += n
        return out

    return jax.jit(split)(buf)
_POSITIONS_CACHE: Dict[Tuple[int, int], jnp.ndarray] = {}


def _example_simulator(cfg: SVoRTTrainConfig, n_slice: int, ss: int,
                       do_blur: bool):
    """ONE jitted device program that turns a host-generated raw volume +
    motion parameters into a complete training example (acquired stacks,
    q99-normalized; motion-free input transforms; anchor-point targets;
    scaled ground-truth volume). A single dispatch with no host fetch —
    the per-example D2H quantile fetches + per-op eager dispatches of the
    old host-side path dominated pool-refresh cost on the remote TPU
    (measured 30-78 s/example vs ~0.3 s of device compute; PERF.md r04)."""
    key = (cfg.n_stacks, n_slice, ss, cfg.vs, cfg.gap, cfg.res_s, cfg.res_r,
           cfg.volume_shape, do_blur)
    if key in _SIM_CACHE:
        return _SIM_CACHE[key]

    psf = jnp.asarray(
        get_psf(
            res_ratio=(
                cfg.res_s / cfg.res_r,
                cfg.res_s / cfg.res_r,
                cfg.gap / cfg.res_r,
            )
        )
    )
    n_stacks, vs = cfg.n_stacks, cfg.vs
    res_s, res_r = cfg.res_s, cfg.res_r
    vol_shape = cfg.volume_shape

    @jax.jit
    def sim(volume, ax_in, ax_true):
        vol = volume[None, None]
        if do_blur:
            vol = gaussian_blur(vol, 0.8, 3.0)
        vol = vol / jnp.maximum(jnp.max(vol), 1e-6)
        t_true = RigidTransform(ax_true.reshape(-1, 6), trans_first=True)
        mats_true = t_true.matrix()
        mat_acq = mat_update_resolution(mats_true, 1, res_r)
        s = slice_acquisition(
            mat_acq, vol, None, None, psf, (ss, ss),
            res_s / res_r, False, False,
        )  # (n_stacks*n_slice, 1, ss, ss), stack-major like the old concat
        # per-stack q99 of NONZERO values — the exact normalization
        # inference applies in parse_data (svort/inference.py:140-143);
        # train/test input scales must match. In-graph with static shapes:
        # sort the whole stack (zeros first) and index past the zero run,
        # reproducing np.quantile's linear interpolation.
        sk = s.reshape(n_stacks, -1)
        m = sk.shape[1]
        srt = jnp.sort(sk, axis=1)
        c = jnp.sum(sk > 0, axis=1)
        h = (c - 1).astype(jnp.float32) * 0.99
        f = jnp.floor(h)
        frac = h - f
        i0 = jnp.clip(m - c + f.astype(jnp.int32), 0, m - 1)
        i1 = jnp.clip(i0 + 1, 0, m - 1)
        lo = jnp.take_along_axis(srt, i0[:, None], 1)[:, 0]
        hi = jnp.take_along_axis(srt, i1[:, None], 1)[:, 0]
        q99 = jnp.where(
            c > 0, jnp.maximum(lo + (hi - lo) * frac, 1e-6), 1.0
        )
        stacks = (
            s.reshape(n_stacks, n_slice, 1, ss, ss)
            / q99[:, None, None, None, None]
        ).reshape(-1, 1, ss, ss)
        mats_in = RigidTransform(
            ax_in.reshape(-1, 6), trans_first=True
        ).matrix()
        theta_gt = mat2point(mats_true, ss, ss, res_s)
        # ground-truth volume in the PSF-recon working frame (centered,
        # res_r): supervision target for the volume loss. Scale matches the
        # reconstruction's intensity (stacks are q99-normalized, so the
        # target carries the same scale or the MSE has an irreducible floor
        # that biases the score-head gradients).
        D, H, W = vol_shape
        v = vol[0, 0] / jnp.mean(q99)
        z0, y0, x0 = (D - vs) // 2, (H - vs) // 2, (W - vs) // 2
        vol_gt = (
            jnp.zeros(vol_shape, jnp.float32)
            .at[z0 : z0 + vs, y0 : y0 + vs, x0 : x0 + vs]
            .set(v)
        )
        return stacks, mats_in, theta_gt, vol_gt

    _SIM_CACHE[key] = (sim, psf)
    return _SIM_CACHE[key]


def make_training_example(
    cfg: SVoRTTrainConfig, seed: int, sev_scale: float = 1.0
) -> Dict:
    """One simulated example: the SVoRT input dict (motion-free geometry)
    plus the ground-truth anchor-point targets ``theta_gt``.

    The host generates only the raw volume and motion parameters (numpy,
    milliseconds); acquisition, normalization, and targets run as one
    jitted device dispatch with NO host fetch (``_example_simulator``) —
    results stay device-resident for the training step. The rng stream is
    identical to the original host-side implementation (``sev_scale``
    multiplies severities after all draws), so a given seed produces the
    same example distribution."""
    rng = np.random.default_rng(seed)
    if cfg.brain_frac and rng.random() < cfg.brain_frac:
        from ..utils.brain_phantom import brain_phantom

        volume_np = brain_phantom(
            cfg.vs, seed=int(rng.integers(1 << 31)), shape_jitter=0.15
        )
        do_blur = False  # already band-limited by its level-set fades
    else:
        volume_np = _ellipsoid_volume_np(rng, cfg.vs)
        do_blur = True
    ax_in, ax_true, n_slice, ss = _stack_geometry(cfg, rng, sev_scale)
    sim, psf_rec = _example_simulator(cfg, n_slice, ss, do_blur)
    stacks, mats_in, theta_gt, vol_gt = sim(
        jnp.asarray(volume_np),
        jnp.asarray(np.stack(ax_in)),
        jnp.asarray(np.stack(ax_true)),
    )

    pkey = (cfg.n_stacks, n_slice)
    if pkey not in _POSITIONS_CACHE:
        _POSITIONS_CACHE[pkey] = jnp.concatenate(
            [
                jnp.stack(
                    (
                        jnp.arange(n_slice, dtype=jnp.float32) - n_slice // 2,
                        jnp.full((n_slice,), k, dtype=jnp.float32),
                    ),
                    -1,
                )
                for k in range(cfg.n_stacks)
            ],
            axis=0,
        )
    # acquisition and reconstruction deliberately share the PSF (same
    # res/thickness ratios), exactly as in run_model
    data = {
        "psf_rec": psf_rec,
        "slice_shape": (ss, ss),
        "resolution_slice": cfg.res_s,
        "resolution_recon": cfg.res_r,
        "slice_thickness": cfg.gap,
        "volume_shape": cfg.volume_shape,
        "transforms": mats_in,
        "stacks": stacks,
        "positions": _POSITIONS_CACHE[pkey],
    }
    return {"data": data, "theta_gt": theta_gt, "vol_gt": vol_gt}


def pose_error(theta_pred, theta_gt):
    """(rotation mrad, translation mm) mean errors of anchor-point poses."""
    t_p = RigidTransform(point2mat(theta_pred))
    t_g = RigidTransform(point2mat(theta_gt))
    diff = t_g.inv().compose(t_p).axisangle()
    rot = float(jnp.linalg.norm(diff[:, :3], axis=-1).mean()) * 1e3
    trans = float(jnp.linalg.norm(diff[:, 3:], axis=-1).mean())
    return rot, trans


def pose_error_gauge_removed(theta_pred, theta_gt):
    """Like ``pose_error`` but with the global SE(3) gauge (the Karcher-mean
    deviation) removed first. Registration outputs are defined up to one
    world transform; on random synthetic anatomy the across-stack mean
    orientation jitter is genuinely unobservable from content (no atlas
    frame — unlike the reference's fetal-trained weights), so the raw
    metric carries an ~90 mrad irreducible term (r05 severity sweep). This
    is the metric the e2e register drive already uses
    (scripts/e2e_register_svort.py)."""
    from .inference import average_rotation

    t_p = RigidTransform(point2mat(theta_pred))
    t_g = RigidTransform(point2mat(theta_gt))
    d = t_p.compose(t_g.inv())
    d_ax = np.asarray(d.axisangle())
    mean_r = np.asarray(average_rotation(d_ax[:, :3]))[0]
    mean_t = d_ax[:, 3:].mean(0)
    g = RigidTransform(
        jnp.asarray(np.concatenate([mean_r, mean_t])[None], jnp.float32)
    )
    resid = np.asarray(g.inv().compose(d).axisangle())
    rot = float(np.linalg.norm(resid[:, :3], axis=-1).mean()) * 1e3
    trans = float(np.linalg.norm(resid[:, 3:], axis=-1).mean())
    return rot, trans


def train_svort(cfg: SVoRTTrainConfig, model=None):
    """Returns (model, trained params, history dict of per-log losses)."""
    import optax

    # the volume loss differentiates through the SRR solve, so its CG must
    # be the unrolled (scan) form
    diff_srr = bool(cfg.volume_weight)
    if model is None:
        n_it = cfg.n_iter_model or (3 if cfg.version == "v1" else 4)
        if cfg.version == "v1":
            model = SVoRT(n_iter=n_it, differentiable_srr=diff_srr)
        elif cfg.version == "v2":
            model = SVoRTv2(n_iter=n_it, differentiable_srr=diff_srr)
        else:
            raise ValueError(cfg.version)
    elif diff_srr:
        srrs = [
            getattr(model, "srr", None),
            getattr(getattr(model, "srrnet", None), "srr", None),
        ]
        if not any(s is not None and s.differentiable for s in srrs):
            raise ValueError(
                "volume_weight > 0 needs a model built with "
                "differentiable_srr=True (lax.while_loop CG has no "
                "reverse-mode rule)"
            )

    key = jax.random.PRNGKey(cfg.seed)
    if cfg.init_params_path:
        # warm start: validate against abstract shapes only (eval_shape) —
        # running the real init would pay hundreds of eager RNG-op
        # compiles (~16 min measured on the remote TPU) just to be
        # overwritten
        shapes = jax.eval_shape(model.init, key)
        from .convert import load_converted

        loaded = load_converted(cfg.init_params_path)
        missing = set(shapes) - set(loaded)
        extra = set(loaded) - set(shapes)
        if missing or extra:
            raise ValueError(
                f"init params mismatch: missing {sorted(missing)[:3]}..., "
                f"extra {sorted(extra)[:3]}..."
            )
        for k in shapes:
            if loaded[k].shape != shapes[k].shape:
                raise ValueError(
                    f"shape mismatch for {k}: "
                    f"{loaded[k].shape} vs {shapes[k].shape}"
                )
        params = upload_tree(loaded)  # one H2D transfer, not one per tensor
        # fingerprint source for the optimizer-sidecar check: the HOST
        # copies — fingerprinting device params fetches every tensor
        # through the tunnel (~minutes); the f16-quantized digest of the
        # loaded file bytes is identical
        params_host = loaded
        logging.info("warm-started params from %s", cfg.init_params_path)
    else:
        # one compiled program instead of hundreds of eager init dispatches
        params = jax.jit(model.init)(key)
        params_host = None
    if cfg.lr_milestones:
        # reference-style MultiStepLR (gamma at fraction-of-session
        # milestones), composed with the linear warmup
        bounds = jnp.asarray(
            [int(m * cfg.steps) for m in cfg.lr_milestones], jnp.int32
        )
        gamma = cfg.lr_gamma

        def lr(count):
            warm = (
                jnp.minimum(1.0, (count + 1) / cfg.warmup_steps)
                if cfg.warmup_steps
                else 1.0
            )
            return cfg.lr * warm * gamma ** jnp.sum(count >= bounds)

    elif cfg.warmup_steps:
        lr = optax.linear_schedule(0.0, cfg.lr, cfg.warmup_steps)
    else:
        lr = cfg.lr
    # flat chain (not nested optax.adam) so _adam_index finds the moments
    # at the top level whether or not the clip stage is present
    stages = []
    if cfg.grad_clip:
        stages.append(optax.clip_by_global_norm(cfg.grad_clip))
    stages += [optax.scale_by_adam(), optax.scale_by_learning_rate(lr)]
    tx = optax.chain(*stages)
    opt_state = tx.init(params)
    if cfg.init_opt_path:
        try:
            opt_state = load_opt_state(
                cfg.init_opt_path, opt_state,
                params_host if params_host is not None else params,
            )
            logging.info("restored optimizer state from %s", cfg.init_opt_path)
        except ValueError as e:
            # a stale/mismatched sidecar must not kill an unattended
            # session at startup — continue with a fresh optimizer (the
            # pre-restore behavior; the install gate guards the outcome)
            logging.warning(
                "NOT restoring optimizer state (%s); training continues "
                "with fresh Adam moments", e,
            )

    logging.info(
        "simulating %d SVoRT training examples (vs=%d, %d stacks)",
        cfg.n_examples, cfg.vs, cfg.n_stacks,
    )
    def sev_at(step_i: int) -> float:
        """Curriculum severity for examples simulated at ``step_i``."""
        if cfg.sev_start == cfg.sev_end:
            return cfg.sev_start
        f = min(1.0, max(0.0, step_i / max(1, cfg.steps - 1)))
        return cfg.sev_start + (cfg.sev_end - cfg.sev_start) * f

    examples = [
        make_training_example(cfg, cfg.seed * 10_000 + i, sev_at(0))
        for i in range(cfg.n_examples)
    ]

    # the data dict mixes arrays with static fields (slice_shape,
    # volume_shape, resolutions feed static shapes inside the model), so
    # only the array leaves go through jit; statics close over from the
    # shared config (identical across examples by construction)
    static = {
        k: examples[0]["data"][k]
        for k in (
            "psf_rec", "slice_shape", "resolution_slice", "resolution_recon",
            "slice_thickness", "volume_shape",
        )
    }

    def make_loss_fn(use_vw: bool):
        def loss_fn(params, transforms, stacks, positions, theta_gt, vol_gt):
            data = {
                **static,
                "transforms": transforms,
                "stacks": stacks,
                "positions": positions,
            }
            _, volumes, thetas = model(params, data)
            loss = sum(
                jnp.mean((t - theta_gt) ** 2) for t in thetas
            ) / len(thetas)
            if use_vw and cfg.volume_weight:
                loss = loss + cfg.volume_weight * jnp.mean(
                    (volumes[-1].reshape(vol_gt.shape) - vol_gt) ** 2
                )
            return loss

        return loss_fn

    def batched_grads(loss_fn, params, batch):
        # leading axis = examples. Gradients accumulate through a scan of
        # complete fwd+bwd passes, so HBM holds ONE example's activations
        # at a time (a vmap/map under value_and_grad would keep all k
        # residual sets live) — single-example variance averages away at
        # flat memory, ~k x step time.
        def body(acc, ex):
            l, g = jax.value_and_grad(loss_fn)(params, *ex)
            return (
                acc[0] + l,
                jax.tree_util.tree_map(jnp.add, acc[1], g),
            ), None

        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        (tot, gsum), _ = jax.lax.scan(body, (0.0, zeros), batch)
        k = cfg.batch_examples
        return tot / k, jax.tree_util.tree_map(lambda g: g / k, gsum)

    import functools

    @functools.partial(jax.jit, static_argnames=("use_vw",))
    def step(params, opt_state, transforms, stacks, positions, theta_gt,
             vol_gt, use_vw=True):
        # use_vw=False (the volume_every off-steps) drops the volume-loss
        # term; XLA then dead-code-eliminates the final SRR solve and its
        # differentiable-CG backward, ~halving the step (PERF.md r05)
        loss_fn = make_loss_fn(use_vw)
        if cfg.batch_examples > 1:
            loss, grads = batched_grads(
                loss_fn, params,
                (transforms, stacks, positions, theta_gt, vol_gt),
            )
        else:
            loss, grads = jax.value_and_grad(loss_fn)(
                params, transforms, stacks, positions, theta_gt, vol_gt
            )
        gnorm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, gnorm

    eval_sets: Dict[str, List[Dict]] = {}
    fwd_eval = None
    if cfg.eval_every:
        from dataclasses import replace

        # fixed held-out examples in BOTH domains (the curve is comparable
        # across sessions because the seeds and the generator rng stream
        # are fixed): "ell" = smooth ellipsoids (the historical gate
        # domain), "brain" = the feature-rich brain phantom — tracking both
        # shows whether brain-generator training closes the domain gap
        # without regressing the original distribution
        # pin the HISTORICAL generator fields (raw jitter at std 0.1, full
        # severity): sessions that train with zero_mean_jitter / larger
        # stack_jitter must still be measured against the same held-out
        # distribution or the cross-session curve stops being comparable
        eval_kw = dict(zero_mean_jitter=False, stack_jitter=0.1)
        eval_sets = {
            "ell": [
                make_training_example(
                    replace(cfg, brain_frac=0.0, **eval_kw),
                    seed=888_000 + s,
                )
                for s in range(cfg.eval_examples)
            ],
            "brain": [
                make_training_example(
                    replace(cfg, brain_frac=1.0, **eval_kw),
                    seed=889_000 + s,
                )
                for s in range(cfg.eval_examples)
            ],
        }

        @jax.jit
        def fwd_eval(params, transforms, stacks, positions):
            data = {**static, "transforms": transforms, "stacks": stacks,
                    "positions": positions}
            _, _, thetas = model(params, data)
            return thetas[-1]

    def run_eval(params) -> Dict[str, Tuple[float, float, float, float]]:
        out = {}
        for name, exs in eval_sets.items():
            rots, trs, rots_g, trs_g = [], [], [], []
            for ex in exs:
                theta = fwd_eval(
                    params, ex["data"]["transforms"], ex["data"]["stacks"],
                    ex["data"]["positions"],
                )
                r, t = pose_error(theta, ex["theta_gt"])
                rg, tg = pose_error_gauge_removed(theta, ex["theta_gt"])
                rots.append(r)
                trs.append(t)
                rots_g.append(rg)
                trs_g.append(tg)
            out[name] = (
                float(np.mean(rots)), float(np.mean(trs)),
                float(np.mean(rots_g)), float(np.mean(trs_g)),
            )
        return out

    history: Dict[str, List] = {"loss": [], "eval": []}
    t0 = time.time()
    n_fresh = 0
    k = max(1, cfg.batch_examples)
    for i in range(cfg.steps):
        if k == 1:
            ex = examples[i % len(examples)]
            args_i = (
                ex["data"]["transforms"], ex["data"]["stacks"],
                ex["data"]["positions"], ex["theta_gt"], ex["vol_gt"],
            )
        else:
            grp = [examples[(i * k + j) % len(examples)] for j in range(k)]
            args_i = tuple(
                jnp.stack([g["data"][f] for g in grp])
                for f in ("transforms", "stacks", "positions")
            ) + tuple(
                jnp.stack([g[f] for g in grp])
                for f in ("theta_gt", "vol_gt")
            )
        use_vw = bool(cfg.volume_weight) and (
            cfg.volume_every <= 1 or i % cfg.volume_every == 0
        )
        params, opt_state, loss, gnorm = step(
            params, opt_state, *args_i, use_vw=use_vw
        )
        if cfg.refresh_every and (i + 1) % cfg.refresh_every == 0:
            slot = n_fresh % len(examples)
            # refresh seeds live in their own namespace, disjoint from both
            # the initial pool (cfg.seed*10_000 + i) and any held-out eval
            # seeds (e.g. 777_000+/999_000+ in scripts/tests); severity
            # follows the curriculum schedule at the current step
            examples[slot] = make_training_example(
                cfg, 1_000_000_000 + cfg.seed * 1_000_000 + n_fresh,
                sev_at(i),
            )
            n_fresh += 1
        if (i + 1) % cfg.log_every == 0 or i == cfg.steps - 1:
            loss = float(loss)
            gnorm = float(gnorm)
            history["loss"].append(loss)
            history.setdefault("gnorm", []).append(gnorm)
            logging.info(
                "svort train step %d/%d: loss %.4f |g| %.2f (%.1f s)",
                i + 1, cfg.steps, loss, gnorm, time.time() - t0,
            )
        if cfg.eval_every and (
            (i + 1) % cfg.eval_every == 0 or i == cfg.steps - 1
        ):
            ev = run_eval(params)
            history["eval"].append((i + 1, ev))
            logging.info(
                "svort held-out eval at step %d: %s",
                i + 1,
                "  ".join(
                    f"{k}: {v[0]:.1f} mrad / {v[1]:.2f} mm"
                    f" (gauge {v[2]:.1f} / {v[3]:.2f})"
                    for k, v in ev.items()
                ),
            )
        if (
            cfg.checkpoint_path
            and cfg.save_every
            and ((i + 1) % cfg.save_every == 0 or i == cfg.steps - 1)
        ):
            # snapshot saves fetch ~0.5 GB (params + Adam moments) through
            # the remote tunnel — ~2-3 min each. Synchronous on purpose:
            # a background-thread fetch was measured taking ~35 MINUTES
            # while training dispatches competed for the tunnel (the
            # skip-while-in-flight logic then silently dropped every
            # later cadence point — PERF.md r04). Callers choose the
            # cadence; scripts/train_svort.py uses ~steps/4.
            save_params(cfg.checkpoint_path, params)
            save_opt_state(opt_state_path(cfg.checkpoint_path), opt_state, params)
            logging.info("saved %s at step %d", cfg.checkpoint_path, i + 1)
    return model, params, history


def gate_config(version: str = "v1", vs: int = 48) -> SVoRTTrainConfig:
    """Canonical held-out gate config — the single source of truth for the
    example distribution (motion_jitter, volume_shape, seeds live with the
    callers) used by BOTH the end-of-training gate in scripts/train_svort.py
    and the standalone snapshot gate in scripts/gate_svort.py. Any drift
    between the two gates means a checkpoint could be installed against a
    different (easier) bar — hence one constructor."""
    vol_vs = -(-int(np.sqrt(3) * vs + 12) // 32) * 32
    return SVoRTTrainConfig(
        version=version, vs=vs, n_stacks=3, gap=3.0,
        motion_rot=0.06, motion_trans=2.0, motion_jitter=0.5,
        volume_shape=(vol_vs, vol_vs, vol_vs),
    )


def held_out_gate(
    params: Dict,
    version: str = "v1",
    vs: int = 48,
    model=None,
    n_examples: int = 3,
    seed_base: int = 777_000,
) -> Dict:
    """Evaluate ``params`` on held-out synthetic-motion examples and decide
    whether they clear the install bar used by tests/test_svort_pretrained.py:
    mean rotation AND translation error must beat the motion-free
    initialization by >20%.

    The eval model is the inference form (differentiable_srr=False, i.e. the
    while_loop CG) — what ``--registration svort`` actually runs. A model
    trained with volume_weight>0 uses the unrolled CG during training; the two
    solves agree to solver tolerance but are not bit-identical, so the gate
    intentionally measures the deployed form.

    Returns a dict with per-metric means and ``improved`` (the verdict).
    """
    from .models import SVoRT, SVoRTv2
    from ..transform import mat2point

    cfg = gate_config(version, vs)
    if model is None:
        model = SVoRT(n_iter=3) if version == "v1" else SVoRTv2(n_iter=4)
    exs = [
        make_training_example(cfg, seed=seed_base + s)
        for s in range(n_examples)
    ]
    static = {
        k: exs[0]["data"][k]
        for k in ("psf_rec", "slice_shape", "resolution_slice",
                  "resolution_recon", "slice_thickness", "volume_shape")
    }
    # Deployment-geometry evals (vs=128, the install gate's deploy leg)
    # need the projector's slice_chunk bound exactly like inference does:
    # unchunked slab programs at this scale materialize a ~52 GB gather
    # buffer and OOM HBM (measured). The canonical vs=48 gate stays
    # unchunked so its scores remain byte-comparable with the historical
    # curve/gate records.
    if vs > 64:
        from .inference import _SLICE_CHUNK

        static["slice_chunk"] = _SLICE_CHUNK

    # one compiled forward for all examples (the eager per-op path paid
    # minutes of remote dispatch overhead per gate example)
    @jax.jit
    def fwd(params, transforms, stacks, positions):
        data = {**static, "transforms": transforms, "stacks": stacks,
                "positions": positions}
        _, _, thetas = model(params, data)
        return thetas[-1]

    rots0, rots1, trs0, trs1 = [], [], [], []
    rots1g, trs1g = [], []
    for s, ex in enumerate(exs):
        theta_last = fwd(
            params, ex["data"]["transforms"], ex["data"]["stacks"],
            ex["data"]["positions"],
        )
        thetas = [theta_last]
        theta_init = mat2point(
            ex["data"]["transforms"], ex["data"]["slice_shape"][1],
            ex["data"]["slice_shape"][0], cfg.res_s,
        )
        r0, t0 = pose_error(theta_init, ex["theta_gt"])
        r1, t1 = pose_error(thetas[-1], ex["theta_gt"])
        r1g, t1g = pose_error_gauge_removed(thetas[-1], ex["theta_gt"])
        rots0.append(r0); trs0.append(t0); rots1.append(r1); trs1.append(t1)
        rots1g.append(r1g); trs1g.append(t1g)
        logging.info(
            "held-out %d: init %.1f mrad / %.2f mm -> trained %.1f mrad / "
            "%.2f mm (gauge-removed %.1f mrad / %.2f mm)",
            s, r0, t0, r1, t1, r1g, t1g,
        )
    res = {
        "rot_init_mrad": float(np.mean(rots0)),
        "trans_init_mm": float(np.mean(trs0)),
        "rot_mrad": float(np.mean(rots1)),
        "trans_mm": float(np.mean(trs1)),
        # the raw metrics above keep the historical gate semantics (and
        # gate_score comparability with every shipped .gate.json); the
        # gauge-removed pair is the physically meaningful registration
        # quality on random anatomy (see pose_error_gauge_removed)
        "rot_gauge_mrad": float(np.mean(rots1g)),
        "trans_gauge_mm": float(np.mean(trs1g)),
    }
    res["improved"] = bool(
        res["rot_mrad"] < 0.8 * res["rot_init_mrad"]
        and res["trans_mm"] < 0.8 * res["trans_init_mm"]
    )
    return res


def held_out_sweep(
    params: Dict,
    version: str = "v1",
    vs: int = 48,
    sev_scales=(0.1, 0.25, 0.5, 0.75, 1.0),
    n_examples: int = 3,
) -> List[Dict]:
    """Residual-vs-initial-severity curve of a checkpoint (VERDICT r04
    item 2): evaluate the inference-form model on held-out examples whose
    motion severity is scaled by each entry of ``sev_scales`` (1.0 = the
    gate's full corruption, ~1112 mrad at the default config). One
    compiled forward serves every severity — the example shapes are
    severity-invariant. Returns one dict per severity with mean init and
    recovered errors; decides whether a plateau at full severity is a
    model limit (flat residual across severities) or a gate artifact
    (residual tracking init severity)."""
    from .models import SVoRT, SVoRTv2
    from ..transform import mat2point

    cfg = gate_config(version, vs)
    model = SVoRT(n_iter=3) if version == "v1" else SVoRTv2(n_iter=4)
    ex0 = make_training_example(cfg, seed=777_000, sev_scale=sev_scales[0])
    static = {
        k: ex0["data"][k]
        for k in ("psf_rec", "slice_shape", "resolution_slice",
                  "resolution_recon", "slice_thickness", "volume_shape")
    }

    @jax.jit
    def fwd(params, transforms, stacks, positions):
        data = {**static, "transforms": transforms, "stacks": stacks,
                "positions": positions}
        _, _, thetas = model(params, data)
        return thetas[-1]

    out = []
    for sev in sev_scales:
        rots0, rots1, trs0, trs1 = [], [], [], []
        rots1g, trs1g = [], []
        for s in range(n_examples):
            ex = make_training_example(
                cfg, seed=777_000 + s, sev_scale=float(sev)
            )
            theta = fwd(
                params, ex["data"]["transforms"], ex["data"]["stacks"],
                ex["data"]["positions"],
            )
            theta_init = mat2point(
                ex["data"]["transforms"], ex["data"]["slice_shape"][1],
                ex["data"]["slice_shape"][0], cfg.res_s,
            )
            r0, t0 = pose_error(theta_init, ex["theta_gt"])
            r1, t1 = pose_error(theta, ex["theta_gt"])
            r1g, t1g = pose_error_gauge_removed(theta, ex["theta_gt"])
            rots0.append(r0); trs0.append(t0)
            rots1.append(r1); trs1.append(t1)
            rots1g.append(r1g); trs1g.append(t1g)
        rec = {
            "sev_scale": float(sev),
            "rot_init_mrad": float(np.mean(rots0)),
            "trans_init_mm": float(np.mean(trs0)),
            "rot_mrad": float(np.mean(rots1)),
            "trans_mm": float(np.mean(trs1)),
            "rot_gauge_mrad": float(np.mean(rots1g)),
            "trans_gauge_mm": float(np.mean(trs1g)),
        }
        logging.info(
            "sweep sev %.2f: init %.1f mrad / %.2f mm -> %.1f mrad / %.2f "
            "mm (gauge-removed %.1f mrad / %.2f mm)",
            sev, rec["rot_init_mrad"], rec["trans_init_mm"],
            rec["rot_mrad"], rec["trans_mm"],
            rec["rot_gauge_mrad"], rec["trans_gauge_mm"],
        )
        out.append(rec)
    return out


def gate_score(res: Dict) -> float:
    """Scalar quality of a held-out gate result: geometric mean of the
    rotation- and translation-error ratios vs the motion-free init (lower is
    better; 1.0 = no improvement). Used to compare a candidate against the
    incumbent installed checkpoint — both evaluated on the same held-out
    seeds, so the ratio comparison is apples-to-apples."""
    r = res["rot_mrad"] / max(res["rot_init_mrad"], 1e-9)
    t = res["trans_mm"] / max(res["trans_init_mm"], 1e-9)
    return float(np.sqrt(max(r, 1e-12) * max(t, 1e-12)))


def gate_score_gauge(res: Dict) -> Optional[float]:
    """Gauge-removed gate score — the PRIMARY install criterion (VERDICT
    r05 item 4c): same geometric-mean-of-ratios form as ``gate_score`` but
    on the gauge-removed errors, which exclude the ~90 mrad global SE(3)
    component that is unobservable from content on random synthetic anatomy
    (PERF.md orientation-floor analysis). Returns None for legacy results
    that predate the gauge fields (callers then fall back to the raw
    score)."""
    if "rot_gauge_mrad" not in res or "trans_gauge_mm" not in res:
        return None
    r = res["rot_gauge_mrad"] / max(res["rot_init_mrad"], 1e-9)
    t = res["trans_gauge_mm"] / max(res["trans_init_mm"], 1e-9)
    return float(np.sqrt(max(r, 1e-12) * max(t, 1e-12)))


def measure_gate_noise(
    params: Dict,
    version: str = "v1",
    vs: int = 48,
    n_draws: int = 5,
    model=None,
) -> Dict:
    """Noise band of the held-out gate metric (VERDICT r05 item 4a): gate
    one FIXED checkpoint across ``n_draws`` fresh held-out example draws
    (disjoint seed blocks; draw 0 = the canonical gate seeds) and report
    the spread. ``gate_and_install`` requires a candidate to beat the
    incumbent by MORE than this band — a keep-if-better rule on a noisy
    metric otherwise ratchets downward by selection alone."""
    scores, gauge_scores, results = [], [], []
    for d in range(n_draws):
        res = held_out_gate(
            params, version, vs, model=model,
            seed_base=777_000 + 100_000 * d,
        )
        scores.append(gate_score(res))
        g = gate_score_gauge(res)
        if g is not None:
            gauge_scores.append(g)
        results.append(res)
        logging.info(
            "noise draw %d: score %.4f gauge %.4f", d, scores[-1],
            g if g is not None else float("nan"),
        )
    out = {
        "n_draws": n_draws,
        "scores": scores,
        "score_band": float(max(scores) - min(scores)),
        "score_std": float(np.std(scores)),
    }
    if gauge_scores:
        out["gauge_scores"] = gauge_scores
        out["gauge_band"] = float(max(gauge_scores) - min(gauge_scores))
        out["gauge_std"] = float(np.std(gauge_scores))
    return out


def _incumbent_record(out: str, version: str, vs: int) -> Dict:
    """Full .gate.json record of the currently installed checkpoint at
    ``out`` ({result, noise_band?, deploy?}). Reads the metadata written at
    install time when it matches this gate's config; otherwise re-evaluates
    the incumbent live (a fresh held_out_gate call — its jitted forward is
    a new closure, so this path pays one recompile; acceptable because it
    only runs when the metadata is missing or stale)."""
    import json
    import os

    meta = out + ".gate.json"
    if os.path.exists(meta):
        try:
            with open(meta) as f:
                rec = json.load(f)
            if rec.get("version") == version and rec.get("vs") == vs:
                assert "result" in rec
                return rec
        except (AssertionError, KeyError, ValueError):
            pass
    from .convert import load_converted

    logging.info("re-evaluating incumbent %s on the held-out gate", out)
    return {"result": held_out_gate(load_converted(out), version, vs)}


def gate_and_install(
    params: Dict, version: str = "v1", vs: int = 48,
    deploy_leg: bool = True,
) -> Dict:
    """Run ``held_out_gate`` and install the weights at the live checkpoint
    path (what ``--registration svort`` loads) only on a pass; otherwise save
    them next to it as .ungated.npz. When a live checkpoint already exists,
    the candidate must BEAT the incumbent by MORE than the gate's measured
    noise band (VERDICT r05 item 4: end-of-session gate evals oscillate; a
    keep-if-better rule on a noisy metric ratchets downward by selection
    alone), on the gauge-removed score when both sides carry it (item 4c),
    else the raw score. A winning candidate must then also hold up on the
    DEPLOYMENT-geometry leg (vs=128 — the 128x128-crop regime inference
    actually runs, item 4b): improved there, and not worse than the
    incumbent's recorded deploy score. A passing-but-not-better candidate is
    kept as .candidate.npz. Returns the gate result dict plus ``path``."""
    import json
    import os

    from .. import __checkpoint_dir

    res = held_out_gate(params, version, vs)
    out = os.path.join(__checkpoint_dir, f"SVoRT_{version}.npz")
    g = gate_score_gauge(res)
    print(
        f"held-out pose error: init {res['rot_init_mrad']:.1f} mrad / "
        f"{res['trans_init_mm']:.2f} mm -> trained {res['rot_mrad']:.1f} mrad"
        f" / {res['trans_mm']:.2f} mm (score {gate_score(res):.4f}, "
        f"gauge {g if g is None else round(g, 4)})", flush=True,
    )
    install = res["improved"]
    inc_rec: Dict = {}
    if install and os.path.exists(out):
        inc_rec = _incumbent_record(out, version, vs)
        inc = inc_rec["result"]
        noise = inc_rec.get("noise_band", {})
        cand_g, inc_g = gate_score_gauge(res), gate_score_gauge(inc)
        if cand_g is not None and inc_g is not None:
            band = float(noise.get("gauge_band", noise.get("score_band", 0.0)))
            cand_s, inc_s, kind = cand_g, inc_g, "gauge"
        else:
            band = float(noise.get("score_band", 0.0))
            cand_s, inc_s, kind = gate_score(res), gate_score(inc), "raw"
        if not noise:
            logging.warning(
                "incumbent %s has no measured noise band — comparing at "
                "band 0 (run scripts/gate_svort.py --noise-band to fix)",
                out,
            )
        if cand_s >= inc_s - band:
            install = False
            print(
                f"candidate passes the bar but does not beat the incumbent "
                f"by more than the gate noise band ({kind} score "
                f"{cand_s:.4f} vs {inc_s:.4f} - band {band:.4f}) — "
                f"keeping the installed checkpoint", flush=True,
            )
            res["incumbent"] = inc
            out = out.replace(".npz", ".candidate.npz")
    deploy = None
    if install and deploy_leg:
        deploy = held_out_gate(params, version, vs=128, n_examples=2)
        inc_deploy = inc_rec.get("deploy")
        print(
            f"deploy-geometry leg (vs=128): init "
            f"{deploy['rot_init_mrad']:.1f} mrad -> {deploy['rot_mrad']:.1f} "
            f"mrad (score {gate_score(deploy):.4f}, "
            f"improved={deploy['improved']})", flush=True,
        )
        if not deploy["improved"] or (
            inc_deploy and gate_score(deploy) > gate_score(inc_deploy)
        ):
            install = False
            print(
                "candidate wins at gate geometry but fails the "
                "deployment-geometry leg — keeping the installed "
                "checkpoint", flush=True,
            )
            out = out.replace(".npz", ".candidate.npz")
    if not res["improved"]:
        out = out.replace(".npz", ".ungated.npz")
    save_params(out, params)
    if install:
        record = {
            "version": version,
            "vs": vs,
            "result": res,
            "gate_score": gate_score(res),
            "gate_score_gauge": gate_score_gauge(res),
        }
        if deploy is not None:
            record["deploy"] = dict(deploy)
        # the noise band is a property of the gate metric, not of one
        # checkpoint — carry the incumbent's measurement forward so the
        # next install is still band-protected
        if inc_rec.get("noise_band"):
            record["noise_band"] = inc_rec["noise_band"]
        with open(out + ".gate.json", "w") as f:
            json.dump(record, f, indent=1)
        print(f"saved {out}", flush=True)
    else:
        print(f"not installed; weights at {out}", flush=True)
    res["path"] = out
    return res


def opt_state_path(checkpoint_path: str) -> str:
    """Sibling file holding the optimizer state for a params checkpoint
    (``SVoRT_v1.training.npz`` -> ``SVoRT_v1.training.opt.npz``)."""
    base = checkpoint_path[:-4] if checkpoint_path.endswith(".npz") else (
        checkpoint_path
    )
    return base + ".opt.npz"


def _adam_index(opt_state) -> int:
    """Index of the ScaleByAdamState entry in an optax chain state. Only
    the Adam moments are persisted — LR-schedule counters are left to the
    continuation's own schedule (continuations should run warmup_steps=0)."""
    for i, s in enumerate(opt_state):
        if hasattr(s, "mu") and hasattr(s, "nu") and hasattr(s, "count"):
            return i
    raise ValueError("no ScaleByAdamState in optimizer state")


def params_fingerprint(params: Dict) -> np.ndarray:
    """SHA-256 over the f16-quantized bytes of every param, in sorted key
    order — exactly what ``save_params`` writes, so the fingerprint of the
    in-memory training params equals the fingerprint of the same params
    after an f16 checkpoint round-trip (f16->f32->f16 is bit-exact)."""
    import hashlib

    h = hashlib.sha256()
    for k in sorted(params):
        h.update(k.encode())
        h.update(np.ascontiguousarray(np.asarray(params[k], np.float16)))
    return np.frombuffer(h.digest(), dtype=np.uint8)


def save_opt_state(path: str, opt_state, params: Dict = None) -> None:
    """Persist the Adam step count and moments so a later session can
    continue training as if uninterrupted (see SVoRTTrainConfig.init_opt_path).
    mu is stored f16 (same scale as gradients; rounding there is harmless),
    nu f32 — an underflowed-to-zero second moment would explode the next
    update to mu/eps. Atomic write, like save_params.

    When ``params`` is given, their fingerprint is stored so a later load
    can verify the moments belong to the exact params being resumed — a
    stale sidecar surviving next to a *different* checkpoint (e.g. the
    training snapshot's .opt.npz after an install-declined run, resumed
    against the incumbent) has matching shapes and would otherwise be
    grafted silently."""
    import os

    s = opt_state[_adam_index(opt_state)]
    arrs = {"count": np.asarray(s.count)}
    if params is not None:
        arrs["param_sha"] = params_fingerprint(params)
    for k, v in s.mu.items():
        arrs["mu::" + k] = np.asarray(v, np.float16)
    for k, v in s.nu.items():
        arrs["nu::" + k] = np.asarray(v, np.float32)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, **arrs)
    os.replace(tmp, path)


def load_opt_state(path: str, opt_state, params: Dict = None):
    """Graft Adam moments saved by ``save_opt_state`` into a freshly
    initialized optimizer state (any LR schedule — the template's other
    chain entries are kept as-is). Raises on any param-name/shape mismatch:
    a moment file from a different model must never be silently applied.
    With ``params``, also requires the file's stored fingerprint to match
    them (moments for a *different snapshot* of the same model are rejected,
    not just a different architecture)."""
    s = opt_state[_adam_index(opt_state)]
    data = np.load(path)
    if params is not None and "param_sha" in data.files:
        if not np.array_equal(data["param_sha"], params_fingerprint(params)):
            raise ValueError(
                f"{path} holds moments for a different params snapshot "
                "(fingerprint mismatch) — refusing to graft a stale sidecar"
            )
    mu_h, nu_h = {}, {}
    for k in s.mu:
        mk, nk = "mu::" + k, "nu::" + k
        if mk not in data.files or nk not in data.files:
            raise ValueError(f"{path} has no moments for param {k!r}")
        if data[mk].shape != np.shape(s.mu[k]):
            raise ValueError(
                f"moment shape mismatch for {k!r}: "
                f"{data[mk].shape} vs {np.shape(s.mu[k])}"
            )
        mu_h[k] = data[mk]
        nu_h[k] = data[nk]
    mu = upload_tree(mu_h)  # one transfer each, not one per moment tensor
    nu = upload_tree(nu_h)
    extra = (
        {f for f in data.files if f not in ("count", "param_sha")}
        - {"mu::" + k for k in s.mu}
        - {"nu::" + k for k in s.nu}
    )
    if extra:
        raise ValueError(f"{path} has moments for unknown params: {sorted(extra)[:3]}")
    i = _adam_index(opt_state)
    new = s._replace(
        count=jnp.asarray(data["count"]), mu=mu, nu=nu
    )
    return tuple(opt_state[:i]) + (new,) + tuple(opt_state[i + 1:])


def save_params(path: str, params: Dict) -> None:
    """Persist a params dict as a .npz loadable by ``svort_predict``
    (svort/convert.py load_converted). f16 storage: inference-quality
    (activation-parity tests pass at well under f16 resolution) at half
    the file size of f32 — these checkpoints are hundreds of MB."""
    import os

    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(
            f,
            **{
                k: np.asarray(v).astype(np.float16)
                for k, v in params.items()
            },
        )
    # atomic install: a crash mid-write must not corrupt the live file
    os.replace(tmp, path)
