"""Brain-like multi-tissue 3-D phantom for quality studies.

Every quality number through round 3 was measured on smooth ellipsoid
phantoms (Shepp-Logan / Yu-Ye-Wang); the reference's actual workload is
fetal brain MRI (reference README.md:41-43) — folded cortex, multi-tissue
contrast, per-acquisition intensity inhomogeneity. This generator adds a
synthetic cortex so "matches the reference on its workload" is measured,
not extrapolated (VERDICT r03 item 4):

- outer anatomy: scalp (bright fat), skull (dark shell), CSF space;
- a GYRIFIED cortical ribbon: the brain-surface level set is perturbed by
  band-limited 3-D noise, so the gray-matter sheet folds like gyri/sulci
  instead of being a smooth shell;
- interior: T2-like fetal tissue ordering (CSF brightest, WM above GM at
  mid-gestation), deep-gray nuclei, curved lateral ventricles;
- everything is smooth/band-limited by construction (level-set fades), so
  PSNR against it is meaningful at acquisition resolution.

Lives in the package (not tests/) because it is ALSO the training-data
generator for SVoRT (svort/train.py synth_volume brain examples): the
registrar should see feature-rich, brain-like volumes, not only smooth
ellipsoids — the reference's pretrained weights were trained on real fetal
anatomy (reference svort/inference.py:565-593).

Pure numpy, no torch/JAX — same contract as tests/phantom3d.py.
"""

import numpy as np


def _smooth_noise(shape, sigma_vox, rng):
    """Band-limited unit-std Gaussian noise via FFT low-pass (periodic,
    cheap at 64..192^3; avoids a separable-blur dependency on the package)."""
    noise = rng.standard_normal(shape).astype(np.float32)
    f = np.fft.rfftn(noise)
    freqs = [np.fft.fftfreq(s) for s in shape[:-1]] + [np.fft.rfftfreq(shape[-1])]
    kk = np.zeros(f.shape, np.float32)
    for ax, fr in enumerate(freqs):
        sh = [1] * len(shape)
        sh[ax] = len(fr)
        kk = kk + (fr.astype(np.float32) ** 2).reshape(sh)
    # Gaussian transfer function exp(-2 (pi sigma k)^2)
    f *= np.exp(-2.0 * (np.pi * sigma_vox) ** 2 * kk)
    out = np.fft.irfftn(
        f, shape, axes=tuple(range(len(shape)))
    ).astype(np.float32)
    return out / max(out.std(), 1e-6)


def _ellipsoid_q(coords, center, semi):
    """Quadratic form of an axis-aligned ellipsoid: <=1 inside."""
    q = np.zeros(coords[0].shape, np.float32)
    for c, c0, a in zip(coords, center, semi):
        q += ((c - c0) / a) ** 2
    return q


def _fade(level, width):
    """1 inside (level<=1), 0 outside, smooth linear ramp of ``width``
    in level units: keeps every tissue boundary band-limited."""
    return np.clip((1.0 + width - level) / width, 0.0, 1.0).astype(np.float32)


def brain_phantom(
    n: int = 96,
    seed: int = 0,
    return_tissues: bool = False,
    shape_jitter: float = 0.0,
):
    """A (n, n, n) float32 volume in [0, 1]: synthetic T2-like fetal head.

    ``return_tissues`` additionally returns a dict of the soft tissue
    fraction maps (scalp/skull/csf/gm/wm/deep_gm/ventricles) for studies
    that need per-tissue metrics. ``shape_jitter`` > 0 perturbs every
    ellipsoid semi-axis by U(1±jitter) (seed-dependent anatomy — used when
    the phantom serves as a TRAINING-data generator so the registrar
    cannot memorize one head shape; keep 0 for quality studies, whose
    ground truth must be reproducible from the seed alone... which jitter
    also is, but fixed geometry keeps studies comparable across seeds).
    """
    rng = np.random.default_rng(seed)

    def J(semi):
        if not shape_jitter:
            return semi
        return tuple(
            s * rng.uniform(1.0 - shape_jitter, 1.0 + shape_jitter)
            for s in semi
        )

    # normalized coords in [-1, 1] (z, y, x order to match phantom3d layout)
    lin = np.linspace(-1.0, 1.0, n, dtype=np.float32)
    z, y, x = np.meshgrid(lin, lin, lin, indexing="ij")
    coords = (x, y, z)

    # ----- head envelope (slightly egg-shaped: broader occiput) -----
    hj = J((1.0, 1.0, 1.0))  # one common head-scale jitter keeps shells nested
    head = _ellipsoid_q(coords, (0.0, -0.02, 0.0), tuple(
        a * b for a, b in zip((0.72, 0.88, 0.70), hj)))
    skull = _ellipsoid_q(coords, (0.0, -0.02, 0.0), tuple(
        a * b for a, b in zip((0.66, 0.82, 0.64), hj)))
    brain0 = _ellipsoid_q(coords, (0.0, -0.02, 0.02), tuple(
        a * b for a, b in zip((0.58, 0.74, 0.56), hj)))

    # ----- gyrification: perturb the brain level set with band-limited
    # noise, amplitude growing toward the surface so deep WM stays smooth.
    # Fold wavelength ~n/3 voxels (sigma n/12): broad shallow folds like a
    # mid-gestation fetal brain, comfortably above the acquisition PSF at
    # the test geometries (gap 3 vox), so reconstruction CAN recover them —
    # finer folds would measure the acquisition bandwidth, not the method.
    fold = _smooth_noise((n, n, n), sigma_vox=n / 12.0, rng=rng)
    surf_weight = np.clip(brain0, 0.0, 1.2) ** 2  # ~0 at center, ~1 at surface
    brain = brain0 + 0.16 * fold * surf_weight

    w = 24.0 / n  # fade width: ~2-3 voxels at any n, in level units
    in_head = _fade(head, w)
    in_skull = _fade(skull, w)
    in_brain = _fade(brain, w)
    # cortical ribbon: the outer shell of the folded brain level set.
    # ribbon thickness in level units (folded level set => folded sheet)
    ribbon = 0.22
    in_wm_core = _fade(brain + ribbon, w)
    gm = in_brain * (1.0 - in_wm_core)
    wm = in_wm_core

    # ----- deep gray nuclei (thalami + basal ganglia, two mirrored blobs)
    dgs = J((0.14, 0.20, 0.14))
    deep = np.maximum(
        1.0 - _ellipsoid_q(coords, (0.16, 0.02, -0.02), dgs),
        1.0 - _ellipsoid_q(coords, (-0.16, 0.02, -0.02), dgs),
    )
    deep_gm = np.clip(deep / w, 0.0, 1.0) * wm

    # ----- lateral ventricles: two curved (sheared) CSF cavities
    xs = x - 0.35 * y * y  # parabolic bend along y gives the C-shape
    vvs = J((0.07, 0.34, 0.10))
    vent = np.maximum(
        1.0 - _ellipsoid_q((xs, y, z), (0.17, 0.12, 0.10), vvs),
        1.0 - _ellipsoid_q((xs, y, z), (-0.17, 0.12, 0.10), vvs),
    )
    ventricles = np.clip(vent / w, 0.0, 1.0) * wm
    deep_gm = deep_gm * (1.0 - ventricles)  # CSF wins where the two abut

    # ----- compose tissue fractions (each in [0,1], disjoint by masking)
    csf = in_skull * (1.0 - in_brain)  # subarachnoid CSF between brain & skull
    skull_sh = in_head * (1.0 - in_skull)
    # scalp = thin bright rim outside the skull envelope
    scalp_outer = _fade(
        _ellipsoid_q(coords, (0.0, -0.02, 0.0), tuple(
            a * b for a, b in zip((0.78, 0.94, 0.76), hj))), w
    )
    scalp = scalp_outer * (1.0 - in_head)

    wm_only = wm * (1.0 - deep_gm) * (1.0 - ventricles)

    # ----- T2-like intensities (fetal ~22-30 wk: CSF >> WM > GM) -----
    I = (
        1.00 * csf
        + 1.00 * ventricles
        + 0.62 * gm
        + 0.78 * wm_only
        + 0.55 * deep_gm
        + 0.12 * skull_sh
        + 0.80 * scalp
    )
    # gentle WM maturation gradient (periventricular brighter)
    I += 0.06 * wm_only * np.clip(1.0 - brain0, 0.0, 1.0)
    I = I.astype(np.float32)

    if return_tissues:
        return I, {
            "scalp": scalp,
            "skull": skull_sh,
            "csf": csf,
            "gm": gm,
            "wm": wm_only,
            "deep_gm": deep_gm,
            "ventricles": ventricles,
        }
    return I


def bias_field(n: int, seed: int, strength: float = 0.3) -> np.ndarray:
    """Smooth multiplicative intensity inhomogeneity (N4-style): exp of a
    low-order random field — a few long-wavelength cosines with random
    orientation/phase. Mean ~1; ``strength`` ~ peak log-deviation."""
    rng = np.random.default_rng(seed)
    lin = np.linspace(-1.0, 1.0, n, dtype=np.float32)
    z, y, x = np.meshgrid(lin, lin, lin, indexing="ij")
    field = np.zeros((n, n, n), np.float32)
    for _ in range(3):
        k = rng.normal(0, 1.2, 3).astype(np.float32)  # ~1 cycle across the FOV
        phase = rng.uniform(0, 2 * np.pi)
        field += np.cos(k[0] * np.pi * x + k[1] * np.pi * y + k[2] * np.pi * z + phase)
    field -= field.mean()
    field *= strength / max(np.abs(field).max(), 1e-6)
    return np.exp(field).astype(np.float32)
