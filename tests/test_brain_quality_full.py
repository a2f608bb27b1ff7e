"""Full-config brain-phantom quality regression guard (VERDICT r04 item 6).

The round-4 TPU study measured 21.49 dB PSNR / 0.919 SSIM inside the brain
mask for the fourier flagship at full config (vs=128 @ 0.5 mm, 6 stacks,
bias 0.4, 5000 iters) — but only as PERF.md prose; nothing failed if it
regressed. This test pins it: run with

    NESVOR_TPU_TESTS=1 python -m pytest tests/test_brain_quality_full.py -m '' -q

on a TPU host (the default suite forces the CPU backend and skips this —
a CPU run of the full config would take hours and its compile ceiling
changes the measured quality anyway).
"""

import jax
import pytest

pytestmark = pytest.mark.slow


@pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="full-config quality gate needs the TPU "
    "(run with NESVOR_TPU_TESTS=1 on hardware)",
)
def test_full_config_brain_quality_regression():
    from scripts.exp_brain_quality import run_study

    r = run_study("fourier", 5000)
    psnr = max(r["psnr_raw"], r["psnr_fixed"])
    ssim = max(r["ssim_raw"], r["ssim_fixed"])
    # round-4 measured 21.49 dB / 0.919; gate ~1 dB / 0.02 below to absorb
    # seed/tunnel noise while still catching a real regression
    assert psnr >= 20.5, r
    assert ssim >= 0.90, r
