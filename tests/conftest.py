"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Unlike the reference (whose tests require a CUDA GPU — reference
tests/__init__.py:37 calls .cuda() in every fixture), this suite runs the
same JAX code on CPU, and exposes 8 virtual devices so sharding/pjit paths
are exercised without TPU hardware.

Note: the env-var route (JAX_PLATFORMS=cpu) is overridden by the TPU
platform plugin in this environment, so the config API is used instead —
it must run before any backend initialization, hence at conftest import.
"""

import os

# NESVOR_TPU_TESTS=1 leaves the real accelerator visible so the tpu-gated
# quality tests (tests/test_brain_quality_full.py) can run on hardware;
# default = the virtual 8-device CPU mesh for the portable suite
_TPU_MODE = os.environ.get("NESVOR_TPU_TESTS") == "1"

flags = os.environ.get("XLA_FLAGS", "")
if not _TPU_MODE and "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not _TPU_MODE:
    jax.config.update("jax_platforms", "cpu")

# apply the package's f32-matmul-semantics setting (entry-point-scoped in
# the package itself; tests exercise internals directly)
from nesvor_tpu._precision import ensure_f32_matmul_semantics  # noqa: E402

ensure_f32_matmul_semantics()
