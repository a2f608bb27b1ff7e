"""Scoped JAX runtime configuration: f32 matmul semantics + compile cache.

This TPU stack runs XLA with ``--xla_allow_excess_precision=true``, under
which an unannotated f32 dot/einsum/conv is lowered as a SINGLE bf16 MXU
pass (~0.4% relative error). That silently corrupts geometry
(rigid-transform point matmuls: ~0.4-voxel position error) and the Fourier
encoder's phases (2.5 rad at the finest octave — measured catastrophic PSNR
loss). Setting ``jax_default_matmul_precision="highest"`` (3-pass bf16)
restores true f32 semantics for every dot that does not opt out; the
hot-path MLP/encoder matmuls cast to bf16 explicitly and are unaffected
(bf16 inputs are a single MXU pass at any precision setting).

The setting is applied from this package's entry points (CLI main, train,
sample, svort_predict) rather than as an import side effect, so merely
importing ``nesvor_tpu`` does not mutate process-global JAX behavior for
unrelated code. Library users calling deep internals directly on TPU should
call :func:`ensure_f32_matmul_semantics` themselves (it is idempotent).
"""

import os

import jax


def ensure_f32_matmul_semantics() -> None:
    """Idempotently set jax_default_matmul_precision='highest' (see module
    docstring for the measured rationale). Also enables the persistent
    compilation cache — both settings belong to every entry point."""
    if jax.config.jax_default_matmul_precision != "highest":
        jax.config.update("jax_default_matmul_precision", "highest")
    enable_persistent_compilation_cache()


def _machine_fingerprint() -> str:
    """Short stable hash of the jaxlib build + host CPU feature set.

    XLA:CPU persists AOT *executables* whose cache key does NOT include the
    host's CPU features; entries written on a different machine image can
    load back with real feature mismatches (SIGILL risk). CPU cache
    partitions are therefore machine-scoped. (Note this does NOT silence
    the ~3 KB/program "+prefer-no-gather is not supported" loader spew —
    those are XLA tuning pseudo-features the loader flags even for
    same-machine entries; the multihost launchers absorb that spew with
    file-backed stdout instead of pipes.)"""
    import hashlib
    import platform

    try:
        import jaxlib

        ver = getattr(jaxlib, "__version__", "?")
    except Exception:
        ver = "?"
    try:
        with open("/proc/cpuinfo") as f:
            flags = next(ln for ln in f if ln.startswith("flags"))
    except (OSError, StopIteration):
        flags = platform.machine()
    return hashlib.sha256(f"{ver}|{flags}".encode()).hexdigest()[:10]


def _default_cache_dir() -> str:
    """Repo-checkout `.jax_cache/` when the package runs from a git checkout
    (so warmed cache entries travel with the repo), else the user cache dir.
    Partitioned by interpreter version (two pythons with different jaxlib
    builds coexist in this environment), and — for CPU-only processes — by
    a machine fingerprint, because XLA:CPU AOT entries are host-specific
    (see :func:`_machine_fingerprint`). TPU partitions stay machine-neutral
    on purpose: TPU programs are compiled remotely and their warmed cache
    (the expensive part) must survive build-machine image changes."""
    import sys

    tag = f"py{sys.version_info[0]}{sys.version_info[1]}"
    if jax.config.jax_platforms == "cpu":
        tag += f"-cpu-{_machine_fingerprint()}"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if os.path.isdir(os.path.join(repo, ".git")):
        return os.path.join(repo, ".jax_cache", tag)
    return os.path.expanduser(f"~/.cache/nesvor_tpu/jax_cache/{tag}")


def enable_persistent_compilation_cache() -> None:
    """Idempotently point JAX's persistent compilation cache at a durable
    directory.

    Rationale (BENCH_r01): 84.2 s of a 344.8 s benchmark run was XLA
    compilation, and the bench log showed "cache is disabled/not
    initialized" — a fixed cost the cache amortizes to near zero on every
    run after the first. min_compile_time is 0 — on the remote-TPU path
    even a trivial eager op costs ~1-2 s to compile through the tunnel's
    compile service (measured: 172 s of setup for ~100 eager ops), so
    caching tiny programs matters as much as caching the train step.
    Override the location with NESVOR_TPU_CACHE_DIR; set
    NESVOR_TPU_CACHE_DIR="" (empty) to disable.
    """
    if jax.config.jax_compilation_cache_dir:
        return  # already configured (by us or the application)
    cache_dir = os.environ.get("NESVOR_TPU_CACHE_DIR")
    if cache_dir == "":
        return
    if cache_dir is None:
        cache_dir = _default_cache_dir()
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
