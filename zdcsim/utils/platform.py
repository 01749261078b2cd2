"""Platform selection helpers.

The TPU plugin's site customization forces ``jax_platforms`` to the
accelerator at interpreter start, overriding the ``JAX_PLATFORMS`` env var.
Tests and host-only tooling call :func:`force_cpu` (before any backend use)
to really run on CPU, optionally with N virtual devices for mesh tests.
"""

from __future__ import annotations

import os


def force_cpu(virtual_devices: int | None = None) -> None:
    """Pin JAX to the CPU backend (call before any jax computation)."""
    if virtual_devices is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={virtual_devices}"
            ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")


def enable_compile_cache(path: str = "/tmp/zdcsim_tpu_cache") -> None:
    """Enable JAX's persistent compilation cache (client-side serialized
    executables keyed by HLO hash). Remote-TPU compiles over the axon
    tunnel cost 1-4 min each and never survive the process otherwise —
    chip experiments / bench / fidelity call this first so re-runs of an
    unchanged program skip the compile."""
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
