"""Platform bring-up helpers: compilation caching, device selection."""

from __future__ import annotations

import os
from pathlib import Path


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Turn on JAX's persistent compilation cache.

    Tracker-step compiles take minutes on remote-attached TPUs; with the
    cache, every identically-shaped run after the first starts instantly.
    Safe to call multiple times; call before the first jit compilation.
    """
    import jax

    path = Path(cache_dir or os.environ.get("JAX_CACHE_DIR", Path.home() / ".cache" / "jax_compilation"))
    path.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def force_cpu() -> None:
    """Pin JAX to the CPU backend (tests, CI, hardware-free hosts).

    Must run before any JAX backend initialization. Note: hosted-TPU
    plugins may force-register even when JAX_PLATFORMS=cpu is exported;
    the explicit config update is the reliable override.
    """
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")


def pallas_backend() -> bool:
    """True when the TPU Pallas kernels should run (Mosaic-capable backend).

    ``THOR_SLAM_DISABLE_PALLAS=1`` forces the portable XLA fallbacks —
    the escape hatch for debugging kernel/XLA discrepancies in place.
    """
    if os.environ.get("THOR_SLAM_DISABLE_PALLAS"):
        return False
    import jax

    return jax.default_backend() not in ("cpu", "gpu")
