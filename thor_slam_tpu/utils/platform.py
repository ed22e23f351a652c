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
