"""Persistent XLA compilation cache (best-effort).

The TPU toolchain this framework targets compiles remotely over a
congestion-sensitive link — the SAME headline program has been measured
compiling in 128 s .. 1032 s depending on load (docs/PERF.md). Executable
serialization works on this PJRT plugin (verified on hardware), so a
persistent on-disk cache turns every repeat invocation — CLI re-runs,
debias-loop restarts, benchmark re-measurements — into a seconds-long
deserialize instead of a cold remote compile.

Enabled by default from the CLI entry point; opt out with
``UCE_COMPILE_CACHE=0`` or redirect with ``UCE_COMPILE_CACHE_DIR=...``.
Never raises: any failure (read-only FS, plugin without serialization
support) silently falls back to cold compiles.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "uce_tpu", "xla")


def enable(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Returns the directory on success, None when disabled or unavailable.
    Safe to call multiple times and at any point before the first compile.
    """
    if os.environ.get("UCE_COMPILE_CACHE", "1") == "0":
        return None
    cache_dir = (cache_dir
                 or os.environ.get("UCE_COMPILE_CACHE_DIR")
                 or _DEFAULT_DIR)
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Programs below ~1 s compile locally anyway; don't churn the disk.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return cache_dir
    except Exception:  # noqa: BLE001 - cache is never worth failing over
        return None
