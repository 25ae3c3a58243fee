"""Persistent XLA compilation cache setup.

First compilation of the fused decode loop takes minutes (notably through the
remote-compile tunnel); the persistent cache makes every subsequent process
start warm. Call once before building jitted programs.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "CALLIREADER_JAX_CACHE", os.path.expanduser("~/.cache/callireader_jax")
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
