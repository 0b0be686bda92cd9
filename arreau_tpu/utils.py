"""Small runtime utilities shared by the CLIs."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache.

    First XLA compiles of the big fused train-step programs take minutes on
    the remote-compile TPU path; the persistent cache makes every later
    process start instantly for unchanged programs. Call before the first
    jit execution.
    """
    import jax

    cache_dir = path or os.environ.get(
        "ARREAU_JAX_CACHE", os.path.expanduser("~/.cache/arreau_jax")
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
