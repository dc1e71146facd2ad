"""Persistent XLA compilation cache setup.

First compiles over the axon device tunnel cost 100-400 s per program
shape; the persistent cache brings fresh-process reruns down to cache
reads. The ``JAX_COMPILATION_CACHE_DIR`` env var alone is NOT reliably
honored on this image (a platform plugin may initialize jax's config
first — the same gotcha as ``JAX_PLATFORMS``), so every entry point
calls :func:`enable_compile_cache` explicitly after importing jax.
"""

import os

DEFAULT_DIR = "/tmp/ntsynt_jax_cache"


def enable_compile_cache(path: str | None = None) -> str | None:
    """Point jax's persistent compilation cache at ``path``.

    Must run before the first jit compile. Safe to call multiple times.
    Set NTSYNT_NO_COMPILE_CACHE=1 to disable. Returns the directory, or
    None when disabled.
    """
    if os.environ.get("NTSYNT_NO_COMPILE_CACHE"):
        return None
    import jax

    cache_dir = path or os.environ.get("JAX_COMPILATION_CACHE_DIR") or DEFAULT_DIR
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    return cache_dir
