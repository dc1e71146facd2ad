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
# a cache shipped with the checkout (pre-warmed for the benchmark
# program shapes — first compiles over the device tunnel cost
# 100-400 s each, ~7 min of warmup per fresh machine without it)
_REPO_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def default_cache_dir() -> str:
    return _REPO_DIR if os.path.isdir(_REPO_DIR) else DEFAULT_DIR


def enable_compile_cache(path: str | None = None) -> str | None:
    """Point jax's persistent compilation cache at ``path``.

    Must run before the first jit compile. Safe to call multiple times.
    Set NTSYNT_NO_COMPILE_CACHE=1 to disable. Returns the directory, or
    None when disabled.
    """
    if os.environ.get("NTSYNT_NO_COMPILE_CACHE"):
        return None
    import jax

    cache_dir = path or os.environ.get("JAX_COMPILATION_CACHE_DIR") or default_cache_dir()
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    return cache_dir
