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
    """Working cache dir: /tmp, seeded from the checked-in .jax_cache.

    Pointing JAX at the repo cache directly made every run write new
    jit_* entries into the working tree (dirty checkout, stale-entry
    commit risk). Instead the shipped entries are hardlinked/copied into
    /tmp once and JAX writes there; refreshing the shipped cache stays a
    deliberate step (cp -r /tmp/ntsynt_jax_cache/. .jax_cache — see
    CLAUDE.md)."""
    if os.path.isdir(_REPO_DIR):
        try:
            os.makedirs(DEFAULT_DIR, exist_ok=True)
            for name in os.listdir(_REPO_DIR):
                src = os.path.join(_REPO_DIR, name)
                dst = os.path.join(DEFAULT_DIR, name)
                if not os.path.exists(dst) and os.path.isfile(src):
                    # copy, never hardlink: a shared inode would let any
                    # in-place write by the jax cache layer corrupt the
                    # committed repo cache files
                    import shutil

                    shutil.copy2(src, dst)
        except OSError:
            return _REPO_DIR  # /tmp unusable; fall back to the repo cache
    return DEFAULT_DIR


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
