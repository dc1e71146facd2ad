from . import u64, nthash, winmin, sketch, bloom, bf_build  # noqa: F401
