from . import u64, nthash, winmin, sketch, bloom  # noqa: F401
