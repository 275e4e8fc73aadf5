from .refresh import IncrementalIndexer  # noqa: F401
