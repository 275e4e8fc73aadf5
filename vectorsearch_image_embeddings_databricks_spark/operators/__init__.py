from . import dedup, hybrid, knn, textstats  # noqa: F401
