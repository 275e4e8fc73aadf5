from .vector import (  # noqa: F401
    cosine_similarity,
    dim_check,
    dot,
    l2_dist,
    l2_norm,
    l2_normalize,
)
