from .vector_index import VectorIndex  # noqa: F401
