"""kNN operators — thin composition layer over index.VectorIndex
(SURVEY.md §2 E1/E2, generalizing the reference's single-query
``similarity_search`` REST call, NMR:380–390)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

from ..index.vector_index import VectorIndex


def knn_search(
    corpus: DataFrame,
    query_vector: Sequence[float],
    k: int = 5,
    key: str = "vec_id",
    vec_col: str = "embedding",
    columns: Sequence[str] | None = None,
) -> DataFrame:
    """Exact top-k for one query vector: scan → score → TakeOrderedAndProject."""
    idx = VectorIndex(corpus, key=key, vector_col=vec_col, dim=len(query_vector))
    return idx.search(query_vector, k=k, columns=columns)


def knn_join(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    key: str = "vec_id",
    vec_col: str = "embedding",
    query_key: str = "query_id",
    query_vec_col: str = "query_vec",
    columns: Sequence[str] | None = None,
) -> DataFrame:
    """Per-query top-k join; broadcasts the query table (small side)."""
    idx = VectorIndex(corpus, key=key, vector_col=vec_col)
    return idx.search_batch(
        queries,
        k=k,
        query_key=query_key,
        query_vector_col=query_vec_col,
        columns=columns,
    )
