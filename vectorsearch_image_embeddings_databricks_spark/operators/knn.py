"""kNN operators — thin composition layer over index.VectorIndex
(SURVEY.md §2 E1/E2, generalizing the reference's single-query
``similarity_search`` REST call, NMR:380–390)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from ..functions.vector import cosine_similarity
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


def mine_triplets(
    corpus: DataFrame,
    anchors: DataFrame,
    key: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative triplet mining for contrastive training: for each
    anchor, the most-similar same-label vector (hardest positive) and
    the most-similar different-label vector (hardest negative) by
    cosine. The mined (anchor, positive, hard-negative) triplets are
    the training batches of a contrastive embedding run (SimCSE/CLIP-
    style), and "nearest wrong-label neighbor" is the canonical hard
    negative.

    Returns one row per anchor:
    ``(anchor_id, anchor_label, pos_id, pos_cos, neg_id, neg_cos)``
    with cosines rounded to 6 dp and exact-tie break to the smallest
    candidate id (ties resolved on the raw double BEFORE rounding).

    Scale shape (100 TB lens): the anchor set is the small side by
    construction (a training batch / probe set) → broadcast; the corpus
    is scanned ONCE, each row scored against every anchor inside
    whole-stage codegen, then reduced by a single groupBy(anchor) whose
    conditional struct-max aggregates are partial-aggregated map-side —
    each executor emits at most one candidate struct per anchor per
    side before the exchange, so the shuffle is O(|anchors| × #tasks)
    regardless of corpus size. No window over the corpus, no cross-join
    materialization.
    """
    a = F.broadcast(
        anchors.select(
            F.col(key).alias("anchor_id"),
            F.col(label_col).alias("anchor_label"),
            F.col(vec_col).alias("anchor_vec"),
        )
    )
    c = corpus.select(
        F.col(key).alias("cand_id"),
        F.col(label_col).alias("cand_label"),
        F.col(vec_col).alias("cand_vec"),
    )
    scored = c.join(a, F.col("cand_id") != F.col("anchor_id")).select(
        "anchor_id",
        "anchor_label",
        "cand_id",
        "cand_label",
        cosine_similarity("cand_vec", "anchor_vec").alias("cos"),
    )
    # struct compare is lexicographic: max cos first, then max(-id) ==
    # smallest id on exact ties.
    cand = F.struct(
        F.col("cos"), (-F.col("cand_id")).alias("nid")
    )
    same = F.col("cand_label") == F.col("anchor_label")
    best = scored.groupBy("anchor_id", "anchor_label").agg(
        F.max(F.when(same, cand)).alias("p"),
        F.max(F.when(~same, cand)).alias("n"),
    )
    return best.select(
        "anchor_id",
        "anchor_label",
        (-F.col("p.nid")).alias("pos_id"),
        F.round("p.cos", 6).alias("pos_cos"),
        (-F.col("n.nid")).alias("neg_id"),
        F.round("n.cos", 6).alias("neg_cos"),
    )
