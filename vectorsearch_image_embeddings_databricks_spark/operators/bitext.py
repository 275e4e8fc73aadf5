"""Margin-based parallel-pair mining over two embedding sets.

The bitext-mining step of multilingual training-data pipelines
(Artetxe & Schwenk's margin criterion, the CCMatrix/LASER recipe):
a candidate pair (x, y) is scored not by raw cosine but by the margin

    margin(x, y) = cos(x, y) / (0.5 * (mean_k(x) + mean_k(y)))

where mean_k(v) is the mean cosine of v's k nearest neighbors in the
OTHER set — normalizing away "hubness" (vectors that are close to
everything). Each x keeps its best-margin y above a threshold.

Spark-first shape: one kNN join per direction (the same bounded
`TakeOrderedAndProject`/window machinery as `VectorIndex.search_batch`),
then the per-vector neighbor means are tiny (|set| rows) and join back
by key. Nothing is ever all-pairs at scale — swap the exact kNN for the
ANN index to mine at corpus size; the formula only needs top-k lists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import cosine_similarity


def _topk_cross(
    a: DataFrame, b: DataFrame, id_col: str, vec_col: str, k: int
) -> DataFrame:
    """For each row of ``a``: its k highest-cosine rows of ``b`` →
    (id_a, id_b, cos). Exact tier: per-query top-k via a partitioned
    window over the broadcast-joined score table."""
    left = a.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    right = b.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    scored = left.join(F.broadcast(right)).select(
        "id_a", "id_b", cosine_similarity("__va", "__vb").alias("cos")
    )
    w = Window.partitionBy("id_a").orderBy(F.desc("cos"), F.asc("id_b"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def mine_parallel_pairs(
    a: DataFrame,
    b: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 4,
    margin_threshold: float = 1.0,
) -> DataFrame:
    """(id_a, id_b, margin): each ``a`` row's best-margin ``b`` partner
    with margin above ``margin_threshold`` (1.0 = better than the
    neighborhood average; CCMatrix ships ~1.06 for real bitext).

    Deterministic: the argmax tie-breaks on the smallest id_b."""
    # |a|·k and |b|·k rows; materialized once — each list feeds both a
    # neighbor-mean aggregate and the margin join, and without the
    # checkpoint every consumer re-runs the full cross scoring
    ab = _topk_cross(a, b, id_col, vec_col, k).localCheckpoint(eager=True)
    ba = _topk_cross(b, a, id_col, vec_col, k).localCheckpoint(eager=True)
    mean_a = ab.groupBy("id_a").agg(F.avg("cos").alias("__ma"))
    mean_b = ba.groupBy(F.col("id_a").alias("id_b")).agg(
        F.avg("cos").alias("__mb")
    )
    margins = (
        ab.join(mean_a, "id_a")
        .join(mean_b, "id_b")
        .withColumn(
            "margin",
            F.col("cos") / (0.5 * (F.col("__ma") + F.col("__mb"))),
        )
    )
    w = Window.partitionBy("id_a").orderBy(F.desc("margin"), F.asc("id_b"))
    return (
        margins.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col("margin") > margin_threshold))
        .select("id_a", "id_b", "margin")
    )
