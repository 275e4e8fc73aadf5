"""Driver-contract query registry.

Each entry pairs a PySpark implementation ``(spark, sf_dir) -> DataFrame``
with (where SQL-expressible) an equivalent ANSI-SQL oracle run by DuckDB on
the same parquet files. Column names/aliases match exactly between the two —
the driver sorts columns by name and hashes values (see repo
``__spark_entry__.py`` docstring).

Numeric policy (FIXTURES.md "Type-fidelity"): similarity math in float64 on
both sides; every float output rounded to 6 decimals; deterministic ORDER BY
tie-breaks on the primary key wherever a LIMIT/top-k makes the row *set*
order-sensitive.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .index.vector_index import VectorIndex

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


# --------------------------------------------------------------------- #
# E1 / O19 — exact kNN top-k, the reference's core query (NMR:388)
# --------------------------------------------------------------------- #

KNN_K = 5
KNN_QUERY_ID = 0  # query vector = embedding of vec_id 0 (deterministic)


@register(
    "knn_exact",
    oracle=f"""
    WITH q AS (
        SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = {KNN_QUERY_ID}
    )
    SELECT e.vec_id, e.label,
           round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) AS score
    FROM embeddings e, q
    ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qv) DESC, e.vec_id
    LIMIT {KNN_K}
    """,
)
def knn_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-query exact top-k over the embeddings corpus.

    Plan: parquet scan (embedding+vec_id+label pruned) → codegen'd cosine
    expression → TakeOrderedAndProject(k). No shuffle; scales to an
    arbitrarily large corpus (per-partition top-k, driver merges k rows per
    partition).
    """
    emb = load(spark, sf_dir, "embeddings")
    qvec = (
        emb.filter(F.col("vec_id") == KNN_QUERY_ID)
        .select("embedding")
        .collect()[0][0]
    )
    idx = VectorIndex(emb, key="vec_id", vector_col="embedding", dim=len(qvec))
    res = idx.search(qvec, k=KNN_K, columns=["label"])
    return res.select("vec_id", "label", F.round("score", 6).alias("score"))
