"""Unit + property tests for vector column expressions (SURVEY.md §5.1/§5.3)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from vectorsearch_image_embeddings_databricks_spark.functions.vector import (
    cosine_similarity,
    dim_check,
    dot,
    l2_dist,
    l2_norm,
    l2_normalize,
)


def _eval(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def arr(xs):
    return F.array(*[F.lit(float(x)) for x in xs])


def test_dot_basic(spark):
    assert _eval(spark, dot(arr([1, 2, 3]), arr([4, 5, 6]))) == pytest.approx(32.0)


def test_l2_norm_and_dist(spark):
    assert _eval(spark, l2_norm(arr([3, 4]))) == pytest.approx(5.0)
    assert _eval(spark, l2_dist(arr([0, 0]), arr([3, 4]))) == pytest.approx(5.0)


def test_cosine_self_is_one(spark):
    v = [0.3, -0.4, 0.5, 0.1]
    assert _eval(spark, cosine_similarity(arr(v), arr(v))) == pytest.approx(1.0)


def test_normalize_produces_unit_vector(spark):
    v = [3.0, 4.0, 12.0]
    normed = _eval(spark, l2_norm(l2_normalize(arr(v))))
    assert normed == pytest.approx(1.0, abs=1e-12)


def test_normalize_zero_vector_unchanged(spark):
    assert _eval(spark, l2_normalize(arr([0, 0]))) == [0.0, 0.0]


def test_dim_check(spark):
    assert _eval(spark, dim_check(arr([1, 2, 3]), 3)) is True
    assert _eval(spark, dim_check(arr([1, 2, 3]), 4)) is False


def test_metric_equivalence_on_unit_vectors(spark):
    """§1.4 invariant: for unit vectors, ranking by cosine ≡ dot ≡ −L2."""
    import numpy as np

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((20, 8))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    q = vecs[0]
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "id: int, v: array<double>")
    qc = arr(q)
    scored = df.select(
        "id",
        cosine_similarity("v", qc).alias("cos"),
        dot("v", qc).alias("dp"),
        (-l2_dist("v", qc)).alias("negl2"),
    ).collect()
    by_cos = [r["id"] for r in sorted(scored, key=lambda r: (-r["cos"], r["id"]))]
    by_dot = [r["id"] for r in sorted(scored, key=lambda r: (-r["dp"], r["id"]))]
    by_l2 = [r["id"] for r in sorted(scored, key=lambda r: (-r["negl2"], r["id"]))]
    assert by_cos == by_dot == by_l2


def test_topk_is_prefix_of_topk_plus_one(spark):
    """top-k ⊆ top-(k+1) on the real fixture corpus."""
    from vectorsearch_image_embeddings_databricks_spark.index import VectorIndex

    from .conftest import SF_SMALL

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    q = emb.filter("vec_id = 7").collect()[0]["embedding"]
    idx = VectorIndex(emb, key="vec_id", vector_col="embedding")
    k5 = [r["vec_id"] for r in idx.search(q, k=5).collect()]
    k6 = [r["vec_id"] for r in idx.search(q, k=6).collect()]
    assert k6[:5] == k5


def test_python_norm_matches_catalyst_fold(spark):
    """The driver-side query-norm shortcut must equal the Catalyst fold."""
    v = [0.1234567, -0.7654321, 0.5555555, -0.0000001]
    acc = 0.0
    for x in v:
        acc += x * x
    assert _eval(spark, l2_norm(arr(v))) == pytest.approx(math.sqrt(acc), abs=0)


def test_search_batch_local_topk_equals_window_plan(spark):
    """The big-corpus plan (partition-local top-k before the exchange)
    must return exactly the default window plan's results, including
    tie-breaks, for every query."""
    from pyspark.sql import functions as F
    from vectorsearch_image_embeddings_databricks_spark.index.vector_index import VectorIndex
    from .conftest import SF_SMALL

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").repartition(7)
    queries = (
        spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
        .filter(F.col("vec_id") < 12)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
    )
    idx = VectorIndex(emb, key="vec_id", vector_col="embedding")

    def canon(df):
        return sorted(
            (r["query_id"], r["vec_id"], round(r["score"], 9))
            for r in df.collect()
        )

    base = canon(idx.search_batch(queries, k=5))
    local = canon(idx.search_batch(queries, k=5, local_topk=True))
    assert base == local and len(base) == 12 * 5


def test_to_data_array_matches_reference_consumer_shape(spark):
    """Code written against the notebook's positional dict unpack
    (path = row[1], score last) must work unchanged on the adapter."""
    from pyspark.sql import functions as F
    from vectorsearch_image_embeddings_databricks_spark.index.vector_index import (
        VectorIndex,
        to_data_array,
    )
    from .conftest import SF_SMALL

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").withColumn(
        "filepath", F.concat(F.lit("/imgs/"), F.col("vec_id"))
    )
    idx = VectorIndex(emb, key="vec_id", vector_col="embedding")
    q = emb.limit(1).collect()[0]["embedding"]
    res = to_data_array(idx.search(q, k=5, columns=["filepath"]))
    rows = res["result"]["data_array"]
    assert res["result"]["row_count"] == 5 and len(rows) == 5
    # positional contract: [vec_id, filepath, score] — NMR:416's path[1]
    assert [c["name"] for c in res["manifest"]["columns"]] == [
        "vec_id", "filepath", "score",
    ]
    assert all(r[1].startswith("/imgs/") for r in rows)
    assert all(isinstance(r[-1], float) for r in rows)
    # ranked by score desc, self-match first with cos≈1
    assert rows[0][-1] >= rows[-1][-1] and abs(rows[0][-1] - 1.0) < 1e-6


def test_search_batch_local_topk_payload_columns_stay_out_of_python(spark):
    """Requesting payload columns (even the vector itself) with
    local_topk=True must (a) return the same rows/values as the default
    window plan, and (b) keep the payload out of the pandas fold — the
    MapInPandas stage operates on exactly (query_id, key, score), with
    the payload re-attached afterward by a broadcast join."""
    import contextlib
    import io

    from pyspark.sql import functions as F
    from vectorsearch_image_embeddings_databricks_spark.index.vector_index import VectorIndex
    from .conftest import SF_SMALL

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").repartition(7)
    queries = (
        spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
        .filter(F.col("vec_id") < 8)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
    )
    idx = VectorIndex(emb, key="vec_id", vector_col="embedding")

    def canon(df):
        return sorted(
            (r["query_id"], r["vec_id"], r["label"], len(r["embedding"]),
             round(r["score"], 9))
            for r in df.collect()
        )

    cols = ["label", "embedding"]
    base = canon(idx.search_batch(queries, k=3, columns=cols))
    local_df = idx.search_batch(queries, k=3, columns=cols, local_topk=True)
    assert base == canon(local_df) and len(base) == 8 * 3

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        local_df.explain("formatted")
    plan = buf.getvalue()
    # the MapInPandas detail section lists its output attributes: the
    # payload must not be among them
    map_section = [
        s for s in plan.split("\n\n") if s.startswith("(") and "MapInPandas" in s
    ]
    assert map_section and "embedding" not in map_section[0]
    assert "label" not in map_section[0]
    assert "BroadcastHashJoin" in plan  # payload re-attach probes the corpus
