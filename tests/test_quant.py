"""SQ8 scalar quantization and binary sign-bit quantization
(index/quant.py): encode bounds, self-distance identities, recall vs
exact kNN, and the zero-shuffle search-path plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectorsearch_image_embeddings_databricks_spark.index import VectorIndex, quant

from .conftest import SF_SMALL


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").cache()


def test_sq8_codes_stay_in_byte_range_and_constant_dim_is_zero(spark):
    df = spark.createDataFrame(
        [(0, [0.0, 5.0, 7.0]), (1, [1.0, -5.0, 7.0]), (2, [0.5, 0.0, 7.0])],
        "id long, v array<double>",
    )
    mins, maxes = quant.sq8_train(df, "v", 3)
    assert mins == [0.0, -5.0, 7.0] and maxes == [1.0, 5.0, 7.0]
    codes = {
        r["id"]: r["c"]
        for r in df.select(
            "id", quant.sq8_encode_expr("v", mins, maxes).alias("c")
        ).collect()
    }
    for cs in codes.values():
        assert all(0 <= c <= 255 for c in cs)
        assert cs[2] == 0  # constant dimension encodes 0, no div-by-zero
    assert codes[0][0] == 0 and codes[1][0] == 255  # min→0, max→255
    assert codes[0][1] == 255 and codes[1][1] == 0


def test_sq8_topk_recall_vs_exact(emb):
    qvec = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    mins, maxes = quant.sq8_train(emb, "embedding", len(qvec))
    sq = {
        r["vec_id"]
        for r in quant.sq8_topk(
            emb, "vec_id", "embedding", qvec, mins, maxes, k=5
        ).collect()
    }
    exact_idx = VectorIndex(emb, key="vec_id", vector_col="embedding",
                            dim=len(qvec))
    exact = {r["vec_id"] for r in exact_idx.search(qvec, k=5).collect()}
    # 8-bit scalar quantization is near-exact: ≥4/5 overlap on the fixture
    assert len(sq & exact) >= 4


def test_binary_words_self_distance_zero_and_negation_is_dim(spark):
    df = spark.createDataFrame(
        [(0, [1.0, -1.0] * 32), (1, [-1.0, 1.0] * 32)],
        "id long, v array<double>",
    )
    words = df.select(
        "id", quant.sign_words_expr("v", 64).alias("w")
    ).collect()
    w = {r["id"]: r["w"] for r in words}
    assert len(w[0]) == 2  # 64 dims → two 32-bit words
    d = df.sparkSession.range(1).select(
        quant.hamming_words(
            F.array(*[F.lit(x).cast("long") for x in w[0]]),
            F.array(*[F.lit(x).cast("long") for x in w[1]]),
        ).alias("d")
    ).collect()[0]["d"]
    assert d == 64  # exact sign negation flips every bit
    d0 = df.sparkSession.range(1).select(
        quant.hamming_words(
            F.array(*[F.lit(x).cast("long") for x in w[0]]),
            F.array(*[F.lit(x).cast("long") for x in w[0]]),
        ).alias("d")
    ).collect()[0]["d"]
    assert d0 == 0


def test_binary_topk_returns_query_first_and_monotone(emb):
    qvec = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    rows = quant.binary_topk(emb, "vec_id", "embedding", qvec, k=5).collect()
    assert rows[0]["vec_id"] == 0 and rows[0]["hamming"] == 0
    hams = [r["hamming"] for r in rows]
    assert hams == sorted(hams)


def test_quant_search_paths_have_no_exchange(emb):
    qvec = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    mins, maxes = quant.sq8_train(emb, "embedding", len(qvec))
    for df in (
        quant.sq8_topk(emb, "vec_id", "embedding", qvec, mins, maxes, k=5),
        quant.binary_topk(emb, "vec_id", "embedding", qvec, k=5),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
        assert "Exchange" not in plan
