"""index.pq: product quantization — encode semantics, plan shape,
trained-vs-seeded residual quality."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from vectorsearch_image_embeddings_databricks_spark.index import pq

from .conftest import SF_SMALL

DIM = 64
M, K = 4, 4


def _emb(spark):
    return spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")


def test_encode_is_map_only_and_seeds_self_encode(spark):
    """Plan must contain no Exchange/Join (pure projection+explode);
    every seed row must encode to its own code with residual 0 in all
    subspaces."""
    emb = _emb(spark)
    books = pq.seed_codebooks(emb, "vec_id", "embedding", m=M, k=K, dim=DIM)
    enc = pq.encode(emb, "vec_id", "embedding", books, dim=DIM)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        enc.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan
    assert "Join" not in plan
    rows = enc.filter(F.col("id") < K).collect()
    assert len(rows) == K * M
    for r in rows:
        assert r["code"] == r["id"]
        assert r["dist_micro"] == 0


def test_profile_covers_corpus_and_residual_nonneg(spark):
    emb = _emb(spark)
    n = emb.count()
    books = pq.seed_codebooks(emb, "vec_id", "embedding", m=M, k=K, dim=DIM)
    prof = pq.code_profile(
        pq.encode(emb, "vec_id", "embedding", books, dim=DIM)
    ).collect()
    per_sub = {}
    for r in prof:
        per_sub[r["sub"]] = per_sub.get(r["sub"], 0) + r["n_vecs"]
        assert r["sum_dist_micro"] >= 0
    assert per_sub == {j: n for j in range(M)}


def test_trained_codebooks_cut_residual_vs_seeded(spark):
    """Lloyd-trained codebooks must achieve a strictly lower total
    residual than the arbitrary seeded ones (the point of training),
    and be deterministic across calls."""
    emb = _emb(spark)
    seeded = pq.seed_codebooks(emb, "vec_id", "embedding", m=M, k=K, dim=DIM)
    trained = pq.train_codebooks(
        emb, "embedding", m=M, k=K, dim=DIM, sample_size=500
    )
    trained2 = pq.train_codebooks(
        emb, "embedding", m=M, k=K, dim=DIM, sample_size=500
    )
    assert trained == trained2

    def residual(books):
        return (
            pq.encode(emb, "vec_id", "embedding", books, dim=DIM)
            .agg(F.sum("dist_micro"))
            .collect()[0][0]
        )

    assert residual(trained) < residual(seeded)


def test_dim_mismatch_rejected(spark):
    emb = _emb(spark)
    with pytest.raises(ValueError):
        pq.seed_codebooks(emb, "vec_id", "embedding", m=5, k=K, dim=DIM)
    books = pq.seed_codebooks(emb, "vec_id", "embedding", m=M, k=K, dim=DIM)
    with pytest.raises(ValueError):
        pq.encode(emb, "vec_id", "embedding", books, dim=63)


def test_adc_search_plan_and_self_hit(spark):
    """ADC over the compact code table must be shuffle/join-free
    (scan -> codegen'd LUT sum -> TakeOrderedAndProject), and the query
    vector's own row (a seed, residual 0 in every subspace) must rank
    first with adc_dist_micro == 0."""
    emb = _emb(spark)
    books = pq.seed_codebooks(emb, "vec_id", "embedding", m=M, k=K, dim=DIM)
    enc = pq.encode_compact(emb, "vec_id", "embedding", books, dim=DIM)
    qvec = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    res = pq.adc_search(enc, qvec, books, dim=DIM, k=5)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        res.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "TakeOrderedAndProject" in plan
    rows = res.collect()
    assert rows[0]["id"] == 0
    assert rows[0]["adc_dist_micro"] == 0
    micro = [r["adc_dist_micro"] for r in rows]
    assert micro == sorted(micro)


def test_encode_compact_matches_exploded_encode(spark):
    """The compact (id, codes[]) layout must agree per-subspace with the
    exploded encode() output."""
    emb = _emb(spark).limit(50)
    books = pq.seed_codebooks(emb, "vec_id", "embedding", m=M, k=K, dim=DIM)
    compact = {
        r["id"]: list(r["codes"])
        for r in pq.encode_compact(
            emb, "vec_id", "embedding", books, dim=DIM
        ).collect()
    }
    exploded = pq.encode(emb, "vec_id", "embedding", books, dim=DIM).collect()
    for r in exploded:
        assert compact[r["id"]][r["sub"]] == r["code"]


def test_adc_lut_portable_and_recall_positive(spark):
    """LUT entries are nonnegative ints; ADC top-20 overlaps the exact
    L2 top-20 (sanity floor, not a tuned recall claim)."""
    emb = _emb(spark)
    books = pq.seed_codebooks(emb, "vec_id", "embedding", m=M, k=K, dim=DIM)
    qvec = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    luts = pq.adc_lut_micro(qvec, books, DIM)
    assert len(luts) == M and all(len(row) == K for row in luts)
    assert all(isinstance(v, int) and v >= 0 for row in luts for v in row)
    enc = pq.encode_compact(emb, "vec_id", "embedding", books, dim=DIM)
    adc_ids = {
        r["id"] for r in pq.adc_search(enc, qvec, books, dim=DIM, k=20).collect()
    }
    from vectorsearch_image_embeddings_databricks_spark.functions.vector import l2_dist

    qlit = F.array(*[F.lit(float(x)) for x in qvec])
    exact_ids = {
        r["vec_id"]
        for r in emb.select("vec_id", l2_dist("embedding", qlit).alias("d"))
        .orderBy("d", "vec_id")
        .limit(20)
        .collect()
    }
    assert len(adc_ids & exact_ids) >= 1
