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
