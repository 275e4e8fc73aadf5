"""End-to-end facade test (SURVEY.md §5 layer 4): fixture binary dir →
ingest → distributed stub embedding → index → text query → reference
wire-shape adapter."""

from __future__ import annotations

import pandas as pd

from vectorsearch_image_embeddings_databricks_spark.embed import StubImageEncoder, StubTextEncoder
from vectorsearch_image_embeddings_databricks_spark.engine import (
    MultiModalEngine,
    to_data_array,
)


def _write_images(tmp_path, n=30):
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(n):
        (d / f"img_{i:03d}.jpg").write_bytes(
            b"\xff\xd8\xff\xe0" + f"payload-{i}".encode()
        )
    (d / "not_an_image.txt").write_text("skipped by the glob")
    return str(d)


def test_engine_end_to_end(spark, tmp_path):
    directory = _write_images(tmp_path)
    eng = MultiModalEngine(spark, dim=32)
    images = eng.ingest_images(directory, glob="*.jpg")
    assert images.count() == 30  # txt file pruned at listing time
    assert not [p for p in images.select("path").collect() if "file:" in p[0]]

    eng.build_index(limit=25)  # the reference's demo cap path (NMR:224)
    res = eng.search_images_by_text("a dog on a skateboard", top_k=5)
    rows = res.collect()
    assert len(rows) == 5
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(r["filepath"].endswith(".jpg") for r in rows)

    # top_k is honored (the reference ignores it — SURVEY §1.4)
    assert len(eng.search_images_by_text("same", top_k=3).collect()) == 3

    # self-retrieval sanity: querying with the exact embedding of one
    # image puts that image first (stub encoders are deterministic)
    content = [
        r["content"]
        for r in images.filter(images.path.endswith("img_007.jpg")).collect()
    ][0]
    img_vec = StubImageEncoder(dim=32).encode_batch(pd.Series([bytes(content)]))[0]
    top = eng.index.search(img_vec, k=1, columns=["filepath"]).collect()[0]
    assert top["filepath"].endswith("img_007.jpg")
    assert abs(top["score"] - 1.0) < 1e-6

    # wire-shape adapter: positional [image_id, filepath, score] rows,
    # consumers can do path = row[1] (NMR:416)
    shaped = to_data_array(res, columns=["image_id", "filepath"])
    arr = shaped["result"]["data_array"]
    assert len(arr) == 5 and len(arr[0]) == 3
    assert arr[0][1].endswith(".jpg") and isinstance(arr[0][2], float)


def test_engine_text_embedding_is_pure(spark):
    eng = MultiModalEngine(spark, dim=16)
    v1 = eng.embed_text("hello world")
    v2 = eng.embed_text("hello world")
    v3 = eng.embed_text("different")
    assert v1 == v2 and v1 != v3
    assert len(v1) == 16


def test_engine_tolerates_unencodable_rows(spark, tmp_path):
    """NMR:211–213 semantics: a failing row is skipped, not fatal."""

    class FlakyEncoder:
        dim = 16

        def encode_batch(self, batch):
            return [
                None if b is not None and bytes(b).endswith(b"-3") else
                StubImageEncoder(dim=16).encode_batch(pd.Series([b]))[0]
                for b in batch
            ]

    directory = _write_images(tmp_path, n=6)
    eng = MultiModalEngine(
        spark, dim=16, image_encoder_factory=lambda: FlakyEncoder()
    )
    eng.ingest_images(directory)
    idx = eng.build_index()
    # 6 images, payload-3 fails to embed → 5 indexed
    assert idx.df.count() == 5


def test_engine_query_type_routing(spark, tmp_path):
    """query_type='ann' approximates the exact ranking; 'hybrid' fuses a
    keyword signal: a filename-matching query term must boost that file
    (NMR:386–387's declared hybrid surface)."""
    directory = _write_images(tmp_path, n=40)
    eng = MultiModalEngine(spark, dim=32)
    eng.ingest_images(directory)
    eng.build_index()

    exact = eng.search_images_by_text("sample query", top_k=5)
    ann = eng.search_images_by_text("sample query", top_k=5, query_type="ann")
    e_ids = [r["image_id"] for r in exact.collect()]
    a_ids = [r["image_id"] for r in ann.collect()]
    assert len(a_ids) == 5
    # recall@5 against the exact oracle (BASELINE.md target ≥0.9; small
    # corpus + 6 hash tables reaches 1.0 deterministically or near it)
    assert len(set(e_ids) & set(a_ids)) >= 4
    assert set(ann.columns) == set(exact.columns)

    hyb = eng.search_images_by_text(
        "img_007.jpg", top_k=5, query_type="hybrid"
    )
    rows = hyb.collect()
    assert len(rows) == 5
    assert set(hyb.columns) == set(exact.columns)
    # the keyword side must surface the literally-named file
    assert any(r["filepath"].endswith("img_007.jpg") for r in rows)

    import pytest

    with pytest.raises(ValueError):
        eng.search_images_by_text("x", query_type="nope")


def test_hybrid_search_one_call_matches_composition(spark):
    """The one-call hybrid entry point must reproduce the registry's
    explicit keyword+vector+RRF composition when given the same inputs
    and the same (bounded) candidate pool."""
    from pyspark.sql import functions as F
    from vectorsearch_image_embeddings_databricks_spark import registry
    from vectorsearch_image_embeddings_databricks_spark.operators import hybrid
    from vectorsearch_image_embeddings_databricks_spark.index.vector_index import VectorIndex
    from .conftest import SF_SMALL

    docs = registry.load_docs(spark, SF_SMALL)
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    qvec = emb.filter(F.col("vec_id") == registry.KNN_QUERY_ID).collect()[0][
        "embedding"
    ]
    idx = VectorIndex(emb, key="vec_id", vector_col="embedding")
    import math

    got = [
        (r["id"], math.floor(r["rrf_score"] * 1e6))
        for r in hybrid.hybrid_search(
            docs,
            idx,
            registry.HYBRID_TERMS,
            qvec,
            k=registry.HYBRID_TOPK,
            scorer=hybrid.term_overlap_scores,
            candidates=registry.HYBRID_POOL,
        ).collect()
    ]
    want = [
        (r["id"], r["rrf_micro"])
        for r in registry.QUERIES["hybrid_rrf"](spark, SF_SMALL).collect()
    ]
    assert got == want and len(got) == registry.HYBRID_TOPK


def test_hybrid_search_default_pool_agrees_with_full_pool(spark):
    """The default bounded pool (20·k) must return the same final top-k
    ids as the unbounded composition on the fixture corpus — the RRF tail
    contribution (≤ 1/(60+pool)) is too small to reorder the head. This
    pins the default-pool path itself, not just candidates=|corpus|."""
    from pyspark.sql import functions as F
    from vectorsearch_image_embeddings_databricks_spark import registry
    from vectorsearch_image_embeddings_databricks_spark.operators import hybrid
    from vectorsearch_image_embeddings_databricks_spark.index.vector_index import VectorIndex
    from .conftest import SF_SMALL

    docs = registry.load_docs(spark, SF_SMALL)
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    qvec = emb.filter(F.col("vec_id") == registry.KNN_QUERY_ID).collect()[0][
        "embedding"
    ]
    idx = VectorIndex(emb, key="vec_id", vector_col="embedding")

    def run(candidates):
        return [
            r["id"]
            for r in hybrid.hybrid_search(
                docs,
                idx,
                registry.HYBRID_TERMS,
                qvec,
                k=registry.HYBRID_TOPK,
                scorer=hybrid.term_overlap_scores,
                candidates=candidates,
            ).collect()
        ]

    n = emb.count()
    default_pool = max(20 * registry.HYBRID_TOPK, 100)
    assert default_pool < n  # the bound is actually exercised
    assert run(None) == run(n)


def test_maxsim_late_interaction_hand_computed(spark):
    """E91 MaxSim semantics on a hand-computed fixture: every query
    token takes its best document token (Σ max q·d), a doc whose tokens
    align per-token beats one with a single strong token, exact ties
    break to the smaller doc id, and k bounds per-query output."""
    from pyspark.sql import functions as F

    from vectorsearch_image_embeddings_databricks_spark.operators.hybrid import (
        maxsim_rerank,
        maxsim_score,
    )

    # q tokens: e1, e2. A: only e1 matched -> 1.0; B: both matched
    # 0.6 + 0.8 = 1.4; C: same tokens as A -> tie with A, id breaks.
    cand = spark.createDataFrame(
        [
            (0, 10, [[1.0, 0.0], [0.0, 1.0]], [[1.0, 0.0], [0.0, 0.0]]),
            (0, 11, [[1.0, 0.0], [0.0, 1.0]], [[0.6, 0.0], [0.0, 0.8]]),
            (0, 12, [[1.0, 0.0], [0.0, 1.0]], [[1.0, 0.0], [0.0, 0.0]]),
        ],
        "query_id long, doc_id long, q_toks array<array<double>>, "
        "d_toks array<array<double>>",
    )
    rows = maxsim_rerank(
        cand, "query_id", "doc_id", "q_toks", "d_toks", k=2
    ).collect()
    assert [(r["doc_id"], round(r["maxsim"], 9)) for r in rows] == [
        (11, 1.4),
        (10, 1.0),  # ties with doc 12, smaller id wins; k=2 cuts 12
    ]
    # scalar check: Σ_q max_d — NOT max over pairs, NOT symmetric
    one = cand.filter("doc_id = 11").select(
        maxsim_score("q_toks", "d_toks").alias("s"),
        maxsim_score("d_toks", "q_toks").alias("rev"),
    ).collect()[0]
    assert round(one["s"], 9) == 1.4
    assert round(one["rev"], 9) == 1.4  # symmetric here (unit axes)


def test_rerank_token_overlap_orders_and_broadcasts(spark):
    """Rerank must order by overlap first (a lower-first-stage-score doc
    with more query terms wins), tie-break on first-stage score then
    id, and plan the pool join as a broadcast hash join (pool side
    broadcast — rerank cost |pool|, not a corpus shuffle)."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from vectorsearch_image_embeddings_databricks_spark.operators import hybrid

    docs = spark.createDataFrame(
        [
            (1, "vector join scan extra words"),   # overlap 3
            (2, "vector vector vector vector"),    # overlap 1, high tf
            (3, "join scan other"),                # overlap 2
            (4, "nothing relevant here"),          # overlap 0
        ],
        ["doc_id", "text"],
    )
    pool = (
        hybrid.bm25_scores(docs, "doc_id", "text", ["vector", "join", "scan"])
        .select("id", F.round("score", 4).alias("score"))
        .orderBy(F.desc("score"), F.asc("id"))
        .limit(4)
    )
    res = hybrid.rerank_token_overlap(
        pool, docs, "doc_id", "text", ["vector", "join", "scan"], 3
    )
    rows = res.collect()
    assert [r["id"] for r in rows] == [1, 3, 2]
    assert [r["overlap"] for r in rows] == [3, 2, 1]
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        res.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
