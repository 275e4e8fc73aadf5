"""Graph ANN tier (index.graph_ann): build + beam-search properties."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectorsearch_image_embeddings_databricks_spark.index.graph_ann import (
    beam_search,
    build_knn_graph,
)
from vectorsearch_image_embeddings_databricks_spark.index.vector_index import VectorIndex

from .conftest import SF_SMALL


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def graph(emb):
    return build_knn_graph(
        emb, "vec_id", "embedding", degree=8
    ).localCheckpoint(eager=True)


def _queries(emb, n=16):
    return emb.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )


def _exact(emb, queries, k=5):
    idx = VectorIndex(emb, key="vec_id", vector_col="embedding")
    return {
        (r["query_id"], r["vec_id"])
        for r in idx.search_batch(queries, k=k)
        .select("query_id", "vec_id")
        .collect()
    }


def test_graph_degree_and_no_self_edges(emb, graph):
    n = emb.count()
    per_src = graph.groupBy("src").agg(F.count("*").alias("d")).collect()
    assert len(per_src) == n
    assert all(r["d"] == 8 for r in per_src)
    assert graph.filter(F.col("src") == F.col("dst")).count() == 0


def test_beam_search_recall_beats_frontier_ivf(emb, graph):
    """At beam=24/hops=4 the walk must reach >= 0.95 recall@5 — the bar
    ANN_FRONTIER.md shows the IVF tiers miss below ~half the corpus —
    while scoring at most entries + hops*beam*degree rows per query
    (corpus-size-independent by construction)."""
    queries = _queries(emb)
    exact = _exact(emb, queries)
    res = beam_search(
        graph, emb, queries, "vec_id", "embedding",
        k=5, beam=24, hops=4, entry_ids=[0, 1, 2, 3],
    )
    got = {(r["query_id"], r["vec_id"]) for r in res.collect()}
    recall = len(exact & got) / len(exact)
    assert recall >= 0.95, recall


def test_beam_search_recall_monotone_in_beam(emb, graph):
    queries = _queries(emb, n=8)
    exact = _exact(emb, queries)
    last = -1.0
    for beam in (8, 16, 32):
        res = beam_search(
            graph, emb, queries, "vec_id", "embedding",
            k=5, beam=beam, hops=3, entry_ids=[0, 1, 2, 3],
        )
        got = {(r["query_id"], r["vec_id"]) for r in res.collect()}
        recall = len(exact & got) / len(exact)
        assert recall >= last - 1e-9, (beam, recall, last)
        last = recall


def test_beam_search_deterministic_across_partitioning(emb, graph):
    queries = _queries(emb, n=6)

    def run(g, e):
        res = beam_search(
            g, e, queries, "vec_id", "embedding",
            k=5, beam=8, hops=2, entry_ids=[0, 1, 2, 3],
        )
        return sorted(
            (r["query_id"], r["vec_id"], round(r["score"], 9))
            for r in res.collect()
        )

    a = run(graph, emb)
    b = run(graph.repartition(7), emb.repartition(5))
    assert a == b


def test_beam_search_requires_entries(emb, graph):
    with pytest.raises(ValueError, match="entry_ids"):
        beam_search(
            graph, emb, _queries(emb, 2), "vec_id", "embedding",
            entry_ids=[],
        )


def test_ivf_build_strategy_approximates_exact_graph(emb):
    """The corpus-scale build: cell-join candidates must produce a
    degree-bounded graph whose edges are mostly the exact graph's (the
    misses are cross-cell by construction)."""
    exact_g = build_knn_graph(emb, "vec_id", "embedding", degree=6)
    ivf_g = build_knn_graph(
        emb, "vec_id", "embedding", degree=6,
        strategy="ivf", nlist=8, nprobe=4,
    )
    per_src = ivf_g.groupBy("src").agg(F.count("*").alias("d"))
    assert per_src.filter(F.col("d") > 6).count() == 0
    n_exact = exact_g.count()
    overlap = ivf_g.join(exact_g, ["src", "dst"]).count()
    assert overlap / n_exact >= 0.5, overlap / n_exact


def test_build_rejects_unknown_strategy(emb):
    with pytest.raises(ValueError, match="strategy"):
        build_knn_graph(emb, "vec_id", "embedding", strategy="hnsw")
