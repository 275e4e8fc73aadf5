"""Graph ANN tier (index.graph_ann): build + beam-search properties."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectorsearch_image_embeddings_databricks_spark.index.graph_ann import (
    append_knn_graph,
    beam_search,
    build_knn_graph,
    ivf_entry_points,
    refine_knn_graph,
)
from vectorsearch_image_embeddings_databricks_spark.index.vector_index import VectorIndex

from .conftest import SF_SMALL, TESTDATA

SF_BENCH = f"{TESTDATA}/sf0.1"


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


def test_ivf_build_blocked_matmul_survives_skewed_cell(emb, monkeypatch):
    """Adversarial skew: force EVERY row into one cell (nlist=1 — the
    worst case a bad quantizer draw can produce) and shrink the block
    budget so the guard must split the cell's similarity matrix into
    many row blocks. The guard is allocation-shape only: with a single
    cell covering the whole corpus the ivf build must emit exactly the
    exact-strategy graph, block boundaries notwithstanding."""
    from vectorsearch_image_embeddings_databricks_spark.index import graph_ann

    n = emb.count()
    monkeypatch.setattr(graph_ann, "GRAPH_BUILD_BLOCK_BUDGET", 4096)
    # budget // n < 128 -> block=128 -> ceil(500/128)=4 blocks in one cell
    assert max(128, 4096 // n) == 128 < n
    ivf_g = build_knn_graph(
        emb, "vec_id", "embedding", degree=6,
        strategy="ivf", nlist=1, nprobe=1,
    )
    exact_g = build_knn_graph(emb, "vec_id", "embedding", degree=6)
    got = {(r["src"], r["dst"]) for r in ivf_g.collect()}
    want = {(r["src"], r["dst"]) for r in exact_g.collect()}
    assert got == want


def test_build_rejects_unknown_strategy(emb):
    with pytest.raises(ValueError, match="strategy"):
        build_knn_graph(emb, "vec_id", "embedding", strategy="hnsw")


def test_append_exact_equals_full_rebuild(emb):
    """The locality argument made checkable: exact old graph + append
    batch == exact graph of the full corpus, because a stored node's
    top-degree list can only change where a NEW vector enters it."""
    old = emb.filter(F.col("vec_id") < 400)
    new = emb.filter(F.col("vec_id") >= 400)
    g_old = build_knn_graph(old, "vec_id", "embedding", degree=6)
    appended = append_knn_graph(
        g_old, old, new, "vec_id", "embedding", degree=6
    )
    full = build_knn_graph(emb, "vec_id", "embedding", degree=6)
    got = {(r["src"], r["dst"]) for r in appended.collect()}
    want = {(r["src"], r["dst"]) for r in full.collect()}
    assert got == want


def test_append_update_case_replaces_vectors(emb):
    """Change-feed UPDATE semantics: an id present in both inputs takes
    the NEW vector — no duplicate fan-out, no self-pairs. Unlike pure
    inserts (exact identity, previous test), updates are NOT exactly
    locally repairable: a changed vector can be EVICTED from an old
    node's list and the replacement candidate isn't local — so the pin
    is: new-src rows exactly match the full rebuild, the old-src
    eviction gap stays small, and the graph is well-formed."""
    base = emb.select("vec_id", "embedding")
    old = base.filter(F.col("vec_id") < 420)
    # re-deliver ids 400-419 with DIFFERENT vectors (rotate by one
    # position) alongside 80 genuinely new rows
    updated = (
        base.filter((F.col("vec_id") >= 400) & (F.col("vec_id") < 420))
        .select(
            "vec_id",
            F.concat(
                F.slice("embedding", 2, 63), F.slice("embedding", 1, 1)
            ).alias("embedding"),
        )
    )
    brand_new = base.filter(F.col("vec_id") >= 420)
    new = updated.unionByName(brand_new)
    g_old = build_knn_graph(old, "vec_id", "embedding", degree=6)
    appended = append_knn_graph(
        g_old, old, new, "vec_id", "embedding", degree=6
    )
    effective = old.filter(F.col("vec_id") < 400).unionByName(new)
    full = build_knn_graph(effective, "vec_id", "embedding", degree=6)
    got = [(r["src"], r["dst"]) for r in appended.collect()]
    want = {(r["src"], r["dst"]) for r in full.collect()}
    assert len(got) == len(set(got))  # no duplicate edges
    gset = set(got)
    assert not any(s == d for s, d in gset)  # no self-pairs
    new_ids = set(range(400, 500))
    assert {p for p in gset if p[0] in new_ids} == {
        p for p in want if p[0] in new_ids
    }  # new/updated sources see ALL candidates -> exact
    overlap = len(gset & want) / len(want)
    assert overlap >= 0.98, overlap  # eviction gaps only (measured ~1%)


def test_append_ivf_tier_bounded_and_close(emb):
    from vectorsearch_image_embeddings_databricks_spark.index.ann import IVFIndex

    old = emb.filter(F.col("vec_id") < 400)
    new = emb.filter(F.col("vec_id") >= 400)
    g_old = build_knn_graph(old, "vec_id", "embedding", degree=6)
    # the incremental contract: the STORED index (old corpus only) is
    # passed in, so the append assigns just the new batch against it
    stored_ivf = IVFIndex(
        old, key="vec_id", vector_col="embedding",
        nlist=8, replication=4, seed=42,
    )
    appended = append_knn_graph(
        g_old, old, new, "vec_id", "embedding", degree=6,
        strategy="ivf", nprobe=4, ivf=stored_ivf,
    )
    per_src = appended.groupBy("src").agg(F.count("*").alias("d"))
    assert per_src.filter(F.col("d") > 6).count() == 0
    n_new_src = appended.join(
        new.select(F.col("vec_id").alias("src")), "src"
    ).select("src").distinct().count()
    assert n_new_src == new.count()  # every appended vector got edges
    full = build_knn_graph(emb, "vec_id", "embedding", degree=6)
    overlap = appended.join(full, ["src", "dst"]).count() / full.count()
    assert overlap >= 0.5, overlap
    with pytest.raises(ValueError, match="strategy"):
        append_knn_graph(g_old, old, new, "vec_id", "embedding",
                         strategy="hnsw")


def test_ivf_built_graph_beam_recall_at_bench_scale(spark):
    """End-to-end production-tier bar at the bench scale (sf0.1, 2000
    vectors): beam search over the IVF-BUILT graph (not the exact
    oracle-tier build) must hold recall@5 >= 0.9 — the r4 edge-overlap
    bar (>= 0.5) was too weak for a build regression to trip; this pins
    what users actually get. Adaptive (centroid-routed) entries must do
    at least as well as the fixed entry list at the same beam/hops
    while scoring no more rows."""
    from vectorsearch_image_embeddings_databricks_spark.index.ann import IVFIndex

    emb = spark.read.parquet(f"{SF_BENCH}/embeddings.parquet").cache()
    queries = _queries(emb, n=16)
    exact = _exact(emb, queries)
    ivf = IVFIndex(
        emb, key="vec_id", vector_col="embedding",
        nlist=32, replication=2, seed=42,
    )
    graph = build_knn_graph(
        emb, "vec_id", "embedding", degree=12,
        strategy="ivf", nlist=32, nprobe=8,
    ).localCheckpoint(eager=True)

    fixed_stats: list[int] = []
    fixed = beam_search(
        graph, emb, queries, "vec_id", "embedding",
        k=5, beam=32, hops=5, entry_ids=[0, 1, 2, 3, 4, 5, 6, 7],
        stats=fixed_stats,
    )
    got_fixed = {(r["query_id"], r["vec_id"]) for r in fixed.collect()}
    recall_fixed = len(exact & got_fixed) / len(exact)
    assert recall_fixed >= 0.9, recall_fixed

    entries = ivf_entry_points(
        ivf, queries, "vec_id", nprobe=8, per_cell=1
    ).localCheckpoint(eager=True)
    ad_stats: list[int] = []
    adaptive = beam_search(
        graph, emb, queries, "vec_id", "embedding",
        k=5, beam=32, hops=5, entries=entries, stats=ad_stats,
    )
    got_ad = {(r["query_id"], r["vec_id"]) for r in adaptive.collect()}
    recall_ad = len(exact & got_ad) / len(exact)
    assert recall_ad >= recall_fixed - 1e-9, (recall_ad, recall_fixed)
    assert sum(ad_stats) <= sum(fixed_stats), (ad_stats, fixed_stats)


def test_adaptive_entries_shape_and_beam_compat(emb):
    """ivf_entry_points: per-query entries are bounded by
    nprobe*per_cell, every id exists in the corpus, and the result is
    partition-invariant; beam_search accepts the DataFrame form and
    rejects ambiguous entry specs."""
    from vectorsearch_image_embeddings_databricks_spark.index.ann import IVFIndex

    ivf = IVFIndex(
        emb, key="vec_id", vector_col="embedding",
        nlist=8, replication=2, seed=42,
    )
    queries = _queries(emb, n=6)
    ent = ivf_entry_points(ivf, queries, "vec_id", nprobe=3, per_cell=2)
    rows = ent.collect()
    per_q = {}
    ids = {r["vec_id"] for r in emb.select("vec_id").collect()}
    for r in rows:
        per_q.setdefault(r["query_id"], set()).add(r["vec_id"])
        assert r["vec_id"] in ids
    assert set(per_q) == set(range(6))
    assert all(1 <= len(v) <= 6 for v in per_q.values())
    again = ivf_entry_points(
        ivf, queries.repartition(5), "vec_id", nprobe=3, per_cell=2
    )
    assert {(r["query_id"], r["vec_id"]) for r in again.collect()} == {
        (r["query_id"], r["vec_id"]) for r in rows
    }
    res = beam_search(
        build_knn_graph(emb, "vec_id", "embedding", degree=6),
        emb, queries, "vec_id", "embedding", k=5, beam=8, hops=2,
        entries=ent,
    )
    assert res.groupBy("query_id").count().filter("count > 5").count() == 0
    with pytest.raises(ValueError, match="entry_ids"):
        beam_search(
            build_knn_graph(emb, "vec_id", "embedding", degree=6),
            emb, queries, "vec_id", "embedding",
            entry_ids=[0, 1], entries=ent,
        )


def _plan_of(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _search_rows(res):
    return sorted(
        (r["query_id"], r["vec_id"], round(r["score"], 9))
        for r in res.collect()
    )


def test_graph_index_lifecycle_save_load(emb, tmp_path):
    """Build-once / serve-many (r5 verdict #1): build → save → load →
    search must return the identical answer, the loaded index must read
    its MATERIALIZED entry reps (no Window, no corpus-wide recompute in
    the entry plan), and the reps table must round-trip exactly."""
    from vectorsearch_image_embeddings_databricks_spark.index.graph_ann import KNNGraphIndex

    idx = KNNGraphIndex.build(
        emb, "vec_id", "embedding", degree=8,
        strategy="ivf", nlist=8, nprobe=4, seed=42, per_cell=2,
    )
    queries = _queries(emb, n=8)
    fresh = _search_rows(idx.search(queries, k=5, beam=16, hops=3))
    path = str(tmp_path / "gidx")
    idx.save(path)
    loaded = KNNGraphIndex.load(emb.sparkSession, path)
    again = _search_rows(loaded.search(queries, k=5, beam=16, hops=3))
    assert again == fresh
    # reps round-trip exactly (same cells, same representatives)
    assert {
        (r["centroid_id"], r["__id"]) for r in loaded.reps.collect()
    } == {(r["centroid_id"], r["__id"]) for r in idx.reps.collect()}
    # the serving entry plan reads the persisted reps parquet — it must
    # NOT re-run the per-cell window over the assigned corpus (the
    # fresh-build derivation), nor scan the corpus vectors at all.
    # (r9: the query-side cell assignment itself became a broadcast
    # centroid-table join + window over the QUERY PANEL — a tiny keyed
    # window is expected; the no-corpus-recompute contract is pinned by
    # the two source assertions below.)
    entry_plan = _plan_of(loaded.entries_for(queries, nprobe=4))
    assert "reps" in entry_plan  # the persisted table is the source
    assert "vectors" not in entry_plan  # no corpus scan


def test_graph_index_catalog_roundtrip(spark, emb, tmp_path):
    """Catalog surface for the graph tier: create under a name, list
    with type tag, reopen by name, serve, drop."""
    from vectorsearch_image_embeddings_databricks_spark.index import IndexCatalog

    cat = IndexCatalog(spark, str(tmp_path / "cat"))
    cat.create_graph_index(
        "gidx", emb, key="vec_id", vector_col="embedding",
        degree=6, strategy="exact", nlist=8, nprobe=4,
    )
    assert cat.graph_exists("gidx") and not cat.exists("gidx")
    listed = {e["name"]: e for e in cat.list_indexes()}
    assert listed["gidx"]["type"] == "knn_graph"
    assert listed["gidx"]["degree"] == 6
    assert "centroids" not in listed["gidx"]
    idx = cat.get_graph_index("gidx")
    queries = _queries(emb, n=4)
    res = idx.search(queries, k=5, beam=12, hops=3)
    assert res.groupBy("query_id").count().filter("count > 5").count() == 0
    assert res.count() == 20  # 4 queries x top-5
    with pytest.raises(KeyError, match="knn_graph"):
        cat.get_index("gidx")
    with pytest.raises(ValueError, match="already exists"):
        cat.create_graph_index("gidx", emb)
    same = cat.create_graph_index("gidx", emb, if_exists="ignore")
    assert same.degree == 6
    # a FAILED replace build must not destroy the existing index (the
    # staging discipline): empty source -> quantizer training raises
    empty = emb.filter(F.col("vec_id") < 0)
    with pytest.raises(Exception, match="empty training sample"):
        cat.create_graph_index("gidx", empty, key="vec_id",
                               vector_col="embedding",
                               if_exists="replace")
    assert cat.graph_exists("gidx")  # old index survived the failure
    # cross-type name collision: a vector index may not silently share
    # a name with a graph index; 'ignore' refuses coherently, 'replace'
    # clears the old type entirely
    with pytest.raises(ValueError, match="already exists"):
        cat.create_index("gidx", emb, key="vec_id", vector_col="embedding")
    with pytest.raises(ValueError, match="knn_graph"):
        cat.create_index("gidx", emb, key="vec_id",
                         vector_col="embedding", if_exists="ignore")
    cat.create_index(
        "gidx", emb, key="vec_id", vector_col="embedding",
        if_exists="replace",
    )
    with pytest.raises(ValueError, match="vector index"):
        cat.create_graph_index("gidx", emb, if_exists="ignore")
    with pytest.raises(KeyError, match="vector index"):
        cat.get_graph_index("gidx")
    assert cat.exists("gidx") and not cat.graph_exists("gidx")
    assert {e["name"]: e["type"] for e in cat.list_indexes()}["gidx"] == "vector"
    cat.drop_index("gidx")
    assert not cat.graph_exists("gidx") and not cat.exists("gidx")
    with pytest.raises(KeyError):
        cat.get_graph_index("gidx")


def test_graph_index_append_serves_new_vectors(emb, tmp_path):
    """Loaded-index append (delta-sync, NMR:278): exact tier keeps the
    append == rebuild identity THROUGH the persisted lifecycle, the
    upserted vectors serve immediately, and the reps refresh."""
    from vectorsearch_image_embeddings_databricks_spark.index.graph_ann import (
        KNNGraphIndex,
        build_knn_graph,
    )

    old = emb.filter(F.col("vec_id") < 400)
    new = emb.filter(F.col("vec_id") >= 400)
    idx = KNNGraphIndex.build(
        old, "vec_id", "embedding", degree=6,
        strategy="exact", nlist=8, nprobe=4,
    )
    path = str(tmp_path / "gidx2")
    idx.save(path)
    loaded = KNNGraphIndex.load(emb.sparkSession, path)
    loaded.append(new)
    full = build_knn_graph(emb, "vec_id", "embedding", degree=6)
    got = {(r["src"], r["dst"]) for r in loaded.edges.collect()}
    want = {(r["src"], r["dst"]) for r in full.collect()}
    assert got == want
    # an appended vector is servable: querying with its own embedding
    # returns itself at rank 1 (cos = 1)
    probe = new.filter(F.col("vec_id") == 450).select(
        F.lit(0).alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    top = loaded.search(probe, k=1, beam=12, hops=3).collect()[0]
    assert top["vec_id"] == 450 and round(top["score"], 6) == 1.0
    assert loaded.vectors.count() == emb.count()
    # persist the appended state back to the SAME path (the delta-sync
    # save cycle): the checkpoint-first save must not trip Spark's
    # read-and-overwrite guard, and a reload serves the appended corpus
    loaded.save(path)
    again = KNNGraphIndex.load(emb.sparkSession, path)
    assert again.vectors.count() == emb.count()
    assert {(r["src"], r["dst"]) for r in again.edges.collect()} == want
    top2 = again.search(probe, k=1, beam=12, hops=3).collect()[0]
    assert top2["vec_id"] == 450


def test_graph_index_ivf_append_uses_stored_quantizer(emb):
    """The incremental path through the lifecycle class: an ivf-built
    index appends a batch under its STORED quantizer (the
    IVFIndex.append contract — only the new rows run the assignment
    expression), the graph keeps its degree bound, every new vector
    gets edges, and the refreshed reps stay |cells|-bounded."""
    from vectorsearch_image_embeddings_databricks_spark.index.graph_ann import KNNGraphIndex

    old = emb.filter(F.col("vec_id") < 400)
    new = emb.filter(F.col("vec_id") >= 400)
    idx = KNNGraphIndex.build(
        old, "vec_id", "embedding", degree=6,
        strategy="ivf", nlist=8, nprobe=4, per_cell=2,
    )
    cents_before = [list(c) for c in idx.ivf.centroids]
    idx.append(new, nprobe=4)
    assert [list(c) for c in idx.ivf.centroids] == cents_before
    per_src = idx.edges.groupBy("src").agg(F.count("*").alias("d"))
    assert per_src.filter(F.col("d") > 6).count() == 0
    new_srcs = idx.edges.join(
        new.select(F.col("vec_id").alias("src")), "src"
    ).select("src").distinct().count()
    assert new_srcs == new.count()
    assert idx.vectors.count() == emb.count()
    # reps refreshed and still bounded by |cells| x per_cell
    assert idx.reps.count() <= 8 * 2
    # appended rows are assigned in the quantizer state
    assigned_ids = {
        r["vec_id"] for r in idx.ivf.assigned.select("vec_id").collect()
    }
    assert assigned_ids == {r["vec_id"] for r in emb.collect()}


def test_append_update_plus_refine_recovers_rebuild(emb):
    """The E90 update-path repair contract (r5 verdict #2), pinned:
    after an UPDATE batch (changed vectors — the change-feed case,
    NMR:278) one NN-descent refine round must bring the repaired
    graph's edge overlap vs a full rebuild to >= 0.99 (the bare append
    carries a ~1% stored-source eviction gap)."""
    from vectorsearch_image_embeddings_databricks_spark.index.graph_ann import (
        append_knn_graph,
        build_knn_graph,
        refine_knn_graph,
    )

    base = emb.select("vec_id", "embedding")
    old = base.filter(F.col("vec_id") < 420)
    updated = (
        base.filter((F.col("vec_id") >= 400) & (F.col("vec_id") < 420))
        .select(
            "vec_id",
            F.concat(
                F.slice("embedding", 2, 63), F.slice("embedding", 1, 1)
            ).alias("embedding"),
        )
    )
    brand_new = base.filter(F.col("vec_id") >= 420)
    new = updated.unionByName(brand_new)
    g_old = build_knn_graph(old, "vec_id", "embedding", degree=6)
    appended = append_knn_graph(
        g_old, old, new, "vec_id", "embedding", degree=6
    ).localCheckpoint(eager=True)
    effective = old.filter(F.col("vec_id") < 400).unionByName(new)
    repaired = refine_knn_graph(
        appended, effective, "vec_id", "embedding", degree=6, rounds=1
    )
    full = build_knn_graph(effective, "vec_id", "embedding", degree=6)
    want = {(r["src"], r["dst"]) for r in full.collect()}
    before = {(r["src"], r["dst"]) for r in appended.collect()}
    after = {(r["src"], r["dst"]) for r in repaired.collect()}
    overlap_before = len(before & want) / len(want)
    overlap_after = len(after & want) / len(want)
    assert overlap_after >= 0.99, (overlap_before, overlap_after)
    assert overlap_after >= overlap_before - 1e-12


def test_delete_exact_equals_rebuild_of_remaining(emb):
    """Graph-tier DELETE (E92): deletions only remove competitors, so a
    source that lost no edge keeps its exact top-degree and only
    affected sources refill — surviving ∪ (affected × remaining)
    re-ranked IS the exact graph of the remaining corpus."""
    from vectorsearch_image_embeddings_databricks_spark.index.graph_ann import (
        build_knn_graph,
        delete_knn_graph,
    )

    g = build_knn_graph(emb, "vec_id", "embedding", degree=6)
    dele = emb.filter(F.col("vec_id") % 7 == 3).select("vec_id")
    repaired = delete_knn_graph(
        g, emb, dele, "vec_id", "embedding", degree=6
    )
    rest = emb.filter(F.col("vec_id") % 7 != 3)
    want = {
        (r["src"], r["dst"])
        for r in build_knn_graph(
            rest, "vec_id", "embedding", degree=6
        ).collect()
    }
    got = {(r["src"], r["dst"]) for r in repaired.collect()}
    assert got == want
    with pytest.raises(ValueError, match="strategy"):
        delete_knn_graph(g, emb, dele, "vec_id", "embedding",
                         strategy="hnsw")
    with pytest.raises(ValueError, match="ivf"):
        delete_knn_graph(g, emb, dele, "vec_id", "embedding",
                         strategy="ivf")


def test_graph_index_delete_lifecycle(emb):
    """DELETE through the lifecycle class: deleted ids disappear from
    search results, vectors, quantizer assignments, and reps; the
    ivf-tier repair keeps the degree bound and covers every affected
    source."""
    from vectorsearch_image_embeddings_databricks_spark.index.graph_ann import KNNGraphIndex

    idx = KNNGraphIndex.build(
        emb, "vec_id", "embedding", degree=6,
        strategy="ivf", nlist=8, nprobe=4, per_cell=2,
    )
    n = emb.count()
    dele = emb.filter(F.col("vec_id") < 20).select("vec_id")
    idx.delete(dele)
    assert idx.vectors.count() == n - 20
    assert idx.ivf.assigned.filter(F.col("vec_id") < 20).count() == 0
    assert idx.edges.filter(
        (F.col("src") < 20) | (F.col("dst") < 20)
    ).count() == 0
    per_src = idx.edges.groupBy("src").agg(F.count("*").alias("d"))
    assert per_src.filter(F.col("d") > 6).count() == 0
    # a deleted id is no longer reachable: query with its own old
    # vector and assert it is absent from the result
    probe = emb.filter(F.col("vec_id") == 5).select(
        F.lit(0).alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    hits = idx.search(probe, k=5, beam=16, hops=3).collect()
    assert all(r["vec_id"] >= 20 for r in hits)


def test_graph_index_copy_isolates_mutations(emb):
    """copy() hands out a twin whose append/delete leave the original
    fully servable — the contract that lets the registry's delete-audit
    row mutate the session-memoized build (knn_graph_ivf_delete_recall)
    without corrupting it for knn_graph_ivf_recall."""
    from vectorsearch_image_embeddings_databricks_spark.index.graph_ann import KNNGraphIndex

    idx = KNNGraphIndex.build(
        emb, "vec_id", "embedding", degree=6,
        strategy="ivf", nlist=8, nprobe=4, per_cell=2,
    )
    n = emb.count()
    before_edges = idx.edges.count()
    twin = idx.copy()
    twin.delete(emb.filter(F.col("vec_id") < 20).select("vec_id"))
    # twin mutated ...
    assert twin.vectors.count() == n - 20
    # ... original untouched: vectors, edges, quantizer assignment, reps
    assert idx.vectors.count() == n
    assert idx.edges.count() == before_edges
    assert idx.ivf.assigned.filter(F.col("vec_id") < 20).count() > 0
    probe = emb.filter(F.col("vec_id") == 5).select(
        F.lit(0).alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    hits = idx.search(probe, k=1, beam=16, hops=3).collect()
    assert hits and hits[0]["vec_id"] == 5  # still finds the deleted id


def test_delete_default_nprobe_matches_build_replication(emb):
    """ADVICE r6: KNNGraphIndex.delete must repair with probes as wide
    as the build's (replication = max(2, nprobe)) unless overridden —
    an index built at nprobe=8 no longer silently refills at the old
    nprobe=4 default."""
    from vectorsearch_image_embeddings_databricks_spark.index import graph_ann

    idx = graph_ann.KNNGraphIndex.build(
        emb, "vec_id", "embedding", degree=6,
        strategy="ivf", nlist=8, nprobe=8, per_cell=2,
    )
    seen = {}
    orig = graph_ann.delete_knn_graph

    def spy(*args, **kwargs):
        seen["nprobe"] = kwargs.get("nprobe")
        return orig(*args, **kwargs)

    graph_ann.delete_knn_graph = spy
    try:
        idx.copy().delete(emb.filter(F.col("vec_id") < 5).select("vec_id"))
        assert seen["nprobe"] == idx.ivf.replication == 8
        idx.copy().delete(
            emb.filter(F.col("vec_id") < 5).select("vec_id"), nprobe=3
        )
        assert seen["nprobe"] == 3
    finally:
        graph_ann.delete_knn_graph = orig


def test_nn_descent_refinement_improves_ivf_graph(emb):
    """One NN-descent round over a deliberately coarse ivf-built graph
    (few probed cells -> many missed cross-cell edges) must strictly
    increase exact-edge overlap while keeping the degree bound."""
    exact_g = build_knn_graph(emb, "vec_id", "embedding", degree=6)
    coarse = build_knn_graph(
        emb, "vec_id", "embedding", degree=6,
        strategy="ivf", nlist=16, nprobe=2,
    ).localCheckpoint(eager=True)
    refined = refine_knn_graph(
        coarse, emb, "vec_id", "embedding", degree=6, rounds=1
    )
    n_exact = exact_g.count()
    before = coarse.join(exact_g, ["src", "dst"]).count() / n_exact
    after = refined.join(exact_g, ["src", "dst"]).count() / n_exact
    assert after > before, (before, after)
    per_src = refined.groupBy("src").agg(F.count("*").alias("d"))
    assert per_src.filter(F.col("d") > 6).count() == 0


def test_exact_tier_tie_break_and_zero_norm_convention(spark):
    """ADVICE r9 pins: (1) with MORE than ``degree`` equal cosines in
    one scoring block, the block-local cut must keep the
    (cos desc, dst asc)-preferred dsts — the tie-aware widening in
    _exact_block_topk/_pair_topk, where a bare argpartition kept an
    arbitrary subset; (2) zero-norm vectors score cos 0.0 against
    everything in every numpy scorer (never NaN/null), one convention
    across build, append and delete. Both are invisible on the random
    fixtures (no exact ties, no zero vectors), so this planted corpus
    is their only guard."""
    rows = [(i, [0.0] * 8) for i in range(6)] + [
        (i, [1.0] + [0.0] * 7) for i in range(6, 20)
    ]
    dup = spark.createDataFrame(rows, "id long, v array<double>")
    g = build_knn_graph(dup, "id", "v", degree=3)
    got = sorted((r["src"], r["dst"]) for r in g.collect())
    # zero srcs: cos 0.0 with EVERYTHING (zero-norm convention) -> all
    # candidates tie -> dst asc keeps the 3 smallest other ids; unit
    # srcs: cos 1.0 with every other unit -> the 3 smallest other units
    exp = []
    for s in range(6):
        exp += [(s, d) for d in range(4) if d != s][:3]
    for s in range(6, 20):
        exp += [(s, d) for d in range(6, 10) if d != s][:3]
    assert got == sorted(exp)
    # deterministic under adversarial partitioning (block population
    # changes, the cut must not)
    g2 = build_knn_graph(dup.repartition(7), "id", "v", degree=3)
    assert sorted((r["src"], r["dst"]) for r in g2.collect()) == got
    # the maintenance paths share the convention: appending the unit
    # block onto the zero-only graph equals the full rebuild even
    # though every overlap score is an exact tie
    old = dup.filter(F.col("id") < 6)
    new = dup.filter(F.col("id") >= 6)
    g_old = build_knn_graph(old, "id", "v", degree=3)
    app = append_knn_graph(g_old, old, new, "id", "v", degree=3)
    assert sorted((r["src"], r["dst"]) for r in app.collect()) == got
    # and deleting back down re-ranks the tied survivors identically
    from vectorsearch_image_embeddings_databricks_spark.index.graph_ann import (
        delete_knn_graph,
    )

    deleted = spark.createDataFrame([(19,), (18,)], "id long")
    dl = delete_knn_graph(
        build_knn_graph(dup, "id", "v", degree=3).localCheckpoint(),
        dup, deleted, "id", "v", degree=3,
    )
    reb = build_knn_graph(
        dup.filter(F.col("id") < 18), "id", "v", degree=3
    )
    assert sorted((r["src"], r["dst"]) for r in dl.collect()) == sorted(
        (r["src"], r["dst"]) for r in reb.collect()
    )


def test_refine_pair_engine_matches_hof_reference(emb):
    """r10: refine_knn_graph scores its candidate set through the
    numpy pair engine (_pair_topk). On the tie-free fixture the result
    must equal the former per-pair HOF-cosine formulation exactly —
    the equivalence the registry oracle (knn_graph_update) replays in
    SQL. Pinned here so a scorer drift fails fast in pytest rather
    than at the oracle."""
    from vectorsearch_image_embeddings_databricks_spark.functions.vector import (
        cosine_similarity,
    )
    from vectorsearch_image_embeddings_databricks_spark.index.graph_ann import (
        _top_degree_edges,
    )

    base = emb.filter(F.col("vec_id") < 120)
    coarse = build_knn_graph(
        base, "vec_id", "embedding", degree=4,
        strategy="ivf", nlist=8, nprobe=2,
    ).localCheckpoint(eager=True)
    refined = refine_knn_graph(
        coarse, base, "vec_id", "embedding", degree=4, rounds=1
    )
    edges = coarse.select("src", "dst")
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    sym = edges.unionByName(rev).distinct()
    hop2 = (
        sym.alias("a")
        .join(sym.alias("b"), F.col("a.dst") == F.col("b.src"))
        .select(F.col("a.src").alias("src"), F.col("b.dst").alias("dst"))
    )
    cand = (
        sym.unionByName(hop2)
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    vs = base.select(
        F.col("vec_id").alias("src"), F.col("embedding").alias("__vs")
    )
    vd = base.select(
        F.col("vec_id").alias("dst"), F.col("embedding").alias("__vd")
    )
    hof = _top_degree_edges(
        cand.join(vs, "src")
        .join(vd, "dst")
        .select(
            "src", "dst", cosine_similarity("__vs", "__vd").alias("__cos")
        ),
        4,
    )
    assert sorted(
        (r["src"], r["dst"]) for r in refined.collect()
    ) == sorted((r["src"], r["dst"]) for r in hof.collect())


def test_mutual_pairs_planted_asymmetry(spark):
    """E98: a<->b reciprocate at degree 1; c's edge to b is NOT
    reciprocated (b prefers a) — mutual_pairs must keep exactly (a,b)."""
    from vectorsearch_image_embeddings_databricks_spark.index.graph_ann import (
        build_knn_graph,
        mutual_pairs,
    )

    rows = [
        (0, [1.0, 0.0, 0.0]),        # a
        (1, [0.999, 0.0447, 0.0]),   # b: nearest is a
        (2, [0.7, 0.7141, 0.0]),     # c: nearest is b, but b prefers a
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    g = build_knn_graph(df, "vec_id", "embedding", degree=1)
    got = {(r["id_a"], r["id_b"]) for r in mutual_pairs(g).collect()}
    assert got == {(0, 1)}


def test_knn_label_classify_structure_and_determinism(spark):
    """E99 on the fixture: exactly one row per held-out query, correct
    flag consistent with the label pair, deterministic across runs.
    (Fixture labels are geometry-uncorrelated, so accuracy ~ chance —
    the VOTE semantics are pinned by the planted test below and the
    value-exact oracle.)"""
    from vectorsearch_image_embeddings_databricks_spark import registry as reg

    out = reg.QUERIES["knn_label_classify"](spark, SF_SMALL).collect()
    assert len(out) == 40
    for r in out:
        assert r["correct"] in (0, 1)
        assert (r["correct"] == 1) == (r["pred_label"] == r["true_label"])
    again = reg.QUERIES["knn_label_classify"](spark, SF_SMALL).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_knn_vote_majority_and_smaller_label_tiebreak(spark):
    """The argmax-over-(count, −label) vote the classify row uses:
    majority wins; an exact tie takes the SMALLER label — planted
    geometry where the top-5 neighbor labels are [7,7,7,2,2] (query A)
    and [4,4,9,9,1] (query B: 2-2 tie → 4)."""
    from vectorsearch_image_embeddings_databricks_spark.index.vector_index import (
        VectorIndex,
    )

    def vec(axis, eps=0.0):
        v = [0.0] * 8
        v[axis] = 1.0
        v[7] = eps
        return v

    corpus = [
        # cluster on axis 0: labels 7,7,7,2,2 at descending similarity
        (10, vec(0, 0.010), 7), (11, vec(0, 0.020), 7),
        (12, vec(0, 0.030), 7), (13, vec(0, 0.040), 2),
        (14, vec(0, 0.050), 2),
        # cluster on axis 1: labels 4,4,9,9 then a far 1
        (20, vec(1, 0.010), 4), (21, vec(1, 0.020), 4),
        (22, vec(1, 0.030), 9), (23, vec(1, 0.040), 9),
        (24, vec(1, 0.300), 1),
    ]
    emb = spark.createDataFrame(corpus, ["vec_id", "embedding", "label"])
    queries = spark.createDataFrame(
        [(0, vec(0)), (1, vec(1))], ["query_id", "query_vec"]
    )
    idx = VectorIndex(emb, key="vec_id", vector_col="embedding")
    nbrs = idx.search_batch(queries, k=5, columns=["label"])
    pred = (
        nbrs.groupBy("query_id", "label")
        .agg(F.count("*").alias("c"))
        .groupBy("query_id")
        .agg(F.max(F.struct("c", (-F.col("label")).alias("nl"))).alias("b"))
        .select("query_id", (-F.col("b.nl")).alias("pred"))
        .collect()
    )
    got = {r["query_id"]: r["pred"] for r in pred}
    assert got == {0: 7, 1: 4}  # majority; tie 4-vs-9 → smaller label


def _synth_geometry(spark, n, dim, seed, clusters=None, sigma=0.05):
    """Deterministic unit-vector corpus: planted clusters (the easy,
    real-embedding-like regime) or structure-free (quantizer-hostile)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    if clusters:
        C = rng.normal(size=(clusters, dim))
        C /= np.linalg.norm(C, axis=1, keepdims=True)
        X = C[rng.integers(0, clusters, n)] + sigma * rng.normal(
            size=(n, dim)
        )
    else:
        X = rng.normal(size=(n, dim))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    return spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )


def test_refine_auto_skips_on_clustered_refines_on_structure_free(spark):
    """r9 verdict #6: 'auto' refine adopts the r8 clustered-frontier
    finding (ANN_FRONTIER.md: NN-descent is bit-identical-output waste
    on clustered geometry, repair on structure-free). On a planted-
    cluster corpus the quantizer's cell-coassignment recall clears the
    bar -> auto == the raw build, refine skipped; on structure-free
    data it misses the bar -> auto == exactly one NN-descent round."""
    from vectorsearch_image_embeddings_databricks_spark.index.ann import IVFIndex
    from vectorsearch_image_embeddings_databricks_spark.index.graph_ann import (
        cell_coassignment_recall,
        resolve_refine_rounds,
    )

    def edge_set(df):
        return {(r["src"], r["dst"]) for r in df.collect()}

    clustered = _synth_geometry(spark, 400, 16, seed=7, clusters=8)
    ivf_c = IVFIndex(
        clustered, key="vec_id", vector_col="embedding",
        nlist=16, replication=2, seed=1,
    )
    assert cell_coassignment_recall(ivf_c) >= 0.9
    assert resolve_refine_rounds("auto", ivf_c) == 0
    raw = build_knn_graph(
        clustered, "vec_id", "embedding", degree=6,
        strategy="ivf", ivf=ivf_c,
    )
    auto = build_knn_graph(
        clustered, "vec_id", "embedding", degree=6,
        strategy="ivf", ivf=ivf_c, refine="auto",
    )
    assert edge_set(auto) == edge_set(raw)  # refine skipped

    free = _synth_geometry(spark, 400, 16, seed=7)
    ivf_f = IVFIndex(
        free, key="vec_id", vector_col="embedding",
        nlist=16, replication=2, seed=1,
    )
    assert cell_coassignment_recall(ivf_f) < 0.9
    assert resolve_refine_rounds("auto", ivf_f) == 1
    raw_f = build_knn_graph(
        free, "vec_id", "embedding", degree=6, strategy="ivf", ivf=ivf_f
    )
    auto_f = build_knn_graph(
        free, "vec_id", "embedding", degree=6,
        strategy="ivf", ivf=ivf_f, refine="auto",
    )
    refined = refine_knn_graph(
        raw_f, free, "vec_id", "embedding", degree=6, rounds=1
    )
    assert edge_set(auto_f) == edge_set(refined)  # one repair round ran
    assert edge_set(auto_f) != edge_set(raw_f)  # ...and it mattered
    # ints pass through unchanged; exact tier under 'auto' never refines
    assert resolve_refine_rounds(2, ivf_f) == 2
    assert resolve_refine_rounds("auto", None) == 0
