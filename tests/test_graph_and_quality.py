"""Round-3 operators: integer PageRank, cross-doc boilerplate,
model-based quality scoring, hard-negative triplet mining — semantic
tests on planted fixtures plus plan-shape regressions."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import Row, functions as F

from vectorsearch_image_embeddings_databricks_spark import registry
from vectorsearch_image_embeddings_databricks_spark.operators.graph import pagerank
from vectorsearch_image_embeddings_databricks_spark.operators.knn import mine_triplets
from vectorsearch_image_embeddings_databricks_spark.operators.textstats import (
    cross_doc_boilerplate,
    linear_quality,
)

from .conftest import SF_SMALL


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# ------------------------------------------------------------------ #
# pagerank
# ------------------------------------------------------------------ #


def test_pagerank_hand_checked_chain(spark):
    """a -> b -> c chain, 1 iteration: every step of the fixed-point
    recurrence checked by hand. BASE = (1e12 * 3) // 20."""
    e = spark.createDataFrame([("a", "b"), ("b", "c")], ["src", "dst"])
    r = {x["node"]: x["rank_scaled"] for x in pagerank(e, iters=1).collect()}
    base = (10**12 * 3) // 20
    # a: no in-edges
    assert r["a"] == base
    # b and c each receive one full rank (out_deg of their source is 1)
    assert r["b"] == base + (17 * 10**12) // 20
    assert r["c"] == base + (17 * 10**12) // 20


def test_pagerank_sink_accumulates_over_iterations(spark):
    """Star a,b,c -> d: d's rank must strictly dominate and grow toward
    its fixed point; sources decay to BASE after iteration 1; the total
    is conserved modulo the dangling-sink leak (d has no out-edges)."""
    e = spark.createDataFrame(
        [("a", "d"), ("b", "d"), ("c", "d")], ["src", "dst"]
    )
    r1 = {x["node"]: x["rank_scaled"] for x in pagerank(e, iters=1).collect()}
    r3 = {x["node"]: x["rank_scaled"] for x in pagerank(e, iters=3).collect()}
    base = (10**12 * 3) // 20
    assert r1["d"] == base + (17 * 3 * 10**12) // 20
    assert r1["a"] == r1["b"] == r1["c"] == base
    # after sources settle at BASE, d's fixed point is base + 17*3*base/20
    assert r3["d"] == base + (17 * 3 * base) // 20
    assert r3["d"] > r3["a"] == base


def test_pagerank_isolated_node_keeps_base(spark):
    e = spark.createDataFrame([("a", "b")], ["src", "dst"])
    nodes = spark.createDataFrame([Row(node="z")])
    r = {
        x["node"]: x["rank_scaled"]
        for x in pagerank(e, iters=2, nodes=nodes).collect()
    }
    assert r["z"] == (10**12 * 3) // 20
    assert set(r) == {"a", "b", "z"}


def test_pagerank_rejects_bad_damping(spark):
    e = spark.createDataFrame([("a", "b")], ["src", "dst"])
    with pytest.raises(ValueError):
        pagerank(e, damping_num=21, damping_den=20)


def test_pagerank_trade_graph_registry_shape(spark):
    out = registry.QUERIES["pagerank_trade_graph"](spark, SF_SMALL)
    rows = out.collect()
    assert 0 < len(rows) <= registry.PAGERANK_TOP
    ranks = [r["rank_scaled"] for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    assert {r["node_type"] for r in rows} <= {"customer", "supplier"}
    # high-degree suppliers dominate a bipartite trade graph's top ranks
    assert rows[0]["node_type"] == "supplier"


# ------------------------------------------------------------------ #
# cross-doc boilerplate
# ------------------------------------------------------------------ #


def test_boilerplate_planted_shared_ngram(spark):
    """Five docs share the trigram "terms of service"; unique docs don't.
    min_df=5 marks exactly that trigram's postings as boilerplate."""
    shared = [
        (i, f"terms of service unique{i} tail{i}", "web") for i in range(5)
    ]
    clean = [(10 + i, f"alpha{i} beta{i} gamma{i} delta{i}", "book")
             for i in range(3)]
    df = spark.createDataFrame(shared + clean, ["doc_id", "text", "src"])
    out = {
        r["grp"]: r
        for r in cross_doc_boilerplate(
            df, "doc_id", "text", "src", n=3, min_df=5,
            flag_ratio_micro=100_000,
        ).collect()
    }
    # each shared doc has 3 distinct trigrams, 1 of which is boilerplate
    assert out["web"]["n_docs"] == 5
    assert out["web"]["total_boiler"] == 5
    assert out["web"]["total_grams"] == 15
    assert out["web"]["n_flagged"] == 5          # 1/3 >= 10%
    assert out["web"]["boiler_ratio_micro"] == 333_333
    assert out["book"]["total_boiler"] == 0
    assert out["book"]["n_flagged"] == 0


def test_boilerplate_empty_docs_excluded(spark):
    df = spark.createDataFrame(
        [(1, "a b c d", "s"), (2, "", "s"), (3, "   ", "s")],
        ["doc_id", "text", "src"],
    )
    out = cross_doc_boilerplate(
        df, "doc_id", "text", "src", n=3, min_df=2
    ).collect()
    assert out[0]["n_docs"] == 1  # token-less docs contribute no grams


def test_boilerplate_plan_no_cross_join_no_global_window(spark):
    plan = plan_of(registry.QUERIES["boilerplate_ngrams"](spark, SF_SMALL))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" not in plan
    # the df side is vocabulary-sized: must be a shuffle join, never a
    # broadcast that would OOM at corpus scale; postings materialized
    # once (the corpus explode must not appear twice)
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan
    tree = plan.split("\n\n")[0]
    assert tree.count("Generate") == 0  # explode hidden behind checkpoint


def test_drift_chi2_single_corpus_pass(spark):
    """All marginals derive from the checkpointed histogram — the
    corpus parquet is scanned exactly once (inside the checkpoint),
    never once per rollup."""
    spark.catalog.clearCache()
    plan = plan_of(registry.QUERIES["source_drift_chi2"](spark, SF_SMALL))
    tree = plan.split("\n\n")[0]
    assert tree.count("Scan parquet") == 0  # only the obs checkpoint feeds it
    assert "CartesianProduct" not in plan


# ------------------------------------------------------------------ #
# linear quality
# ------------------------------------------------------------------ #


def test_linear_quality_integer_core_matches_python_md5(spark):
    """Spark's conv(md5) weight must equal Python's int(md5_hex[:3], 16)
    - 2048 — the portability contract the DuckDB oracle relies on."""
    import hashlib

    toks = ["alpha", "beta", "gamma"]
    df = spark.createDataFrame([(1, " ".join(toks), "en")],
                               ["doc_id", "text", "lang"])
    row = linear_quality(df, "doc_id", "text", "lang").collect()[0]
    expect = sum(
        int(hashlib.md5(t.encode()).hexdigest()[:3], 16) - 2048 for t in toks
    )
    assert row["sum_w"] == expect
    assert row["sum_tok"] == 3
    assert row["n_kept"] == (1 if expect >= 0 else 0)


def test_linear_quality_threshold_monotonic(spark):
    """keep at quality>=0.5 is exactly w_sum>=0 (sigmoid monotone,
    sigmoid(0)=0.5 exactly in IEEE doubles)."""
    df = spark.createDataFrame(
        [(i, f"tok{i}a tok{i}b tok{i}c tok{i}d", "en") for i in range(40)],
        ["doc_id", "text", "lang"],
    )
    per_doc = (
        df.select(
            "doc_id",
            F.explode(F.split("text", " ")).alias("t"),
        )
        .select(
            "doc_id",
            (F.conv(F.substring(F.md5("t"), 1, 3), 16, 10).cast("long")
             - F.lit(2048)).alias("w"),
        )
        .groupBy("doc_id")
        .agg(F.sum("w").alias("w_sum"))
    )
    expect_kept = per_doc.filter(F.col("w_sum") >= 0).count()
    out = linear_quality(df, "doc_id", "text", "lang").collect()[0]
    assert out["n_kept"] == expect_kept


def test_linear_quality_plan_two_shuffles_no_udf(spark):
    plan = plan_of(registry.QUERIES["quality_model_score"](spark, SF_SMALL))
    tree = plan.split("\n\n")[0]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # load_docs' compute repartition + per-doc agg + per-lang agg; the
    # md5 weight itself must add no shuffle and no Python boundary
    assert tree.count("Exchange") == 3


# ------------------------------------------------------------------ #
# hard-negative triplet mining
# ------------------------------------------------------------------ #


def _emb_fixture(spark):
    # two tight clusters by label; vectors hand-placed so nearest
    # same/different-label neighbors are unambiguous
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.99, 0.14], 0),    # nearest 0-label to anchor 0
        (2, [0.9, 0.43], 0),
        (3, [0.0, 1.0], 1),
        (4, [0.14, 0.99], 1),
        (5, [0.7, 0.71], 1),     # nearest 1-label to anchor 0
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding", "label"])


def test_mine_triplets_planted_geometry(spark):
    emb = _emb_fixture(spark)
    anchors = emb.filter(F.col("vec_id") == 0)
    out = mine_triplets(emb, anchors).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["pos_id"], r["neg_id"]) == (1, 5)
    assert r["pos_cos"] > r["neg_cos"]
    assert r["anchor_label"] == 0


def test_mine_triplets_excludes_anchor_itself(spark):
    emb = _emb_fixture(spark)
    out = mine_triplets(emb, emb).collect()
    assert len(out) == 6
    for r in out:
        assert r["pos_id"] != r["anchor_id"]


def test_mine_triplets_tie_breaks_to_smallest_id(spark):
    rows = [
        (0, [1.0, 0.0], 0),
        (7, [2.0, 0.0], 0),   # same direction => cos exactly equal
        (3, [2.0, 0.0], 0),
        (9, [0.0, 1.0], 1),
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = mine_triplets(emb, emb.filter(F.col("vec_id") == 0)).collect()[0]
    assert out["pos_id"] == 3  # exact cosine tie -> smallest vec_id


def test_mine_triplets_plan_broadcast_no_window(spark):
    spark.catalog.clearCache()
    plan = plan_of(
        registry.QUERIES["hard_negative_triplets"](spark, SF_SMALL)
    )
    tree = plan.split("\n\n")[0]
    assert "BroadcastNestedLoopJoin" in plan  # anchors are the broadcast side
    assert "Window" not in plan               # no corpus-wide window
    assert "SortMergeJoin" not in plan
    # struct-max compiles to SortAggregate (struct agg buffers aren't
    # hash-aggregable); the partial instance before the exchange is what
    # bounds the shuffle to |anchors| x tasks
    assert tree.count("SortAggregate") == 2


# ------------------------------------------------------------------ #
# triangle counting
# ------------------------------------------------------------------ #


def test_triangle_count_hand_checked(spark):
    """K4 has 4 triangles, 6 edges; oriented wedge count for K4 under
    any total order is 6 (each vertex of out-degree d contributes
    C(d,2): degrees 3,2,1,0 -> 3+1+0+0... by id-order tie-break)."""
    from vectorsearch_image_embeddings_databricks_spark.operators.graph import (
        triangle_count,
    )

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    df = spark.createDataFrame(k4, ["src", "dst"])
    r = triangle_count(df).collect()[0]
    assert r["n_edges"] == 6
    assert r["n_triangles"] == 4
    # orientation bound: sum over vertices of C(outdeg, 2); for K4 with
    # equal degrees the id tie-break yields outdegs (3,2,1,0) -> 3+1 = 4
    assert r["n_wedges"] == 4


def test_triangle_count_no_triangle_in_path(spark):
    from vectorsearch_image_embeddings_databricks_spark.operators.graph import (
        triangle_count,
    )

    path = [(0, 1), (1, 2), (2, 3)]
    df = spark.createDataFrame(path, ["src", "dst"])
    r = triangle_count(df).collect()[0]
    assert r["n_triangles"] == 0


def test_triangle_count_star_bounded_wedges(spark):
    """Celebrity star: naive wedges at the hub = C(n,2); degree
    orientation points every edge INTO the hub, so oriented wedges at
    the hub are ZERO — the last-reducer fix made observable."""
    from vectorsearch_image_embeddings_databricks_spark.operators.graph import (
        triangle_count,
    )

    star = [(0, i) for i in range(1, 30)]
    df = spark.createDataFrame(star, ["src", "dst"])
    r = triangle_count(df).collect()[0]
    assert r["n_edges"] == 29
    assert r["n_wedges"] == 0      # leaves have out-degree 1, hub in-degree 29
    assert r["n_triangles"] == 0


def test_triangle_count_single_wedge_join_plan(spark):
    """The O(|E|^1.5) wedge self-join must execute exactly ONCE:
    n_wedges and n_triangles are two aggregates of the same left join
    (r3 verdict: the count + semi-join shape ran it twice). Pinned by
    the optimized plan of the RETURNED DataFrame — one inner join
    (w1 x w2), one left-outer join (closing-edge match), one cross join
    (single-row edge_stats x wedge_stats), and nothing else: a second
    wedge materialization would show as an extra Inner/LeftOuter join
    or as an eagerly-collected LocalRelation result."""
    from vectorsearch_image_embeddings_databricks_spark.operators.graph import (
        triangle_count,
    )

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    df = spark.createDataFrame(k4, ["src", "dst"])
    res = triangle_count(df)
    plan = res._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Join Inner") == 1, plan
    assert plan.count("Join LeftOuter") == 1, plan
    assert plan.count("Join Cross") == 1, plan
    # lazy single-pass plan, not a driver-collected LocalRelation
    assert "LocalRelation" not in plan.split("\n")[0], plan
    r = res.collect()[0]
    assert (r["n_edges"], r["n_wedges"], r["n_triangles"]) == (6, 4, 4)
