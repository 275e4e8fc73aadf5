"""Physical-plan regression tests: the scale-design claims in docstrings
(pushdown, broadcast, top-k without full sort, no corpus shuffle) must be
visible in the actual Catalyst plans, not just asserted in prose."""

from __future__ import annotations

import contextlib
import io

from vectorsearch_image_embeddings_databricks_spark import registry

from .conftest import SF_SMALL


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def tree_of(plan: str) -> str:
    """Just the operator tree (the formatted output repeats node names in
    the per-node detail sections below it)."""
    return plan.split("\n\n")[0]


def test_knn_exact_is_scan_plus_takeordered_no_shuffle(spark):
    # another module's cached embeddings relation would substitute an
    # InMemoryTableScan and hide the parquet-scan properties under test
    spark.catalog.clearCache()
    plan = plan_of(registry.QUERIES["knn_exact"](spark, SF_SMALL))
    assert "TakeOrderedAndProject" in plan  # per-partition top-k
    assert "Exchange" not in plan  # the corpus is never shuffled
    # column pruning reaches the scan: only the 3 needed columns
    assert "ReadSchema: struct<vec_id:bigint,embedding:array<float>,label:int>" in plan


def test_pricing_summary_pushdown_and_partial_agg(spark):
    plan = plan_of(registry.QUERIES["pricing_summary"](spark, SF_SMALL))
    tree = tree_of(plan)
    assert "LessThanOrEqual(l_shipdate" in plan  # predicate at the scan
    assert tree.count("HashAggregate") == 2  # map-side partial agg
    assert tree.count("Exchange") == 1  # exactly one shuffle
    assert "o_orderkey" not in plan  # (sanity: only lineitem scanned)


def test_shipping_priority_broadcasts_dims_takeordered_topk(spark):
    plan = plan_of(registry.QUERIES["shipping_priority"](spark, SF_SMALL))
    assert plan.count("BroadcastHashJoin") >= 2  # orders+customer broadcast
    assert "TakeOrderedAndProject" in plan  # top-10 without full sort
    assert "GreaterThan(l_shipdate" in plan  # pushed to lineitem scan
    assert "SortMergeJoin" not in plan


def test_region_revenue_broadcast_dim_chain(spark):
    plan = plan_of(registry.QUERIES["region_revenue"](spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan
    assert "EqualTo(r_name,ASIA)" in plan  # filter pushed into region scan
    assert "SortMergeJoin" not in plan  # no fact-to-fact shuffle join


def test_knn_batch_broadcasts_query_side(spark):
    plan = plan_of(registry.QUERIES["knn_batch"](spark, SF_SMALL))
    assert "Broadcast" in plan  # query table broadcast, corpus not shuffled
    assert "RunningWindowFunction" in plan or "Window" in plan


def test_range_join_plans_as_hash_join_not_nested_loop(spark):
    plan = plan_of(registry.QUERIES["range_join_events"](spark, SF_SMALL))
    # the bucketized rewrite must produce an equi-join...
    assert "HashJoin" in plan or "SortMergeJoin" in plan
    # ...never the quadratic fallback for pure inequality conditions
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_asof_join_single_shuffle_per_side(spark):
    plan = plan_of(registry.QUERIES["asof_click_attribution"](spark, SF_SMALL))
    assert "Window" in plan
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_small_qty_revenue_broadcasts_part_and_threshold(spark):
    plan = plan_of(registry.QUERIES["small_qty_revenue"](spark, SF_SMALL))
    tree = tree_of(plan)
    # decorrelated subquery: per-part threshold joined back via broadcast
    assert tree.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in tree and "NestedLoop" not in tree
    assert "EqualTo(p_brand" in plan  # brand filter pushed into part scan


def test_late_order_priority_is_broadcast_semi_join(spark):
    plan = plan_of(registry.QUERIES["late_order_priority"](spark, SF_SMALL))
    tree = tree_of(plan)
    # EXISTS = one semi join: each order emitted at most once, no distinct
    assert "LeftSemi" in tree
    assert "HashAggregate" in tree and "NestedLoop" not in tree


def test_large_volume_customers_semi_filter_before_joins(spark):
    plan = plan_of(registry.QUERIES["large_volume_customers"](spark, SF_SMALL))
    tree = tree_of(plan)
    # lineitem aggregated once (partial+final), customer broadcast,
    # no second lineitem scan for the final total
    assert tree.count("Scan parquet") == 3  # orders, lineitem, customer
    assert "BroadcastHashJoin" in tree
    assert "SortMergeJoin" not in tree


def test_promo_revenue_pushes_date_range_to_scan(spark):
    plan = plan_of(registry.QUERIES["promo_revenue"](spark, SF_SMALL))
    assert "GreaterThanOrEqual(l_shipdate" in plan  # range → row-group pruning
    assert "LessThan(l_shipdate" in plan
    assert "BroadcastHashJoin" in plan  # part is the broadcast side


def test_grouping_sets_single_expand_single_shuffle(spark):
    plan = plan_of(registry.QUERIES["grouping_sets_revenue"](spark, SF_SMALL))
    tree = tree_of(plan)
    assert tree.count("Expand") == 1  # all 3 sets in one Expand node
    assert tree.count("Exchange") == 1  # one shuffle, partial aggs first


def test_pivot_is_single_scan_no_extra_job(spark):
    plan = plan_of(registry.QUERIES["order_priority_pivot"](spark, SF_SMALL))
    tree = tree_of(plan)
    # pinned pivot values → no distinct-values job, one scan; Spark's
    # two-phase pivot (pre-agg on (status,priority), then pivot agg) means
    # both shuffles carry only |status|x|priority| rows
    assert tree.count("Scan parquet") == 1
    assert tree.count("Exchange") <= 2


def test_monthly_trend_windows_only_the_aggregate(spark):
    plan = plan_of(registry.QUERIES["monthly_revenue_trend"](spark, SF_SMALL))
    tree = tree_of(plan)
    # cumulative window runs AFTER the groupBy shrank the input to ~months
    assert tree.index("Window") < tree.index("HashAggregate")  # tree prints top-down
    assert "NestedLoop" not in tree


def test_forecast_revenue_all_predicates_at_scan_single_row_agg(spark):
    plan = plan_of(registry.QUERIES["forecast_revenue"](spark, SF_SMALL))
    tree = tree_of(plan)
    # every predicate reaches the parquet scan (row-group pruning on all 3)
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_shipdate" in plan
    assert "LessThan(l_quantity" in plan
    assert "GreaterThanOrEqual(l_discount" in plan
    # zero joins; single-group agg → the only exchange is the 1-row
    # partial→final single-partition gather
    assert "Join" not in tree
    assert tree.count("HashAggregate") == 2


def test_jaccard_pairs_no_cartesian_hashed_keys(spark):
    plan = plan_of(registry.QUERIES["near_dup_pairs_jaccard"](spark, SF_SMALL))
    tree = tree_of(plan)
    # inverted-index equi-join on hashed shingles — never a pairwise scan
    assert "CartesianProduct" not in tree and "NestedLoop" not in tree
    assert "SortMergeJoin" in tree or "HashJoin" in tree


def test_audio_chunks_partition_local_no_shuffle(spark):
    plan = plan_of(registry.QUERIES["audio_chunks"](spark, SF_SMALL))
    tree = tree_of(plan)
    # chunking is a partition-local flat-map over one scan
    assert "Exchange" not in tree
    assert tree.count("Scan parquet") == 1
    assert "MapInPandas" in tree


def test_rolling_fingerprints_single_pass_no_shuffle(spark):
    plan = plan_of(registry.QUERIES["rolling_fingerprints"](spark, SF_SMALL))
    tree = tree_of(plan)
    # pure expression pipeline after the deliberate parallelism
    # repartition (load_docs decouples compute from the single-file
    # fixture layout): exactly that one round-robin exchange, no
    # key shuffle, and no Python in the hot path
    assert tree.count("Exchange") == 1
    assert "roundrobin" in plan.lower()
    assert "hashpartitioning" not in plan.lower()
    assert "Python" not in tree and "MapInPandas" not in tree
    # column pruning: only doc_id+text read
    assert "ReadSchema: struct<doc_id:bigint,text:string" in plan


def test_knn_batch_bigcorpus_reduces_before_exchange(spark):
    plan = plan_of(registry.QUERIES["knn_batch_bigcorpus"](spark, SF_SMALL))
    tree = tree_of(plan)
    # the partition-local reducer must sit BELOW the window's exchange:
    # scan → score → MapInPandas → Exchange → window, never Exchange first
    assert "MapInPandas" in tree and "Exchange" in tree
    assert tree.index("Exchange") < tree.index("MapInPandas")  # top-down print
    assert "Window" in tree


def test_hybrid_rrf_windows_only_over_bounded_pools(spark):
    """The RRF rank windows must never see corpus-sized input: each
    unpartitioned Window's child has to be a TakeOrderedAndProject (the
    distributed bounded-pool top-N), and no eager count() job sets k —
    the scale-killer shape (global row_number over the full corpus) is
    plan-asserted away."""
    plan = plan_of(registry.QUERIES["hybrid_rrf"](spark, SF_SMALL))
    tree = tree_of(plan)
    lines = tree.splitlines()
    window_lines = [i for i, ln in enumerate(lines) if "Window" in ln]
    assert len(window_lines) == 2  # keyword rank + vector rank
    for i in window_lines:
        assert "TakeOrderedAndProject" in lines[i + 1]  # bounded input
    # final fused top-k is also a TakeOrderedAndProject, not a full sort
    assert sum("TakeOrderedAndProject" in ln for ln in lines) == 3


def test_decontaminate_broadcasts_eval_side_no_cartesian(spark):
    """The contamination join must broadcast the eval postings and join
    on the n-gram hash — never a nested-loop/cartesian product. Checked
    on contamination_pairs directly: the report checkpoints the pair set
    (so its own plan starts from the materialized RDD and the join isn't
    visible there)."""
    from pyspark.sql import functions as F
    from vectorsearch_image_embeddings_databricks_spark import registry
    from vectorsearch_image_embeddings_databricks_spark.operators import decontam

    docs = registry.load_docs(spark, SF_SMALL)
    pairs = decontam.contamination_pairs(
        docs.filter(F.col("doc_id") % 20 != 0),
        docs.filter(F.col("doc_id") % 20 == 0),
        "doc_id",
        "text",
    )
    plan = plan_of(pairs)
    tree = tree_of(plan)
    assert "BroadcastHashJoin" in tree
    assert "CartesianProduct" not in tree
    assert "BroadcastNestedLoopJoin" not in tree


def test_pack_sequences_windows_are_partitioned(spark):
    """Packing must never global-sort: its window partitions by stream,
    so the plan has no unpartitioned Window (single-reducer) stage and
    exactly two exchanges (stream partition + bin aggregation)."""
    plan = plan_of(registry.QUERIES["pack_sequences"](spark, SF_SMALL))
    tree = tree_of(plan)
    assert "Window" in tree
    # an unpartitioned window logs "No Partition Defined" and plans a
    # SinglePartition exchange feeding the Window — assert it's absent
    assert "Exchange SinglePartition" not in plan.split("Window")[0]
    assert tree.count("Exchange") <= 2


def test_mixture_rebalance_single_corpus_scan(spark):
    """The corpus is aggregated once (localCheckpointed |strata| rows);
    the scalar-min branch must reuse it, not rescan the parquet."""
    plan = plan_of(registry.QUERIES["mixture_rebalance"](spark, SF_SMALL))
    assert plan.count("Scan parquet") <= 1


def test_gapfill_window_is_partitioned_and_grid_broadcast(spark):
    """Gap filling must LOCF through a series-partitioned window (no
    single-reducer window over the dense grid) and build the grid via a
    broadcast of the distinct series keys."""
    plan = plan_of(registry.QUERIES["events_gapfill_hourly"](spark, SF_SMALL))
    tree = tree_of(plan)
    assert "Window" in tree
    assert "Exchange SinglePartition" not in plan.split("Window")[0]
    assert "BroadcastNestedLoopJoin" in tree or "BroadcastExchange" in plan


def test_perplexity_vocab_scalar_is_broadcast(spark):
    """The unigram LM's (N, |V|) scalar must come back as a broadcast,
    not a shuffle, and the plan needs only the vocab + per-doc keyed
    exchanges plus the bucket window."""
    plan = plan_of(registry.QUERIES["lm_perplexity_buckets"](spark, SF_SMALL))
    tree = tree_of(plan)
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in tree


def test_perplexity_bucket_window_is_partitioned(spark):
    """The quantile bucket must come from the distributed global rank
    (range exchange + per-partition window + broadcast offsets), not an
    ntile over an unpartitioned window: no Exchange SinglePartition
    anywhere (the single-reducer sort is exactly the stage that dies at
    100 TB). Asserted on the pre-checkpoint ranking stage — the eager
    localCheckpoint truncates the final query's visible plan — plus the
    final plan for completeness."""
    from vectorsearch_image_embeddings_databricks_spark.operators import textstats
    from vectorsearch_image_embeddings_databricks_spark import registry as reg

    docs = reg.load_docs(spark, SF_SMALL).limit(50)
    per_doc = docs.selectExpr("doc_id AS id", "length(text) * 1.0 AS nll")
    stage = textstats._range_ranked(per_doc, ["nll", "id"], None)
    plan = plan_of(stage)
    assert "Exchange SinglePartition" not in plan
    assert "rangepartitioning" in plan.lower()
    assert "Window" in tree_of(plan)
    full = plan_of(registry.QUERIES["lm_perplexity_buckets"](spark, SF_SMALL))
    assert "Exchange SinglePartition" not in full


def test_knn_filtered_pushes_predicate_to_scan(spark):
    """The reference's `filters` parameter as a pre-index DataFrame
    filter: the label predicate must reach the parquet scan
    (PushedFilters), and the plan must stay scan → filter → cosine →
    TakeOrderedAndProject with no shuffle — filtered search costs LESS
    than unfiltered, never a post-filter of k results."""
    # cached relations from other modules would hide the parquet scan
    spark.catalog.clearCache()
    plan = plan_of(registry.QUERIES["knn_filtered"](spark, SF_SMALL))
    assert "TakeOrderedAndProject" in plan
    assert "PushedFilters" in plan and "label" in plan.split("PushedFilters")[1][:200]
    assert "Exchange" not in tree_of(plan)


def test_domain_relevance_select_map_only_topk(spark):
    """E94's scale claim: prototypes ride as literals, so the plan is
    one scan + TakeOrderedAndProject — no join, no data-dependent
    shuffle (the single round-robin REPARTITION_BY_NUM exchange is
    load_embeddings' documented fixture-parallelism decoupling, AQE-
    coalesced at real split counts), and column pruning reaches the
    scan (vec_id + embedding only)."""
    spark.catalog.clearCache()
    plan = plan_of(
        registry.QUERIES["domain_relevance_select"](spark, SF_SMALL)
    )
    tree = tree_of(plan)
    assert "TakeOrderedAndProject" in tree
    assert tree.count("Exchange") == 1
    assert "REPARTITION_BY_NUM" in plan  # the loader's, not the op's
    assert "hashpartitioning" not in plan  # no key shuffle anywhere
    assert "Join" not in tree
    assert "ReadSchema: struct<vec_id:bigint,embedding:array<float>" in plan


def test_kcenter_round_scan_is_map_only_topk(spark):
    """E93's per-round scan (the greatest-over-centers argmax): scoring
    against the literal center set must plan as scan → filter → top-1
    with no Exchange — k of these is the whole algorithm's cost."""
    from pyspark.sql import functions as F

    from vectorsearch_image_embeddings_databricks_spark.functions.vector import (
        cosine_similarity,
    )

    spark.catalog.clearCache()
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    centers = [[1.0] + [0.0] * 63, [0.0, 1.0] + [0.0] * 62]
    best = F.greatest(
        *[
            cosine_similarity(
                "embedding", F.array(*[F.lit(float(x)) for x in c])
            )
            for c in centers
        ]
    )
    df = (
        emb.select(F.col("vec_id"), best.alias("__sim"))
        .filter(~F.col("vec_id").isin([0, 1]))
        .orderBy(F.asc("__sim"), F.asc("vec_id"))
        .limit(1)
    )
    tree = tree_of(plan_of(df))
    assert "TakeOrderedAndProject" in tree
    assert "Exchange" not in tree
