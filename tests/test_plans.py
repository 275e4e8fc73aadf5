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
