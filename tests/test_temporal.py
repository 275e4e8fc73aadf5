"""Unit semantics for operators/temporal.py: backward as-of join
(DuckDB ASOF-JOIN-compatible) and gap sessionization."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vectorsearch_image_embeddings_databricks_spark.operators.temporal import (  # noqa: E402
    asof_join,
    sessionize,
)


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_asof_basic_and_no_prior(spark):
    left = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 5), (3, "b", 100)], "id int, k string, t long"
    )
    right = spark.createDataFrame(
        [(101, "a", 7), (102, "a", 9), (103, "b", 200)],
        "rid int, k string, t long",
    )
    out = asof_join(left, right, key="k", left_ts="t", right_ts="t",
                    payload_cols=["rid"])
    got = _rows(out, "id", "rid_asof")
    # id=1 (t=10): latest right ≤10 is rid 102 (t=9); id=2 (t=5): none ≤5;
    # id=3 (t=100): right t=200 is in the future → NULL
    assert got == [(1, 102), (2, None), (3, None)]


def test_asof_inclusive_equal_ts(spark):
    left = spark.createDataFrame([(1, "a", 10)], "id int, k string, t long")
    right = spark.createDataFrame([(9, "a", 10)], "rid int, k string, t long")
    out = asof_join(left, right, key="k", left_ts="t", right_ts="t",
                    payload_cols=["rid"])
    assert _rows(out, "id", "rid_asof") == [(1, 9)]


def test_asof_row_count_preserved(spark):
    """Left join semantics: exactly one output row per left row, never an
    explosion, regardless of how many right rows precede it."""
    left = spark.createDataFrame([(i, "a", 50) for i in range(5)],
                                 "id int, k string, t long")
    right = spark.createDataFrame([(100 + j, "a", j) for j in range(20)],
                                  "rid int, k string, t long")
    out = asof_join(left, right, key="k", left_ts="t", right_ts="t",
                    payload_cols=["rid"])
    rows = _rows(out, "id", "rid_asof")
    assert len(rows) == 5
    assert all(r[1] == 119 for r in rows)  # latest rid with t=19 ≤ 50


def test_sessionize_gap_boundaries(spark):
    # gap=10: deltas of exactly 10 stay in-session; 11 starts a new one
    df = spark.createDataFrame(
        [("u", 0), ("u", 10), ("u", 21), ("u", 25), ("v", 1000)],
        "k string, t long",
    )
    out = sessionize(df, key="k", ts_col="t", gap=10)
    got = _rows(out, "k", "t", "session_id")
    assert got == [
        ("u", 0, 0), ("u", 10, 0), ("u", 21, 1), ("u", 25, 1), ("v", 1000, 0),
    ]


def test_range_join_inclusive_bounds_and_bucket_crossing(spark):
    from vectorsearch_image_embeddings_databricks_spark.operators.temporal import (
        range_join,
    )

    left = spark.createDataFrame([(1, "a", 100)], "id int, k string, t long")
    # window [t+0, t+10]: 100 and 110 inclusive, 99 and 111 out;
    # 105 sits in the next bucket (width 10) — must still match
    right = spark.createDataFrame(
        [(1, "a", 99), (2, "a", 100), (3, "a", 105), (4, "a", 110),
         (5, "a", 111), (6, "b", 105)],
        "rid int, k string, t long",
    )
    out = range_join(
        left, right, key="k", left_ts="t", right_ts="t",
        lower=0, upper=10, payload_cols=["rid"],
    )
    assert sorted(r["rid_r"] for r in out.collect()) == [2, 3, 4]


def test_range_join_negative_lower(spark):
    from vectorsearch_image_embeddings_databricks_spark.operators.temporal import (
        range_join,
    )

    left = spark.createDataFrame([(1, "a", 100)], "id int, k string, t long")
    right = spark.createDataFrame(
        [(1, "a", 94), (2, "a", 95), (3, "a", 105), (4, "a", 106)],
        "rid int, k string, t long",
    )
    out = range_join(
        left, right, key="k", left_ts="t", right_ts="t",
        lower=-5, upper=5, payload_cols=["rid"],
    )
    assert sorted(r["rid_r"] for r in out.collect()) == [2, 3]


def test_salted_join_equals_plain_join(spark):
    from vectorsearch_image_embeddings_databricks_spark.operators.skew import (
        salted_join,
    )

    left = spark.createDataFrame(
        [(i, i % 3, f"l{i}") for i in range(50)], "id long, k long, lv string"
    )
    right = spark.createDataFrame(
        [(0, "r0"), (1, "r1"), (1, "r1b"), (5, "r5")], "k long, rv string"
    )
    plain = sorted(
        (r["id"], r["k"], r["rv"])
        for r in left.join(right, "k").collect()
    )
    salted = sorted(
        (r["id"], r["k"], r["rv"])
        for r in salted_join(left, right, key="k", salt=4, salt_from="id").collect()
    )
    assert plain == salted and len(plain) > 0


def test_hash_sample_deterministic_subset_with_sane_rate(spark):
    from vectorsearch_image_embeddings_databricks_spark.operators.sampling import (
        hash_sample,
        train_eval_split,
    )

    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    s1 = {r["k"] for r in hash_sample(df, "k", 0.3, seed=7).collect()}
    # repartitioning must not change membership (the df.sample pitfall)
    s2 = {
        r["k"] for r in hash_sample(df.repartition(13), "k", 0.3, seed=7).collect()
    }
    assert s1 == s2
    assert 0.2 < len(s1) / 2000 < 0.4
    # different seed → different sample
    s3 = {r["k"] for r in hash_sample(df, "k", 0.3, seed=8).collect()}
    assert s1 != s3

    train, ev = train_eval_split(df, "k", eval_fraction=0.2, seed=1)
    t = {r["k"] for r in train.collect()}
    e = {r["k"] for r in ev.collect()}
    assert t | e == set(range(2000)) and not (t & e)  # disjoint + exhaustive


def test_stratified_sample_respects_per_stratum_rates(spark):
    from vectorsearch_image_embeddings_databricks_spark.operators.sampling import (
        stratified_sample,
    )

    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(2000)]
    df = spark.createDataFrame(rows, "k long, s string")
    out = stratified_sample(
        df, strata_col="s", fractions={"a": 1.0, "b": 0.1}, key="k"
    )
    counts = {r["s"]: r["n"] for r in out.groupBy("s").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
    ).collect()}
    assert counts["a"] == 1000  # fraction 1.0 keeps everything
    assert 50 < counts.get("b", 0) < 200  # ≈10% of 1000


def test_scd2_apply_invariants(spark):
    """SCD2 contract: one open version per key, closed versions chain
    end-to-start, latest change in a batch wins, history passes through."""
    import datetime as dt

    from pyspark.sql import functions as F
    from vectorsearch_image_embeddings_databricks_spark.operators.scd import scd2_apply, scd2_init

    t0 = dt.datetime(2020, 1, 1)
    t1 = dt.datetime(2021, 6, 1)
    t2 = dt.datetime(2022, 3, 1)
    dim = scd2_init(
        spark.createDataFrame(
            [(1, "a0"), (2, "b0"), (3, "c0")], "k long, attr string"
        ),
        "k",
        F.lit(t0),
    )
    # key 1 changes twice in the batch (t1 then t2): t2 must win; key 2
    # changes once; key 3 untouched
    changes = spark.createDataFrame(
        [(1, "a1", t1), (1, "a2", t2), (2, "b1", t1)],
        "k long, attr string, change_ts timestamp",
    )
    out = scd2_apply(dim, changes, key="k", change_ts_col="change_ts")
    rows = {(r["k"], r["attr"]): r for r in out.collect()}
    assert len(rows) == 5  # 3 originals + 2 new versions
    assert rows[(1, "a0")]["valid_to"] == t2 and not rows[(1, "a0")]["is_current"]
    assert rows[(1, "a2")]["valid_from"] == t2 and rows[(1, "a2")]["is_current"]
    assert (1, "a1") not in rows  # intermediate change collapsed
    assert rows[(2, "b0")]["valid_to"] == t1 and rows[(2, "b1")]["is_current"]
    assert rows[(3, "c0")]["is_current"] and rows[(3, "c0")]["valid_to"] is None
    # exactly one open version per key
    cur = out.filter("is_current").groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in cur) and len(cur) == 3

    # applying a second batch: history rows pass through byte-identical
    t3 = dt.datetime(2023, 1, 1)
    changes2 = spark.createDataFrame(
        [(2, "b2", t3)], "k long, attr string, change_ts timestamp"
    )
    out2 = scd2_apply(out, changes2, key="k", change_ts_col="change_ts")
    assert out2.count() == 6
    closed = {
        (r["k"], r["attr"]): r for r in out2.filter("NOT is_current").collect()
    }
    assert closed[(2, "b1")]["valid_to"] == t3
    assert closed[(1, "a0")]["valid_to"] == t2  # untouched history


def test_gapfill_locf_densifies_and_carries_forward(spark):
    """Missing buckets appear with carried-forward values; leading gaps
    (before a series' first value) stay null; counts are per-bucket."""
    from pyspark.sql import functions as F
    from vectorsearch_image_embeddings_databricks_spark.operators.temporal import (
        gapfill_locf,
    )

    rows = [
        ("a", 10, 1.0),
        ("a", 13, 4.0),   # gap at 11, 12
        ("b", 12, 9.0),   # leading gap at 10, 11
    ]
    df = spark.createDataFrame(rows, ["s", "b", "v"])
    out = gapfill_locf(
        df, "s", "b", {"n": F.count("*"), "v": F.sum("v")}, fill_cols=["v"]
    )
    got = {(r["s"], r["b"]): (r["n"], r["v"]) for r in out.collect()}
    assert len(got) == 8  # buckets 10..13 x 2 series
    assert got[("a", 11)] == (None, 1.0)   # carried forward
    assert got[("a", 12)] == (None, 1.0)
    assert got[("a", 13)] == (1, 4.0)
    assert got[("b", 10)] == (None, None)  # leading gap: nothing to carry
    assert got[("b", 12)] == (1, 9.0)
    assert got[("b", 13)] == (None, 9.0)


def test_time_weighted_avg_hand_checked(spark):
    """Three observations: value 100 cents holds 10s, 300 cents holds
    30s -> twa = (100*10 + 300*30)/40 = 250 cents = 2.5 -> 2_500_000
    micro. The last observation carries no interval; a single-obs key
    drops entirely."""
    from vectorsearch_image_embeddings_databricks_spark.operators.temporal import (
        time_weighted_avg,
    )

    rows = [
        (1, 0, 100),
        (1, 10, 300),
        (1, 40, 999),   # last obs: no successor, excluded
        (2, 5, 777),    # single obs: zero covered duration, key drops
    ]
    df = spark.createDataFrame(rows, ["k", "t", "cents"])
    out = {r["k"]: r for r in time_weighted_avg(df, ["k"], "t", "cents").collect()}
    assert set(out) == {1}
    assert out[1]["n_intervals"] == 2
    assert out[1]["twa_micro"] == 2_500_000


def test_time_weighted_avg_plan_partitioned_window(spark):
    """The lead() window must be partitioned by the key — a global sort
    of the corpus would be the single-reducer anti-pattern."""
    import contextlib
    import io

    from vectorsearch_image_embeddings_databricks_spark import registry
    from .conftest import SF_SMALL

    df = registry.QUERIES["time_weighted_avg_user"](spark, SF_SMALL)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "Window" in plan
    assert "SinglePartition" not in plan


def test_weighted_sample_es_overwhelming_weight_always_selected(spark):
    """A doc whose weight dwarfs the rest has ln(u)/w ~ 0 > everyone
    else's key — it must appear in any top-k; output keys descend."""
    from vectorsearch_image_embeddings_databricks_spark.operators.sampling import (
        weighted_sample_es,
    )

    rows = [(i, "x", 10) for i in range(100)] + [(999, "y", 10**9)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "n_chars"])
    out = weighted_sample_es(df, "doc_id", "n_chars", 5).collect()
    assert len(out) == 5
    assert out[0]["id"] == 999
    keys = [r["es_key"] for r in out]
    assert keys == sorted(keys, reverse=True)


def test_weighted_sample_es_plan_no_shuffle(spark):
    import contextlib
    import io

    from vectorsearch_image_embeddings_databricks_spark import registry
    from .conftest import SF_SMALL

    spark.catalog.clearCache()
    df = registry.QUERIES["weighted_sample_docs"](spark, SF_SMALL)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_winsorized_stats_hand_checked(spark):
    """20 values 1..20 in one group: p05 bound = 1st order stat (=1),
    p95 bound = 19th (=19); clamping only moves 20 -> 19, so the
    winsorized sum is 210 - 1 = 209."""
    from vectorsearch_image_embeddings_databricks_spark.operators.quantiles import (
        winsorized_stats,
    )

    rows = [("a", i, i) for i in range(1, 21)]
    df = spark.createDataFrame(rows, ["g", "id", "v"])
    out = winsorized_stats(df, "g", "v", "id").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["lo_bound"], r["hi_bound"]) == (1, 19)
    assert r["sum_winsorized"] == 209
    assert r["n"] == 20


def test_grouped_ranked_matches_naive_window(spark):
    """The range-exchange grouped rank must equal the naive per-group
    window rank on every row, across a multi-group fixture."""
    from pyspark.sql import Window, functions as F
    from vectorsearch_image_embeddings_databricks_spark.operators.quantiles import (
        grouped_ranked,
    )

    rows = [(f"g{i % 3}", i * 7 % 50, i) for i in range(200)]
    df = spark.createDataFrame(rows, ["g", "v", "id"])
    got = {
        (r["g"], r["id"]): r["__grank"]
        for r in grouped_ranked(df, "g", "v", "id").collect()
    }
    w = Window.partitionBy("g").orderBy("v", "id")
    want = {
        (r["g"], r["id"]): r["rk"]
        for r in df.withColumn("rk", F.row_number().over(w)).collect()
    }
    assert got == want
