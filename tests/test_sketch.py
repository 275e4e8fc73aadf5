"""Count-min sketch (operators/sketch.py): the CMS guarantee
(estimate ≥ truth), exactness at generous width, cell-wise mergeability,
and the sketch-sized-shuffle plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectorsearch_image_embeddings_databricks_spark.operators import sketch


def _toks(spark, words):
    return spark.createDataFrame([(w,) for w in words], "t string")


def test_cms_never_underestimates_and_exact_at_wide_width(spark):
    words = ["a"] * 7 + ["b"] * 3 + ["c"] * 1 + ["dd"] * 5
    toks = _toks(spark, words)
    sk = sketch.cms_build(toks, "t", depth=4, width=4096)
    probes = toks.select("t").distinct()
    est = {
        r["t"]: r["cms_estimate"]
        for r in sketch.cms_estimate(sk, probes, "t", 4, 4096).collect()
    }
    truth = {"a": 7, "b": 3, "c": 1, "dd": 5}
    for t, c in truth.items():
        assert est[t] >= c
    # at width >> vocabulary, collisions are absent and the sketch is exact
    assert est == truth


def test_cms_overestimates_only_under_collisions(spark):
    # width 2 forces collisions: estimates must still dominate the truth
    words = [f"w{i}" for i in range(20)] * 3
    toks = _toks(spark, words)
    sk = sketch.cms_build(toks, "t", depth=3, width=2)
    est = sketch.cms_estimate(
        sk, toks.select("t").distinct(), "t", 3, 2
    ).collect()
    assert all(r["cms_estimate"] >= 3 for r in est)


def test_cms_merges_by_cellwise_sum(spark):
    a = _toks(spark, ["x"] * 4 + ["y"] * 2)
    b = _toks(spark, ["x"] * 1 + ["z"] * 5)
    union = a.union(b)
    direct = {
        (r["j"], r["cell"]): r["cnt"]
        for r in sketch.cms_build(union, "t", 4, 64).collect()
    }
    merged = {}
    for part in (a, b):
        for r in sketch.cms_build(part, "t", 4, 64).collect():
            k = (r["j"], r["cell"])
            merged[k] = merged.get(k, 0) + r["cnt"]
    assert direct == merged


def test_cms_build_shuffle_is_sketch_sized(spark):
    toks = _toks(spark, ["a", "b"] * 10)
    plan = sketch.cms_build(
        toks, "t", 4, 64
    )._jdf.queryExecution().executedPlan().toString()
    # partial aggregation before the exchange: each task ships ≤ d·w rows
    assert "partial_count" in plan


def test_cms_unknown_probe_estimates_zero_at_wide_width(spark):
    sk = sketch.cms_build(_toks(spark, ["seen"]), "t", 4, 4096)
    est = sketch.cms_estimate(
        sk, _toks(spark, ["never-seen-token"]), "t", 4, 4096
    ).collect()
    assert est[0]["cms_estimate"] == 0


def test_cms_from_counts_equals_occurrence_build(spark):
    toks = _toks(spark, ["a"] * 5 + ["b"] * 3 + ["c"])
    wc = toks.groupBy("t").agg(F.count("*").alias("c"))
    from_occ = {
        (r["j"], r["cell"]): r["cnt"]
        for r in sketch.cms_build(toks, "t", 4, 64).collect()
    }
    from_counts = {
        (r["j"], r["cell"]): r["cnt"]
        for r in sketch.cms_build_from_counts(wc, "t", "c", 4, 64).collect()
    }
    assert from_occ == from_counts


def _lang_toks(spark, rows):
    return spark.createDataFrame(rows, "lang string, t string")


def test_hll_duplicates_do_not_move_the_estimate(spark):
    uniq = [("en", f"tok{i}") for i in range(300)]
    once = sketch.hll_distinct_estimate(
        _lang_toks(spark, uniq), "lang", "t"
    ).collect()[0]
    thrice = sketch.hll_distinct_estimate(
        _lang_toks(spark, uniq * 3), "lang", "t"
    ).collect()[0]
    assert once["hll_micro_estimate"] == thrice["hll_micro_estimate"]
    assert once["exact_distinct"] == thrice["exact_distinct"] == 300


def test_hll_estimate_within_error_band(spark):
    rows = [("en", f"w{i}") for i in range(1000)] + [
        ("fr", f"v{i}") for i in range(100)
    ]
    got = {
        r["lang"]: r
        for r in sketch.hll_distinct_estimate(
            _lang_toks(spark, rows), "lang", "t"
        ).collect()
    }
    for lang, n in (("en", 1000), ("fr", 100)):
        est = got[lang]["hll_micro_estimate"] / 1_000_000
        # m=64 → σ ≈ 13%; 3σ band
        assert abs(est - n) / n < 0.4, (lang, est)


def test_hll_register_build_has_mapside_partial_max(spark):
    df = _lang_toks(spark, [("en", "a")])
    plan = sketch.hll_distinct_estimate(
        df, "lang", "t"
    )._jdf.queryExecution().executedPlan().toString()
    assert "partial_max" in plan


def test_hll_registers_merge_by_cellwise_max(spark):
    a = _lang_toks(spark, [("en", f"a{i}") for i in range(80)])
    b = _lang_toks(spark, [("en", f"b{i}") for i in range(60)])
    union = a.union(b)

    def regs(df):
        from pyspark.sql import functions as F
        bucket, rank = sketch._hll_parts(F.col("t"))
        return {
            (r["__g"], r["__b"]): r["__m"]
            for r in df.select(
                F.col("lang").alias("__g"), bucket.alias("__b"),
                rank.alias("__r"),
            ).groupBy("__g", "__b").agg(F.max("__r").alias("__m")).collect()
        }

    direct = regs(union)
    ra, rb = regs(a), regs(b)
    merged = {}
    for part in (ra, rb):
        for k, v in part.items():
            merged[k] = max(merged.get(k, 0), v)
    assert direct == merged


def test_quantile_sketch_audit_within_bounds_and_partition_invariant(spark):
    """E89: percentile_approx's GK rank guarantee holds on the fixture
    (within=1 everywhere) and the audit — sketch + rank scan — is
    invariant to input partitioning (the sketch is mergeable; the rank
    count is associative)."""
    from vectorsearch_image_embeddings_databricks_spark.operators.quantiles import (
        quantile_sketch_audit,
    )

    df = spark.createDataFrame(
        [(("g%d" % (i % 3)), float((i * 37) % 1009)) for i in range(3000)],
        "g string, v double",
    )
    out = quantile_sketch_audit(df, "g", "v", [0.1, 0.5, 0.9], accuracy=50)
    rows = {(r["g"], r["q_micro"]): r["within"] for r in out.collect()}
    assert len(rows) == 9
    assert all(v == 1 for v in rows.values())
    again = quantile_sketch_audit(
        df.repartition(13), "g", "v", [0.1, 0.5, 0.9], accuracy=50
    )
    assert {(r["g"], r["q_micro"]): r["within"] for r in again.collect()} == rows


def test_quantile_sketch_audit_rank_math_catches_bad_value(spark):
    """Negative control for the audit arithmetic: feed the SAME rank
    check a value far outside the quantile's rank window (the min of a
    1000-row group audited as the 0.9-quantile at accuracy 100) and it
    must report within=0 — i.e. the row can actually fail, the oracle's
    expected-if-healthy answer is a real assertion."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("g", float(i)) for i in range(1000)], "g string, v double"
    )
    # replicate the operator's cross-multiplied closed-span rank check
    # (integer micro-units, floor/ceil window) with v = min
    n = 1000
    v = 0.0
    lt = df.filter(F.col("v") < v).count()
    le = df.filter(F.col("v") <= v).count()
    q_micro, eps_micro = 900000, 1_000_000 // 100
    p_lo, q_hi = (q_micro - eps_micro) * n, (q_micro + eps_micro) * n
    hi_rank_m, lo_rank_m = le * 1_000_000, (lt + 1) * 1_000_000
    assert not (
        hi_rank_m + 999_999 >= p_lo and lo_rank_m <= q_hi + 999_999
    )
