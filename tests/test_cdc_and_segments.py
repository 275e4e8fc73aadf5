"""CDC MERGE apply (operators.cdc) and cross-doc segment dedup
(operators.dedup.segment_dedup): semantics on literal frames + plan
shape (argmax aggregate, not a window; no broadcast of the frequency
side)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectorsearch_image_embeddings_databricks_spark.operators import cdc, dedup


def _base(spark):
    return spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
        "k long, tag string, bal long",
    )


def _changes(spark, rows):
    return spark.createDataFrame(rows, "k long, seq long, op string, bal long")


def test_cdc_upsert_delete_insert_keep(spark):
    ch = _changes(
        spark,
        [
            (1, 1, "U", 11),   # update key 1
            (2, 1, "U", 99),
            (2, 2, "D", 0),    # later delete wins for key 2
            (4, 1, "U", 40),   # insert new key 4
        ],
    )
    got = {
        r["k"]: (r["bal"], r["tag"])
        for r in cdc.apply_cdc(
            _base(spark), ch, "k", ["seq"], "op", ["bal"]
        ).collect()
    }
    assert got == {
        1: (11, "a"),    # upserted payload, passthrough kept
        3: (30, "c"),    # untouched
        4: (40, None),   # inserted — no base passthrough
    }


def test_cdc_latest_wins_across_sequence_ties_broken_by_second_col(spark):
    ch = spark.createDataFrame(
        [(1, 5, 1, "U", 100), (1, 5, 2, "D", 0), (1, 4, 9, "U", 7)],
        "k long, ts long, off long, op string, bal long",
    )
    out = cdc.apply_cdc(
        _base(spark), ch, "k", ["ts", "off"], "op", ["bal"]
    ).collect()
    # latest change for key 1 is (ts=5, off=2) = delete
    assert sorted(r["k"] for r in out) == [2, 3]


def test_cdc_delete_then_reinsert_latest_wins(spark):
    ch = _changes(spark, [(3, 1, "D", 0), (3, 2, "U", 33)])
    out = {r["k"]: r["bal"] for r in cdc.apply_cdc(
        _base(spark), ch, "k", ["seq"], "op", ["bal"]
    ).collect()}
    assert out == {1: 10, 2: 20, 3: 33}


def test_cdc_latest_changes_plan_is_aggregate_not_window(spark):
    ch = _changes(spark, [(1, 1, "U", 11)])
    plan = cdc.latest_changes(
        ch, "k", ["seq"], "op", ["bal"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial_max" in plan or "HashAggregate" in plan


def test_segment_dedup_removes_cross_doc_boilerplate(spark):
    shared = "the quick brown fox jumps over the lazy"  # exactly 8 tokens
    docs = spark.createDataFrame(
        [
            (0, shared + " alpha beta gamma delta epsilon zeta eta theta"),
            (1, shared + " one two three four five six seven eight"),
            (2, shared + " red green blue cyan magenta yellow black white"),
            (3, "totally unique words nobody else repeats anywhere here"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in dedup.segment_dedup(
            docs, "doc_id", "text", seg_len=8, max_df=2
        ).collect()
    }
    # the shared leading segment appears in 3 docs > max_df → dropped
    assert out[0]["n_segs"] == 2 and out[0]["n_kept"] == 1
    assert out[3]["n_segs"] == 1 and out[3]["n_kept"] == 1
    # doc 3's text survives verbatim
    import hashlib

    assert (
        out[3]["clean_md5"]
        == hashlib.md5(
            b"totally unique words nobody else repeats anywhere here"
        ).hexdigest()
    )
    # a fully-boilerplate doc reassembles to the empty string
    docs2 = spark.createDataFrame(
        [(i, shared) for i in range(3)], "doc_id long, text string"
    )
    out2 = dedup.segment_dedup(docs2, "doc_id", "text", 8, 2).collect()
    assert all(
        r["n_kept"] == 0
        and r["clean_md5"] == hashlib.md5(b"").hexdigest()
        for r in out2
    )


def test_segment_dedup_keeps_order_and_ignores_empty_docs(spark):
    docs = spark.createDataFrame(
        [(0, "a b c d e f g h i j"), (1, "   "), (2, "")],
        "doc_id long, text string",
    )
    rows = dedup.segment_dedup(docs, "doc_id", "text", 4, 2).collect()
    assert [r["doc_id"] for r in rows] == [0]  # token-less docs drop out
    import hashlib

    # segments [a b c d][e f g h][i j] reassemble in original order
    assert rows[0]["n_segs"] == 3
    assert rows[0]["clean_md5"] == hashlib.md5(
        b"a b c d e f g h i j"
    ).hexdigest()


def test_segment_dedup_plan_never_broadcasts_frequency_side(spark):
    docs = spark.createDataFrame(
        [(0, "a b c d"), (1, "a b c d")], "doc_id long, text string"
    )
    plan = dedup.segment_dedup(
        docs, "doc_id", "text", 2, 1
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan


def test_incremental_dedup_statuses(spark):
    history = spark.createDataFrame(
        [(100, "old text"), (101, "shared text")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (1, "shared text"),    # exists in history
            (2, "fresh text"),     # novel, first occurrence
            (3, "fresh text"),     # dup of 2 within the batch
            (4, "brand new"),      # novel
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["status"]
        for r in dedup.incremental_dedup(
            history, batch, "doc_id", "text"
        ).collect()
    }
    assert got == {
        1: "history_dup",
        2: "novel",
        3: "batch_dup",
        4: "novel",
    }


def test_incremental_dedup_history_never_shuffles(spark):
    history = spark.createDataFrame(
        [(100, "a")], "doc_id long, text string"
    )
    batch = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    plan = dedup.incremental_dedup(
        history, batch, "doc_id", "text"
    )._jdf.queryExecution().executedPlan().toString()
    # the history pass is a broadcast left-semi: the big side sees no
    # exchange before the join
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_cdc_sequential_batches_equal_one_shot_when_split_by_sequence(spark):
    # the invariant streaming_cdc_snapshot rests on: applying
    # sequence-ordered batches one at a time == one global apply
    base = _base(spark)
    ch = _changes(
        spark,
        [
            (1, 1, "U", 11), (2, 1, "D", 0), (4, 2, "U", 40),
            (1, 3, "D", 0), (2, 4, "U", 22), (4, 5, "U", 41),
        ],
    )
    one_shot = sorted(
        (r["k"], r["bal"])
        for r in cdc.apply_cdc(base, ch, "k", ["seq"], "op", ["bal"]).collect()
    )
    snap = base
    for lo, hi in ((0, 3), (3, 99)):
        snap = cdc.apply_cdc(
            base=snap,
            changes=ch.filter((F.col("seq") > lo) & (F.col("seq") <= hi)),
            key="k", seq_cols=["seq"], op_col="op", payload_cols=["bal"],
        )
    sequential = sorted((r["k"], r["bal"]) for r in snap.collect())
    assert one_shot == sequential


def test_exact_substring_dedup_cuts_only_the_shared_span(spark):
    import hashlib

    shared = "one two three four five six seven eight"  # 8 tokens
    docs = spark.createDataFrame(
        [
            (0, "alpha " + shared + " omega"),
            (1, "beta " + shared),
            (2, "gamma delta epsilon"),      # < k tokens, untouched
            (3, shared), (4, shared),        # full-duplicate pair
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in dedup.exact_substring_dedup(
            docs, "doc_id", "text", k=8
        ).collect()
    }
    # the shared 8-gram is cut from every carrier; unique affixes survive
    assert got[0]["n_covered"] == 8
    assert got[0]["clean_md5"] == hashlib.md5(b"alpha omega").hexdigest()
    assert got[1]["clean_md5"] == hashlib.md5(b"beta").hexdigest()
    # short doc untouched
    assert got[2]["n_covered"] == 0
    assert got[2]["clean_md5"] == hashlib.md5(
        b"gamma delta epsilon"
    ).hexdigest()
    # exact duplicates collapse to empty
    for d in (3, 4):
        assert got[d]["n_covered"] == got[d]["n_tokens"] == 8
        assert got[d]["clean_md5"] == hashlib.md5(b"").hexdigest()


def test_exact_substring_dedup_overlapping_runs_cover_exactly(spark):
    # a 10-token duplicated run yields 3 overlapping 8-grams; coverage is
    # the union of their spans = all 10 positions, not 24
    run = "a b c d e f g h i j"
    docs = spark.createDataFrame(
        [(0, "x " + run), (1, run + " y")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in dedup.exact_substring_dedup(
            docs, "doc_id", "text", k=8
        ).collect()
    }
    import hashlib

    assert got[0]["n_covered"] == 10 and got[1]["n_covered"] == 10
    assert got[0]["clean_md5"] == hashlib.md5(b"x").hexdigest()
    assert got[1]["clean_md5"] == hashlib.md5(b"y").hexdigest()
