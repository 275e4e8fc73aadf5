"""BPE pair counting, temperature sampling quotas, and event-transition
counts: hand-computed semantics on literal frames + plan shapes."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from vectorsearch_image_embeddings_databricks_spark.operators import (
    sampling,
    temporal,
    textstats,
)


def test_bpe_pair_counts_hand_computed(spark):
    # "aab" x2 docs, "ab" once  → words: aab:2, ab:1
    # pairs: aab → (a,a),(a,b) each ×2 ; ab → (a,b) ×1
    docs = spark.createDataFrame(
        [(0, "aab ab"), (1, "aab")], "doc_id long, text string"
    )
    rows = textstats.bpe_pair_counts(docs, "text", top=10).collect()
    got = {(r["a"], r["b"]): r["pair_count"] for r in rows}
    assert got == {("a", "b"): 3, ("a", "a"): 2}
    # ordering: count desc, then lexicographic
    assert [(r["a"], r["b"]) for r in rows] == [("a", "b"), ("a", "a")]


def test_bpe_single_char_words_produce_no_pairs(spark):
    docs = spark.createDataFrame([(0, "a b c a")], "doc_id long, text string")
    assert textstats.bpe_pair_counts(docs, "text").count() == 0


def test_bpe_pair_work_is_vocab_sized(spark):
    # the pair explode must read the aggregated word table, not the corpus:
    # the plan has exactly one pre-explode aggregate below the generator
    docs = spark.createDataFrame([(0, "xy xy xy")], "doc_id long, text string")
    plan = textstats.bpe_pair_counts(docs, "text")._jdf.queryExecution(
    ).optimizedPlan().toString()
    gen_pos = plan.find("Generate")
    agg_pos = plan.find("Aggregate", gen_pos)
    assert gen_pos != -1 and agg_pos != -1  # explode sits ABOVE an aggregate


def _reference_bpe(word_counts: dict[str, int], merges: int):
    """Textbook greedy BPE (Sennrich et al. 2016): explicit list-walk
    re-segmentation, left-to-right non-overlapping — the semantics the
    distributed string-replace formulation must reproduce exactly."""
    words = {w: (list(w), f) for w, f in word_counts.items()}
    out = []
    for r in range(merges):
        pc: dict[tuple, int] = {}
        for syms, f in words.values():
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                pc[k] = pc.get(k, 0) + f
        if not pc:
            break
        (a, b), c = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        out.append((r + 1, a, b, a + b, c))
        for w, (syms, f) in words.items():
            seg, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    seg.append(a + b)
                    i += 2
                else:
                    seg.append(syms[i])
                    i += 1
            words[w] = (seg, f)
    return out


def test_bpe_train_matches_reference_greedy(spark):
    """The full training loop against the textbook implementation,
    including the overlap traps: 'aaaa' must re-segment to (aa)(aa)
    not (aa)a a, runs of the merged pair must not chain through their
    own replacement, and count ties must break lexicographically."""
    text = "aaaa aaa low lower lowest low low newer new wider aab abab"
    docs = spark.createDataFrame(
        [(0, text), (1, text), (2, "aaaa zz zz")],
        "doc_id long, text string",
    )
    wc: dict[str, int] = {}
    for row in [text, text, "aaaa zz zz"]:
        for w in row.split(" "):
            if w:
                wc[w] = wc.get(w, 0) + 1
    want = _reference_bpe(wc, merges=8)
    got = [
        (r["merge_rank"], r["lhs"], r["rhs"], r["merged"], r["pair_count"])
        for r in textstats.bpe_train(docs, "text", merges=8)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == want
    # 'aa' must be an early merge (count 3*2 inside aaaa + ...) and the
    # second-round count must reflect NON-overlapping resegmentation
    assert any(m[3] == "aa" for m in got)


def test_bpe_segment_roundtrip_and_reference_equality(spark):
    """Applying the learned merges must (a) re-concatenate to the
    original token (lossless segmentation) and (b) produce the same
    symbol sequences as the reference list-walk applied to the same
    merge list."""
    text = "aaaa aaa banana bandana low lower lowest"
    docs = spark.createDataFrame(
        [(i, text) for i in range(3)], "doc_id long, text string"
    )
    wc: dict[str, int] = {}
    for w in (text + " " + text + " " + text).split(" "):
        wc[w] = wc.get(w, 0) + 1
    ref = _reference_bpe(wc, merges=6)
    merges = [(m[1], m[2]) for m in ref]
    seg = {
        r["token"]: (r["corpus_count"], r["symbols"])
        for r in textstats.bpe_segment(docs, "text", merges).collect()
    }
    # reference segmentation: replay the walk on the final state
    words = {w: list(w) for w in wc}
    for a, b in merges:
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    assert set(seg) == set(wc)
    for w, (cnt, syms) in seg.items():
        assert cnt == wc[w]
        assert "".join(syms) == w
        assert syms == words[w], (w, syms, words[w])


def test_bpe_segment_multi_chunk_equals_reference(spark):
    """Above _BPE_SEGMENT_CHUNK merges bpe_segment switches to chunked
    projections with a localCheckpoint between chunks (round-5 advice:
    one merge-count-deep nested-replace expression would hit Catalyst
    analyzer/codegen recursion at production vocabularies). The chunk
    boundary must be invisible: segmentation equals the reference
    list-walk and round-trips losslessly."""
    import random

    rng = random.Random(7)
    words = sorted(
        {"".join(rng.choice("abcdef") for _ in range(10)) for _ in range(50)}
    )
    docs = spark.createDataFrame(
        [(0, " ".join(words))], "doc_id long, text string"
    )
    wc = {w: 1 for w in words}
    ref = _reference_bpe(wc, merges=150)
    merges = [(m[1], m[2]) for m in ref]
    assert len(merges) > textstats._BPE_SEGMENT_CHUNK  # multi-chunk regime
    seg = {
        r["token"]: r["symbols"]
        for r in textstats.bpe_segment(docs, "text", merges).collect()
    }
    state = {w: list(w) for w in wc}
    for a, b in merges:
        for w, syms in state.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            state[w] = out
    assert set(seg) == set(wc)
    for w, syms in seg.items():
        assert "".join(syms) == w
        assert syms == state[w], (w, syms, state[w])


def test_bpe_word_counts_excludes_frame_bytes(spark):
    """Tokens carrying the \\x01/\\x02 framing bytes would corrupt merge
    counting and segmentation; bpe_word_counts (the choke point both BPE
    stages share) must drop them."""
    docs = spark.createDataFrame(
        [(0, "good tok\x01en also\x02bad good")],
        "doc_id long, text string",
    )
    rows = {
        r["t"]: r["f"]
        for r in textstats.bpe_word_counts(docs, "text").collect()
    }
    assert rows == {"good": 2}


def test_bpe_train_partition_invariant(spark):
    docs = spark.createDataFrame(
        [(i, "remerge remerge merge merges") for i in range(20)],
        "doc_id long, text string",
    )
    a = textstats.bpe_train(docs, "text", merges=5).collect()
    b = textstats.bpe_train(docs.repartition(7), "text", merges=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_bpe_oracle_survives_merge_exhaustion(spark, tmp_path):
    """Regression (round-5 code review): a corpus whose tokens fully
    merge before the requested round count leaves later oracle rounds
    with an EMPTY argmax CTE — the original cross-join re-segmentation
    wiped the whole vocabulary, so bpe_vocab_coverage returned 0 rows
    while Spark returned real coverage. The left-join COALESCE form
    must carry the vocab through empty rounds; Spark and DuckDB must
    agree on BOTH rows of the E88 pair for such a corpus."""
    import duckdb

    from vectorsearch_image_embeddings_databricks_spark import registry

    from .oracle_utils import canonical, spark_result

    docs = spark.createDataFrame(
        [(0, "zz zz"), (1, "zz zz"), (2, "zz")],
        "doc_id long, text string",
    )
    sf_dir = str(tmp_path)
    docs.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    for name in ("bpe_train_merges", "bpe_vocab_coverage"):
        sdf = registry.QUERIES[name](spark, sf_dir)
        s_cols, s_rows = canonical(*spark_result(sdf))
        cur = con.execute(registry.ORACLE[name])
        d_cols, d_rows = canonical(
            [d[0] for d in cur.description], cur.fetchall()
        )
        assert s_cols == d_cols, name
        assert s_rows == d_rows, (name, s_rows, d_rows)
        assert s_rows, name  # non-trivial: coverage/merges must exist
    con.close()


def test_bpe_train_driver_tier_equals_distributed(spark):
    """The collected-word-counts merge loop (the 30k-merge production
    path) must produce EXACTLY the distributed tier's merge table; the
    cap guards the collect (hard error, not a silent OOM) and 'auto'
    picks by vocabulary size."""
    import pytest as _pytest

    text = "aaaa aaa low lower lowest banana bandana abab aab"
    docs = spark.createDataFrame(
        [(i, text) for i in range(4)], "doc_id long, text string"
    )
    dist = [tuple(r) for r in textstats.bpe_train(
        docs, "text", merges=8, strategy="distributed").collect()]
    drv = [tuple(r) for r in textstats.bpe_train(
        docs, "text", merges=8, strategy="driver").collect()]
    auto = [tuple(r) for r in textstats.bpe_train(
        docs, "text", merges=8, strategy="auto").collect()]
    assert dist == drv == auto
    with _pytest.raises(ValueError, match="driver_vocab_cap"):
        textstats.bpe_train(
            docs, "text", merges=2, strategy="driver", driver_vocab_cap=2
        )
    with _pytest.raises(ValueError, match="strategy"):
        textstats.bpe_train(docs, "text", strategy="gpu")


def test_temperature_quotas_alpha_half(spark):
    docs = spark.createDataFrame(
        [(i, "en") for i in range(100)] + [(i + 100, "fr") for i in range(25)],
        "doc_id long, lang string",
    )
    rows = {
        r["lang"]: r
        for r in sampling.temperature_quotas(docs, "lang", total=60).collect()
    }
    # weights: sqrt(100)=10, sqrt(25)=5 → quotas 60*2/3=40, 60*1/3=20
    assert rows["en"]["weight_micro"] == 10_000_000
    assert rows["fr"]["weight_micro"] == 5_000_000
    assert rows["en"]["quota"] == 40 and rows["fr"]["quota"] == 20
    # α=1/2 boosts the low-resource group vs proportional sampling
    assert rows["fr"]["quota"] / 60 > 25 / 125


def test_temperature_quota_sum_exact_by_largest_remainder(spark):
    """Floor-divided quotas undershoot the total; the largest-remainder
    redistribution must close the gap exactly, and no group may gain
    more than one extra slot."""
    docs = spark.createDataFrame(
        [(i, f"l{i % 7}") for i in range(500)], "doc_id long, lang string"
    )
    rows = sampling.temperature_quotas(docs, "lang", total=123).collect()
    assert sum(r["quota"] for r in rows) == 123
    for r in rows:
        assert r["weight_micro"] == math.floor(
            math.sqrt(r["n_docs"]) * 1_000_000
        )
        # base floor quota is within 1 of the corrected quota
        base = 123 * r["weight_micro"] // sum(
            x["weight_micro"] for x in rows
        )
        assert r["quota"] in (base, base + 1)


def test_temperature_quota_no_int64_overflow(spark):
    """total × weight_micro beyond int64 (weight ~1.4e6 × total 1e13 ≈
    1.4e19 > 2^63−1): the DECIMAL(38,0) path must return exact quotas
    where a BIGINT product would raise under ANSI or wrap."""
    small = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "doc_id long, lang string"
    )
    rows = sampling.temperature_quotas(
        small, "lang", total=10**13
    ).collect()
    assert sum(r["quota"] for r in rows) == 10**13


def test_event_transitions_hand_computed_and_tie_broken(spark):
    ev = spark.createDataFrame(
        [
            (1, 10, 1, "view"),
            (1, 20, 2, "click"),
            (1, 20, 3, "buy"),   # same ts as event 2 → id breaks the tie
            (2, 5, 4, "view"),
            (2, 6, 5, "view"),
        ],
        "user long, ts long, event_id long, state string",
    )
    got = {
        (r["from_state"], r["to_state"]): r["n_transitions"]
        for r in temporal.event_transitions(
            ev, "user", ["ts", "event_id"], "state"
        ).collect()
    }
    assert got == {
        ("view", "click"): 1,
        ("click", "buy"): 1,
        ("view", "view"): 1,
    }


def test_event_transitions_window_is_key_partitioned(spark):
    ev = spark.createDataFrame(
        [(1, 1, 1, "a")], "user long, ts long, event_id long, state string"
    )
    plan = temporal.event_transitions(
        ev, "user", ["ts", "event_id"], "state"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    # hashpartitioning on the entity key — never a single global sort
    assert "hashpartitioning(user" in plan


def _funnel(spark, rows, span=100):
    ev = spark.createDataFrame(
        rows, "user long, ts long, event_id long, state string"
    )
    return {
        (r["step"], r["step_name"]): r["n_entities"]
        for r in temporal.window_funnel(
            ev, "user", "ts", "event_id", "state",
            steps=["a", "b", "c"], span=span,
        ).collect()
    }


def test_window_funnel_full_and_partial_depths(spark):
    rows = [
        # user 1 completes a→b→c within span
        (1, 0, 1, "a"), (1, 10, 2, "b"), (1, 20, 3, "c"),
        # user 2 reaches b only (c out of order: before b)
        (2, 0, 4, "a"), (2, 5, 5, "c"), (2, 10, 6, "b"),
        # wait — user 2's c at ts=5 precedes b, but a later c would count;
        # none exists → depth 2
        # user 3: never does step a → depth 0, appears in no step count
        (3, 0, 7, "b"), (3, 10, 8, "c"),
    ]
    got = _funnel(spark, rows)
    assert got == {(1, "a"): 2, (2, "b"): 2, (3, "c"): 1}


def test_window_funnel_span_expiry_and_first_match(spark):
    rows = [
        # first 'a' at ts=0 anchors the window; the b at ts=150 is outside
        # span=100 even though a second 'a' at ts=120 would fit — first-match
        # semantics never re-anchor
        (1, 0, 1, "a"), (1, 120, 2, "a"), (1, 150, 3, "b"),
        # strict ordering: b at the SAME ts as a does not advance
        (2, 0, 4, "a"), (2, 0, 5, "b"), (2, 1, 6, "b"),
    ]
    got = _funnel(spark, rows)
    assert got == {(1, "a"): 2, (2, "b"): 1, (3, "c"): 0}


def test_window_funnel_is_single_corpus_pass(spark):
    ev = spark.createDataFrame(
        [(1, 0, 1, "a")], "user long, ts long, event_id long, state string"
    )
    plan = temporal.window_funnel(
        ev, "user", "ts", "event_id", "state", ["a", "b"], 10
    )._jdf.queryExecution().optimizedPlan().toString()
    # the corpus appears exactly once: no per-step self-joins
    assert plan.count("LogicalRDD") == 1


def test_integer_zscore_outliers_hand_computed(spark):
    from vectorsearch_image_embeddings_databricks_spark.operators.quantiles import (
        integer_zscore_outliers,
    )

    ev = spark.createDataFrame(
        # group 1: nine 10s and one 100 — the 100 is > 2σ out
        [(1, 10)] * 9 + [(1, 100)]
        # group 2: constant values — σ = 0, x = μ, strict > keeps 0 outliers
        + [(2, 5)] * 4,
        "g long, cents long",
    )
    got = {
        r["g"]: (r["n_events"], r["n_outliers"])
        for r in integer_zscore_outliers(ev, "g", "cents", k=2).collect()
    }
    assert got == {1: (10, 1), 2: (4, 0)}


def test_integer_zscore_matches_float_formula(spark):
    import statistics

    from vectorsearch_image_embeddings_databricks_spark.operators.quantiles import (
        integer_zscore_outliers,
    )

    vals = [3, 14, 15, 92, 65, 35, 89, 79, 32, 38, 46]
    ev = spark.createDataFrame([(1, v) for v in vals], "g long, cents long")
    n_out = integer_zscore_outliers(ev, "g", "cents", k=2).collect()[0][
        "n_outliers"
    ]
    mu = statistics.mean(vals)
    sigma = statistics.pstdev(vals)
    expect = sum(1 for v in vals if abs(v - mu) > 2 * sigma)
    assert n_out == expect


def test_char_entropy_hand_computed(spark):
    import math

    docs = spark.createDataFrame(
        [(0, "aaaa"), (1, "ab"), (2, "abcd"), (3, "")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in textstats.char_entropy(docs, "doc_id", "text").collect()
    }
    assert 3 not in got  # empty doc dropped
    assert got[0]["entropy_micro"] == 0  # single symbol → zero entropy
    assert got[1]["entropy_micro"] == math.floor(math.log(2) * 1e6)
    assert got[2]["entropy_micro"] == math.floor(math.log(4) * 1e6)
    assert got[2]["n_distinct_chars"] == 4 and got[2]["n_chars_total"] == 4


def test_char_entropy_matches_python_float_fold(spark):
    import math
    from collections import Counter

    text = "the quick brown fox jumps over the lazy dog"
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    row = textstats.char_entropy(docs, "doc_id", "text").collect()[0]
    cnts = Counter(text)
    n = sum(cnts.values())
    s = 0.0
    for c in sorted(cnts):  # the operator's sorted fold order
        s += float(cnts[c]) * math.log(float(cnts[c]))
    expect = math.floor((math.log(float(n)) - s / n) * 1e6)
    assert row["entropy_micro"] == expect
