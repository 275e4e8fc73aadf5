"""Property-based tests (SURVEY.md §5 layer 3): metric equivalences,
dedup idempotence, RRF symmetry, shingle invariants — each property
evaluated through the real Spark expressions on hypothesis-generated data
(small example counts: every example is a Spark job)."""

from __future__ import annotations

import math

from hypothesis import assume, given, settings, strategies as st

from pyspark.sql import functions as F

from vectorsearch_image_embeddings_databricks_spark.functions.text import word_shingles
from vectorsearch_image_embeddings_databricks_spark.functions.vector import (
    cosine_similarity,
    dot,
    l2_dist,
    l2_normalize,
)
from vectorsearch_image_embeddings_databricks_spark.operators import dedup

FLOATS = st.floats(
    min_value=-100.0, max_value=100.0, allow_nan=False, allow_infinity=False
)
VEC = st.lists(FLOATS, min_size=2, max_size=8)


@settings(max_examples=10, deadline=None)
@given(v=VEC.filter(lambda xs: sum(x * x for x in xs) > 1e-6))
def test_cosine_self_is_one(spark, v):
    df = spark.createDataFrame([(v, v)], "a array<double>, b array<double>")
    got = df.select(cosine_similarity("a", "b").alias("c")).collect()[0]["c"]
    assert math.isclose(got, 1.0, abs_tol=1e-9)


@settings(max_examples=8, deadline=None)
@given(
    vs=st.integers(2, 6).flatmap(
        lambda d: st.lists(
            st.lists(FLOATS, min_size=d, max_size=d).filter(
                lambda xs: sum(x * x for x in xs) > 1e-6
            ),
            min_size=3,
            max_size=6,
        )
    ),
)
def test_ranking_invariant_under_metric_choice_for_unit_vectors(spark, vs):
    """SURVEY §1.4: for unit vectors, cosine / dot / negative-L2 produce
    the same ranking against any query (near-ties below float precision
    are excluded — the equivalence is about ordering, not ulp behavior)."""
    # exclude examples whose true cosines are closer than float noise
    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    uq = unit(vs[0])
    cosines = [sum(a * b for a, b in zip(unit(v), uq)) for v in vs]
    gaps = [
        abs(a - b)
        for i, a in enumerate(cosines)
        for b in cosines[i + 1:]
    ]
    assume(min(gaps) > 1e-6)

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vs)], "id int, v array<double>"
    ).select("id", l2_normalize("v").alias("v"))
    qn = df.filter(F.col("id") == 0).collect()[0]["v"]
    lit_q = F.array(*[F.lit(float(x)) for x in qn])
    scored = df.select(
        "id",
        cosine_similarity("v", lit_q).alias("cos"),
        dot("v", lit_q).alias("dp"),
        (-l2_dist("v", lit_q)).alias("nl2"),
    ).collect()
    by_cos = [r["id"] for r in sorted(scored, key=lambda r: (-r["cos"], r["id"]))]
    by_dot = [r["id"] for r in sorted(scored, key=lambda r: (-r["dp"], r["id"]))]
    by_nl2 = [r["id"] for r in sorted(scored, key=lambda r: (-r["nl2"], r["id"]))]
    assert by_cos == by_dot == by_nl2


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.sampled_from(["x", "y", "z"])),
        min_size=1,
        max_size=12,
    )
)
def test_dedup_exact_idempotent_and_minimal(spark, rows):
    df = spark.createDataFrame(
        [(i, k) for i, (_, k) in enumerate(rows)], "id long, k string"
    )
    once = dedup.dedup_exact(df, keys=["k"], id_col="id").select("id", "k")
    twice = dedup.dedup_exact(once, keys=["k"], id_col="id").select("id", "k")
    got_once = sorted(tuple(r) for r in once.collect())
    got_twice = sorted(tuple(r) for r in twice.collect())
    assert got_once == got_twice  # idempotent
    # exactly one representative per key, and it is the min id
    want = {}
    for i, (_, k) in enumerate(rows):
        want.setdefault(k, i)
    assert got_once == sorted((i, k) for k, i in want.items())


@settings(max_examples=8, deadline=None)
@given(
    text=st.text(
        alphabet=st.sampled_from("ab cd"), min_size=0, max_size=40
    ),
    n=st.integers(2, 4),
)
def test_word_shingle_invariants(spark, text, n):
    df = spark.createDataFrame([(text,)], "t string")
    sh = df.select(word_shingles("t", n=n).alias("s")).collect()[0]["s"]
    toks = [w for w in text.split(" ") if w]
    # count: distinct over max(len-n+1, 1) windows; always ≥1
    assert 1 <= len(sh) <= max(len(toks) - n + 1, 1)
    # each shingle has at most n words, drawn from the doc's tokens
    for s in sh:
        ws = [w for w in s.split(" ") if w]
        assert len(ws) <= n
        assert all(w in toks for w in ws) or s == ""


def test_rrf_fusion_is_symmetric(spark):
    from vectorsearch_image_embeddings_databricks_spark.operators.hybrid import (
        rrf_fuse,
    )

    a = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "id long, rank int"
    )
    b = spark.createDataFrame(
        [(3, 1), (4, 2), (1, 3)], "id long, rank int"
    )
    ab = {r["id"]: r["rrf_score"] for r in rrf_fuse(a, b, "id").collect()}
    ba = {r["id"]: r["rrf_score"] for r in rrf_fuse(b, a, "id").collect()}
    assert ab.keys() == ba.keys()
    for k in ab:
        assert math.isclose(ab[k], ba[k], rel_tol=1e-12)


def test_bm25_matches_pure_python_reference(spark):
    """The Catalyst BM25 expression must equal a from-scratch Python BM25
    on the same corpus (tighter than a SQL oracle: zero tolerance beyond
    float addition order)."""
    import math as m

    from vectorsearch_image_embeddings_databricks_spark.operators.hybrid import (
        bm25_scores,
    )

    corpus = [
        (0, "spark join scan join"),
        (1, "vector search with vector index"),
        (2, "the quick brown fox"),
        (3, ""),
        (4, "join"),
        (5, "scan scan scan scan scan vector"),
    ]
    terms = ["vector", "join", "scan"]
    k1, b = 1.2, 0.75
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        r["id"]: r["score"]
        for r in bm25_scores(docs, "doc_id", "text", terms).collect()
    }

    toks = {i: [w for w in t.split(" ") if w] for i, t in corpus}
    N = len(corpus)
    avgdl = sum(len(v) for v in toks.values()) / N
    dfs = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    for i, _ in corpus:
        want = 0.0
        for t in terms:
            tf = toks[i].count(t)
            idf = m.log(1 + (N - dfs[t] + 0.5) / (dfs[t] + 0.5))
            want += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(toks[i]) / avgdl))
        assert abs(got[i] - want) < 1e-9, (i, got[i], want)
    # sanity: the all-scan doc tops a 'scan' ranking
    assert max(got, key=lambda i: got[i]) == 5


def test_approx_sketches_within_documented_error(spark):
    """HLL++ distinct estimates within rsd bound; quantile sketch within
    rank accuracy of the exact percentile — checked against exact
    recomputations on the fixture."""
    from vectorsearch_image_embeddings_databricks_spark import registry
    from .conftest import SF_SMALL

    got = {
        r["event_type"]: r
        for r in registry.QUERIES["approx_sketch_stats"](spark, SF_SMALL).collect()
    }
    ev = registry.load_events(spark, SF_SMALL)
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("p50"),
        )
        .collect()
    }
    for et, row in got.items():
        ex = exact[et]
        # the query now carries its own verification columns (the partial
        # oracle hashes them); confirm they assert what this test used to
        assert row["exact_users"] == ex["users"]
        assert row["users_within_5pct"] is True
        assert row["p50_within_tol"] is True
        assert row["p50_micro"] == math.floor(ex["p50"] * 1e6)


def test_rolling_fingerprints_position_invariant_overlap(spark):
    """The defining property of content-defined rolling-hash selection:
    a shared substring yields the SAME fingerprints wherever it sits, so
    partially-overlapping docs share exactly the overlap's fingerprints."""
    from vectorsearch_image_embeddings_databricks_spark.functions.text import rolling_fingerprints

    shared = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, "PREFIX-" * 10 + shared),
        (2, shared + "-SUFFIX" * 10),
        (3, shared),
        (4, "completely unrelated content with no overlap at all zzz qqq"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    fps = {
        r["id"]: set(r["fps"])
        for r in df.select(
            "id", rolling_fingerprints("text").alias("fps")
        ).collect()
    }
    # every interior fingerprint of the bare shared string appears in both
    # embeddings of it (edge grams straddling the boundary may differ)
    assert fps[3], "selection produced no fingerprints for the shared text"
    assert fps[3] <= fps[1] and fps[3] <= fps[2]
    # overlap detectable via fingerprint intersection; unrelated doc is not
    assert fps[1] & fps[2] >= fps[3]
    assert not (fps[3] & fps[4])
    # deterministic
    again = {
        r["id"]: set(r["fps"])
        for r in df.select(
            "id", rolling_fingerprints("text").alias("fps")
        ).collect()
    }
    assert again == fps


def test_pack_bins_respect_budget_overflow_bound(spark):
    """Every bin's token total must be <= budget + (max_doc_tokens - 1);
    docs longer than the budget open their own bin; the assignment is a
    pure function of (id, tokens)."""
    from vectorsearch_image_embeddings_databricks_spark.operators import packing

    rows = [(i, 10 + (i * 37) % 120) for i in range(200)] + [
        (1000, 500),  # oversized: longer than the budget
    ]
    df = spark.createDataFrame(rows, ["doc_id", "tokens"])
    budget = 128
    rep = packing.pack_report(df, "doc_id", "tokens", budget=budget).collect()
    max_doc = max(t for _, t in rows)
    for r in rep:
        assert r["token_sum"] <= budget + max_doc - 1
    # oversized doc is alone in its bin
    man = packing.pack_manifest(df, "doc_id", "tokens", budget=budget)
    big_bin = man.filter("doc_id = 1000").collect()[0]["bin_id"]
    assert man.filter(f"bin_id = {big_bin}").count() == 1
    # deterministic across recomputation and repartitioning
    a = sorted(map(tuple, man.collect()))
    b = sorted(map(tuple, packing.pack_manifest(
        df.repartition(7), "doc_id", "tokens", budget=budget).collect()))
    assert a == b


def test_mixture_rebalance_hits_target_shares(spark):
    """The sampled mixture must match the target shares (floor rounding)
    and the binding stratum must be kept ~in full; unlisted strata drop
    to zero."""
    from vectorsearch_image_embeddings_databricks_spark.operators.sampling import (
        mixture_rebalance_plan,
    )

    rows = (
        [(i, "en") for i in range(600)]
        + [(i + 1000, "de") for i in range(100)]
        + [(i + 2000, "xx") for i in range(50)]
    )
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    plan = {r["lang"]: r for r in mixture_rebalance_plan(
        df, "lang", {"en": 800_000, "de": 200_000}
    ).collect()}
    # de is binding: 100 docs for a 20% share -> total budget 500
    assert plan["de"]["n_keep"] == 100
    assert plan["en"]["n_keep"] == 400
    assert plan["xx"]["n_keep"] == 0 and plan["xx"]["rate_micro"] == 0
    # achieved shares: 400/500 and 100/500
    total = sum(p["n_keep"] for p in plan.values())
    assert plan["en"]["n_keep"] * 1_000_000 // total == 800_000


def test_redact_patterns_scrubs_planted_pii(spark):
    """Emails, URLs, and long digit runs are redacted; clean text is
    untouched; pattern_counts counts each family independently."""
    from pyspark.sql import functions as F
    from vectorsearch_image_embeddings_databricks_spark.functions.text import (
        pattern_counts,
        redact_patterns,
    )

    rows = [
        (0, "contact bob.smith+x@example.co.uk or call 12345678 now"),
        (1, "see https://example.com/a?b=c for details"),
        (2, "perfectly clean text with no identifiers"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            redact_patterns("text").alias("red"),
            *pattern_counts("text"),
        ).collect()
    }
    assert "@" not in out[0]["red"] and "12345678" not in out[0]["red"]
    assert out[0]["n_email"] == 1 and out[0]["n_long_digits"] == 1
    assert "https://" not in out[1]["red"] and out[1]["n_url"] == 1
    assert out[2]["red"] == rows[2][1]
    assert out[2]["n_email"] == out[2]["n_url"] == out[2]["n_long_digits"] == 0


def test_repetition_ratio_flags_looping_text(spark):
    """Degenerate looping text scores high; all-distinct text scores 0;
    short docs don't divide by zero."""
    from pyspark.sql import functions as F
    from vectorsearch_image_embeddings_databricks_spark.functions.text import (
        repetition_ratio,
    )

    rows = [
        (0, " ".join(["spam ham eggs"] * 20)),          # loops hard
        (1, " ".join(f"w{i}" for i in range(30))),      # all distinct
        (2, "tiny"),                                     # < n tokens
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    got = {
        r["id"]: r["rep"]
        for r in df.select(
            "id", repetition_ratio("text", 3).alias("rep")
        ).collect()
    }
    assert got[0] > 0.9
    assert got[1] == 0.0
    assert got[2] == 0.0


@settings(max_examples=6, deadline=None)
@given(
    tokens=st.lists(st.integers(min_value=1, max_value=400), min_size=1, max_size=60),
    budget=st.integers(min_value=16, max_value=256),
)
def test_pack_manifest_invariants_hold_for_any_corpus(spark, tokens, budget):
    """For arbitrary token-count corpora: every doc is assigned exactly
    once, and every bin total respects budget + max_doc - 1."""
    from vectorsearch_image_embeddings_databricks_spark.operators import packing

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(tokens)], ["doc_id", "tokens"]
    )
    man = packing.pack_manifest(df, "doc_id", "tokens", budget=budget).collect()
    assert sorted(r["doc_id"] for r in man) == list(range(len(tokens)))
    totals = {}
    for r in man:
        totals[r["bin_id"]] = totals.get(r["bin_id"], 0) + r["tokens"]
    bound = budget + max(tokens) - 1
    assert all(t <= bound for t in totals.values())


@settings(max_examples=6, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=1, max_size=40), min_size=2, max_size=12
    )
)
def test_remove_contaminated_leaves_no_flagged_overlap(spark, texts):
    """After remove_contaminated, re-running contamination_pairs on the
    survivors finds nothing — the closure property of the sweep."""
    from vectorsearch_image_embeddings_databricks_spark.operators import decontam

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    test = df.filter("doc_id % 3 = 0")
    train = df.filter("doc_id % 3 != 0")
    kept = decontam.remove_contaminated(
        train, test, "doc_id", "text", n=2, min_shared=1
    )
    left = decontam.contamination_pairs(
        kept, test, "doc_id", "text", n=2, min_shared=1
    ).collect()
    assert left == []


def test_unigram_nll_ranks_rare_token_docs_as_tail(spark):
    """Docs made of corpus-rare tokens must score higher NLL (tail
    bucket) than docs of corpus-frequent tokens (head bucket)."""
    from vectorsearch_image_embeddings_databricks_spark.operators.textstats import (
        unigram_nll,
    )

    common = "the cat sat on the mat"
    rows = (
        [(i, common) for i in range(6)]              # frequent tokens
        + [(10 + i, f"zq{i}x wv{i}k jj{i}m") for i in range(3)]  # rare
    )
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["id"]: r for r in unigram_nll(df, "doc_id", "text").collect()}
    common_nll = max(out[i]["nll"] for i in range(6))
    rare_nll = min(out[10 + i]["nll"] for i in range(3))
    assert rare_nll > common_nll
    # ntile(3) over 9 docs: the 6 low-NLL docs fill buckets 1-2, the
    # rare-token docs are exactly the tail bucket
    assert all(out[i]["bucket"] in (1, 2) for i in range(6))
    assert all(out[10 + i]["bucket"] == 3 for i in range(3))


def test_deterministic_shuffle_is_stable_and_seed_sensitive(spark):
    from vectorsearch_image_embeddings_databricks_spark.operators.sampling import (
        deterministic_shuffle,
    )

    df = spark.range(200).withColumnRenamed("id", "k")
    a = [r["k"] for r in deterministic_shuffle(df, "k", seed=1).collect()]
    b = [r["k"] for r in deterministic_shuffle(df.repartition(7), "k", seed=1).collect()]
    c = [r["k"] for r in deterministic_shuffle(df, "k", seed=2).collect()]
    assert a == b            # partitioning-independent
    assert a != c            # epochs differ
    assert sorted(a) == list(range(200))  # a permutation


def test_distributed_ntile_matches_builtin_ntile(spark):
    """distributed_ntile must be bit-identical to ntile() OVER (ORDER BY)
    for awkward (N, n_buckets) combos — including N < n, N % n != 0, and
    heavy ties on the primary order column (the unique tiebreak makes the
    order total)."""
    from pyspark.sql import Window

    from vectorsearch_image_embeddings_databricks_spark.operators.textstats import (
        distributed_ntile,
    )

    for n_rows, n_buckets in ((1, 3), (2, 3), (7, 3), (30, 4), (100, 7)):
        df = spark.range(n_rows).select(
            F.col("id"), (F.col("id") % 5).alias("v")
        )
        w = Window.orderBy("v", "id")
        want = {
            (r["id"]): r["b"]
            for r in df.withColumn("b", F.ntile(n_buckets).over(w)).collect()
        }
        got = {
            (r["id"]): r["bucket"]
            for r in distributed_ntile(df, ["v", "id"], n_buckets).collect()
        }
        assert got == want, (n_rows, n_buckets)


@settings(max_examples=8, deadline=None)
@given(
    n_tokens=st.integers(0, 40),
    window=st.integers(1, 12),
    stride_frac=st.integers(1, 12),
)
def test_chunk_tokens_coverage_and_count_invariants(
    spark, n_tokens, window, stride_frac
):
    """For ANY (n, window, stride): chunk count matches the closed-form
    1 + ceil(max(n-W,0)/S); every token position is covered by at least
    one chunk; every chunk is non-empty except the single chunk of an
    empty doc; chunk token counts are exact."""
    from vectorsearch_image_embeddings_databricks_spark.operators.packing import (
        chunk_tokens,
    )

    stride = min(stride_frac, window)  # stride ≤ window (overlap or abut)
    text = " ".join(f"t{i}" for i in range(n_tokens))
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    rows = sorted(
        (r["chunk_id"], r["n_chunk_tokens"], r["chunk_text"])
        for r in chunk_tokens(
            df, "doc_id", "text", window=window, stride=stride
        ).collect()
    )
    want_nc = 1 + max(0, -(-(n_tokens - window) // stride)) if n_tokens > window else 1
    assert len(rows) == want_nc
    covered = set()
    for cid, nct, ctext in rows:
        toks = [t for t in ctext.split(" ") if t]
        assert len(toks) == nct
        start = cid * stride
        assert toks == [f"t{i}" for i in range(start, start + nct)]
        covered.update(range(start, start + nct))
    assert covered == set(range(n_tokens))


# ------------------------------------------------------------------ #
# round-3 algorithmic operators
# ------------------------------------------------------------------ #

EDGE_SETS = st.sets(
    st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(
        lambda e: e[0] < e[1]
    ),
    min_size=1,
    max_size=20,
)


@settings(max_examples=8, deadline=None)
@given(edges=EDGE_SETS)
def test_triangle_count_matches_bruteforce(spark, edges):
    """Degree-oriented count == brute-force enumeration on random
    graphs (orientation invariance, the property the oracle relies on)."""
    from itertools import combinations

    from vectorsearch_image_embeddings_databricks_spark.operators.graph import (
        triangle_count,
    )

    es = set(edges)
    nodes = {x for e in es for x in e}
    brute = sum(
        1
        for a, b, c in combinations(sorted(nodes), 3)
        if (a, b) in es and (a, c) in es and (b, c) in es
    )
    df = spark.createDataFrame(sorted(es), ["src", "dst"])
    r = triangle_count(df).collect()[0]
    assert r["n_triangles"] == brute
    assert r["n_edges"] == len(es)


@settings(max_examples=6, deadline=None)
@given(edges=EDGE_SETS)
def test_pagerank_invariants(spark, edges):
    """Every rank >= BASE; total rank never exceeds the initial mass
    (damping + dangling nodes only ever LEAK mass in the unnormalized
    variant); an edgeless vertex set would sit exactly at BASE."""
    from vectorsearch_image_embeddings_databricks_spark.operators.graph import (
        SCALE,
        pagerank,
    )

    df = spark.createDataFrame(
        [(str(a), str(b)) for a, b in sorted(edges)], ["src", "dst"]
    )
    rows = pagerank(df, iters=2).collect()
    base = (SCALE * 3) // 20
    n = len(rows)
    assert all(r["rank_scaled"] >= base for r in rows)
    assert sum(r["rank_scaled"] for r in rows) <= n * SCALE


@settings(max_examples=8, deadline=None)
@given(
    vals=st.lists(st.integers(0, 1000), min_size=2, max_size=40),
)
def test_winsorized_stats_matches_python_reference(spark, vals):
    """Distributed grouped winsorization == the plain single-node
    definition: clamp to the ceil(n/20)-th / ceil(19n/20)-th order
    statistics, sum."""
    import math as _math

    from vectorsearch_image_embeddings_databricks_spark.operators.quantiles import (
        winsorized_stats,
    )

    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate(vals)], ["grp", "id", "v"]
    )
    out = winsorized_stats(df, "grp", "v", "id").collect()[0]
    s = sorted(vals)
    n = len(s)
    lo = s[_math.ceil(n / 20) - 1]
    hi = s[_math.ceil(19 * n / 20) - 1]
    assert (out["lo_bound"], out["hi_bound"]) == (lo, hi)
    assert out["sum_winsorized"] == sum(min(max(v, lo), hi) for v in vals)
    assert out["n"] == n


@settings(max_examples=8, deadline=None)
@given(
    words=st.lists(
        st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]),
        min_size=1,
        max_size=40,
    )
)
def test_cms_estimate_dominates_truth_for_any_stream(spark, words):
    from collections import Counter

    from vectorsearch_image_embeddings_databricks_spark.operators import sketch

    toks = spark.createDataFrame([(w,) for w in words], "t string")
    sk = sketch.cms_build(toks, "t", depth=3, width=8)  # narrow → collisions
    est = {
        r["t"]: r["cms_estimate"]
        for r in sketch.cms_estimate(
            sk, toks.select("t").distinct(), "t", 3, 8
        ).collect()
    }
    truth = Counter(words)
    assert all(est[w] >= c for w, c in truth.items())
    # total mass conservation per depth row: Σ cells == |stream|
    rows = sk.collect()
    for j in range(3):
        assert sum(r["cnt"] for r in rows if r["j"] == j) == len(words)


@settings(max_examples=8, deadline=None)
@given(
    vals=st.lists(st.integers(0, 10_000), min_size=2, max_size=60),
)
def test_zscore_outliers_respect_chebyshev_bound(spark, vals):
    from vectorsearch_image_embeddings_databricks_spark.operators.quantiles import (
        integer_zscore_outliers,
    )

    ev = spark.createDataFrame([(1, v) for v in vals], "g long, cents long")
    row = integer_zscore_outliers(ev, "g", "cents", k=2).collect()[0]
    # Chebyshev: P(|x−μ| > kσ) ≤ 1/k² → strictly fewer than n/4 outliers
    # can exceed 2σ (equality impossible under the strict > test)
    assert row["n_outliers"] <= len(vals) // 4
    assert row["n_events"] == len(vals)


@settings(max_examples=6, deadline=None)
@given(
    spans=st.integers(1, 200),
    seed=st.integers(0, 5),
)
def test_window_funnel_depth_monotone_in_span(spark, spans, seed):
    import random

    from vectorsearch_image_embeddings_databricks_spark.operators import temporal

    rng = random.Random(seed)
    rows = [
        (1, i * 10 + rng.randint(0, 5), i, rng.choice(["a", "b", "c", "x"]))
        for i in range(12)
    ]
    ev = spark.createDataFrame(
        rows, "user long, ts long, event_id long, state string"
    )

    def depth(span):
        out = {
            r["step"]: r["n_entities"]
            for r in temporal.window_funnel(
                ev, "user", "ts", "event_id", "state", ["a", "b", "c"], span
            ).collect()
        }
        return max((s for s, n in out.items() if n > 0), default=0)

    # a wider window can only deepen the funnel (first-match anchor is
    # span-independent: it is the first step-1 event)
    assert depth(spans) <= depth(spans + 50)


@settings(max_examples=8, deadline=None)
@given(
    counts=st.lists(st.integers(1, 400), min_size=1, max_size=6),
    total=st.integers(10, 500),
)
def test_temperature_quota_sum_and_order_preservation(spark, counts, total):
    from vectorsearch_image_embeddings_databricks_spark.operators.sampling import (
        temperature_quotas,
    )

    rows = [
        (i, f"l{g}") for g, n in enumerate(counts) for i in range(n)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    out = {
        r["lang"]: r for r in temperature_quotas(docs, "lang", total).collect()
    }
    assert sum(r["quota"] for r in out.values()) <= total
    # bigger groups never get smaller quotas beyond the single
    # largest-remainder unit: the sqrt weight (hence the base quota) is
    # monotone in n_docs, but the shortfall is redistributed as +1
    # units by remainder rank (ties to the smaller group value), so a
    # smaller-or-equal group can legitimately sit exactly one above a
    # larger one (hypothesis found counts=[1,1,1], total=10 → quotas
    # 4,3,3 — the old strict-sort assertion was wrong, not the
    # operator)
    for a in out.values():
        for b in out.values():
            if a["n_docs"] < b["n_docs"]:
                assert a["quota"] <= b["quota"] + 1


@settings(max_examples=6, deadline=None)
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c"]), min_size=0, max_size=14
        ).map(" ".join),
        min_size=2,
        max_size=5,
    )
)
def test_exact_substring_dedup_matches_bruteforce(spark, texts):
    import hashlib

    K = 4
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_covered"], r["clean_md5"])
        for r in dedup.exact_substring_dedup(
            docs, "doc_id", "text", k=K
        ).collect()
    }
    # brute force: every K-gram seen in ≥2 docs covers its span
    toks = {i: t.split() if t else [] for i, t in enumerate(texts)}
    toks = {i: [w for w in ws if w] for i, ws in toks.items()}
    owners: dict[tuple, set] = {}
    for i, ws in toks.items():
        for p in range(len(ws) - K + 1):
            owners.setdefault(tuple(ws[p : p + K]), set()).add(i)
    for i, ws in toks.items():
        cov = set()
        for p in range(len(ws) - K + 1):
            if len(owners[tuple(ws[p : p + K])]) >= 2:
                cov.update(range(p, p + K))
        kept = " ".join(w for j, w in enumerate(ws) if j not in cov)
        expect = (
            len(ws),
            len(cov),
            hashlib.md5(kept.encode()).hexdigest(),
        )
        assert got[i] == expect, (i, texts)


@settings(max_examples=6, deadline=None)
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["p", "q", "r"]), min_size=0, max_size=10
        ).map(" ".join),
        min_size=2,
        max_size=5,
    )
)
def test_segment_dedup_matches_bruteforce(spark, texts):
    import hashlib

    SEG, MAXDF = 3, 1
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_segs"], r["n_kept"], r["clean_md5"])
        for r in dedup.segment_dedup(
            docs, "doc_id", "text", seg_len=SEG, max_df=MAXDF
        ).collect()
    }
    toks = {
        i: [w for w in (t.split() if t else []) if w]
        for i, t in enumerate(texts)
    }
    segs = {
        i: [
            " ".join(ws[j * SEG : (j + 1) * SEG])
            for j in range((len(ws) + SEG - 1) // SEG)
        ]
        for i, ws in toks.items()
    }
    dfreq: dict[str, set] = {}
    for i, ss in segs.items():
        for s_ in ss:
            dfreq.setdefault(s_, set()).add(i)
    for i, ss in segs.items():
        if not toks[i]:
            assert i not in got  # token-less docs drop out
            continue
        kept = [s_ for s_ in ss if len(dfreq[s_]) <= MAXDF]
        expect = (
            len(ss),
            len(kept),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )
        assert got[i] == expect, (i, texts)
