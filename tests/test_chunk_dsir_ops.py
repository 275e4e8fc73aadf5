"""Round-3 LLM-pipeline additions: fixed-window chunking, DSIR
importance weighting, keep-best dedup, vocabulary coverage — operator
semantics pinned on hand-computable fixtures, plan shapes pinned on the
registry queries (the oracle hashes are the cross-engine layer)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from vectorsearch_image_embeddings_databricks_spark import registry
from vectorsearch_image_embeddings_databricks_spark.operators import dedup
from vectorsearch_image_embeddings_databricks_spark.operators.packing import (
    chunk_tokens,
)
from vectorsearch_image_embeddings_databricks_spark.operators.textstats import (
    dsir_logratio,
    oov_stats,
)

from .conftest import SF_SMALL


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_chunk_tokens_exact_coverage(spark):
    """Chunk boundaries by hand: 7 tokens at window=3, stride=2 →
    nc = 1 + ceil((7−3)/2) = 3, starts 0,2,4 — the last window reaches
    token 7 so every token is covered with no ragged tail; 8 tokens →
    nc = 4 with a short remainder chunk; empty and sub-window docs give
    exactly one chunk."""
    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x y"), (3, ""), (4, "a b c d e f g h")],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["chunk_id"]): (r["n_chunk_tokens"], r["chunk_text"])
        for r in chunk_tokens(df, "doc_id", "text", window=3, stride=2).collect()
    }
    assert got == {
        (1, 0): (3, "a b c"),
        (1, 1): (3, "c d e"),
        (1, 2): (3, "e f g"),
        (2, 0): (2, "x y"),
        (3, 0): (0, ""),
        (4, 0): (3, "a b c"),
        (4, 1): (3, "c d e"),
        (4, 2): (3, "e f g"),
        (4, 3): (2, "g h"),
    }


def test_chunk_documents_plan_is_shuffle_free(spark):
    """scan → generate → project: no aggregation/join exchange anywhere
    (the loader's round-robin decoupling exchange is the one allowed
    Exchange kind)."""
    plan = _plan(registry.QUERIES["chunk_documents"](spark, SF_SMALL))
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange SinglePartition" not in plan
    assert "Generate" in plan  # the posexplode


def test_dsir_separates_target_like_documents(spark):
    """Docs made of target-only tokens must outscore docs of
    source-only tokens; mixed docs sit between."""
    rows = [
        (0, "alpha beta alpha beta", 1),
        (1, "alpha beta beta alpha", 1),
        (2, "gamma delta gamma delta", 0),
        (3, "gamma delta delta gamma", 0),
        (4, "alpha beta gamma delta", 0),
    ]
    df = spark.createDataFrame(rows, "id long, text string, is_t int")
    got = {
        r["id"]: r["logratio"]
        for r in dsir_logratio(
            df, "id", "text", target_pred=(F.col("is_t") == 1)
        ).collect()
    }
    assert got[0] > got[4] > got[2]
    assert abs(got[0] - got[1]) < 1e-12  # same bag → same score
    assert got[2] < 0 < got[0]  # log-ratio signs split by domain


def test_dedup_keep_best_argmax_policy(spark):
    """Highest score wins; ties break to the smallest id; singletons keep
    themselves; one row per key."""
    rows = [
        (1, "k1", 10),
        (2, "k1", 30),
        (3, "k1", 30),
        (4, "k2", 5),
    ]
    df = spark.createDataFrame(rows, "id long, k string, s long")
    got = {
        r["dup_key"]: (r["best_id"], r["dup_count"], r["best_score"])
        for r in dedup.dedup_keep_best(
            df, key=F.col("k"), id_col="id", score=F.col("s")
        ).collect()
    }
    assert got == {"k1": (2, 3, 30), "k2": (4, 1, 5)}


def test_dedup_keep_best_plan_single_aggregate_no_window(spark):
    """The argmax must be ONE key-shuffle aggregate — no Window stage,
    no self-join (the naive rank-and-filter formulation)."""
    plan = _plan(registry.QUERIES["dedup_keep_best"](spark, SF_SMALL))
    assert "Window" not in plan.split("\n\n")[0]
    assert plan.count("hashpartitioning(") == 1  # exactly one key shuffle
    assert "partial_max" in plan  # map-side combine before the exchange
    assert "SortMergeJoin" not in plan and "Join" not in plan.split("\n\n")[0]


def test_vocab_oov_plan_broadcasts_topk_vocab(spark):
    """The vocabulary must be a pre-exchange top-k
    (TakeOrderedAndProject) that reaches the corpus as a broadcast —
    never a sort-merge join on the token key."""
    plan = _plan(registry.QUERIES["vocab_oov_stats"](spark, SF_SMALL))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_oov_stats_counts_by_hand(spark):
    """vocab_size=1 keeps only the modal token ('a', count desc then
    token asc tie-break); everything else is OOV."""
    df = spark.createDataFrame(
        [(0, "a a b", "g1"), (1, "a c", "g2")],
        "id long, text string, grp string",
    )
    got = {
        r["grp"]: (r["n_tokens"], r["n_oov"], r["oov_micro"])
        for r in oov_stats(df, "id", "text", "grp", vocab_size=1).collect()
    }
    assert got == {"g1": (3, 1, 333333), "g2": (2, 1, 500000)}


def test_repetition_metrics_planted_values(spark):
    """Hand-computable docs: a fully repeated doc maxes dup_word_micro;
    an all-distinct doc scores 0; top-bigram share counts the most
    frequent adjacent pair; <2-token docs are dropped."""
    from vectorsearch_image_embeddings_databricks_spark.operators.textstats import (
        repetition_metrics,
    )

    rows = [
        (0, "a a a a"),            # 4 tokens, 1 distinct, bigram 'a a' x3
        (1, "w x y z"),            # all distinct; 3 bigrams, each once
        (2, "solo"),               # dropped
        (3, ""),                   # dropped
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["total"], r["dup_word_micro"], r["top_bigram_micro"])
        for r in repetition_metrics(df, "doc_id", "text").collect()
    }
    assert set(got) == {0, 1}
    # doc 0: dup = (4-1)/4 = 0.75; top bigram 3/3 = 1.0
    assert got[0] == (4, 750000, 1000000)
    # doc 1: dup = 0; top bigram 1/3
    assert got[1] == (4, 0, 333333)


def test_repetition_metrics_shuffle_free(spark):
    """The per-doc stage must plan with NO Exchange (run-length fold,
    not explode->groupBy->max)."""
    import contextlib
    import io

    from vectorsearch_image_embeddings_databricks_spark.operators.textstats import (
        repetition_metrics,
    )

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    m = repetition_metrics(docs, "doc_id", "text")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        m.explain("formatted")
    assert "Exchange" not in buf.getvalue()


def test_pmi_collocations_planted_pair(spark):
    """A planted always-adjacent pair must surface with higher PMI than
    a frequent-but-independent pair; counts and ordering must be
    integer-deterministic."""
    from vectorsearch_image_embeddings_databricks_spark.operators.textstats import (
        pmi_collocations,
    )

    # "neural network" always adjacent; "the" pairs freely with others
    rows = [(i, "neural network the cat the dog") for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["wa"], r["wb"]): (r["c_ab"], r["pmi"])
        for r in pmi_collocations(df, "text", min_count=5, top=10).collect()
    }
    assert got[("neural", "network")][0] == 10
    # P(neural network)=10/B with unigrams 10/N each -> strongest PMI
    best = max(got.values(), key=lambda v: v[1])
    assert got[("neural", "network")] == best
    # a 1-token doc must not break the bigram stage
    df2 = df.union(spark.createDataFrame([(99, "solo")], ["doc_id", "text"]))
    assert (
        pmi_collocations(df2, "text", min_count=5, top=10).count() == len(got)
    )


def test_chunk_tokens_rejects_gap_leaving_stride(spark):
    import pytest
    from vectorsearch_image_embeddings_databricks_spark.operators.packing import chunk_tokens

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="stride"):
        chunk_tokens(df, "doc_id", "text", window=4, stride=5)
