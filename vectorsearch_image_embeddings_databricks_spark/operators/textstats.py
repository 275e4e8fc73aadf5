"""Text-analysis aggregate operators over a documents corpus
(SURVEY.md §2 E6; north-star "text analysis").

All pure DataFrame ops: groupBy aggregates benefit from map-side partial
aggregation, the explode-based term stats shuffle once on the term key."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import lang_id, quality_score, token_count, tokenize


def corpus_stats(df: DataFrame, text_col: str, group_cols: list[str]) -> DataFrame:
    """Per-group document stats: doc count, char/token totals and averages.

    Averages are exact micro-scaled integers ((sum * 1e6) div n, i.e. the
    mean truncated at 6 decimal places): integer division is associative-
    safe and engine-independent, where float avg() carries an ulp hazard
    across partial-aggregation orders and engines."""
    return (
        df.withColumn("__toks", token_count(text_col))
        .groupBy(*group_cols)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length(text_col)).alias("total_chars"),
            F.sum("__toks").alias("total_tokens"),
        )
        .select(
            *group_cols,
            "n_docs",
            "total_chars",
            "total_tokens",
            F.expr("(total_chars * 1000000) div n_docs").alias(
                "avg_chars_micro"
            ),
            F.expr("(total_tokens * 1000000) div n_docs").alias(
                "avg_tokens_micro"
            ),
        )
    )


def top_terms(
    df: DataFrame, text_col: str, group_col: str, top_n: int = 5
) -> DataFrame:
    """Most frequent terms per group with deterministic tie-break.

    explode → two-level aggregate (term counts partially aggregated
    map-side) → windowed top-n. The window input is |groups|×|vocab| rows,
    already tiny relative to the corpus."""
    terms = df.select(
        F.col(group_col), F.explode(tokenize(text_col)).alias("term")
    )
    counts = terms.groupBy(group_col, "term").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy(group_col).orderBy(F.desc("cnt"), F.asc("term"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
    )


def quality_report(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document quality + predicted language (heuristic lang-id)."""
    return df.select(
        F.col(id_col),
        F.round(quality_score(text_col), 6).alias("quality"),
        lang_id(text_col).alias("pred_lang"),
        token_count(text_col).alias("n_tokens"),
    )


def unigram_nll(
    df: DataFrame,
    id_col: str,
    text_col: str,
    alpha: float = 1.0,
    n_buckets: int = 3,
) -> DataFrame:
    """CCNet-style language-model quality scoring with a self-trained
    unigram LM: per-doc mean negative log-likelihood, bucketed into
    ``n_buckets`` quantiles (CCNet's head/middle/tail uses 3 — low NLL =
    head = most fluent under the corpus distribution).

    The LM is add-``alpha`` smoothed unigram probabilities over the
    corpus itself: p(t) = (c(t) + α) / (N + α·|V|). Where CCNet scores
    with a KenLM 5-gram, the unigram tier is the same pipeline shape
    (train on corpus → score per doc → quantile-bucket) with the model
    expressible inside the engine.

    Scale shape: one token-key shuffle for the vocabulary counts, the
    scalar (N, |V|) broadcast back, one doc-key shuffle for the per-doc
    mean; the quantile bucket is a window over doc-level rows ordered by
    (nll, id) — partition-less but over |docs| rows AFTER aggregation,
    the same cost class as any global ranking of results. At 100 TB
    bucket by pre-computed quantile cut points instead (one
    approxQuantile pass) to avoid the global window entirely.

    Returns (id, n_tokens, nll, bucket 1..n_buckets).
    """
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(tokenize(text_col)).alias("t")
    )
    # |V| rows; materialized once — the (N, |V|) scalar and the prob
    # table both read it, and without the checkpoint each branch would
    # re-run the corpus-wide explode+count (a full extra scan at scale)
    vocab = (
        toks.groupBy("t")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=True)
    )
    scal = vocab.agg(
        F.sum("c").alias("__n"), F.count("*").alias("__v")
    )
    probs = vocab.crossJoin(F.broadcast(scal)).select(
        "t",
        (
            (F.col("c") + F.lit(alpha))
            / (F.col("__n") + F.lit(alpha) * F.col("__v"))
        ).alias("p"),
    )
    per_doc = (
        toks.join(probs, "t")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.avg(-F.log("p")).alias("nll"),
        )
    )
    w = Window.orderBy("nll", "id")
    return per_doc.withColumn("bucket", F.ntile(n_buckets).over(w))
