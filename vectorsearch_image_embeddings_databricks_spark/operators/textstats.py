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
