"""Sequence packing: assign documents to fixed token-budget bins for
training-batch construction.

Training pipelines pack variable-length documents into fixed context
windows (T5/GPT-style "sample packing") so padding doesn't waste FLOPs.
Exact bin packing is NP-hard and inherently sequential; the scalable
approximation here is *streamed offset binning*:

- Split the corpus into ``num_streams`` independent packing streams by a
  deterministic key (``id % num_streams``) — each stream packs in
  parallel, so there is no global sort and every window below is
  PARTITIONED (no single-reducer window, the anti-pattern this repo's
  plan tests outlaw).
- Within a stream, order docs longest-first (first-fit-decreasing
  flavor, deterministic id tie-break), take the running token cumsum,
  and assign ``local_bin = (cum - tokens) div budget``: a doc starts the
  bin its offset falls into.

Guarantee: every bin's token total is ≤ ``budget + (max_doc_tokens - 1)``
(a doc that crosses a boundary overflows its bin by at most its own
length − 1); docs longer than the budget always open their own bin.
Longest-first ordering keeps the overflow small in practice because
boundary-crossing docs are the short tail.

All math is integer and window frames are explicit, so the assignment is
bitwise-reproducible and SQL-expressible (DuckDB oracle in the registry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_STREAM_STRIDE = 1_000_000_000


def pack_manifest(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    num_streams: int = 4,
) -> DataFrame:
    """(id, tokens, bin_id): the pack assignment for every document.

    ``bin_id = stream * 1e9 + local_bin`` — globally unique without any
    cross-stream coordination."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    stream = F.pmod(F.col(id_col), F.lit(num_streams))
    w = (
        Window.partitionBy("__stream")
        .orderBy(F.desc("__tokens"), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.select(
            F.col(id_col),
            F.col(token_col).cast("long").alias("__tokens"),
            stream.alias("__stream"),
        )
        .withColumn("__cum", F.sum("__tokens").over(w))
        .select(
            id_col,
            F.col("__tokens").alias("tokens"),
            (
                F.col("__stream") * F.lit(_STREAM_STRIDE)
                + F.expr("(__cum - __tokens) div " + str(budget))
            ).alias("bin_id"),
        )
    )


def pack_report(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    num_streams: int = 4,
) -> DataFrame:
    """Per-bin packing stats: docs, token total, and utilization in
    micro-units (token_sum * 1e6 div budget — >1e6 marks the documented
    boundary-overflow case)."""
    m = pack_manifest(df, id_col, token_col, budget, num_streams)
    return m.groupBy("bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("tokens").alias("token_sum"),
        F.expr(f"(sum(tokens) * 1000000) div {budget}").alias(
            "utilization_micro"
        ),
    )


def chunk_tokens(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Fixed-token-window chunking with overlap — the context-window
    construction step of RAG indexing and long-document training
    (windows of ``window`` tokens, starts every ``stride``; the final
    chunk is the short remainder so every token is covered exactly as a
    sliding tokenizer would).

    Chunk count for an n-token doc: 1 if n ≤ window, else
    1 + ceil((n − window) / stride) — pure integer math, restated
    verbatim in the DuckDB oracle. Empty docs yield one empty chunk (the
    doc is preserved, not dropped — dropping is a curation decision).

    Scale shape: entirely ROW-LOCAL — tokenize, one integer expression
    for the chunk count, posexplode over a ``sequence``, ``slice`` +
    ``concat_ws`` per chunk. No shuffle, no Python; output size is
    input × (overlap factor), the plan is scan → generate → project.

    Returns (id, chunk_id, n_chunk_tokens, chunk_text).
    """
    if window <= 0 or stride <= 0:
        raise ValueError("window and stride must be positive")
    if stride > window:
        # windows starting every `stride` tokens with stride > window
        # leave (stride − window)-token gaps — the docstring's
        # every-token-covered contract would silently break
        raise ValueError(
            f"stride ({stride}) must be <= window ({window}): larger "
            "strides leave uncovered token gaps"
        )
    from ..functions.text import tokenize

    toks = df.select(
        F.col(id_col), tokenize(text_col).alias("__toks")
    ).withColumn("__n", F.size("__toks"))
    n_chunks = F.when(
        F.col("__n") <= window, F.lit(1)
    ).otherwise(
        F.lit(1)
        + F.expr(f"(__n - {window} + {stride} - 1) div {stride}")
    )
    out = (
        toks.withColumn("__nc", n_chunks)
        .select(
            id_col,
            "__toks",
            "__n",
            F.posexplode(F.expr("sequence(0, __nc - 1)")).alias(
                "chunk_id", "__start_idx"
            ),
        )
        .withColumn("__start", F.col("chunk_id") * stride)
    )
    return out.select(
        id_col,
        "chunk_id",
        F.least(
            F.lit(window), F.col("__n") - F.col("__start")
        ).alias("n_chunk_tokens"),
        F.concat_ws(
            " ", F.slice(F.col("__toks"), F.col("__start") + 1, window)
        ).alias("chunk_text"),
    )
