"""Train/eval decontamination: flag training documents that share n-grams
with an evaluation set.

The operation a large-scale training-data pipeline runs before every
training job: any train document sharing ``min_shared`` distinct word
n-grams with some eval document is contamination (the eval answer leaks
into training). Re-expressed Spark-first as an inverted-index equi-join —
never a cross join:

    shingle both sides -> explode to (doc, ngram-hash) -> DF-cap the eval
    side -> broadcast-join train postings against eval postings on the
    int64 ngram hash -> count shared ngrams per (train, eval) pair.

Scale notes (100 TB lens):
- Join keys are ``xxhash64`` of the n-gram, not the string: an 8-byte
  shuffle key regardless of n-gram width.
- The eval side is the small side by construction (an eval suite is MBs,
  the corpus is TBs) -> broadcast, so the corpus-side postings never
  shuffle; the per-pair aggregation shuffles only matched postings.
- ``df_cap`` drops n-grams present in more than ``df_cap`` eval docs
  before the join. A boilerplate n-gram appearing in every eval doc would
  otherwise fan every matching corpus posting out |eval| ways; capping
  bounds the fan-out per posting. (No-op at fixture scale; load-bearing
  at corpus scale.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import word_shingles


def _postings(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, gh) postings: one row per distinct n-gram per document,
    n-grams carried as int64 xxhash64 keys. Empty documents contribute
    no postings (word_shingles emits [''] for them; two empty docs
    sharing the sentinel must not count as contamination)."""
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(word_shingles(text_col, n)).alias("g"),
        )
        .filter(F.col("g") != "")
        .select("id", F.xxhash64("g").alias("gh"))
    )


def contamination_pairs(
    train: DataFrame,
    test: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    min_shared: int = 3,
    df_cap: int = 50,
    broadcast_test: bool = True,
) -> DataFrame:
    """(train_id, test_id, shared) for every train/eval pair sharing at
    least ``min_shared`` distinct word n-grams, eval-side n-grams with
    document frequency > ``df_cap`` excluded."""
    tr = _postings(train, id_col, text_col, n)
    te = _postings(test, id_col, text_col, n)
    if df_cap is not None:
        counts = te.groupBy("gh").agg(F.count("*").alias("__df"))
        te = (
            te.join(counts, "gh")
            .filter(F.col("__df") <= df_cap)
            .drop("__df")
        )
    te = te.select(F.col("id").alias("test_id"), "gh")
    if broadcast_test:
        te = F.broadcast(te)
    return (
        tr.select(F.col("id").alias("train_id"), "gh")
        .join(te, "gh")
        .groupBy("train_id", "test_id")
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )


def decontaminate_report(
    train: DataFrame,
    test: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    min_shared: int = 3,
    df_cap: int = 50,
    broadcast_test: bool = True,
) -> DataFrame:
    """Per contaminated train doc: how many eval docs it collides with,
    the worst overlap, and the (deterministic: smallest-id) eval doc
    achieving it. Drop these train ids before training."""
    pairs = contamination_pairs(
        train, test, id_col, text_col, n, min_shared, df_cap, broadcast_test
    ).localCheckpoint(eager=True)
    # ^ the report reads pairs twice (per-train rollup + worst-match
    # join-back); without materialization Catalyst re-executes the whole
    # shingle/join lineage — including the corpus scan — once per branch.
    # The pair set is the *contamination*, orders of magnitude smaller
    # than the corpus, so materializing it is the scalable shape.
    per_train = pairs.groupBy("train_id").agg(
        F.count("*").alias("n_test_matches"),
        F.max("shared").alias("max_shared"),
    )
    return (
        per_train.join(pairs, "train_id")
        .filter(F.col("shared") == F.col("max_shared"))
        .groupBy("train_id", "n_test_matches", "max_shared")
        .agg(F.min("test_id").alias("worst_test_doc"))
    )


def remove_contaminated(
    train: DataFrame,
    test: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    min_shared: int = 3,
    df_cap: int = 50,
) -> DataFrame:
    """The pipeline composition: train minus contaminated ids
    (left-anti join — stays distributed, no collect)."""
    bad = contamination_pairs(
        train, test, id_col, text_col, n, min_shared, df_cap
    ).select(F.col("train_id").alias(id_col)).distinct()
    return train.join(bad, id_col, "left_anti")
