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


def embedding_contamination_pairs(
    train: DataFrame,
    test: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
    broadcast_test: bool = True,
    ann_index=None,
) -> DataFrame:
    """(train_id, test_id, cos) for every train/eval pair whose embedding
    cosine is ≥ ``threshold`` — the semantic sibling of the n-gram tier:
    paraphrased eval answers share no trigram but land next to the eval
    point in embedding space (the contamination n-gram sweeps miss).

    Scale shape mirrors ``contamination_pairs``: the eval suite is the
    small side by construction (MBs vs a TB-scale corpus), so it is
    broadcast and scored with the codegen'd cosine fold — a broadcast
    nested-loop whose cost is |corpus|·|eval| vectorized fused
    multiply-adds with NO corpus shuffle, not an all-pairs self join.
    When the eval side itself is large, pass ``ann_index`` (an
    ``index.ann.CosineLSHIndex`` built over the TRAIN side's id/vector
    columns) and candidates come from banded-signature equi-joins with
    exact verification — the same two-tier contract as
    ``operators.dedup.near_dup_pairs_cosine``.
    """
    from ..functions.vector import cosine_similarity

    if ann_index is not None:
        if ann_index.key != id_col or ann_index.vector_col != vec_col:
            raise ValueError(
                "ann_index was built over "
                f"({ann_index.key!r}, {ann_index.vector_col!r}); "
                f"expected ({id_col!r}, {vec_col!r})"
            )
        cand = ann_index.similarity_join(
            test.select(
                F.col(id_col).alias("test_id"),
                F.col(vec_col).alias("__tv"),
            ),
            other_key="test_id",
            other_vec="__tv",
            threshold=threshold,
        )
        return cand.select(
            F.col("id_a").alias("train_id"),
            F.col("id_b").alias("test_id"),
            "cos",
        )
    te = test.select(
        F.col(id_col).alias("test_id"), F.col(vec_col).alias("__tv")
    )
    if broadcast_test:
        te = F.broadcast(te)
    return (
        train.select(
            F.col(id_col).alias("train_id"), F.col(vec_col).alias("__rv")
        )
        .crossJoin(te)
        .withColumn("cos", cosine_similarity("__rv", "__tv"))
        .filter(F.col("cos") >= threshold)
        .select("train_id", "test_id", "cos")
    )


def embedding_decontaminate_report(
    train: DataFrame,
    test: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
    broadcast_test: bool = True,
) -> DataFrame:
    """Per semantically contaminated train doc: eval-collision count, the
    worst similarity (micro-int, exact integer aggregation), and the
    smallest eval id achieving it. Same report contract as
    ``decontaminate_report`` so the two tiers compose/union cleanly."""
    pairs = (
        embedding_contamination_pairs(
            train, test, id_col, vec_col, threshold, broadcast_test
        )
        .withColumn(
            "cos_micro", F.floor(F.col("cos") * F.lit(1e6)).cast("long")
        )
        .localCheckpoint(eager=True)
    )
    # pairs (the contamination set, tiny vs the corpus) is read twice —
    # rollup + worst-match join-back; materialize once, same rationale
    # as decontaminate_report.
    per_train = pairs.groupBy("train_id").agg(
        F.count("*").alias("n_test_matches"),
        F.max("cos_micro").alias("max_cos_micro"),
    )
    return (
        per_train.join(pairs, "train_id")
        .filter(F.col("cos_micro") == F.col("max_cos_micro"))
        .groupBy("train_id", "n_test_matches", "max_cos_micro")
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
