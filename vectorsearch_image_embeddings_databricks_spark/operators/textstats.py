"""Text-analysis aggregate operators over a documents corpus
(SURVEY.md §2 E6; north-star "text analysis").

All pure DataFrame ops: groupBy aggregates benefit from map-side partial
aggregation, the explode-based term stats shuffle once on the term key."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import (
    lang_id,
    quality_score,
    token_count,
    tokenize,
    word_shingles,
)


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
    mean; the quantile bucket is a DISTRIBUTED global rank — range
    repartition on (nll, id), per-partition row_number (a partitioned
    window), plus a |partitions|-row offset table folded in by broadcast
    join — then the exact SQL-standard ntile formula in integer math.
    No unpartitioned window anywhere: the single-reducer sort the naive
    ``ntile() OVER (ORDER BY ...)`` plans is replaced by a range
    exchange whose every partition ranks independently
    (plan-regression-tested).

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
    # Bucket on the ROUNDED score (the value the row reports), not the
    # raw float: two engines computing nll in different summation
    # orders disagree at ulp level, and near-tied docs (replicated
    # corpora produce many) then sort in opposite orders across a
    # bucket boundary — measured at sf1: 8/50k docs flipped buckets
    # under raw-nll ordering while agreeing on all reported values.
    # Rounding first makes the order a pure function of the reported
    # (nll, id) pair, identical across engines.
    per_doc = per_doc.withColumn("__nll_r", F.round("nll", 6))
    return distributed_ntile(per_doc, ["__nll_r", "id"], n_buckets).drop(
        "__nll_r"
    )


def _range_ranked(
    df: DataFrame, order_cols: list[str], num_partitions: int | None
) -> DataFrame:
    """Range-exchange + per-partition row_number — the pre-checkpoint
    ranking stage of ``distributed_ntile``, exposed so the plan test can
    assert it contains NO Exchange SinglePartition (the checkpoint
    truncates the final query's visible plan)."""
    if num_partitions is None:
        ranked = df.repartitionByRange(*[F.col(c) for c in order_cols])
    else:
        ranked = df.repartitionByRange(
            num_partitions, *[F.col(c) for c in order_cols]
        )
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    return ranked.withColumn("__pid", F.spark_partition_id()).withColumn(
        "__lrn", F.row_number().over(w)
    )


def distributed_ntile(
    df: DataFrame,
    order_cols: list[str],
    n_buckets: int,
    num_partitions: int | None = None,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Exact ``ntile(n) OVER (ORDER BY order_cols)`` without the
    single-reducer global window.

    ``order_cols`` must be a total order (include a unique tiebreak
    column) — ties straddling a range-partition boundary would otherwise
    make ranks partition-dependent.

    Plan: ``repartitionByRange(order_cols)`` (a range exchange — every
    partition then ranks independently with a PARTITIONED window on
    ``spark_partition_id()``), a |partitions|-row count collect to
    compute prefix offsets (scalar-class driver work), and the
    SQL-standard ntile formula in pure integer math:
    with N rows and n buckets, q = N div n, r = N mod n, the first r
    buckets hold q+1 rows — bucket(rank) = ceil(rank/(q+1)) while
    rank ≤ r·(q+1), else r + ceil((rank − r·(q+1))/q). Bit-identical to
    both Spark's and DuckDB's ntile (oracle-hash-verified)."""
    # materialized once: both the offset collect and the final output
    # read the ranked rows, and partition ids must not be recomputed
    ranked = _range_ranked(df, order_cols, num_partitions).localCheckpoint(
        eager=True
    )
    counts = sorted(
        (r["__pid"], r["c"])
        for r in ranked.groupBy("__pid").agg(F.count("*").alias("c")).collect()
    )
    total = sum(c for _, c in counts)
    if total == 0:
        return df.withColumn(bucket_col, F.lit(None).cast("int"))
    offsets, acc = {}, 0
    for pid, c in counts:
        offsets[pid] = acc
        acc += c
    spark = df.sparkSession
    off_df = F.broadcast(
        spark.createDataFrame(
            [(int(p), int(o)) for p, o in offsets.items()],
            "__pid int, __off long",
        )
    )
    q, r = divmod(total, n_buckets)
    rank = F.col("__off") + F.col("__lrn")
    if q == 0:
        # fewer rows than buckets: ntile assigns bucket = rank
        bucket = rank
    else:
        bucket = F.when(
            rank <= F.lit(r * (q + 1)),
            F.expr(f"(__off + __lrn + {q}) div {q + 1}"),
        ).otherwise(
            F.lit(r) + F.expr(f"(__off + __lrn - {r * (q + 1)} + {q - 1}) div {q}")
        )
    return (
        ranked.join(off_df, "__pid")
        .withColumn(bucket_col, bucket.cast("int"))
        .drop("__pid", "__lrn", "__off")
    )


def dsir_logratio(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_pred,
    alpha: float = 1.0,
) -> DataFrame:
    """DSIR-style importance weighting (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every document
    by the mean per-token log-ratio of a TARGET unigram LM (trained on
    the rows matching ``target_pred``) against the SOURCE LM (trained on
    the whole corpus). High scores = documents that look like the target
    domain; the selection step keeps the top mass (resampling is the
    caller's policy — this operator produces the weights).

    Where the paper uses hashed n-gram features, the unigram tier keeps
    the score fully engine-internal and oracle-expressible; the pipeline
    shape (train two LMs → per-doc log-ratio → select) is identical.

    Scale shape: ONE corpus-wide token explode feeds both LMs (the
    target's counts are a filtered aggregate of the same shuffle, not a
    second scan); both (N, |V|) scalars come back as broadcasts; tokens
    join the |V|-row probability table and aggregate per doc — the same
    two-shuffle shape as ``unigram_nll``. Smoothing is add-``alpha``
    over the SHARED vocabulary, so out-of-target tokens get finite mass
    and the ratio is always defined.

    Returns (id, n_tokens, logratio) — logratio > 0 ⇒ target-like.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        target_pred.cast("int").alias("__is_t"),
        F.explode(tokenize(text_col)).alias("t"),
    )
    # |V| rows with both counts from one shuffle; materialized once —
    # the scalar aggregate and the probability table both read it
    vocab = (
        toks.groupBy("t")
        .agg(
            F.count("*").alias("c_s"),
            F.sum("__is_t").alias("c_t"),
        )
        .localCheckpoint(eager=True)
    )
    scal = vocab.agg(
        F.sum("c_s").alias("__ns"),
        F.sum("c_t").alias("__nt"),
        F.count("*").alias("__v"),
    )
    probs = vocab.crossJoin(F.broadcast(scal)).select(
        "t",
        (
            F.log(
                (F.col("c_t") + F.lit(alpha))
                / (F.col("__nt") + F.lit(alpha) * F.col("__v"))
            )
            - F.log(
                (F.col("c_s") + F.lit(alpha))
                / (F.col("__ns") + F.lit(alpha) * F.col("__v"))
            )
        ).alias("lr"),
    )
    return (
        toks.select("id", "t")
        .join(probs, "t")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.avg("lr").alias("logratio"),
        )
    )


def oov_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    vocab_size: int = 100,
) -> DataFrame:
    """Tokenizer-vocabulary coverage report: build the top-``vocab_size``
    corpus vocabulary (by token count, deterministic (count desc, token
    asc) tie-break) and report per-group token totals and out-of-vocab
    rates — the coverage audit run before committing to a tokenizer.

    Scale shape: one token-key shuffle for counts; the vocabulary is a
    top-k ``orderBy().limit()`` (TakeOrderedAndProject — no full sort)
    that stays a DataFrame and reaches the corpus as a BROADCAST
    left-join (null ⇒ OOV); per-group rollup is a partial-agg groupBy.
    The corpus is scanned twice (counts + coverage) but never shuffled
    on anything wider than the token key.

    Returns (group, n_tokens, n_oov, oov_micro = floor(1e6·oov_rate)).
    """
    toks = df.select(
        F.col(group_col).alias("grp"), F.explode(tokenize(text_col)).alias("t")
    )
    vocab = (
        toks.groupBy("t")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("t"))
        .limit(vocab_size)
        .select("t", F.lit(1).alias("__in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "t", "left")
        .groupBy("grp")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(
                F.when(F.col("__in_vocab").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
        )
        .select(
            F.col("grp"),
            "n_tokens",
            "n_oov",
            F.expr("(n_oov * 1000000) div n_tokens").alias("oov_micro"),
        )
    )


def repetition_metrics(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Gopher-style repetition signals per document, in exact integer
    micro-units: ``dup_word_micro`` (fraction of tokens that are
    repeats of an earlier token) and ``top_bigram_micro`` (share of the
    most frequent bigram among all bigrams). Docs with fewer than two
    tokens are dropped (no bigram is defined).

    Repetitive documents (keyword stuffing, boilerplate, degenerate
    generations) are the single strongest removal signal in published
    web-corpus quality rules; both metrics here are the standard ones.

    100 TB shape: the top-bigram count is a run-length fold over the
    per-row SORTED bigram array — one whole-stage-codegen'd projection,
    NOT an explode→groupBy(doc, bigram)→max re-aggregation (which would
    shuffle |corpus tokens| rows twice on skewed keys). Zero shuffles
    here; callers aggregate the per-doc rows as they like.
    """
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    out = (
        df.select(
            F.col(id_col).alias("doc_id_out"),
            toks.alias("__ws"),
        )
        .withColumn("total", F.size("__ws").cast("long"))
        .filter(F.col("total") >= 2)
        .withColumn(
            "distinct_ct", F.size(F.array_distinct("__ws")).cast("long")
        )
        .withColumn(
            "__bg",
            F.zip_with(
                F.slice(F.col("__ws"), 1, F.size("__ws") - 1),
                F.slice(F.col("__ws"), 2, F.size("__ws") - 1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            ),
        )
        .withColumn(
            "top_bigram_ct",
            F.expr(
                """aggregate(
                       array_sort(__bg),
                       named_struct('prev', CAST(NULL AS STRING),
                                    'run', 0L, 'best', 0L),
                       (acc, x) -> named_struct(
                           'prev', x,
                           'run', IF(acc.prev <=> x, acc.run + 1, 1L),
                           'best', greatest(
                               acc.best,
                               IF(acc.prev <=> x, acc.run + 1, 1L))),
                       acc -> acc.best)"""
            ),
        )
        .select(
            F.col("doc_id_out").alias(id_col),
            "total",
            F.expr(
                "((total - distinct_ct) * 1000000L) div total"
            ).alias("dup_word_micro"),
            F.expr(
                "(top_bigram_ct * 1000000L) div (total - 1)"
            ).alias("top_bigram_micro"),
        )
    )
    return out


def repetition_summary(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Decile-bucketed corpus view of the repetition metrics: one row
    per dup-word decile with doc count, summed top-bigram micro (exact
    integer), and the bucket's worst dup fraction. The per-doc stage is
    shuffle-free; this is one partial-agg groupBy to ≤10 rows."""
    m = repetition_metrics(df, id_col, text_col)
    return m.groupBy(
        F.expr("dup_word_micro div 100000").alias("bucket")
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum("top_bigram_micro").alias("sum_top_bigram_micro"),
        F.max("dup_word_micro").alias("max_dup_word_micro"),
    )


def cross_doc_boilerplate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    n: int = 5,
    min_df: int = 20,
    flag_ratio_micro: int = 500_000,
) -> DataFrame:
    """Cross-document boilerplate detection (the CCNet/RefinedWeb corpus-
    cleaning step): a word ``n``-gram appearing in ≥ ``min_df`` distinct
    documents is boilerplate (headers, footers, licence blurbs, nav
    text); a document whose distinct-n-gram set is ≥ ``flag_ratio_micro``
    /1e6 boilerplate should be dropped or cleaned before training.

    Returns one row per ``group_col`` value: docs seen, docs flagged,
    summed distinct/boilerplate n-gram counts, and the group's exact
    boilerplate ratio in floor-truncated micro-units (engine-portable
    integer math; see corpus_stats). Documents with no tokens contribute
    no n-grams and are excluded, matching decontam._postings' sentinel
    rule.

    Scale shape (100 TB lens): postings carry int64 xxhash64 gram keys
    (8-byte shuffle keys regardless of n-gram width) and are
    materialized ONCE (both the document-frequency aggregate and the
    join left side read them — without the checkpoint Catalyst
    re-executes the corpus explode per branch, the same double-scan
    near_dup_pairs_jaccard's inverted index avoids). The postings⋈df
    join is forced SHUFFLE_HASH on the gram key: the df table is
    VOCABULARY-sized (all distinct n-grams), which at corpus scale does
    not fit a broadcast — and its build side hashes on the same key the
    aggregate just shuffled on. The per-doc rollup shuffles on (doc,
    group); the final per-group agg is partial-aggregated map-side to
    |groups| rows. Nothing is collected, no cross join, no
    unpartitioned window.
    """
    postings = (
        df.select(
            F.col(id_col).alias("id"),
            F.col(group_col).alias("grp"),
            F.explode(word_shingles(text_col, n)).alias("g"),
        )
        .filter(F.col("g") != "")
        .select("id", "grp", F.xxhash64("g").alias("gh"))
        .localCheckpoint(eager=True)
    )
    gram_df = postings.groupBy("gh").agg(F.count("*").alias("df"))
    per_doc = (
        postings.join(gram_df.hint("SHUFFLE_HASH"), "gh")
        .groupBy("id", "grp")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum((F.col("df") >= min_df).cast("long")).alias("n_boiler"),
        )
        .withColumn(
            "ratio_micro", F.expr("(n_boiler * 1000000) div n_grams")
        )
    )
    return per_doc.groupBy("grp").agg(
        F.count("*").alias("n_docs"),
        F.sum(
            (F.col("ratio_micro") >= flag_ratio_micro).cast("long")
        ).alias("n_flagged"),
        F.sum("n_grams").alias("total_grams"),
        F.sum("n_boiler").alias("total_boiler"),
        F.expr(
            "(sum(n_boiler) * 1000000) div sum(n_grams)"
        ).alias("boiler_ratio_micro"),
    )


def linear_quality(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    keep_threshold: float = 0.5,
) -> DataFrame:
    """Model-based quality scoring (the fastText-classifier step of the
    GPT-3/LLaMA data pipelines, re-expressed with a deterministic
    stand-in model): each token carries a weight in [-2048, 2047] taken
    from the first 3 hex digits of md5(token) — a fixed, engine-portable
    "embedding table" — a document's logit is the mean token weight
    scaled to ~[-1, 1], and its quality is sigmoid(logit). Swap
    ``_token_weight`` for a real learned table (broadcast join) and the
    plan is production shape.

    Integer-exact core: the weight sum is a long, the token count a
    long; the only float ops are one division and one sigmoid on
    identical IEEE doubles — portable across engines at 6 dp. Returns
    per-group: docs, docs kept (quality ≥ threshold), and the exact
    integer sums that define the group's mean logit.

    Scale shape: explode → per-doc partial-agg (map-side combine on the
    doc key, one shuffle) → per-group rollup to |groups| rows. The md5
    weight is a codegen'd expression — no UDF, no vocabulary shuffle.
    """
    w = (
        F.conv(F.substring(F.md5("t"), 1, 3), 16, 10).cast("long")
        - F.lit(2048)
    )
    per_doc = (
        df.select(
            F.col(id_col).alias("id"),
            F.col(group_col).alias("grp"),
            F.explode(tokenize(text_col)).alias("t"),
        )
        .select("id", "grp", w.alias("w"))
        .groupBy("id", "grp")
        .agg(F.sum("w").alias("w_sum"), F.count("*").alias("n_tok"))
        .withColumn(
            "quality",
            F.lit(1.0)
            / (
                F.lit(1.0)
                + F.exp(
                    -(
                        F.col("w_sum").cast("double")
                        / (F.col("n_tok").cast("double") * F.lit(2048.0))
                    )
                )
            ),
        )
    )
    return per_doc.groupBy("grp").agg(
        F.count("*").alias("n_docs"),
        F.sum((F.col("quality") >= keep_threshold).cast("long")).alias(
            "n_kept"
        ),
        F.sum("w_sum").alias("sum_w"),
        F.sum("n_tok").alias("sum_tok"),
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str,
    min_count: int = 5,
    top: int = 20,
) -> DataFrame:
    """Collocation mining: pointwise mutual information of adjacent
    token pairs — PMI(a,b) = ln((c_ab/B) / ((c_a/N)·(c_b/N))) with N
    total tokens and B total bigrams. High-PMI pairs are multiword
    expressions; a tokenizer/vocab-building pipeline mines them to
    decide merge candidates.

    Scale shape: one token-key shuffle for unigram counts (materialized
    once — both join sides read it), one bigram-key shuffle for pair
    counts, scalars (N, B) folded in by broadcast; the pair table joins
    its two unigram marginals on the token key (hash joins on 8-byte-
    class keys). Ordering is by the INTEGER count with string
    tie-breaks, so the float PMI value never decides the row set."""
    toks = df.select(F.explode(tokenize(text_col)).alias("t"))
    uni = (
        toks.groupBy("t")
        .agg(F.count("*").alias("cu"))
        .localCheckpoint(eager=True)
    )
    n_scal = uni.agg(F.sum("cu").alias("__n"))
    ws = tokenize(text_col)
    bg = (
        df.select(ws.alias("__ws"))
        .filter(F.size("__ws") >= 2)   # slice(len-1) is invalid on 0-token docs
        .select(
            F.explode(
                F.zip_with(
                    F.slice(F.col("__ws"), 1, F.size("__ws") - 1),
                    F.slice(F.col("__ws"), 2, F.size("__ws") - 1),
                    lambda a, b: F.struct(a.alias("wa"), b.alias("wb")),
                )
            ).alias("p")
        )
        .select("p.wa", "p.wb")
    )
    bgc = (
        bg.groupBy("wa", "wb")
        .agg(F.count("*").alias("c_ab"))
        .localCheckpoint(eager=True)
    )
    b_scal = bgc.agg(F.sum("c_ab").alias("__b"))
    ua = uni.select(F.col("t").alias("wa"), F.col("cu").alias("ca"))
    ub = uni.select(F.col("t").alias("wb"), F.col("cu").alias("cb"))
    return (
        bgc.filter(F.col("c_ab") >= min_count)
        .join(ua, "wa")
        .join(ub, "wb")
        .crossJoin(F.broadcast(n_scal))
        .crossJoin(F.broadcast(b_scal))
        .select(
            "wa",
            "wb",
            "c_ab",
            F.round(
                F.log(
                    (
                        F.col("c_ab").cast("double")
                        * F.col("__n").cast("double")
                        * F.col("__n").cast("double")
                    )
                    / (
                        F.col("__b").cast("double")
                        * F.col("ca").cast("double")
                        * F.col("cb").cast("double")
                    )
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.desc("c_ab"), "wa", "wb")
        .limit(top)
    )


def bpe_pair_counts(
    df: DataFrame,
    text_col: str,
    top: int = 20,
) -> DataFrame:
    """BPE merge-candidate counting — the inner statistic of byte-pair-
    encoding tokenizer training (Sennrich et al. 2016): for every
    adjacent symbol pair inside a word, the total corpus frequency. The
    highest-count pair is the next merge; training loops this statistic,
    re-segmenting after each merge (a driver-side loop over a vocab-sized
    table, the same driver-state contract as the k-means/IVF trainers).

    Scale shape: one token-key shuffle collapses the corpus to the
    word-frequency table (map-side partials), after which ALL pair work
    happens on the vocabulary, not the corpus — pairs explode from
    distinct words only, weighted by the word's count, and the pair-key
    shuffle is Σ(len-1) over DISTINCT words. A 100 TB corpus with a
    10M-word vocabulary does corpus-sized work exactly once. Ordering is
    integer count + string tie-breaks; no float anywhere."""
    from ..functions.text import tokenize

    wc = (
        df.select(F.explode(tokenize(text_col)).alias("t"))
        .groupBy("t")
        .agg(F.count("*").alias("f"))
    )
    t = F.col("t")
    pairs = (
        wc.filter(F.length(t) >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length(t) - 1),
                    lambda i: F.struct(
                        t.substr(i, F.lit(1)).alias("a"),
                        t.substr(i + 1, F.lit(1)).alias("b"),
                    ),
                )
            ).alias("p"),
            "f",
        )
        .select("p.a", "p.b", "f")
    )
    return (
        pairs.groupBy("a", "b")
        .agg(F.sum("f").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "a", "b")
        .limit(top)
    )


# Symbol framing for the BPE training loop: every symbol in a word's
# working representation is wrapped \x01<symbol>\x02, so a merge is ONE
# string replace of "\x01a\x02\x01b\x02" with "\x01ab\x02" — and
# because engines scan replace() left-to-right without re-matching
# inside a replacement, that single replace IS greedy non-overlapping
# BPE re-segmentation (the framing makes cross-symbol substring matches
# impossible; verified equal to a reference list-walk implementation in
# pytest). Control bytes never occur in whitespace-tokenized text.
_BPE_OPEN = "\x01"
_BPE_CLOSE = "\x02"

#: Max ``replace`` expressions chained into one bpe_segment projection —
#: keeps the Catalyst expression tree bounded at production merge counts
#: (see bpe_segment's depth note). 64 is comfortably inside analyzer /
#: codegen recursion limits while keeping a 30k-merge vocabulary at
#: ~470 vocab-table passes (vocab-sized maps, not corpus work).
_BPE_SEGMENT_CHUNK = 64


def bpe_word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """The corpus→vocabulary collapse both BPE stages consume: ONE
    token-key shuffle to ``(t, f)`` distinct-word frequencies. Build it
    once (and localCheckpoint it) when composing train + segment so the
    corpus-sized work truly happens once per pipeline, not per stage.

    Tokens containing the framing control bytes (\\x01/\\x02 — which the
    train/segment machinery uses to delimit symbols) are EXCLUDED here,
    at the single choke point both stages share: a corpus token carrying
    a frame byte would silently corrupt merge counting and segmentation
    downstream. Real tokenizer vocabularies never contain C0 control
    bytes; the one cheap map-side filter makes that a contract instead
    of an assumption."""
    from ..functions.text import tokenize

    return (
        df.select(F.explode(tokenize(text_col)).alias("t"))
        .filter(
            (F.instr("t", _BPE_OPEN) == 0) & (F.instr("t", _BPE_CLOSE) == 0)
        )
        .groupBy("t")
        .agg(F.count("*").alias("f"))
    )


def _bpe_driver_loop(
    counts: dict[str, int], merges: int
) -> list[tuple]:
    """In-process merge loop over a collected word-frequency table —
    the classic Sennrich incremental implementation: pair counts are
    maintained by DELTA (only words containing the merged pair are
    re-segmented and re-counted), so a round costs the touched words,
    not the vocabulary. Identical tie-breaks to the distributed tier
    (count desc, then lexicographic — Python's code-point ordering
    equals Spark/DuckDB binary string ordering because UTF-8 byte
    order preserves code points)."""
    from collections import defaultdict

    words = {w: list(w) for w in counts}
    pair_count: dict[tuple, int] = defaultdict(int)
    pair_words: dict[tuple, set] = defaultdict(set)
    for w, syms in words.items():
        f = counts[w]
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pair_count[p] += f
            pair_words[p].add(w)
    out: list[tuple] = []
    for r in range(merges):
        live = [(p, c) for p, c in pair_count.items() if c > 0]
        if not live:
            break
        (a, b), c = min(live, key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        out.append((r + 1, a, b, a + b, c))
        # pop: after this round NO word contains (a,b) — keeping the
        # entry would re-walk every historical member on a future tie.
        for w in pair_words.pop((a, b), ()):
            syms = words[w]
            f = counts[w]
            # membership can be STALE (the word lost the pair to an
            # earlier merge and sets are never eagerly pruned): skip
            # without touching counts, or the subtract/re-add churn
            # makes a round cost O(vocab) instead of O(touched words)
            if not any(
                syms[i] == a and syms[i + 1] == b
                for i in range(len(syms) - 1)
            ):
                continue
            for i in range(len(syms) - 1):
                pair_count[(syms[i], syms[i + 1])] -= f
            new, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    new.append(a + b)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            words[w] = new
            for i in range(len(new) - 1):
                p = (new[i], new[i + 1])
                pair_count[p] += f
                pair_words[p].add(w)
        pair_count.pop((a, b), None)
    return out


def bpe_train(
    df: DataFrame,
    text_col: str,
    merges: int = 8,
    strategy: str = "distributed",
    driver_vocab_cap: int = 2_000_000,
    word_counts: DataFrame | None = None,
) -> DataFrame:
    """Byte-pair-encoding tokenizer TRAINING (Sennrich et al. 2016) —
    the full merge loop, not just one pair statistic (bpe_pair_counts is
    the inner step). Returns the learned merge table:
    ``(merge_rank, lhs, rhs, merged, pair_count)``.

    Two tiers, identical results (equality pytest-pinned):

    - ``strategy='distributed'``: per merge round, everything stays
      distributed and vocabulary-sized — pair counts explode from
      DISTINCT words weighted by corpus frequency (the corpus itself
      was collapsed to the word-frequency table by ONE token-key
      shuffle up front), the argmax pair is a 1-row collect (count
      desc, then lexicographic — deterministic), and re-segmentation is
      one codegen'd string replace over the vocab. Driver state = the
      merge list; ``localCheckpoint`` per round keeps lineage linear.
      This is the only tier that works when even the VOCABULARY doesn't
      fit one machine (a 100 TB web corpus can have 100M+ distinct
      tokens), but each round is a Spark job — fine for hundreds of
      merges, not for a production 30k-merge vocabulary.
    - ``strategy='driver'``: collect the word-frequency table (the
      standard practice — every production BPE trainer consumes word
      counts, not the corpus) and run the merge loop in-process. The
      corpus-sized work is still the one distributed token-key shuffle;
      the collect is bounded by ``driver_vocab_cap`` (hard error above
      it, not a silent OOM). 30k merges take minutes, not days.
    - ``strategy='auto'``: driver tier when the vocabulary fits the
      cap, distributed otherwise — the sane default at unknown scale.

    ``word_counts``: pass a prebuilt (ideally checkpointed)
    :func:`bpe_word_counts` table to share the corpus→vocab collapse
    with other stages (e.g. :func:`bpe_segment`) instead of paying the
    token-key shuffle once per stage.
    """
    if strategy not in ("distributed", "driver", "auto"):
        raise ValueError(f"unknown strategy {strategy!r}")
    spark = df.sparkSession
    wc = (
        word_counts
        if word_counts is not None
        else bpe_word_counts(df, text_col)
    )
    if strategy != "distributed":
        # ONE action: collect at most cap+1 rows — a separate count()
        # would execute the corpus-sized token-key shuffle twice (Spark
        # jobs don't share shuffle output across actions on an
        # unpersisted plan), doubling the dominant cost of the exact
        # path this tier exists to make cheap
        rows = wc.limit(driver_vocab_cap + 1).collect()
        if len(rows) <= driver_vocab_cap:
            counts = {r["t"]: int(r["f"]) for r in rows}
            return spark.createDataFrame(
                _bpe_driver_loop(counts, merges),
                "merge_rank int, lhs string, rhs string, merged string, "
                "pair_count long",
            )
        if strategy == "driver":
            raise ValueError(
                f"vocabulary (> {driver_vocab_cap} tokens) exceeds "
                "driver_vocab_cap; use strategy='distributed' or raise "
                "the cap"
            )
    state = wc.select(
        F.regexp_replace(
            "t", "(.)", f"{_BPE_OPEN}$1{_BPE_CLOSE}"
        ).alias("enc"),
        "f",
    ).localCheckpoint(eager=False)
    learned: list[tuple] = []
    sep = _BPE_CLOSE + _BPE_OPEN
    prev = None
    for r in range(merges):
        syms = F.split(
            F.expr("substring(enc, 2, length(enc) - 2)"), sep
        )
        pairs = (
            state.select(syms.alias("s"), "f")
            .filter(F.size("s") >= 2)
            .select(
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("s") - 1),
                        lambda i: F.struct(
                            F.element_at("s", i).alias("a"),
                            F.element_at("s", i + 1).alias("b"),
                        ),
                    )
                ).alias("p"),
                "f",
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("f").alias("c"))
            .orderBy(F.desc("c"), "a", "b")
            .limit(1)
            .collect()
        )
        # the collect above is the action that materialized this
        # round's LAZY checkpoint — the round-before-last's blocks are
        # now unreferenced; free them (guide §5, the per-round
        # unpersist discipline). At 100 TB the vocab table is 100M+
        # rows per superseded round.
        if prev is not None:
            prev.unpersist()
            prev = None
        if not pairs:
            break
        a, b, c = pairs[0]["a"], pairs[0]["b"], int(pairs[0]["c"])
        learned.append((r + 1, a, b, a + b, c))
        prev = state
        state = state.select(
            F.replace(
                "enc",
                F.lit(_BPE_OPEN + a + _BPE_CLOSE + _BPE_OPEN + b + _BPE_CLOSE),
                F.lit(_BPE_OPEN + a + b + _BPE_CLOSE),
            ).alias("enc"),
            "f",
        ).localCheckpoint(eager=False)
    return spark.createDataFrame(
        learned,
        "merge_rank int, lhs string, rhs string, merged string, "
        "pair_count long",
    )


def bpe_segment(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    token_col: str = "token",
    symbols_col: str = "symbols",
    word_counts: DataFrame | None = None,
) -> DataFrame:
    """Apply a LEARNED merge list (``bpe_train``'s output order) to
    segment every distinct token — the inference side of the tokenizer:
    ``(token, corpus_count, symbols array)`` per distinct token.

    The segmentation is a chain of ``len(merges)`` string replaces over
    the vocab-sized word-frequency table (each replay of one training
    round, same left-to-right non-overlap semantics), then a split back
    to a symbol array. No corpus-sized work beyond the initial token-key
    shuffle, no Python in the plan — at 100 TB this is the map stage
    of every downstream token-count/packing operator. Pass
    ``word_counts`` (a :func:`bpe_word_counts` table, ideally
    checkpointed) to share that shuffle with the training stage.

    Expression-depth bound: a single projection nesting one ``replace``
    Column per merge would hand Catalyst a merge-count-deep expression
    tree — at a production 30k-merge vocabulary that is analyzer/codegen
    recursion territory, not a plan. Merges are therefore applied in
    chunks of ``_BPE_SEGMENT_CHUNK`` replaces per projection with a
    ``localCheckpoint`` between chunks, so the deepest expression any
    stage carries is chunk-sized and the number of passes over the
    (vocab-sized, NOT corpus-sized) table is ``merges/chunk``.
    Pytest-pinned against the reference list-walk segmenter across the
    multi-chunk regime; the single-chunk case keeps the old one-
    projection plan exactly.
    """
    base = (
        word_counts
        if word_counts is not None
        else bpe_word_counts(df, text_col)
    )
    wc = base.select(
        F.col("t").alias(token_col), F.col("f").alias("corpus_count")
    )
    framed = wc.withColumn(
        "__enc",
        F.regexp_replace(token_col, "(.)", f"{_BPE_OPEN}$1{_BPE_CLOSE}"),
    )
    merges = list(merges)
    for i in range(0, len(merges), _BPE_SEGMENT_CHUNK):
        enc = F.col("__enc")
        for a, b in merges[i : i + _BPE_SEGMENT_CHUNK]:
            enc = F.replace(
                enc,
                F.lit(_BPE_OPEN + a + _BPE_CLOSE + _BPE_OPEN + b + _BPE_CLOSE),
                F.lit(_BPE_OPEN + a + b + _BPE_CLOSE),
            )
        framed = framed.withColumn("__enc", enc)
        if i + _BPE_SEGMENT_CHUNK < len(merges):
            # materialize the chunk so the NEXT projection starts from a
            # flat string column, not a deeper tree (lazy: the chunk
            # runs when the segmentation is first consumed)
            framed = framed.localCheckpoint(eager=False)
    syms = F.split(
        F.expr("substring(__enc, 2, length(__enc) - 2)"),
        _BPE_CLOSE + _BPE_OPEN,
    )
    return framed.select(
        token_col, "corpus_count", syms.alias(symbols_col)
    )


def char_entropy(
    df: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Per-document Shannon character entropy — the curation signal for
    gibberish/boilerplate (low entropy = repeated characters, high =
    random noise): H = ln(n) − (Σ c·ln(c))/n over the doc's character
    histogram (c = per-char count, n = total chars).

    Determinism of a float SUM of irrational terms: the per-char terms
    are folded in SORTED-character order by a sequential ``aggregate``
    HOF on both engines (Spark left-fold over ``sort_array``; DuckDB
    ``list_reduce`` over ``list(... ORDER BY c)``) — same terms, same
    order, same IEEE additions → identical doubles, so the micro-floored
    entropy is hash-exact. An unordered SUM would be partial-agg-order-
    dependent and is exactly what this shape avoids.

    Scale: one (doc, char) key shuffle with map-side partials (the
    alphabet bounds per-doc rows), one doc-key fold bounded by the
    doc's own alphabet. Docs with no characters are dropped (no
    histogram to measure)."""
    c_char = F.explode(
        F.transform(
            F.sequence(F.lit(1), F.length(text_col)),
            lambda i: F.col(text_col).substr(i, F.lit(1)),
        )
    ).alias("c")
    chars = (
        df.filter(F.length(text_col) > 0)
        .select(F.col(id_col).alias("__id"), c_char)
    )
    counts = chars.groupBy("__id", "c").agg(F.count("*").alias("cnt"))
    lst = F.array_sort(
        F.collect_list(F.struct(F.col("c"), F.col("cnt")))
    )
    per_doc = counts.groupBy("__id").agg(
        lst.alias("__lst"), F.sum("cnt").alias("n_chars_total")
    )
    s = F.aggregate(
        F.col("__lst"),
        F.lit(0.0),
        lambda acc, x: acc
        + x["cnt"].cast("double") * F.log(x["cnt"].cast("double")),
    )
    n = F.col("n_chars_total").cast("double")
    return per_doc.select(
        F.col("__id").alias(id_col),
        "n_chars_total",
        F.size("__lst").alias("n_distinct_chars"),
        F.floor((F.log(n) - s / n) * F.lit(1_000_000)).alias(
            "entropy_micro"
        ),
    )
