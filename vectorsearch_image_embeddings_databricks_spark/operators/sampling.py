"""Deterministic sampling for training-data pipelines (north-star scale
operators; companions to the dedup family).

``df.sample`` is seed-stable only for a fixed partitioning — repartition
the input and the sample changes. These operators hash a STABLE KEY
instead: membership is a pure function of (key, seed), so samples are
reproducible across runs, partitionings, and cluster sizes, rerunnable
per-partition on task retry, and consistent between a pipeline's stages
(the property training-data dedup/eval splits actually need).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1_000_000


def _bucket(key: Column | str, seed: int) -> Column:
    c = F.col(key) if isinstance(key, str) else key
    return F.pmod(F.xxhash64(c, F.lit(seed)), F.lit(_BUCKETS))


def hash_sample(
    df: DataFrame, key: str, fraction: float, seed: int = 0
) -> DataFrame:
    """Keep ≈``fraction`` of rows, chosen by hash-bucketing ``key``.

    Filter-only: pushes to the scan-adjacent Filter, no shuffle, no RNG
    state. The same (key, seed) always lands on the same side."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return df.filter(_bucket(key, seed) < int(fraction * _BUCKETS))


def train_eval_split(
    df: DataFrame, key: str, eval_fraction: float = 0.1, seed: int = 0
) -> tuple[DataFrame, DataFrame]:
    """Disjoint, exhaustive, deterministic (train, eval) split on a key —
    the two sides are complementary hash ranges, so no row is lost or
    duplicated even across separate pipeline runs."""
    cut = int(eval_fraction * _BUCKETS)
    b = _bucket(key, seed)
    return df.filter(b >= cut), df.filter(b < cut)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[str, float],
    key: str,
    seed: int = 0,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. rebalance languages or
    sources in a corpus). ``fractions`` maps stratum value → keep rate;
    strata not listed keep ``default_fraction``. Single filter pass."""
    cut = F.lit(int(default_fraction * _BUCKETS))
    for value, frac in fractions.items():
        cut = F.when(
            F.col(strata_col) == value, F.lit(int(frac * _BUCKETS))
        ).otherwise(cut)
    return df.filter(_bucket(key, seed) < cut)


def stratified_sample_md5(
    df: DataFrame,
    strata_col: str,
    cut_hex: Mapping[str, str],
    key: str,
    default_cut_hex: str = "00",
) -> DataFrame:
    """Cross-engine-verifiable stratified sampler: keep a row iff
    ``md5(cast(key as string))`` sorts below the stratum's hex cutoff
    (two hex chars ⇒ keep rate = int(cut,16)/256; "g" > every hex char ⇒
    keep all). Same membership-is-a-pure-function-of-the-key property as
    ``stratified_sample`` but with a hash every engine implements
    identically, so the sampled *rows* (not just the rates) can be
    hash-checked against a SQL oracle. Production path stays the xxhash64
    variant (faster, seedable); this one is the auditable twin."""
    digest = F.md5(F.col(key).cast("string"))
    cut = F.lit(default_cut_hex)
    for value, hexcut in cut_hex.items():
        cut = F.when(F.col(strata_col) == value, F.lit(hexcut)).otherwise(cut)
    return df.filter(digest < cut)


def mixture_rebalance_plan(
    df: DataFrame,
    strata_col: str,
    target_shares_micro: Mapping[str, int],
) -> DataFrame:
    """Per-stratum downsampling plan to hit a target corpus mixture.

    Data-mixing step of a training pipeline: given target shares per
    domain (micro-units, summing to 1_000_000), compute how many docs of
    each stratum to keep so the sampled corpus has exactly the target
    mixture, without upsampling any stratum. The binding stratum (the one
    scarcest relative to its target) is kept in full:

        n_budget  = min_s (count_s * 1e6 div target_s)   -- achievable total
        n_keep_s  = target_s * n_budget div 1e6
        rate_s    = n_keep_s * 1e6 div count_s           -- micro-units

    All integer math (div = floor for the non-negative operands here), so
    the plan is engine-exact and oracle-checkable. Strata absent from
    ``target_shares_micro`` get n_keep = 0 (dropped from the mixture).
    A LISTED stratum with zero rows in ``df`` simply contributes no
    plan row: the remaining strata keep their relative target ratios but
    the exact absolute mixture is unachievable — check the output covers
    every targeted stratum if that matters to the caller.

    Scale shape: one partial-aggregated groupBy over the corpus produces
    |strata| rows; the scalar min is broadcast back — no wide shuffle,
    no collect. Feed the rates to ``stratified_sample`` (production) or
    ``stratified_sample_md5`` (auditable) to materialize the sample.
    """
    total = sum(target_shares_micro.values())
    if not 0 < total <= 1_000_000:
        raise ValueError(
            f"target shares must sum to (0, 1e6], got {total}"
        )
    target = F.lit(None).cast("long")
    for value, share in target_shares_micro.items():
        target = (
            F.when(F.col(strata_col) == value, F.lit(int(share)))
            .otherwise(target)
        )
    counts = (
        df.groupBy(strata_col)
        .agg(F.count("*").alias("n_docs"))
        .withColumn("__target", target)
        # |strata| rows; materialize once so the scalar-min branch and
        # the output branch don't each rescan the corpus
        .localCheckpoint(eager=True)
    )
    budget = counts.filter(F.col("__target").isNotNull()).agg(
        F.min(F.expr("(n_docs * 1000000) div __target")).alias("__budget")
    )
    return (
        counts.crossJoin(F.broadcast(budget))
        .select(
            strata_col,
            "n_docs",
            F.coalesce(
                F.expr("(__target * __budget) div 1000000"), F.lit(0)
            ).alias("n_keep"),
        )
        .withColumn(
            "rate_micro", F.expr("(n_keep * 1000000) div n_docs")
        )
    )


def deterministic_shuffle(df: DataFrame, key: str, seed: int = 0) -> DataFrame:
    """Reproducible global shuffle for training order: sort by
    ``xxhash64(key, seed)`` (ties broken by the key itself, so the order
    is total). The standard pre-training materialization step — epoch k
    uses seed k, and the order is identical across reruns, partitionings
    and cluster sizes, unlike ``orderBy(rand())``.

    This IS a full sort (range-partitioned exchange + per-partition
    sort) — the one shuffle a training-data pipeline deliberately pays
    right before writing shards. Write the result with
    ``df.write.parquet`` and downstream readers stream it in order."""
    return df.orderBy(F.xxhash64(F.col(key), F.lit(seed)), F.col(key))


def weighted_sample_es(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """Weighted sampling without replacement, Efraimidis-Spirakis
    (2006): draw u ~ U(0,1] per row, keep the k largest u^(1/w) — every
    subset's inclusion probability is proportional to its weights, in
    ONE pass with no sequential state. The training-mixture primitive
    for "sample 10M docs ∝ quality score".

    Determinism/portability: u comes from the first 6 md5 hex digits of
    the id (cross-engine identical, the repo's seeded-sampling
    convention), and rows are ranked by ln(u)/w DESCENDING (monotone in
    u^(1/w), avoids the pow); the selection is a
    TakeOrderedAndProject — per-partition top-k before the driver
    merge, no shuffle, no window.
    """
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 6), 16, 10)
        .cast("double")
        + F.lit(1.0)
    ) / F.lit(float(16**6))
    key = F.log(u) / F.col(weight_col).cast("double")
    # w <= 0 has no sampling probability (and ln(u)/0 is ±inf/NaN, whose
    # sort order is engine-specific) — excluded by definition, both here
    # and in the SQL oracle
    df = df.filter(F.col(weight_col) > 0)
    scored = df.select(
        F.col(id_col).alias("id"),
        F.col(weight_col).cast("long").alias("weight"),
        key.alias("__key"),
    )
    return (
        scored.orderBy(F.desc("__key"), "id")
        .limit(k)
        .select("id", "weight", F.round("__key", 6).alias("es_key"))
    )


def temperature_quotas(
    df: DataFrame,
    group_col: str,
    total: int,
) -> DataFrame:
    """Temperature-based multilingual sampling quotas (the α-smoothing
    of mBERT/XLM-R/mT5 pipelines, α = 1/2): per-group sample quota
    ∝ n_g^α, boosting low-resource groups relative to proportional
    sampling. Returns one row per group with its raw count, micro-int
    weight, and integer quota out of ``total``.

    Exactness: α = 1/2 makes the weight ``floor(sqrt(n)·1e6)`` — IEEE
    754 requires sqrt correctly rounded (unlike ln/exp), so the double
    is bit-identical on every engine and the floor is policy-free; the
    quota is pure integer arithmetic on those weights, carried in
    DECIMAL(38,0) because ``total × weight_micro`` overflows int64 once
    groups reach ~1e12 rows (weight ≈ 1e12) against a 1e12-row total.
    Floor-divided quotas sum to less than ``total``; the shortfall is
    redistributed by largest remainder (ties to the smaller group
    value), so ``sum(quota) == total`` exactly. Scale shape: one
    partial-agg groupBy to |groups| rows, two broadcast scalars, and a
    rank window over the BOUNDED |groups|-row table (never the corpus)
    — corpus touched once."""
    from pyspark.sql import Window

    counts = df.groupBy(group_col).agg(F.count("*").alias("n_docs"))
    w = F.floor(F.sqrt(F.col("n_docs")) * F.lit(1_000_000)).alias(
        "weight_micro"
    )
    weighted = counts.select(group_col, "n_docs", w)
    tot = weighted.agg(
        F.sum(F.col("weight_micro").cast("decimal(38,0)")).alias("__tw")
    )
    num = (
        f"CAST({int(total)} AS DECIMAL(38,0))"
        " * CAST(weight_micro AS DECIMAL(38,0))"
    )
    based = weighted.crossJoin(F.broadcast(tot)).select(
        group_col,
        "n_docs",
        "weight_micro",
        F.expr(f"CAST(({num}) div __tw AS BIGINT)").alias("__base"),
        F.expr(f"({num}) % __tw").alias("__rem"),
    )
    short = based.agg(
        (F.lit(int(total)) - F.sum("__base")).cast("long").alias("__short")
    )
    # |groups|-row table: the unpartitioned rank window is bounded
    rk = F.row_number().over(
        Window.orderBy(F.desc("__rem"), F.col(group_col))
    )
    return (
        based.withColumn("__rk", rk)
        .crossJoin(F.broadcast(short))
        .select(
            group_col,
            "n_docs",
            "weight_micro",
            (
                F.col("__base")
                + F.when(F.col("__rk") <= F.col("__short"), F.lit(1))
                .otherwise(F.lit(0))
            ).cast("long").alias("quota"),
        )
    )
