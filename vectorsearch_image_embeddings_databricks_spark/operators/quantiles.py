"""Grouped EXACT order statistics at scale — quantile bounds and
winsorized aggregates per group (the outlier-trimming step of a metric
pipeline: clamp each group's values to its own [p_lo, p_hi] before
averaging).

The naive formulation — ``row_number() OVER (PARTITION BY group ORDER
BY value)`` — collapses each group onto ONE reducer; with the handful
of groups a real events table has, that is a few tasks sorting the
whole 100 TB. The scalable shape generalizes
``textstats.distributed_ntile``'s range-exchange trick to grouped
ranks:

    repartitionByRange(group, value, id)       -- one range exchange;
                                               -- each GROUP spans MANY
                                               -- consecutive partitions
    row_number() OVER (PARTITION BY pid, group ORDER BY value, id)
                                               -- bounded local sorts
    per-(group, pid) counts                    -- |groups|·|partitions|
                                               -- rows to the driver
    global rank = prefix-offset(group, pid) + local rank

so no task ever holds more than one partition's slice of a group, and
the only driver state is the (group × partition) count grid. Quantile
indices use exact integer ceilings (k = ceil(q·n) with q a rational
p/q_den), so the bounds are order statistics both engines agree on
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def grouped_ranked(
    df: DataFrame,
    group_col: str,
    value_col: str,
    tiebreak_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """``df`` + ``__grank`` = exact 1-based rank of ``value_col`` within
    ``group_col`` (ties broken by ``tiebreak_col``), computed with a
    range exchange + partition-local windows + a bounded driver count
    grid — never a per-group global window. ``group_col`` must be a
    string column (the offset grid's schema)."""
    cols = [F.col(group_col), F.col(value_col), F.col(tiebreak_col)]
    ranged = (
        df.repartitionByRange(num_partitions, *cols)
        if num_partitions is not None
        else df.repartitionByRange(*cols)
    )
    ranged = ranged.withColumn("__pid", F.spark_partition_id())
    w = Window.partitionBy("__pid", group_col).orderBy(value_col, tiebreak_col)
    ranked = ranged.withColumn("__lrn", F.row_number().over(w)).localCheckpoint(
        eager=True
    )
    counts = sorted(
        (r[group_col], r["__pid"], r["c"])
        for r in ranked.groupBy(group_col, "__pid")
        .agg(F.count("*").alias("c"))
        .collect()
    )
    offsets, acc = [], {}
    for g, pid, c in counts:
        offsets.append((g, pid, acc.get(g, 0)))
        acc[g] = acc.get(g, 0) + c
    spark = df.sparkSession
    off_df = F.broadcast(
        spark.createDataFrame(
            offsets, f"{group_col} string, __pid int, __off long"
        )
    )
    return (
        ranked.join(off_df, [group_col, "__pid"])
        .withColumn("__grank", F.col("__off") + F.col("__lrn"))
        .drop("__pid", "__lrn", "__off")
    )


def winsorized_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    tiebreak_col: str,
    lo_num: int = 1,
    hi_num: int = 19,
    q_den: int = 20,
) -> DataFrame:
    """Per-group winsorized aggregate: clamp each group's INTEGER values
    to its exact [ceil(lo·n/den)-th, ceil(hi·n/den)-th] order statistics
    and report the clamped sum — all long arithmetic, so the result is
    engine-exact with no float policy.

    Returns (group, n, lo_bound, hi_bound, sum_winsorized).
    """
    ranked = grouped_ranked(df, group_col, value_col, tiebreak_col)
    totals = ranked.groupBy(group_col).agg(F.count("*").alias("__n"))
    with_n = ranked.join(F.broadcast(totals), group_col)
    k_lo = F.expr(f"(__n * {lo_num} + {q_den - 1}) div {q_den}")
    k_hi = F.expr(f"(__n * {hi_num} + {q_den - 1}) div {q_den}")
    bounds = (
        with_n.filter(
            (F.col("__grank") == k_lo) | (F.col("__grank") == k_hi)
        )
        .groupBy(group_col)
        .agg(
            F.min(
                F.when(F.col("__grank") == k_lo, F.col(value_col))
            ).alias("lo_bound"),
            F.max(
                F.when(F.col("__grank") == k_hi, F.col(value_col))
            ).alias("hi_bound"),
        )
    )
    # degenerate tiny groups: k_lo == k_hi leaves one bound null
    bounds = bounds.select(
        group_col,
        F.coalesce("lo_bound", "hi_bound").alias("lo_bound"),
        F.coalesce("hi_bound", "lo_bound").alias("hi_bound"),
    )
    clamped = F.least(
        F.greatest(F.col(value_col), F.col("lo_bound")), F.col("hi_bound")
    )
    return (
        ranked.join(F.broadcast(bounds), group_col)
        .groupBy(group_col)
        .agg(
            F.count("*").alias("n"),
            F.min("lo_bound").alias("lo_bound"),
            F.max("hi_bound").alias("hi_bound"),
            F.sum(clamped).alias("sum_winsorized"),
        )
    )


def integer_zscore_outliers(
    df: DataFrame,
    group_col: str,
    value_cents: Column | str,
    k: int = 2,
) -> DataFrame:
    """Per-group σ-threshold outlier counts with EXACT integer algebra —
    the anomaly gate (|x − μ| > k·σ) a data-quality pipeline runs per
    entity, made engine-exact by never materializing μ or σ as floats:

        (x − μ)² > k²σ²
        ⟺ (n·x − S)² > k²·(n·Q − S²)      with S = Σx, Q = Σx² (ints)

    so membership is decided by cross-multiplied INTEGER comparisons on
    cent-scaled values (the dec() money policy). Float mean/variance
    would be partial-aggregation-order-dependent; this is not.

    Scale shape: one group-key partial-agg groupBy to |groups| rows of
    (n, S, Q), one equi-join back on the group key, a second |groups|-
    row rollup. Long arithmetic overflows around n·Q ≈ 9·10¹⁸ — at
    ~10⁶ events/group with 10⁵-cent values switch the accumulators to
    DECIMAL(38,0); the comparison algebra is unchanged."""
    v = F.col(value_cents) if isinstance(value_cents, str) else value_cents
    v = v.cast("long")  # an int32 input would overflow v*v at |v| ≥ 46341
    stats = df.groupBy(group_col).agg(
        F.count("*").alias("__n"),
        F.sum(v).alias("__s"),
        F.sum(v * v).alias("__q"),
    )
    dev = F.col("__n") * v - F.col("__s")
    spread = F.lit(k * k) * (
        F.col("__n") * F.col("__q") - F.col("__s") * F.col("__s")
    )
    return (
        df.join(stats, group_col)
        .select(
            F.col(group_col),
            ((dev * dev) > spread).cast("int").alias("__is_out"),
        )
        .groupBy(group_col)
        .agg(
            F.count("*").alias("n_events"),
            F.sum("__is_out").alias("n_outliers"),
        )
    )


def quantile_sketch_audit(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quantiles: list[float],
    accuracy: int = 100,
) -> DataFrame:
    """Rank-error audit of Spark's built-in mergeable quantile sketch
    (``percentile_approx`` — Greenwald-Khanna): per group and target
    quantile q, check that the sketch's returned value sits within the
    algorithm's documented rank guarantee (|true_rank(v)/n - q| <=
    1/accuracy). Returns ``(group, q_micro, within)`` with within = 1
    on a healthy sketch.

    This is the quantile analog of the CMS/HLL audit rows: the sketch
    is the 100 TB path (single-pass, mergeable partial aggregates, no
    per-group global sort — compare winsorized_stats' exact
    range-exchange machinery, which is what you pay when you need the
    exact order statistic), and the audit pins the accuracy contract
    so a sketch regression or a misused accuracy knob flips a
    hash-verified row instead of silently degrading a metric. Cost:
    the sketch aggregate + ONE extra scan to rank the returned values
    (|groups|·|quantiles| values broadcast into a conditional count).

    Rank convention: with v the returned value, GK guarantees an
    element whose rank is in [(q - eps)·n, (q + eps)·n]; we check that
    the CLOSED interval [count(x < v), count(x <= v)] of ranks v spans
    intersects it (exact for ties), entirely in integer arithmetic
    (micro-units) so both engines agree bitwise.
    """
    qs = F.array(*[F.lit(float(q)) for q in quantiles])
    # count(value_col), not count(*): percentile_approx and the rank
    # counts below all ignore NULLs, so n must too — counting nulls
    # deflates rank/n and flags a healthy sketch on nullable columns.
    sk = df.groupBy(group_col).agg(
        F.percentile_approx(value_col, qs, F.lit(accuracy)).alias("__vs"),
        F.count(value_col).alias("__n"),
    )
    per_q = sk.select(
        group_col,
        "__n",
        F.posexplode("__vs").alias("__qi", "__v"),
    )
    # per_q is |groups|·|quantiles| rows — pin IT as the broadcast side
    # so the corpus side never shuffles on the low-cardinality group
    # key (left to stats, Catalyst happily broadcasts the CORPUS at
    # fixture scale — the wrong side at any real scale).
    ranked = (
        df.select(group_col, value_col)
        .join(F.broadcast(per_q), group_col)
        .groupBy(group_col, "__qi", "__v", "__n")
        .agg(
            F.sum(
                F.when(F.col(value_col) < F.col("__v"), 1).otherwise(0)
            ).alias("__lt"),
            F.sum(
                F.when(F.col(value_col) <= F.col("__v"), 1).otherwise(0)
            ).alias("__le"),
        )
    )
    q_micro = F.element_at(
        F.array(*[F.lit(int(round(q * 1_000_000))) for q in quantiles]),
        F.col("__qi") + 1,
    )
    # integer bound check against Spark's documented guarantee
    # floor((q-eps)·N) <= rank(x) <= ceil((q+eps)·N): SOME rank in the
    # returned value's closed span [lt+1, le] must fall in that integer
    # window. floor/ceil matter — exact real-valued bounds are STRICTER
    # than the contract and flag legal answers at fractional
    # boundaries. TRULY integer arithmetic: the comparisons are
    # cross-multiplied into micro-units (for integers,
    # rank >= floor(P/1e6) <=> 1e6·rank + 999999 >= P and
    # rank <= ceil(Q/1e6) <=> 1e6·rank <= Q + 999999), and the products
    # run in DECIMAL(38,0) so no double rounding or int64 overflow can
    # flip the audit at large N — a float division here rounds past
    # 2^53, i.e. exactly at the corpus sizes this path targets.
    eps_micro = 1_000_000 // accuracy
    dec38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    n = dec38(F.col("__n"))
    p_lo = (dec38(q_micro) - F.lit(eps_micro)) * n
    q_hi = (dec38(q_micro) + F.lit(eps_micro)) * n
    hi_rank_m = dec38(F.col("__le")) * F.lit(1_000_000)
    lo_rank_m = dec38(F.col("__lt") + 1) * F.lit(1_000_000)
    within = (
        (hi_rank_m + F.lit(999_999) >= p_lo)
        & (lo_rank_m <= q_hi + F.lit(999_999))
    ).cast("long")
    return ranked.select(
        group_col,
        q_micro.cast("long").alias("q_micro"),
        within.alias("within"),
    )
