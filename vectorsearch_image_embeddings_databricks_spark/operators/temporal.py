"""Temporal operators Spark lacks as built-ins: as-of join and
gap-based sessionization (SURVEY.md §2.2 'joins … as-of' row; north-star
scale operators for event/feature pipelines).

Both are implemented as compositions of existing DataFrame ops (the
prompt's preferred strategy (a)) — no UDFs, no mapPartitions:

- **as-of join**: union the two sides, one ordered window per key, carry
  the last right-side payload forward. One shuffle on the join key —
  the same cost class as a regular sort-merge join, and immune to the
  row-explosion a naive range-condition join produces.
- **sessionize**: lag + cumulative sum over a per-key window — the
  standard two-window formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row: the most recent right row with
    right_ts <= left_ts within the same key (backward as-of, inclusive —
    DuckDB ``ASOF JOIN`` semantics, so the oracle can restate it).

    Left rows with no prior right row keep NULL payloads (left join).
    """
    lhs = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    rhs_cols = [F.col(key), F.col(right_ts).alias("__ts"), F.lit(0).alias("__side")]
    rhs = right.select(
        *rhs_cols, *[F.col(c).alias(f"{c}{suffix}") for c in payload_cols]
    )
    for c in left.columns:
        if c != key and c not in (pc + suffix for pc in payload_cols):
            rhs = rhs.withColumn(c, F.lit(None)) if c not in rhs.columns else rhs
    unioned = lhs.unionByName(rhs, allowMissingColumns=True)
    # right rows sort before left rows at equal ts → inclusive (>=) match
    w = (
        Window.partitionBy(key)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"__carry_{c}")
            for c in payload_cols
        ],
    )
    out = carried.filter(F.col("__side") == 1).select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"__carry_{c}").alias(f"{c}{suffix}") for c in payload_cols],
    )
    return out


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap: int,
) -> DataFrame:
    """Assign session ids: a new session starts when the time since the
    previous event of the same key exceeds ``gap`` (same units as ts_col).

    Returns df + ``session_id`` (0-based per key). Two stacked windows on
    the same (key, ts) ordering — one shuffle, one sort."""
    w = Window.partitionBy(key).orderBy(ts_col)
    gap_flag = (
        F.when(
            F.col(ts_col) - F.lag(ts_col).over(w) > gap, 1
        ).otherwise(0)
    )
    return df.withColumn("session_id", F.sum(gap_flag).over(w))


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower: int,
    upper: int,
    payload_cols: list[str],
    suffix: str = "_r",
) -> DataFrame:
    """Interval join: all right rows of the same key with
    ``right_ts ∈ [left_ts + lower, left_ts + upper]`` (inclusive).

    A naive inequality join plans as a nested-loop join — quadratic per
    key. Instead: pick a bucket width = the window span, explode each left
    row into the (≤2) covering buckets, put each right row in its single
    bucket, equi-join on (key, bucket), then apply the exact range filter.
    The shuffle is keyed on (key, bucket) — linear, skew-safe under AQE —
    and this is the shape that survives 100 TB.

    Timestamps must share one integer unit (the fixtures use epoch nanos).
    """
    span = upper - lower
    if span <= 0:
        raise ValueError("upper must be > lower")
    w = span
    lhs = left.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.expr(f"({left_ts} + {lower}) div {w}"),
                F.expr(f"({left_ts} + {upper}) div {w}"),
            )
        ),
    )
    rhs = right.select(
        F.col(key).alias("__rk"),
        F.col(right_ts).alias("__rts"),
        F.expr(f"{right_ts} div {w}").alias("__b"),
        *[F.col(c).alias(f"{c}{suffix}") for c in payload_cols],
    )
    joined = lhs.join(
        rhs,
        (F.col(key) == F.col("__rk"))
        & (lhs["__b"] == rhs["__b"])
        & (F.col("__rts") >= F.col(left_ts) + F.lit(lower))
        & (F.col("__rts") <= F.col(left_ts) + F.lit(upper)),
    )
    return joined.select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"{c}{suffix}") for c in payload_cols],
    )


def gapfill_locf(
    df: DataFrame,
    series_col: str,
    bucket_col: str,
    agg_cols: dict,
    fill_cols: list[str],
) -> DataFrame:
    """Hypertable-style gap filling: densify integer time buckets per
    series and carry values forward (LOCF) across the gaps.

    ``df`` is the RAW event table with an integer ``bucket_col`` already
    derived (e.g. ``ts div 3_600_000_000_000`` for hours over epoch
    nanos — keep it integer and timezone-free). ``agg_cols`` maps output
    name -> aggregate Column over a bucket; names in ``fill_cols`` are
    forward-filled across empty buckets (others default per their
    aggregate's null → caller coalesces).

    Scale shape: the heavy work is the per-bucket aggregate (partial-agg
    groupBy, one shuffle keyed (series, bucket)). The dense grid is
    |series| × |buckets| — a function of calendar span, not corpus size —
    built from a 1-row global extent via ``sequence``/``explode`` and a
    broadcast of the distinct series keys. The LOCF window partitions by
    series (never unpartitioned) over grid-sized input.
    """
    # |series|·|occupied buckets| rows; materialized once — the extent
    # scalar, the series key set, and the grid join all read it, and
    # without the checkpoint each branch re-runs the corpus-wide
    # aggregate (three full scans observed in the physical plan)
    agg = (
        df.groupBy(series_col, bucket_col)
        .agg(*[c.alias(name) for name, c in agg_cols.items()])
        .localCheckpoint(eager=True)
    )
    extent = agg.agg(
        F.min(bucket_col).alias("__mn"), F.max(bucket_col).alias("__mx")
    )
    buckets = extent.select(
        F.explode(F.sequence("__mn", "__mx")).alias(bucket_col)
    )
    series = agg.select(series_col).distinct()
    grid = buckets.crossJoin(F.broadcast(series))
    dense = grid.join(agg, [series_col, bucket_col], "left")
    w = (
        Window.partitionBy(series_col)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for name in fill_cols:
        dense = dense.withColumn(name, F.last(name, ignorenulls=True).over(w))
    return dense


def time_weighted_avg(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_cents_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Time-weighted average with LOCF interpolation (TimescaleDB's
    ``time_weight('LOCF', …)``): each observation holds until the next
    one, so its weight is the interval it covered —
    twa = Σ value·Δt / Σ Δt over [first_ts, last_ts) per key.

    Exactness contract: ``value_cents_col`` must be an integer (the
    caller scales the measure; cents for 2-dp fixtures), ``ts_col`` an
    integer epoch. Every product/sum is then a long and the final
    micro-scaled ratio is computed with integral division in DECIMAL(38)
    (exact, engine-identical) — a float Σ value·Δt would be
    add-order-dependent and non-portable.

    Plan: one lead() window PARTITIONED by the key (never global), one
    partial-agg groupBy. Rows with no successor (the last observation
    per key) carry no interval; keys with a single observation drop
    (their covered duration is zero). ``tiebreak_col`` totalizes the
    order under equal timestamps (ties would otherwise make the
    lead() pairing — and thus which value gets the zero-length
    interval — engine/partitioning-dependent).
    """
    order = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    w = Window.partitionBy(*key_cols).orderBy(*order)
    stepped = df.withColumn("__next_ts", F.lead(ts_col).over(w)).filter(
        F.col("__next_ts").isNotNull()
    )
    dt = F.col("__next_ts") - F.col(ts_col)
    return (
        stepped.groupBy(*key_cols)
        .agg(
            F.sum(F.col(value_cents_col) * dt).alias("__num"),
            F.sum(dt).alias("__den"),
            F.count("*").alias("n_intervals"),
        )
        .select(
            *key_cols,
            "n_intervals",
            F.expr(
                "CAST(CAST(__num AS DECIMAL(38,0)) * 10000 div __den "
                "AS BIGINT)"
            ).alias("twa_micro"),
        )
    )


def event_transitions(
    df: DataFrame,
    key: str,
    seq_cols: list[str],
    state_col: str,
) -> DataFrame:
    """First-order Markov transition counts: for each entity (``key``),
    pair every event with its successor in ``seq_cols`` order and count
    (from_state → to_state) transitions corpus-wide — the journey/
    clickstream matrix behind session-flow and next-event models.

    ``seq_cols`` must totalize the per-entity order (timestamp + unique
    id tie-break), otherwise same-timestamp neighbors make the pairing
    partition-dependent. Scale shape: ONE window partitioned by the
    entity key (each task sorts only its own entities — never a global
    sort) followed by a |states|²-sized groupBy with map-side partials."""
    w = Window.partitionBy(key).orderBy(*seq_cols)
    return (
        df.select(
            F.col(state_col).alias("from_state"),
            F.lead(state_col).over(w).alias("to_state"),
        )
        .filter(F.col("to_state").isNotNull())
        .groupBy("from_state", "to_state")
        .agg(F.count("*").alias("n_transitions"))
    )


def window_funnel(
    df: DataFrame,
    key: str,
    ts_col: str,
    tiebreak_col: str,
    state_col: str,
    steps: list[str],
    span: int,
) -> DataFrame:
    """Multi-step windowed funnel (ClickHouse ``windowFunnel``): per
    entity, the deepest prefix of ``steps`` completed in strict order,
    where each step's event is the EARLIEST qualifying one (first-match
    semantics), step k+1 must be strictly later than step k, and every
    step must land within ``span`` of the FIRST step's event time
    (``ts_col`` is numeric epoch; ``span`` in the same unit). Returns
    ``(step, step_name, n_entities)`` with n_entities = entities
    reaching AT LEAST that step — the funnel conversion curve.

    First-match semantics make the result equal to the chain of
    sequential per-entity ``min(ts)`` lookups (the SQL formulation), so
    the operator is oracle-checkable even though the implementation is
    a fold.

    Scale shape: ONE groupBy on the entity key; each entity's events
    are sorted row-locally (bounded by that entity's own history, the
    same contract as sessionization) and folded by a codegen'd
    ``aggregate`` HOF — no self-join per step (the naive SQL shape is
    |steps| joins over the corpus), no window. The funnel curve rollup
    is |steps| rows."""
    ev = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(ts_col).alias("ts"),
                F.col(tiebreak_col).alias("tb"),
                F.col(state_col).alias("st"),
            )
        )
    )
    steps_lit = F.array(*[F.lit(s) for s in steps])
    zero = F.struct(
        F.lit(0).alias("step"),
        F.lit(-1).cast("long").alias("t0"),
        F.lit(-1).cast("long").alias("tprev"),
    )

    def fold(acc, e):
        advance = (
            (acc["step"] < F.lit(len(steps)))
            & (e["st"] == F.element_at(steps_lit, acc["step"] + 1))
            & (
                (acc["step"] == 0)
                | (
                    (e["ts"] > acc["tprev"])
                    & (e["ts"] - acc["t0"] <= F.lit(span))
                )
            )
        )
        return F.when(
            advance,
            F.struct(
                (acc["step"] + 1).alias("step"),
                F.when(acc["step"] == 0, e["ts"])
                .otherwise(acc["t0"])
                .alias("t0"),
                e["ts"].alias("tprev"),
            ),
        ).otherwise(acc)

    depth = (
        df.filter(F.col(state_col).isin(steps))
        .groupBy(key)
        .agg(F.aggregate(ev, zero, fold)["step"].alias("depth"))
    )
    grid = (
        depth.sparkSession.range(1)
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i + 1).alias("step"),
                            F.lit(s).alias("step_name"),
                        )
                        for i, s in enumerate(steps)
                    ]
                )
            ).alias("g")
        )
        .select("g.step", "g.step_name")
    )
    reached = (
        depth.groupBy("depth").agg(F.count("*").alias("n_at"))
    )
    return (
        grid.join(
            F.broadcast(reached), F.col("depth") >= F.col("step"), "left"
        )
        .groupBy("step", "step_name")
        .agg(F.coalesce(F.sum("n_at"), F.lit(0)).alias("n_entities"))
    )
