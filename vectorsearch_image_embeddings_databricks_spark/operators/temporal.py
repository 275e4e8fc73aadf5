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
