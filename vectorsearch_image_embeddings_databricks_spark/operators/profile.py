"""Data profiling: per-column statistics in ONE aggregation pass
(north-star "operations a large-scale training-data pipeline would
need" — profiling is the first step of any corpus intake).

Long-format output (col_name, n_rows, n_null, n_distinct, min_value,
max_value) so the profile of a 1000-column table is still one skinny
DataFrame. All exact aggregates: the multi-DISTINCT plan uses Spark's
Expand operator (one shuffle per distinct-column group); for quick looks
at 100 TB, pass ``approx_distinct=True`` to swap in HLL sketches
(approx_count_distinct) — one ordinary partial-agg shuffle, no Expand.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    approx_distinct: bool = False,
) -> DataFrame:
    """Profile ``cols`` (default: all) → one row per column:
    (col_name, n_rows, n_null, n_distinct, min_value, max_value).
    min/max are computed on the native type, then rendered as strings.

    Caveat: the min/max string rendering of TIMESTAMP columns goes
    through the session timezone (Spark cast-to-string semantics) —
    pin ``spark.sql.session.timeZone`` or derive a tz-free column first
    if the profile must be reproducible across drivers."""
    cols = list(cols) if cols is not None else list(df.columns)
    nd = (
        (lambda c: F.approx_count_distinct(c))
        if approx_distinct
        else (lambda c: F.countDistinct(c))
    )
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"__n_{c}"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nn_{c}"),
            nd(c).alias(f"__nd_{c}"),
            F.min(c).cast("string").alias(f"__min_{c}"),
            F.max(c).cast("string").alias(f"__max_{c}"),
        ]
    row = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col(f"__n_{c}").alias("n_rows"),
            F.col(f"__nn_{c}").cast("long").alias("n_null"),
            F.col(f"__nd_{c}").alias("n_distinct"),
            F.col(f"__min_{c}").alias("min_value"),
            F.col(f"__max_{c}").alias("max_value"),
        )
        for c in cols
    ]
    return row.select(F.explode(F.array(*per_col)).alias("s")).select("s.*")
