"""Slowly-changing-dimension type 2 maintenance (the guide's "CDC /
SCD2" OLAP pattern): apply a change batch to a versioned dimension
without Delta's MERGE INTO, emulated exactly with join + union —
the pure-DataFrame equivalent of

    MERGE INTO dim USING changes ON dim.key = changes.key AND dim.is_current
    WHEN MATCHED THEN UPDATE SET valid_to = change_ts, is_current = false
    ... plus an INSERT of the new versions.

Scale shape: one equi-join of the dimension against the (typically tiny,
broadcastable) change batch plus a union — no window over the dimension,
no full rewrite of history partitions. History rows pass through
untouched, so with the dimension partitioned on ``is_current`` only the
current partition is ever rewritten at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key: str,
    change_ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_flag: str = "is_current",
    broadcast_changes: bool = True,
) -> DataFrame:
    """Apply ``changes`` (one NEW attribute row per changed key, stamped
    ``change_ts_col``) to a type-2 versioned ``dim``.

    ``dim`` carries ``key``, the attribute columns, ``valid_from``,
    ``valid_to`` (null = open) and ``current_flag``. ``changes`` carries
    ``key``, the same attribute columns, and ``change_ts_col``. If a key
    changes more than once in the batch, the LATEST change wins (earlier
    ones are collapsed — per-batch granularity, the standard microbatch
    SCD2 contract).

    Returns the new versioned dimension:
    - history rows (``current_flag`` false) unchanged;
    - current rows of changed keys closed (``valid_to`` = change ts,
      flag false);
    - unchanged current rows untouched;
    - one new open version per changed key.
    """
    attr_cols = [
        c
        for c in dim.columns
        if c not in (key, valid_from, valid_to, current_flag)
    ]
    latest = Window.partitionBy(key).orderBy(F.desc(change_ts_col))
    ch = (
        changes.withColumn("__rn", F.row_number().over(latest))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    ch_keyed = ch.select(
        F.col(key), F.col(change_ts_col).alias("__change_ts")
    )
    if broadcast_changes:
        ch_keyed = F.broadcast(ch_keyed)

    closed_or_kept = (
        dim.join(ch_keyed, on=key, how="left")
        .withColumn(
            valid_to,
            F.when(
                F.col(current_flag) & F.col("__change_ts").isNotNull(),
                F.col("__change_ts"),
            ).otherwise(F.col(valid_to)),
        )
        .withColumn(
            current_flag,
            F.col(current_flag) & F.col("__change_ts").isNull(),
        )
        .drop("__change_ts")
    )
    new_versions = ch.select(
        F.col(key),
        *[F.col(c) for c in attr_cols],
        F.col(change_ts_col).alias(valid_from),
        F.lit(None).cast(dim.schema[valid_to].dataType).alias(valid_to),
        F.lit(True).alias(current_flag),
    )
    return closed_or_kept.unionByName(
        new_versions.select(*closed_or_kept.columns)
    )


def scd2_init(
    dim: DataFrame,
    key: str,
    initial_ts: Column,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_flag: str = "is_current",
) -> DataFrame:
    """Bootstrap a plain dimension snapshot into SCD2 shape (every row an
    open version as of ``initial_ts``)."""
    return dim.select(
        "*",
        initial_ts.alias(valid_from),
        F.lit(None).cast("timestamp").alias(valid_to),
        F.lit(True).alias(current_flag),
    )
