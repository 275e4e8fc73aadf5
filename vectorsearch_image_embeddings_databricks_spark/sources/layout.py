"""Physical data layout operators: bucketing, partitioned layout, and
small-file compaction (SURVEY.md §4 + the prompt-level scale mandates:
"use bucketing for co-located joins", "size partitions so they fit").

At 100 TB these determine whether joins shuffle at all:

- **Bucketed tables**: two tables bucketed by the same key into the same
  bucket count join with NO Exchange on either side (verified in
  tests/test_plans.py). This is the Spark-native equivalent of
  co-partitioned storage in MPP warehouses.
- **Partitioned layout**: directory-partitioning on low-cardinality
  columns gives partition PRUNING at the file-listing level; sorting
  within files tightens min/max column statistics so row groups skip.
- **Compaction**: streaming/incremental pipelines accrete small files;
  scan throughput collapses when file count ≫ cores. Compact to a target
  in-memory-estimated size.
- **Z-order clustering**: multi-dimensional layout (Morton-interleaved
  sort key) so min/max stats prune on ANY clustered column, not just a
  single sort axis.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sort-within-bucket) managed
    table. Joins/aggregations on ``bucket_col`` between tables sharing
    (key, num_buckets) plan without a shuffle."""
    writer = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Directory-partitioned parquet with optional within-file ordering
    (min/max stats clustering — the poor man's Z-order for one axis)."""
    if sort_cols:
        df = df.sortWithinPartitions(*sort_cols)
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def zorder_value(
    cols: list, mins: list, maxs: list, bits_per_col: int = 8
):
    """Z-order (Morton) key over numeric columns as a pure column
    expression: each column is uniform-bucketed to ``bits_per_col`` bits
    inside its [min, max] envelope, then the bits are interleaved —
    round-robin across columns, most-significant first — so rows close in
    EVERY dimension get close keys.

    The driver supplies the envelopes (a cheap min/max aggregate, or
    known domain bounds); bucketing is uniform-width, which is the
    standard practical trade-off (rank-exact bucketing would need a
    global sort of each column first).

    NULLs bucket to 0 explicitly: without the coalesce a null input
    nulls the bucket, and because least/greatest skip nulls the row
    would silently land in the MAX bucket — polluting the top-corner
    files' min/max envelopes and quietly degrading pruning on every
    clustered column. Bucket 0 keeps null rows clustered together at the
    low corner instead (nulls-first, matching Spark's default sort
    order).
    """
    from pyspark.sql import functions as F

    bucketed = []
    for c, lo, hi in zip(cols, mins, maxs):
        if lo is None or hi is None:  # all-null column: one bucket
            lo, hi = 0.0, 1.0
        span = float(hi) - float(lo)
        span = span if span > 0 else 1.0
        b = F.floor(
            (F.col(c).cast("double") - F.lit(float(lo)))
            / F.lit(span)
            * F.lit(float(1 << bits_per_col))
        ).cast("long")
        b = F.coalesce(b, F.lit(0).cast("long"))
        bucketed.append(
            F.greatest(
                F.lit(0).cast("long"),
                F.least(b, F.lit((1 << bits_per_col) - 1).cast("long")),
            )
        )
    z = F.lit(0).cast("long")
    # interleave: output bit (bit_i * n + col_j) takes col_j's bit_i.
    # bitwiseOR/bitwiseAND, not |/& — on Columns those are BOOLEAN ops.
    for bit in range(bits_per_col - 1, -1, -1):
        for b in bucketed:
            z = F.shiftleft(z, 1).bitwiseOR(
                F.shiftright(b, bit).bitwiseAND(F.lit(1).cast("long"))
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list,
    num_files: int,
    bits_per_col: int = 8,
    mode: str = "overwrite",
) -> None:
    """Multi-dimensional clustering (Delta's OPTIMIZE ZORDER, natively):
    range-partition + sort by the interleaved key so every output file
    covers a small hyper-rectangle of the column space — parquet min/max
    stats then prune files/row-groups for predicates on ANY of the
    z-columns, where single-column sorting only helps its one column.
    One range shuffle; envelope discovery is a single min/max aggregate.
    """
    from pyspark.sql import functions as F

    row = df.agg(
        *[F.min(c).alias(f"lo_{i}") for i, c in enumerate(cols)],
        *[F.max(c).alias(f"hi_{i}") for i, c in enumerate(cols)],
    ).collect()[0]
    mins = [row[f"lo_{i}"] for i in range(len(cols))]
    maxs = [row[f"hi_{i}"] for i in range(len(cols))]
    z = zorder_value(cols, mins, maxs, bits_per_col)
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite a parquet directory into ≈target-sized files; returns the
    output file count. Source size is taken from the file listing (exact,
    no sampling); output uses coalesce (no shuffle) since compaction only
    merges — it never needs to redistribute."""
    import os

    total = 0
    for root, _dirs, files in os.walk(src):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n_files = max(1, math.ceil(total / target_file_bytes))
    spark.read.parquet(src).coalesce(n_files).write.mode("overwrite").parquet(dst)
    return n_files
