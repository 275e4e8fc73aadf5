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
