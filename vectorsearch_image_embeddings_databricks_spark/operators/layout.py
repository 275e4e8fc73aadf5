"""Z-order (Morton-curve) data layout — multi-dimensional clustering
for scan pruning, the lakehouse ``OPTIMIZE ... ZORDER BY`` primitive
re-expressed as pure column arithmetic.

Why it matters at 100 TB: min/max file statistics prune a scan only on
the SORT column; a table sorted by customer cannot prune date-range
predicates. Interleaving the bits of two (or more) key dimensions into
one Morton key and range-writing on it gives every file a SMALL
RECTANGLE of the (dim1, dim2) space, so predicates on EITHER dimension
prune files. The interleave below is plain integer arithmetic —
shift/mask per bit, OR-folded — so it stays inside whole-stage codegen
and is restated verbatim in the DuckDB oracle.

``zorder_layout_report`` quantifies the clustering win: bucket rows by
Morton-key prefix (what range-partitioned files would hold) and report
each bucket's bounding box; sum-of-box-areas ≪ full-space-area × buckets
is exactly the pruning factor a min/max index realizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_key(a: Column | str, b: Column | str, bits: int = 10) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns into a single Morton key (a's bit i → position 2i, b's →
    2i+1). Callers clamp/scale inputs into [0, 2^bits) first — values
    outside wrap via the masks, which would break locality, not
    correctness.

    Pure integer shift/mask expression: codegen'd, shuffle-free,
    engine-portable (the oracle states the same arithmetic with
    div/mod, which DuckDB and Spark evaluate identically on BIGINT)."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    av = F.col(a).cast("long") if isinstance(a, str) else a.cast("long")
    bv = F.col(b).cast("long") if isinstance(b, str) else b.cast("long")
    acc = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftright(av, i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(bv, i).bitwiseAND(F.lit(1))
        acc = (
            acc
            + F.shiftleft(abit, 2 * i)
            + F.shiftleft(bbit, 2 * i + 1)
        )
    return acc


def zorder_layout_report(
    df: DataFrame,
    a: Column,
    b: Column,
    bits: int = 10,
    bucket_shift: int = 14,
) -> DataFrame:
    """Cluster rows by Morton-key prefix (``zkey div 2^bucket_shift`` —
    the files a range-partitioned z-ordered write would produce) and
    report each bucket's row count and (a, b) bounding box.

    The bounding boxes are the whole point: each Morton prefix bucket
    covers a small aligned rectangle of the key space, so per-file
    min/max stats prune selective predicates on EITHER dimension. One
    codegen'd projection + one partial-agg groupBy on the bucket id —
    the same cost class as any single-key rollup.

    Returns (bucket, n_rows, a_min, a_max, b_min, b_max).
    """
    keyed = df.select(
        a.cast("long").alias("__a"), b.cast("long").alias("__b")
    ).select(
        "__a",
        "__b",
        F.shiftright(morton_key(F.col("__a"), F.col("__b"), bits), bucket_shift)
        .alias("bucket"),
    )
    return keyed.groupBy("bucket").agg(
        F.count("*").alias("n_rows"),
        F.min("__a").alias("a_min"),
        F.max("__a").alias("a_max"),
        F.min("__b").alias("b_min"),
        F.max("__b").alias("b_max"),
    )
