"""Skew-mitigation utilities (SURVEY.md §4 spill/shuffle row; the
prompt-level scale mandate: "skewed keys hurt … salting for skew").

AQE's skew-join handling splits oversized *partitions*, but a single
pathological key still lands in one task. Salting fixes that case:
spread each left-side key over ``salt`` sub-keys, replicate the right
side ``salt`` ways, join on (key, salt), done. Deterministic (the salt
comes from a hash of stable columns, not rand()) so results are
reproducible and retrying tasks is safe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 8,
    salt_from: Column | str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``left ⋈ right`` on ``key`` with the left side's hot keys
    spread across ``salt`` shuffle partitions.

    ``salt_from``: column whose hash picks the sub-key (defaults to the
    whole left row via all columns — any stable high-cardinality column
    works; pick the row id when available). The right side is replicated
    ``salt`` times, so use this when right is the *smaller* side of a
    shuffle join that can't broadcast (both sides large, left skewed).
    Result is exactly the plain join's result, in any order.
    """
    if salt < 1:
        raise ValueError("salt must be >= 1")
    basis = (
        (F.col(salt_from) if isinstance(salt_from, str) else salt_from)
        if salt_from is not None
        else F.struct(*[F.col(c) for c in left.columns])
    )
    lhs = left.withColumn("__salt", F.pmod(F.xxhash64(basis), F.lit(salt)))
    # Force a SORT-MERGE join: salting exists precisely for the both-
    # sides-large case, but Catalyst sizes the replicated right side
    # from the pre-explode file stats and will happily auto-BROADCAST
    # it — at 10x bench scale that's salt x |right| rows materialized
    # on the driver (measured: driver OOM at sf1), and a broadcastable
    # right side would not need salting in the first place. The merge
    # hint outranks the size-based broadcast choice, keeps the
    # salt-balanced partitioning the operator is for, AND spills: a
    # shuffle-hash build of the replicated side's per-partition hash
    # map is itself an OOM at memory-constrained executors (also
    # measured at sf1), where sort-merge degrades to disk gracefully.
    rhs = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).hint("merge")
    out = lhs.join(rhs, on=[key, "__salt"], how=how)
    return out.drop("__salt")
