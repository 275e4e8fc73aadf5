"""Batch CDC apply — the Delta ``MERGE INTO`` pattern as pure DataFrame
ops (SURVEY.md §2 family of O15/E16: the reference's change-feed hook,
NMR:277-278, consumed as an upsert/delete MERGE instead of SCD2 history).

A change batch is a bag of ``(key, sequence, op, payload)`` rows; applying
it to a snapshot means: keep only the LATEST change per key (CDC sources
emit many changes per key per batch), then per key — ``D`` deletes the
row, ``U``/``I`` replaces (or inserts) the payload, untouched keys pass
through.

Scale shape: latest-per-key is ONE argmax aggregate — ``max`` over
``struct(sequence…, op, payload…)`` — so it is a single key shuffle with
map-side partial aggregation (never a row_number window over the change
log, which would sort every partition). The merge itself is one
full-outer equi-join on the key; both sides can be corpus-scale, so no
broadcast is assumed. Total: two key shuffles, both AQE-skew-handled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: canonical op codes
OP_UPSERT = "U"
OP_DELETE = "D"


def latest_changes(
    changes: DataFrame,
    key: str,
    seq_cols: list[str],
    op_col: str,
    payload_cols: list[str],
) -> DataFrame:
    """Collapse a change batch to the latest change per key.

    ``seq_cols`` must totalize the order within a key (e.g. a commit
    timestamp plus a unique log offset as tie-break) — the argmax struct
    compares them lexicographically, so a non-total order would make the
    winner partition-dependent. One shuffle on ``key``; the ``max`` of a
    struct gets map-side partial aggregation (each task forwards one
    candidate row per key), which a row_number-window formulation never
    does.
    """
    winner = F.max(
        F.struct(
            *[F.col(c) for c in seq_cols],
            F.col(op_col).alias("__op"),
            *[F.col(c) for c in payload_cols],
        )
    ).alias("__w")
    out = changes.groupBy(F.col(key)).agg(winner)
    cols = [F.col(key), F.col("__w.__op").alias(op_col)]
    cols += [F.col(f"__w.{c}").alias(c) for c in payload_cols]
    return out.select(*cols)


def apply_cdc(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    seq_cols: list[str],
    op_col: str,
    payload_cols: list[str],
) -> DataFrame:
    """Apply a CDC change batch to a base snapshot (MERGE semantics).

    Returns the merged snapshot with the base schema restricted to
    ``key`` + ``payload_cols`` + any base columns not overwritten (kept
    as-is from the base side; for inserted keys they are NULL). Rows
    whose latest change is ``D`` are dropped; latest ``U``/``I`` rows
    take the change payload; unchanged keys keep the base payload.
    """
    latest = latest_changes(changes, key, seq_cols, op_col, payload_cols)
    lat = latest.select(
        F.col(key).alias("__lk"),
        F.col(op_col).alias("__lop"),
        *[F.col(c).alias(f"__l_{c}") for c in payload_cols],
    )
    joined = base.join(lat, base[key] == lat["__lk"], "full_outer")
    merged_key = F.coalesce(base[key], F.col("__lk")).alias(key)
    payload = [
        F.when(F.col("__lop").isNotNull(), F.col(f"__l_{c}"))
        .otherwise(base[c])
        .alias(c)
        for c in payload_cols
    ]
    passthrough = [
        base[c]
        for c in base.columns
        if c != key and c not in payload_cols
    ]
    return (
        joined.filter(F.col("__lop").isNull() | (F.col("__lop") != OP_DELETE))
        .select(merged_key, *payload, *passthrough)
    )
