"""Event-time windowed aggregation + custom stateful sessionization for
Structured Streaming (SURVEY.md §2.2 "Streaming" row — the extended
surface beyond the reference's TRIGGERED refresh hook, which is the only
streaming-ish construct in ``Nomic MultiModal Retrieval.py``:277–278).

All functions work identically on batch and streaming DataFrames (the
Spark unified model); tests assert the streaming results equal the batch
recompute, which is the correctness contract throughout this repo.

Scale notes:
- windowed counts are partial-aggregated before the shuffle; state size is
  |open windows| x |keys|, bounded by the watermark;
- sessionization uses ``applyInPandasWithState`` — state is one open
  session per key, closed sessions are emitted as soon as the watermark
  passes their gap timeout, so state never grows with history.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

MICROS_PER_SEC = 1_000_000


def with_event_time(
    df: DataFrame, ts_nanos_col: str = "ts", out: str = "event_time"
) -> DataFrame:
    """Attach a proper TIMESTAMP event-time column derived from the
    fixtures' epoch-nanos long (truncated to µs — Spark timestamp
    resolution)."""
    return df.withColumn(
        out, F.timestamp_micros(F.expr(f"{ts_nanos_col} div 1000"))
    )


def tumbling_counts(
    df: DataFrame,
    event_time: str = "event_time",
    window: str = "1 hour",
    keys: Iterable[str] = ("event_type",),
    watermark: str | None = None,
) -> DataFrame:
    """Per-window, per-key event counts. On a stream, pass ``watermark``
    and use append output mode: a window is emitted exactly once, when the
    watermark passes its end."""
    if watermark is not None:
        df = df.withWatermark(event_time, watermark)
    return (
        df.groupBy(F.window(event_time, window).alias("w"), *keys)
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            "n_events",
        )
    )


def sliding_counts(
    df: DataFrame,
    event_time: str = "event_time",
    window: str = "1 hour",
    slide: str = "30 minutes",
    keys: Iterable[str] = ("event_type",),
    watermark: str | None = None,
) -> DataFrame:
    """Sliding-window counts: each event lands in window/slide windows."""
    if watermark is not None:
        df = df.withWatermark(event_time, watermark)
    return (
        df.groupBy(F.window(event_time, window, slide).alias("w"), *keys)
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            "n_events",
        )
    )


def dedup_stream(
    df: DataFrame,
    keys: Iterable[str],
    event_time: str = "event_time",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact deduplication: emit the first row per ``keys`` and
    drop re-arrivals whose event time lands within the watermark horizon
    (``dropDuplicatesWithinWatermark``) — the streaming counterpart of
    ``operators.dedup``'s batch ``dropDuplicates`` (SURVEY.md §2.3 E4).

    Unlike plain ``dropDuplicates`` on a stream (whose key state grows
    forever), state here is evicted once the watermark passes a key's
    event time + delay, so memory is O(keys within the horizon), not
    O(stream) — the property that makes exact dedup viable on an
    unbounded ingest feed at scale. Batch callers should use
    ``dropDuplicates`` directly; this operator is stream-only by design.
    """
    return df.withWatermark(event_time, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


# --------------------------------------------------------------------- #
# custom stateful operator: gap sessionization over a stream
# --------------------------------------------------------------------- #

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_us", LongType()),
        StructField("session_end_us", LongType()),
        StructField("n_events", LongType()),
        StructField("emit_reason", StringType()),  # 'gap' | 'timeout'
    ]
)

SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
    ]
)


def _fold_sessions(times_us: list[int], gap_us: int, open_state):
    """Fold sorted event times into sessions. Returns (closed, open) where
    closed is a list of (start, last, n) and open is the trailing session."""
    closed = []
    cur = open_state  # (start, last, n) or None
    for t in times_us:
        if cur is None:
            cur = (t, t, 1)
        elif t - cur[1] <= gap_us:
            cur = (cur[0], max(cur[1], t), cur[2] + 1)
        else:
            closed.append(cur)
            cur = (t, t, 1)
    return closed, cur


def sessionize_stream(
    df: DataFrame,
    gap_seconds: int,
    key_col: str = "user_id",
    event_time: str = "event_time",
    watermark: str = "0 seconds",
    epoch_ns_col: str | None = "ts",
) -> DataFrame:
    """Streaming gap-sessionization via ``applyInPandasWithState``.

    Semantics match ``operators.temporal.sessionize`` (a new session starts
    when the gap since the key's previous event exceeds ``gap_seconds``):
    sessions closed by a later in-stream event are emitted with reason
    'gap'; sessions closed because the event-time watermark passed their
    ``last + gap`` deadline are emitted with reason 'timeout'. State per
    key is a single open (start, last, n) triple — O(keys), not O(events).

    Session times come from ``epoch_ns_col`` (raw int64 epoch nanos) when
    the input carries one: Arrow hands the UDF the TIMESTAMP ``event_time``
    as session-timezone-naive datetimes, so epoch math derived from it
    shifts on non-UTC drivers — the raw integer column has no timezone
    step. Pass ``epoch_ns_col=None`` to fall back to ``event_time``
    (then pin ``spark.sql.session.timeZone``).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_seconds * MICROS_PER_SEC

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        out: list[tuple] = []
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            out.append((user_id, start, last, n, "timeout"))
        else:
            times: list[int] = []
            for pdf in pdfs:
                if epoch_ns_col is not None and epoch_ns_col in pdf.columns:
                    times.extend(
                        (pdf[epoch_ns_col].astype("int64") // 1000).tolist()
                    )
                else:
                    times.extend(
                        (pdf[event_time].astype("int64") // 1000).tolist()
                    )
            times.sort()
            prev = state.get if state.exists else None
            closed, cur = _fold_sessions(times, gap_us, prev)
            for s in closed:
                out.append((user_id, s[0], s[1], s[2], "gap"))
            if cur is not None:
                state.update(cur)
                # event-time timeout: fires once the watermark passes the
                # session's gap deadline
                state.setTimeoutTimestamp(cur[1] // 1000 + gap_seconds * 1000)
        yield pd.DataFrame(
            out,
            columns=[
                "user_id",
                "session_start_us",
                "session_end_us",
                "n_events",
                "emit_reason",
            ],
        )

    from ..shipping import ensure_shipped

    ensure_shipped(df.sparkSession)
    return (
        df.withWatermark(event_time, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# --------------------------------------------------------------------- #
# stream-stream interval join
# --------------------------------------------------------------------- #

def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    max_delay: str,
    watermark: str,
    left_cols: Iterable[str] = (),
    right_cols: Iterable[str] = (),
) -> DataFrame:
    """Stream-stream inner join: pair each left event with every right
    event of the same ``key`` whose time lies in
    ``[left_time, left_time + max_delay]`` (e.g. click → purchase-within-N
    attribution).

    Both sides carry a watermark and the join condition bounds
    ``right_time`` relative to ``left_time`` in BOTH directions, which is
    exactly what Spark's streaming join planner needs to compute a state
    eviction horizon: buffered rows older than watermark + max_delay are
    dropped, so state is O(events within the delay window), not O(stream).
    Works identically on batch DataFrames (tests assert equality).
    """
    lw = left.withWatermark(left_time, watermark)
    rw = right.withWatermark(right_time, watermark)
    # disambiguate the key column for the equi-join
    rw = rw.withColumnRenamed(key, f"__r_{key}")
    cond = (
        (F.col(key) == F.col(f"__r_{key}"))
        & (F.col(right_time) >= F.col(left_time))
        & (F.col(right_time) <= F.col(left_time) + F.expr(f"INTERVAL {max_delay}"))
    )
    return lw.join(rw, cond, "inner").select(
        key,
        left_time,
        right_time,
        *left_cols,
        *right_cols,
    )
