"""Streaming windowed aggregation + stateful sessionization: the
streaming (availableNow, file-chunked, watermarked) results must equal
the batch recompute — same contract as the incremental-refresh tests."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from vectorsearch_image_embeddings_databricks_spark import registry
from vectorsearch_image_embeddings_databricks_spark.operators.temporal import sessionize
from vectorsearch_image_embeddings_databricks_spark.streaming import (
    sessionize_stream,
    tumbling_counts,
    with_event_time,
)

from .conftest import SF_SMALL

DAY_NANOS = 86_400_000_000_000
T0 = 1_704_067_200_000_000_000  # 2024-01-01T00:00:00Z in epoch nanos


def _load_events(spark):
    # registry.load_events canonicalizes ts to epoch-nanos longs across
    # both fixture encodings (INT64 nanos / TIMESTAMP micros).
    return registry.load_events(spark, SF_SMALL)


def _chunked_source(spark, tmp_path, n_chunks=3, days_per_chunk=10):
    """Write the fixture events as n time-ordered parquet files so the
    stream's watermark advances deterministically chunk by chunk."""
    ev = _load_events(spark)
    src = str(tmp_path / "stream_src")
    os.makedirs(src)
    for i in range(n_chunks):
        lo = T0 + i * days_per_chunk * DAY_NANOS
        hi = lo + days_per_chunk * DAY_NANOS
        chunk = ev.filter((F.col("ts") >= lo) & (F.col("ts") < hi))
        chunk.coalesce(1).write.mode("append").parquet(src)
    return src, ev


def _run_stream(df, sink_name):
    q = (
        df.writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_streaming_tumbling_counts_equal_batch(spark, tmp_path):
    src, ev = _chunked_source(spark, tmp_path)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = tumbling_counts(
        with_event_time(stream), window="1 day", watermark="1 hour"
    )
    _run_stream(agg, "tumbling_sink")
    got = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in spark.table("tumbling_sink").collect()
    }

    batch = tumbling_counts(with_event_time(ev), window="1 day")
    want = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in batch.collect()
    }
    # every emitted window matches the batch value exactly
    assert got, "stream emitted nothing"
    for k, v in got.items():
        assert want[k] == v, f"window {k}: stream {v} != batch {want[k]}"
    # windows finalized by the second-to-last chunk's watermark MUST be out
    finalized_before = max(
        r["window_end"]
        for r in batch.collect()
        if r["window_end"].timestamp() < (T0 / 1e9) + 19 * 86400
    )
    must_have = {
        (r["window_start"], r["event_type"])
        for r in batch.collect()
        if r["window_end"] <= finalized_before
    }
    missing = must_have - set(got)
    assert not missing, f"{len(missing)} finalized windows not emitted"


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    gap_s = 12 * 3600
    src, ev = _chunked_source(spark, tmp_path)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sess = sessionize_stream(
        with_event_time(stream), gap_seconds=gap_s, watermark="0 seconds"
    )
    _run_stream(sess, "session_sink")
    got = {
        (r["user_id"], r["session_start_us"], r["session_end_us"], r["n_events"])
        for r in spark.table("session_sink").collect()
    }
    assert got, "stream emitted no sessions"

    # batch truth: operators.temporal.sessionize on µs-truncated times
    batch = (
        sessionize(
            ev.select(
                "user_id", F.expr("ts div 1000").alias("t_us")
            ),
            key="user_id",
            ts_col="t_us",
            gap=gap_s * 1_000_000,
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.min("t_us").alias("s"),
            F.max("t_us").alias("e"),
            F.count("*").alias("n"),
        )
    )
    want = {
        (r["user_id"], r["s"], r["e"], r["n"]) for r in batch.collect()
    }
    # every emitted session is a real batch session
    bogus = got - want
    assert not bogus, f"stream emitted {len(bogus)} sessions not in batch: {sorted(bogus)[:3]}"
    # sessions that unambiguously closed before the last chunk must be out
    cutoff_us = (T0 + 19 * DAY_NANOS) // 1000
    must_have = {w for w in want if w[2] + gap_s * 1_000_000 < cutoff_us}
    missing = must_have - got
    assert not missing, f"{len(missing)} closed sessions not emitted: {sorted(missing)[:3]}"


def test_stream_stream_interval_join_equals_batch(spark, tmp_path):
    """click → purchase-within-2-days attribution as a stream-stream join
    must produce exactly the batch join's pairs once both streams drain."""
    from vectorsearch_image_embeddings_databricks_spark.streaming import interval_join_streams

    src, ev = _chunked_source(spark, tmp_path)
    ev_t = with_event_time(ev)
    clicks_b = ev_t.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_time").alias("click_time"), F.col("event_id").alias("click_id")
    )
    buys_b = ev_t.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_time").alias("buy_time"), F.col("event_id").alias("buy_id")
    )

    def stream():
        return with_event_time(
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    clicks_s = stream().filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_time").alias("click_time"), F.col("event_id").alias("click_id")
    )
    buys_s = stream().filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_time").alias("buy_time"), F.col("event_id").alias("buy_id")
    )

    joined_s = interval_join_streams(
        clicks_s,
        buys_s,
        key="user_id",
        left_time="click_time",
        right_time="buy_time",
        max_delay="2 DAYS",
        watermark="1 hour",
        left_cols=["click_id"],
        right_cols=["buy_id"],
    )
    _run_stream(joined_s, "ssjoin_sink")
    got = {
        (r["click_id"], r["buy_id"])
        for r in spark.table("ssjoin_sink").collect()
    }

    joined_b = interval_join_streams(
        clicks_b,
        buys_b,
        key="user_id",
        left_time="click_time",
        right_time="buy_time",
        max_delay="2 DAYS",
        watermark="1 hour",
        left_cols=["click_id"],
        right_cols=["buy_id"],
    )
    want = {(r["click_id"], r["buy_id"]) for r in joined_b.collect()}
    assert got == want and len(want) > 0


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """A duplicated event feed streamed through dedup_stream must emit
    exactly the batch-distinct rows: every event_id once, none dropped."""
    from vectorsearch_image_embeddings_databricks_spark.streaming import dedup_stream

    ev = _load_events(spark)
    src = str(tmp_path / "dup_src")
    os.makedirs(src)
    for i in range(3):
        lo = T0 + i * 10 * DAY_NANOS
        hi = lo + 10 * DAY_NANOS
        chunk = ev.filter((F.col("ts") >= lo) & (F.col("ts") < hi))
        # every row twice within the same file: duplicates are guaranteed
        # to arrive inside the watermark horizon
        chunk.union(chunk).coalesce(1).write.mode("append").parquet(src)

    stream = with_event_time(
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    deduped = dedup_stream(
        stream, keys=["event_id"], watermark="1 hour"
    ).select("event_id")
    _run_stream(deduped, "dedup_sink")

    got = [r["event_id"] for r in spark.table("dedup_sink").collect()]
    want = {
        r["event_id"]
        for r in ev.filter(
            (F.col("ts") >= T0) & (F.col("ts") < T0 + 30 * DAY_NANOS)
        ).select("event_id").distinct().collect()
    }
    assert len(got) == len(set(got)), "a duplicate event_id was emitted twice"
    assert set(got) == want, (
        f"stream emitted {len(set(got))} distinct ids, batch has {len(want)}"
    )


def test_write_ordered_slices_names_and_mtimes_monotonic(spark, tmp_path):
    """The streaming feeds depend on slice pickup order; the writer must
    guarantee BOTH orderings FileStreamSource could use — lexicographic
    file names and strictly increasing mtimes — and one parquet file per
    slice with the slice's exact rows."""
    import os

    from vectorsearch_image_embeddings_databricks_spark.registry import (
        _write_ordered_slices,
    )

    src = str(tmp_path / "feed")
    slices = [
        spark.range(0, 3).withColumnRenamed("id", "v"),
        spark.range(3, 5).withColumnRenamed("id", "v"),
        spark.range(5, 9).withColumnRenamed("id", "v"),
    ]
    _write_ordered_slices(src, slices)
    files = sorted(os.listdir(src))
    assert files == ["00000-slice.parquet", "00001-slice.parquet", "00002-slice.parquet"]
    mtimes = [os.path.getmtime(os.path.join(src, f)) for f in files]
    assert mtimes == sorted(mtimes) and len(set(mtimes)) == 3
    got = [
        sorted(r["v"] for r in spark.read.parquet(os.path.join(src, f)).collect())
        for f in files
    ]
    assert got == [[0, 1, 2], [3, 4], [5, 6, 7, 8]]


def test_running_topk_processor_merge_logic():
    """The processor's merge/truncate math, exercised WITHOUT a stream
    (pure pandas): planted batches must yield the global top-k with
    smallest-id tie-breaks and a strictly increasing seen counter."""
    import pandas as pd

    from vectorsearch_image_embeddings_databricks_spark.streaming.state import (
        RunningTopKProcessor,
    )

    class FakeList:
        def __init__(self):
            self.rows = []
        def get(self):
            return iter(self.rows)
        def put(self, rows):
            self.rows = list(rows)

    class FakeValue:
        def __init__(self):
            self.v = None
        def exists(self):
            return self.v is not None
        def get(self):
            return self.v
        def update(self, v):
            self.v = v

    p = RunningTopKProcessor(2, "v", "id")
    p.topk, p.seen = FakeList(), FakeValue()
    b1 = pd.DataFrame({"v": [1.0, 5.0, 3.0], "id": [10, 11, 12]})
    out1 = next(p.handleInputRows(("k",), iter([b1]), None))
    assert list(out1["seen"]) == [3, 3]
    assert list(out1["id"]) == [11, 12]
    # second batch: a tie at v=5.0 with smaller id wins rank 1
    b2 = pd.DataFrame({"v": [5.0, 0.5], "id": [7, 99]})
    out2 = next(p.handleInputRows(("k",), iter([b2]), None))
    assert list(out2["seen"]) == [5, 5]
    assert list(out2["id"]) == [7, 11]
    assert list(out2["value_micro"]) == [5_000_000, 5_000_000]


def test_running_topk_stream_end_to_end(spark):
    """Full transformWithStateInPandas run (protobuf-gated: the state
    server protocol needs google.protobuf, absent in this sandbox).
    Final rows (seen = per-key max) must equal the batch SQL window
    answer regardless of micro-batching."""
    pytest.importorskip("google.protobuf")
    import tempfile

    from pyspark.sql import functions as F

    from vectorsearch_image_embeddings_databricks_spark.streaming.state import (
        running_topk,
    )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        rows = [("a", float(i % 7), i) for i in range(20)] + [
            ("b", float(i % 5), 100 + i) for i in range(10)
        ]
        df = spark.createDataFrame(rows, "key string, v double, id long")
        with tempfile.TemporaryDirectory() as tmp:
            src = f"{tmp}/feed"
            df.filter("id % 2 = 0").coalesce(1).write.parquet(src)
            df.filter("id % 2 = 1").coalesce(1).write.mode("append").parquet(src)
            stream = (
                spark.readStream.schema(df.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            out = running_topk(stream, "key", "v", "id", k=3)
            q = (
                out.writeStream.format("memory")
                .queryName("tk_e2e")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            from pyspark.sql import Window

            t = spark.table("tk_e2e")
            w = Window.partitionBy("key")
            final = (
                t.withColumn("mx", F.max("seen").over(w))
                .filter("seen = mx")
                .select("key", "rank", "id", "value_micro")
            )
            expect = (
                df.withColumn(
                    "rank",
                    F.row_number().over(
                        Window.partitionBy("key").orderBy(
                            F.desc("v"), F.asc("id")
                        )
                    ),
                )
                .filter("rank <= 3")
                .select(
                    "key",
                    "rank",
                    "id",
                    F.floor(F.col("v") * 1e6).cast("long").alias("value_micro"),
                )
            )
            assert sorted(map(tuple, final.collect())) == sorted(
                map(tuple, expect.collect())
            )
    finally:
        if prev is not None:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
