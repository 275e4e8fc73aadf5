# Auto-split from the former single-file registry (round 4): one
# contiguous, order-preserving slice; every @register call still
# runs in the original order via registry/__init__.py.
from __future__ import annotations  # noqa: F401
from ._core import (  # noqa: F401
    DataFrame,
    F,
    SESSION_GAP_MICROS,
    SparkSession,
    Window,
    day_of,
    dec,
    load,
    load_events,
    register,
    ts_us,
)

# Relational coverage (SURVEY.md §2.2) — TPC-H-style queries over the
# star schema. Money sums use the dec() DECIMAL policy for exactness.
# --------------------------------------------------------------------- #

Q1_CUTOFF = "1998-09-02 00:00:00"


@register(
    "pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base_price,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                          * CAST(1 - l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_disc_price,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                          * CAST(1 - l_discount AS DECIMAL(18,4))
                          * CAST(1 + l_tax AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_charge,
           CAST(floor(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) * 1000000) AS BIGINT) AS avg_qty_micro,
           CAST(floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / count(*) * 1000000) AS BIGINT) AS avg_price_micro,
           CAST(floor(CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(*) * 1000000) AS BIGINT) AS avg_disc_micro,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF}'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary. Scale notes: predicate pushes to the
    parquet scan; partial (map-side) aggregation means the shuffle carries
    |groups| rows per partition, not data rows. Decimal sums are exact, so
    results are independent of partitioning/add order.

    Canonicalization policy (see customer_spend_rank): sums round in
    DECIMAL space (exact HALF_UP, engine-identical) before the double
    cast — a 4-decimal sum ending in .xx50 is a double-rounding coin
    flip otherwise; averages (decimal-sum / count ratios) emit as
    floor-truncated micro-units, which involves no rounding policy at
    all on the bitwise-identical quotient doubles."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.timestamp_micros(F.lit(ts_us(Q1_CUTOFF)))
    )
    disc_price = dec("l_extendedprice") * dec(F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * dec(F.lit(1.0) + F.col("l_tax"))

    def avg_micro(c):
        return (
            F.floor(
                F.sum(dec(c)).cast("double") / F.count("*") * F.lit(1e6)
            ).cast("long")
        )

    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(dec("l_quantity")), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(dec("l_extendedprice")), 2).cast("double").alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(charge), 2).cast("double").alias("sum_charge"),
            avg_micro("l_quantity").alias("avg_qty_micro"),
            avg_micro("l_extendedprice").alias("avg_price_micro"),
            avg_micro("l_discount").alias("avg_disc_micro"),
            F.count("*").alias("count_order"),
        )
    )


Q3_SEGMENT = "BUILDING"
Q3_DATE = "1998-06-01 00:00:00"


@register(
    "shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                          * CAST(1 - l.l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
           substr(CAST(o.o_orderdate AS VARCHAR), 1, 10) AS o_orderdate,
           o.o_orderpriority
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = '{Q3_SEGMENT}'
      AND o.o_orderdate < TIMESTAMP '{Q3_DATE}'
      AND l.l_shipdate  > TIMESTAMP '{Q3_DATE}'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style top-revenue orders. customer is the small dimension —
    broadcast it; orders⋈lineitem is the big join (shuffle on orderkey,
    co-partitionable/bucketable at scale). Top-10 = TakeOrderedAndProject."""
    cust = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == Q3_SEGMENT
    )
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.timestamp_micros(F.lit(ts_us(Q3_DATE)))
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.timestamp_micros(F.lit(ts_us(Q3_DATE)))
    )
    revenue = F.sum(dec("l_extendedprice") * dec(F.lit(1.0) - F.col("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(revenue, 2).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            # tz-free day string (cast-to-string renders via session tz)
            F.date_from_unix_date(
                F.expr("CAST(unix_micros(o_orderdate) div 86400000000 AS INT)")
            ).cast("string").alias("o_orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


Q5_REGION = "ASIA"


@register(
    "region_revenue",
    oracle=f"""
    SELECT n.n_name,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                          * CAST(1 - l.l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
           count(*) AS n_lineitems
    FROM region r
      JOIN nation n   ON n.n_regionkey = r.r_regionkey
      JOIN supplier s ON s.s_nationkey = n.n_nationkey
      JOIN lineitem l ON l.l_suppkey   = s.s_suppkey
    WHERE r.r_name = '{Q5_REGION}'
    GROUP BY n.n_name
    """,
)
def region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-flavored revenue by nation. region/nation/supplier are tiny
    dims — broadcast chain; only lineitem is scanned at scale, and the
    groupBy key (n_name) is low-cardinality so partial aggs collapse it."""
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == Q5_REGION)
    n = load(spark, sf_dir, "nation")
    s = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem")
    dims = F.broadcast(
        r.join(n, n.n_regionkey == r.r_regionkey)
        .join(s, s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", "n_name")
    )
    revenue = F.sum(dec("l_extendedprice") * dec(F.lit(1.0) - F.col("l_discount")))
    return (
        li.join(dims, li.l_suppkey == dims.s_suppkey)
        .groupBy("n_name")
        .agg(
            F.round(revenue, 2).cast("double").alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


Q6_START = "1996-01-01 00:00:00"
Q6_END = "1997-01-01 00:00:00"


@register(
    "forecast_revenue",
    oracle=f"""
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                          * CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
           count(*) AS n_lineitems
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{Q6_START}'
      AND l_shipdate <  TIMESTAMP '{Q6_END}'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style forecasting-revenue-change: pure scan→filter→global
    agg, zero joins. All three predicates push down to the parquet scan
    (min/max row-group pruning on l_shipdate); the single-group aggregate
    reduces map-side to one row per partition, so the shuffle is |partitions|
    rows regardless of data scale — the cheapest possible plan shape at
    100 TB. Window shifted to the fixture's 1995–2001 shipdate range
    (TPC-H's 1994 window matches zero fixture rows)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.timestamp_micros(F.lit(ts_us(Q6_START))))
        & (F.col("l_shipdate") < F.timestamp_micros(F.lit(ts_us(Q6_END))))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.round(
            F.sum(dec("l_extendedprice") * dec("l_discount")), 2).cast("double").alias("revenue"),
        F.count("*").alias("n_lineitems"),
    )


@register(
    "top_orders_per_customer",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice, rk
    FROM (
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice,
               row_number() OVER (PARTITION BY c.c_custkey
                                  ORDER BY o.o_totalprice DESC, o.o_orderkey)::INTEGER AS rk
        FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    )
    WHERE rk <= 3
    """,
)
def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function coverage: per-customer top-3 orders by price.
    o_totalprice is passed through (no float arithmetic → hash-safe)."""
    from pyspark.sql import Window

    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("c_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
    )


# --------------------------------------------------------------------- #
# Events: time-windowed aggregation + JSON extraction (streaming-shaped
# data in batch; the streaming module reuses the same expressions)
# --------------------------------------------------------------------- #

@register(
    "events_daily",
    oracle="""
    SELECT substr(CAST(ts AS VARCHAR), 1, 10) AS day,
           event_type,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling daily rollup over the nanos event log; the day key comes
    from epoch math (timezone-independent, see load_events)."""
    ev = load_events(spark, sf_dir)
    return (
        ev.withColumn("day", day_of("ts"))
        .groupBy("day", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum(dec("value", 6)), 4).cast("double").alias("total_value"),
        )
    )


def _write_ordered_slices(src: str, slices) -> None:
    """Write each DataFrame slice as ONE parquet file whose name is
    lexicographically increasing AND whose mtime is strictly increasing,
    so FileStreamSource (``latestFirst=false``) batches the slices in
    feed order even on coarse-mtime filesystems. Without this, an
    appended later slice can be picked up first, advancing the watermark
    so the earlier slice's rows are dropped by
    dropDuplicatesWithinWatermark / state timeouts and the hash-verified
    result goes flaky."""
    import glob
    import os
    import shutil
    import time

    os.makedirs(src, exist_ok=True)
    base = time.time()
    for i, chunk in enumerate(slices):
        stage = f"{src}__stage{i}"
        chunk.coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dst = os.path.join(src, f"{i:05d}-slice.parquet")
        shutil.copy(part, dst)
        os.utime(dst, (base + i, base + i))
        shutil.rmtree(stage)


@register(
    "streaming_dedup_state",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE)
               AS total_value
    FROM events WHERE event_id < 2000 GROUP BY event_type
    """,
)
def streaming_dedup_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E15 with a hard oracle: a deliberately duplicated two-slice event
    feed streamed through ``dropDuplicatesWithinWatermark`` (availableNow
    micro-batches) must emit exactly the original rows — so the sink's
    per-type aggregate equals the plain SQL aggregate over the raw
    events (event_id is unique in the fixture). State is evicted at the
    watermark horizon, which is the property that makes exact dedup
    viable on an unbounded feed."""
    import tempfile
    import uuid

    from ..streaming import dedup_stream
    from ..streaming.windows import with_event_time

    # a bounded slice: the dedup/watermark semantics are what's under
    # test; feeding the whole log only inflates fixed streaming overhead
    ev = load_events(spark, sf_dir).filter(F.col("event_id") < 2000)
    mid = ev.select(
        F.expr("percentile(CAST(ts AS DOUBLE), 0.5)").alias("m")
    ).collect()[0]["m"]
    sink = f"dedup_state_{uuid.uuid4().hex[:12]}"
    with tempfile.TemporaryDirectory() as tmp:
        src = f"{tmp}/dup_log"
        # every row twice inside one slice: duplicates are guaranteed
        # to arrive within the watermark horizon; ordered names + mtimes
        # pin slice pickup order (see _write_ordered_slices)
        _write_ordered_slices(
            src,
            [
                ev.filter(pred).union(ev.filter(pred))
                for pred in (F.col("ts") < mid, F.col("ts") >= mid)
            ],
        )
        stream = with_event_time(
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(src)
        )
        dd = dedup_stream(stream, keys=["event_id"], watermark="1 hour")
        q = (
            dd.writeStream.format("memory")
            .queryName(sink)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        final = (
            spark.table(sink)
            .groupBy("event_type")
            .agg(
                F.count("*").alias("n_events"),
                F.countDistinct("user_id").alias("n_users"),
                F.round(F.sum(dec("value", 6)), 4)
                .cast("double")
                .alias("total_value"),
            )
        )
        final = final.localCheckpoint(eager=True)  # durable past the tmpdir cleanup (cache is evictable)
        return final


@register(
    "streaming_sessions_state",
    oracle=f"""
    WITH t AS (SELECT user_id, epoch_us(ts) AS us FROM events
               WHERE user_id < 20),
    f AS (
        SELECT user_id, us,
               CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
                    > {SESSION_GAP_MICROS} THEN 1 ELSE 0 END AS brk
        FROM t
    ),
    s AS (
        SELECT user_id, us,
               sum(brk) OVER (PARTITION BY user_id ORDER BY us
                              ROWS UNBOUNDED PRECEDING) AS sid
        FROM f
    )
    SELECT user_id,
           min(us) AS session_start_us,
           max(us) AS session_end_us,
           CAST(count(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def streaming_sessions_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom stateful operator (applyInPandasWithState gap
    sessionization) with a hard oracle: a two-slice feed plus one
    watermark-advancing sentinel event (a fake key far past every real
    session's gap deadline) forces EVERY session to emit — so the sink,
    sentinel excluded, must equal the batch lag/cumsum sessionization the
    SQL oracle computes. Gap math in µs on both sides."""
    import tempfile
    import uuid

    from ..streaming import sessionize_stream
    from ..streaming.windows import with_event_time

    # bounded slice: the stateful-operator semantics are under test, not
    # volume; the full feed only multiplies python-state micro-batch cost
    ev = (
        load_events(spark, sf_dir)
        .filter(F.col("user_id") < 20)
        .select("user_id", "ts")
    )
    hi = ev.agg(F.max("ts")).collect()[0][0]
    gap_s = SESSION_GAP_MICROS // 1_000_000
    sentinel_ts = int(hi) + 100 * SESSION_GAP_MICROS * 1000  # nanos
    sink = f"sessions_state_{uuid.uuid4().hex[:12]}"
    with tempfile.TemporaryDirectory() as tmp:
        src = f"{tmp}/session_log"
        # two micro-batches: all events, then the sentinel — open sessions
        # must survive the batch boundary in state and flush on timeout
        # when the sentinel advances the watermark (mid-session chunk
        # splits are exercised by the pytest layer); ordered names +
        # mtimes pin the sentinel to arrive LAST (_write_ordered_slices)
        _write_ordered_slices(
            src,
            [
                ev,
                spark.createDataFrame(
                    [(-1, sentinel_ts)], "user_id long, ts long"
                ),
            ],
        )
        stream = with_event_time(
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(src)
        )
        sess = sessionize_stream(stream, gap_seconds=gap_s)
        q = (
            sess.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        final = (
            spark.table(sink)
            .filter(F.col("user_id") >= 0)
            .select(
                "user_id", "session_start_us", "session_end_us", "n_events"
            )
        )
        final = final.localCheckpoint(eager=True)  # durable past the tmpdir cleanup (cache is evictable)
        return final


@register(
    "streaming_interval_join_state",
    oracle="""
    SELECT v.user_id,
           epoch_us(v.ts) AS view_us,
           epoch_us(c.ts) AS click_us
    FROM events v JOIN events c ON c.user_id = v.user_id
    WHERE v.event_type = 'view' AND c.event_type = 'click'
      AND v.user_id < 20
      AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 2 HOUR
    """,
)
def streaming_interval_join_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join with a hard oracle: view events joined
    to same-user click events within 2 hours, both sides fed as
    two-slice streams under availableNow — every match must emit (inner
    join emits on arrival; the watermark only bounds state), so the sink
    equals the plain SQL interval join. The 2-HOUR bound is a day-time
    interval (fixed microseconds, timezone-proof, unlike calendar DAY
    intervals); output times are raw epoch µs."""
    import tempfile
    import uuid

    from ..streaming import interval_join_streams
    from ..streaming.windows import with_event_time

    ev = (
        load_events(spark, sf_dir)
        .filter(F.col("user_id") < 20)  # bounded slice (semantics test)
        .select("user_id", "ts", "event_type")
    )
    sink = f"ivjoin_state_{uuid.uuid4().hex[:12]}"
    with tempfile.TemporaryDirectory() as tmp:
        for side, etype in (("views", "view"), ("clicks", "click")):
            part = ev.filter(F.col("event_type") == etype)
            mid = part.select(
                F.expr("percentile(CAST(ts AS DOUBLE), 0.5)").alias("m")
            ).collect()[0]["m"]
            _write_ordered_slices(
                f"{tmp}/{side}",
                [
                    part.filter(pred)
                    for pred in (F.col("ts") < mid, F.col("ts") >= mid)
                ],
            )

        def read(side):
            return with_event_time(
                spark.readStream.schema(ev.schema)
                .option("maxFilesPerTrigger", 1)
                .option("latestFirst", "false")
                .parquet(f"{tmp}/{side}")
            )

        views = read("views").withColumnRenamed("event_time", "view_time")
        clicks = read("clicks").withColumnRenamed("event_time", "click_time")
        joined = interval_join_streams(
            views,
            clicks,
            key="user_id",
            left_time="view_time",
            right_time="click_time",
            max_delay="2 HOURS",
            watermark="1 hour",
        )
        q = (
            joined.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        final = spark.table(sink).select(
            "user_id",
            F.unix_micros("view_time").alias("view_us"),
            F.unix_micros("click_time").alias("click_us"),
        )
        final = final.localCheckpoint(eager=True)  # durable past the tmpdir cleanup (cache is evictable)
        return final


@register(
    "streaming_enrichment_rollup",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users,
           CAST(round(sum(CAST(e.value AS DECIMAL(18,6))), 4) AS DOUBLE)
               AS total_value
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE e.event_id < 3000
    GROUP BY n.n_name
    """,
)
def streaming_enrichment_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STATIC JOIN with a hard oracle — the enrichment pattern
    every production event pipeline runs (attach dimension attributes to
    a stream): a two-slice availableNow event feed broadcast-joined per
    micro-batch against the static customer→nation dim chain, sink
    aggregated per nation. Stateless (no watermark needed — the static
    side is fixed per batch), so the sink must contain EXACTLY the rows
    of the equivalent batch join and the rollup equals the plain SQL
    join+aggregate. At 100 TB the static side is the broadcast-sized dim
    (or a storage-partitioned join for big dims); the stream side never
    shuffles for the join."""
    import tempfile
    import uuid

    ev = load_events(spark, sf_dir).filter(F.col("event_id") < 3000)
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    mid = ev.select(
        F.expr("percentile(CAST(ts AS DOUBLE), 0.5)").alias("m")
    ).collect()[0]["m"]
    sink = f"enrich_rollup_{uuid.uuid4().hex[:12]}"
    with tempfile.TemporaryDirectory() as tmp:
        src = f"{tmp}/event_log"
        _write_ordered_slices(
            src,
            [
                ev.filter(pred)
                for pred in (F.col("ts") < mid, F.col("ts") >= mid)
            ],
        )
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(src)
        )
        enriched = stream.join(
            F.broadcast(cust), stream["user_id"] == cust["c_custkey"]
        ).join(
            F.broadcast(nat), F.col("c_nationkey") == nat["n_nationkey"]
        )
        q = (
            enriched.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        final = (
            spark.table(sink)
            .groupBy(F.col("n_name").alias("nation"))
            .agg(
                F.count("*").alias("n_events"),
                F.countDistinct("user_id").alias("n_users"),
                F.round(F.sum(dec("value", 6)), 4)
                .cast("double")
                .alias("total_value"),
            )
        )
        final = final.localCheckpoint(eager=True)  # durable past the tmpdir cleanup (cache is evictable)
        return final


@register(
    "events_gapfill_hourly",
    oracle="""
    WITH h AS (
        SELECT event_type, epoch_us(ts) // 3600000000 AS hour_no,
               CAST(count(*) AS BIGINT) AS n_events,
               sum(CAST(value AS DECIMAL(18,6))) AS sv
        FROM events GROUP BY 1, 2
    ),
    ext AS (SELECT min(hour_no) AS mn, max(hour_no) AS mx FROM h),
    grid AS (
        SELECT t.event_type, g.hour_no
        FROM (SELECT DISTINCT event_type FROM events) t,
             (SELECT unnest(generate_series(mn, mx)) AS hour_no FROM ext) g
    ),
    j AS (
        SELECT grid.event_type, grid.hour_no,
               coalesce(h.n_events, 0) AS n_events, h.sv
        FROM grid LEFT JOIN h USING (event_type, hour_no)
    )
    SELECT event_type, hour_no,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(round(last_value(sv IGNORE NULLS) OVER (
                    PARTITION BY event_type ORDER BY hour_no
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                ), 4) AS DOUBLE) AS value_locf
    FROM j
    """,
)
def events_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style gap filling: hourly per-type event buckets
    densified over the full span (the fixture is ~5% gappy at hourly
    grain) with the value sum carried forward across empty buckets
    (LOCF). Hour index is tz-free integer epoch math; counts coalesce to
    zero; the carried sum stays exact decimal until the final
    decimal-space round. See operators.temporal.gapfill_locf for the
    scale shape (grid is calendar-sized, not corpus-sized)."""
    from ..operators.temporal import gapfill_locf

    ev = load_events(spark, sf_dir).withColumn(
        "hour_no", F.expr("ts div 3600000000000")
    )
    dense = gapfill_locf(
        ev,
        "event_type",
        "hour_no",
        {"n_events": F.count("*"), "sv": F.sum(dec("value", 6))},
        fill_cols=["sv"],
    )
    return dense.select(
        "event_type",
        "hour_no",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.round(F.col("sv"), 4).cast("double").alias("value_locf"),
    )


@register(
    "events_json",
    oracle=r"""
    WITH k AS (
        SELECT event_type,
               CAST(nullif(regexp_extract(props, '"k":\s*(-?\d+)', 1), '')
                    AS BIGINT) AS k
        FROM events
    )
    SELECT event_type,
           count(*) AS n,
           CAST(sum(k) AS BIGINT) AS sum_k,
           min(k) AS min_k,
           max(k) AS max_k
    FROM k
    GROUP BY event_type
    """,
)
def events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured column handling: get_json_object pushdown into an
    integer aggregate (exact int sums — no float policy needed).

    Oracle hardening: the DuckDB side extracts k with a regexp (no JSON
    extension semantics in play) and casts its integer sum from HUGEINT
    back to BIGINT so both engines emit identical int64 columns."""
    ev = load_events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "events_variant",
    oracle=r"""
    WITH k AS (
        SELECT event_type,
               CAST(nullif(regexp_extract(props, '"k":\s*(-?\d+)', 1), '')
                    AS BIGINT) AS k
        FROM events
    )
    SELECT event_type,
           count(*) AS n,
           CAST(sum(k) AS BIGINT) AS sum_k,
           count(DISTINCT k) AS n_distinct_k
    FROM k
    GROUP BY event_type
    """,
)
def events_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT coverage (Spark 4 native type): parse the
    JSON column ONCE into a VariantType value, then do typed
    ``variant_get`` extractions against the binary variant encoding —
    at scale this beats re-parsing the JSON string per extraction
    (events_json's get_json_object path) whenever ≥2 fields are pulled,
    and it's the open-format twin of the engine's schema-on-read story."""
    ev = load_events(spark, sf_dir)
    withv = ev.select("event_type", F.parse_json("props").alias("v"))
    k = F.variant_get("v", "$.k", "bigint")
    return withv.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("sum_k"),
        F.countDistinct(k).alias("n_distinct_k"),
    )


# --------------------------------------------------------------------- #
# E9 — multimodal/opaque-binary column plumbing (O5/O6 generalized):
# treat content as bytes + typed metadata. The fixture has no binary
# table, so the documents' text bytes stand in as the opaque payload.
# --------------------------------------------------------------------- #

@register(
    "multimodal_meta",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS INTEGER) AS n_bytes,
           md5(text) AS content_md5,
           hex(encode(substr(text, 1, 8))) AS magic_hex
    FROM documents
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata extraction: size, checksum, magic-bytes
    prefix — the schema/plumbing for image/audio payloads (real decode
    lives behind the stubbed encoder, multimodal/)."""
    docs = load(spark, sf_dir, "documents")
    content = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        F.length(content).alias("n_bytes"),
        F.md5(content).alias("content_md5"),
        F.hex(F.substring(content, 1, 8)).alias("magic_hex"),
    )


@register(
    "bucketed_join_revenue",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_items,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                          * CAST(1 - l_discount AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS revenue
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    """,
)
def bucketed_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located fact⋈fact join via bucketed layout (§4 / the 100 TB
    playbook's 'delete the shuffle entirely' row): both sides written
    bucketed+sorted on the join key, joined with broadcast disabled so
    bucketing is what saves the exchange — the plan is asserted
    shuffle-free below the join at runtime, and the values hash-match the
    plain-join oracle. At scale these are standing tables; writing them
    per-call here is the fixture-sized analog of the one-time layout
    job."""
    from ..plans.inspect import explain_str
    from ..sources.layout import write_bucketed

    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    write_bucketed(o, "bjr_orders", "o_orderkey", 8, sort_col="o_orderkey")
    write_bucketed(
        li, "bjr_lineitem", "l_orderkey", 8, sort_col="l_orderkey"
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bjr_orders").join(
            spark.table("bjr_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        revenue = F.sum(
            dec("l_extendedprice") * dec(F.lit(1.0) - F.col("l_discount"))
        )
        out = joined.groupBy("o_orderpriority").agg(
            F.count("*").alias("n_items"),
            F.round(revenue, 2).cast("double").alias("revenue"),
        )
        tree = explain_str(out).split("\n\n")[0]
        # bucket-to-bucket SMJ: the only exchange is the aggregation's
        assert "SortMergeJoin" in tree and tree.count("Exchange") <= 1, tree
        # localCheckpoint, NOT cache: DROP TABLE below uncaches dependent
        # plans, so a cached result would lazily recompute against the
        # deleted files; the checkpoint severs the lineage entirely
        return out.localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bjr_orders")
        spark.sql("DROP TABLE IF EXISTS bjr_lineitem")


@register(
    "audio_chunks",
    oracle="""
    SELECT doc_id, u.i AS chunk_idx,
           (u.i*256)::BIGINT AS start_byte,
           length(substr(text, (u.i*256)::INT + 1, 256))::BIGINT AS n_bytes,
           md5(substr(text, (u.i*256)::INT + 1, 256)) AS chunk_md5
    FROM documents,
         unnest(range(0, GREATEST(1, ceil(length(text)/256.0)::BIGINT))) AS u(i)
    """,
)
def audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E9 audio path: opaque binary payload → fixed-size byte windows via
    the ``mapInPandas`` flat-map chunker (decode stubbed; see
    multimodal/audio.py). The fixture's text bytes stand in as the
    waveform; byte-window chunking is decode-independent, so the full
    chunk table (offsets, sizes, md5s) is value-exact against the SQL
    oracle — the same verification strength as the relational queries,
    for a Python-UDF multimodal op. Text is ASCII in the fixtures, so
    byte offsets == char offsets in the oracle's substr."""
    from ..multimodal import chunk_audio

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("content")
    )
    chunks = chunk_audio(docs, id_col="doc_id", chunk_bytes=256)
    return chunks.select(
        F.col("id").alias("doc_id"),
        "chunk_idx",
        "start_byte",
        "n_bytes",
        "chunk_md5",
    )


# --------------------------------------------------------------------- #
