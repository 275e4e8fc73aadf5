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
    day_date,
    dec,
    hybrid,
    load,
    load_docs,
    load_events,
    register,
    ts_us,
)

# Temporal operators (SURVEY.md §2.2 joins row: as-of; sessionization)
# --------------------------------------------------------------------- #

SESSION_GAP_NANOS = 30 * 60 * 1_000_000_000  # 30-minute inactivity gap


@register(
    "asof_click_attribution",
    oracle="""
    SELECT p.event_id, p.user_id,
           c.event_id AS click_event_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS gap_us,
           round(c.value, 6) AS click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def asof_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join (DuckDB ``ASOF JOIN`` semantics): each purchase
    gets the latest same-user click at-or-before it. Implemented as a
    union + ordered window (operators/temporal.py) — ONE shuffle on
    user_id, no row explosion, scales with |events| not
    |purchases|x|clicks|."""
    from ..operators.temporal import asof_join

    ev = load_events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    joined = asof_join(
        purchases, clicks, key="user_id", left_ts="ts", right_ts="ts",
        payload_cols=["event_id", "ts", "value"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("event_id_asof").alias("click_event_id"),
        # integer µs gap: truncate EACH side to µs first (DuckDB's TIMESTAMP
        # is µs — it drops the sub-µs nanos on read), then subtract. No
        # floats anywhere, so both engines agree bit-for-bit.
        F.expr("(ts div 1000) - (ts_asof div 1000)").alias("gap_us"),
        F.round("value_asof", 6).alias("click_value"),
    )


@register(
    "session_stats",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
                        PARTITION BY user_id ORDER BY ts
                    ) > {SESSION_GAP_MICROS} THEN 1 ELSE 0 END AS new_sess
        FROM events
    )
    SELECT user_id,
           CAST(1 + sum(new_sess) AS BIGINT) AS n_sessions,
           count(*) AS n_events
    FROM flagged GROUP BY user_id
    """,
)
def session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (lag + cumulative-sum windows, one shuffle
    on user_id) rolled up per user. n_sessions is max(session_id)+1.

    Gap math runs in MICROseconds on both sides (``ts div 1000`` here,
    ``epoch_us`` in the oracle) so a nanos-encoded fixture cannot put the
    two engines on different sides of the gap boundary; the oracle's
    HUGEINT sum is cast back to BIGINT."""
    from ..operators.temporal import sessionize

    ev = load_events(spark, sf_dir).select(
        "user_id", F.expr("ts div 1000").alias("ts_us")
    )
    sess = sessionize(ev, key="user_id", ts_col="ts_us", gap=SESSION_GAP_MICROS)
    return sess.groupBy("user_id").agg(
        (F.max("session_id") + F.lit(1)).cast("long").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


@register(
    "moving_avg_revenue",
    oracle="""
    WITH daily AS (
        SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day_no,
               strftime(o_orderdate, '%Y-%m-%d') AS day,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
                   AS revenue
        FROM orders GROUP BY 1, 2
    )
    SELECT day, revenue,
           round(avg(revenue) OVER (
               ORDER BY day_no RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
           ), 6) AS ma7
    FROM daily
    """,
)
def moving_avg_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day moving average of daily revenue: a RANGE window frame over
    the day number — unlike a ROWS frame, gaps in the calendar shrink
    the averaging set (value-based frame semantics; §2.2 windows row).
    The groupBy shrinks input to |days| rows before the window, so the
    unpartitioned frame scans a dimension-sized set.

    day_no/day come from ``unix_micros`` epoch math — tz-free, like
    every other temporal key in this package. ``unix_timestamp``/
    ``date_format`` would route the value through the session timezone
    and shift RANGE-frame membership on non-UTC hosts."""
    o = load(spark, sf_dir, "orders")
    day_no = F.expr("unix_micros(o_orderdate) div 86400000000")
    daily = (
        o.groupBy(
            day_no.alias("day_no"),
            F.date_from_unix_date(day_no.cast("int")).cast("string").alias("day"),
        )
        .agg(
            F.round(F.sum(dec("o_totalprice")), 2).cast("double").alias(
                "revenue"
            )
        )
    )
    w = Window.orderBy("day_no").rangeBetween(-6, Window.currentRow)
    return daily.select(
        "day",
        "revenue",
        F.round(F.avg("revenue").over(w), 6).alias("ma7"),
    )


@register(
    "scd2_customers",
    oracle="""
    WITH changes AS (
        SELECT c_custkey, c_acctbal + 100 AS c_acctbal
        FROM customer WHERE c_custkey % 7 = 0
    )
    SELECT c.c_custkey,
           round(c.c_acctbal, 2) AS acctbal,
           '1990-01-01 00:00:00' AS valid_from,
           CASE WHEN ch.c_custkey IS NOT NULL
                THEN '2000-06-15 00:00:00' END AS valid_to,
           ch.c_custkey IS NULL AS is_current
    FROM customer c LEFT JOIN changes ch USING (c_custkey)
    UNION ALL
    SELECT c_custkey, round(c_acctbal, 2), '2000-06-15 00:00:00', NULL, true
    FROM changes
    """,
)
def scd2_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 dimension versioning (the guide's CDC/MERGE pattern emulated
    with join + union — see operators/scd.py): bootstrap customer as a
    versioned dim, apply a deterministic change batch (+100 acctbal for
    every 7th key), return the full version history. One broadcast join
    against the change batch; history rows pass through untouched."""
    from ..operators.scd import scd2_apply, scd2_init

    c = load(spark, sf_dir, "customer")
    dim = scd2_init(
        c, "c_custkey", F.lit("1990-01-01 00:00:00").cast("timestamp")
    )
    changes = c.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        (F.col("c_acctbal") + 100).alias("c_acctbal"),
        "c_mktsegment",
        F.lit("2000-06-15 00:00:00").cast("timestamp").alias("change_ts"),
    )
    out = scd2_apply(dim, changes, key="c_custkey", change_ts_col="change_ts")
    return out.select(
        "c_custkey",
        F.round("c_acctbal", 2).alias("acctbal"),
        F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format("valid_to", "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
        "is_current",
    )


SESSION_WINDOW_GAP_US = 12 * 3600 * 1_000_000


@register(
    "session_window_stats",
    oracle=f"""
    WITH o AS (
        SELECT user_id, epoch_us(ts) AS t_us,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
                        PARTITION BY user_id ORDER BY ts
                    ) >= {SESSION_WINDOW_GAP_US} THEN 1 ELSE 0 END AS new_sess
        FROM events
    ), s AS (
        SELECT user_id, t_us,
               sum(new_sess) OVER (
                   PARTITION BY user_id ORDER BY t_us
                   ROWS UNBOUNDED PRECEDING
               ) AS sid
        FROM o
    )
    SELECT user_id,
           min(t_us) AS session_start_us,
           max(t_us) + {SESSION_WINDOW_GAP_US} AS session_end_us,
           count(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
)
def session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-native gap sessionization: ``F.session_window`` inside a
    plain groupBy — the built-in counterpart of operators.temporal's
    window-composition and streaming's applyInPandasWithState versions
    (all three session shapes SURVEY §2.2 calls for). Boundary semantics
    differ from the lag/cumsum op: session_window closes when the gap
    REACHES the timeout (diff >= gap starts a new session; the window end
    is last_event + gap) — the oracle encodes exactly that. One shuffle
    on user_id; the agg state is one open window per key."""
    ev = load_events(spark, sf_dir)
    ev = ev.withColumn("event_time", F.timestamp_micros(F.expr("ts div 1000")))
    return (
        ev.groupBy(
            F.session_window(
                "event_time", f"{SESSION_WINDOW_GAP_US} microseconds"
            ).alias("w"),
            "user_id",
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n_events",
        )
    )


@register(
    "unpivot_order_measures",
    oracle="""
    WITH wide AS (
        SELECT o_orderpriority,
               CAST(count(*) AS DOUBLE) AS n_orders,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
                   AS total_price,
               CAST(round(max(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
                   AS max_price
        FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, 'n_orders' AS measure, n_orders AS val FROM wide
    UNION ALL
    SELECT o_orderpriority, 'total_price', total_price FROM wide
    UNION ALL
    SELECT o_orderpriority, 'max_price', max_price FROM wide
    """,
)
def unpivot_order_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-form unpivot (§2.2 pivot row, reverse direction): wide
    per-priority aggregates melted to (priority, measure, val) with
    ``DataFrame.unpivot`` — an Expand node over the tiny aggregated
    relation, so the melt costs |groups|×|measures| rows, never a second
    pass over orders."""
    o = load(spark, sf_dir, "orders")
    wide = o.groupBy("o_orderpriority").agg(
        F.count("*").cast("double").alias("n_orders"),
        F.round(F.sum(dec("o_totalprice")), 2).cast("double").alias(
            "total_price"
        ),
        F.round(F.max(dec("o_totalprice")), 2).cast("double").alias(
            "max_price"
        ),
    )
    return wide.unpivot(
        ["o_orderpriority"],
        ["n_orders", "total_price", "max_price"],
        "measure",
        "val",
    )


# --------------------------------------------------------------------- #
# Grouping sets / rollup + set operations (SURVEY.md §2.2 agg/set rows)
# --------------------------------------------------------------------- #


@register(
    "rollup_revenue",
    oracle="""
    SELECT r.r_name, n.n_name,
           CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS total_price,
           count(*) AS n_orders
    FROM orders o
      JOIN customer c ON o.o_custkey  = c.c_custkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(region, nation) totals over orders. The dim chain
    (customer→nation→region) is broadcast; only orders shuffles, and the
    rollup's partial aggregation collapses to ≤|regions|x|nations| rows
    per partition before the exchange."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    dims = F.broadcast(
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "r_name", "n_name")
    )
    return (
        o.join(dims, o.o_custkey == dims.c_custkey)
        .rollup("r_name", "n_name")
        .agg(
            F.round(F.sum(dec("o_totalprice")), 2).cast("double").alias(
                "total_price"
            ),
            F.count("*").alias("n_orders"),
        )
    )


@register(
    "set_ops_users",
    oracle="""
    WITH p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
         e AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
    SELECT 'purchase_and_error' AS tag, user_id FROM (SELECT * FROM p INTERSECT SELECT * FROM e)
    UNION ALL
    SELECT 'purchase_only' AS tag, user_id FROM (SELECT * FROM p EXCEPT SELECT * FROM e)
    UNION ALL
    SELECT 'error_only' AS tag, user_id FROM (SELECT * FROM e EXCEPT SELECT * FROM p)
    """,
)
def set_ops_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL over per-type user sets. Spark plans
    these as left-semi/left-anti hash joins over the deduped key sets —
    shuffle size is |distinct users|, not |events|."""
    ev = load_events(spark, sf_dir)
    p = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    e = ev.filter(F.col("event_type") == "error").select("user_id").distinct()
    tag = lambda df, t: df.select(  # noqa: E731
        F.lit(t).alias("tag"), "user_id"
    )
    return (
        tag(p.intersect(e), "purchase_and_error")
        .unionByName(tag(p.exceptAll(e), "purchase_only"))
        .unionByName(tag(e.exceptAll(p), "error_only"))
    )


@register(
    "cube_order_stats",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two low-cardinality dims — all four grouping sets in one
    pass; partial aggregation bounds the shuffle at |status|x|priority|
    rows per partition regardless of table size."""
    o = load(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum(dec("o_totalprice")), 2).cast("double").alias(
            "total_price"
        ),
    )


@register(
    "order_quartiles",
    oracle="""
    WITH ranked AS (
        SELECT o_custkey, o_totalprice,
               ntile(4) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS quartile
        FROM orders
    )
    SELECT CAST(quartile AS INTEGER) AS quartile,
           count(*) AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS total_price
    FROM ranked GROUP BY quartile
    """,
)
def order_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer spend quartiles (ntile window, deterministic tie-break
    on the key) rolled up globally. One shuffle on o_custkey for the
    window, then a tiny 4-group aggregate."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("quartile", F.ntile(4).over(w))
        .groupBy("quartile")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum(dec("o_totalprice")), 2).cast("double").alias(
                "total_price"
            ),
        )
    )


# --------------------------------------------------------------------- #
# Event-time windows (batch form of streaming/windows.py; SURVEY §2.2)
# --------------------------------------------------------------------- #


@register(
    "events_hourly_window",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS window_start,
           event_type,
           count(*) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_hourly_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows (F.window — the same operator
    the streaming path uses with a watermark). Session tz pinned to UTC so
    window alignment is timezone-free like the fixtures."""
    from ..streaming.windows import with_event_time

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = with_event_time(load_events(spark, sf_dir))
    return (
        ev.groupBy(F.window("event_time", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(dec("value")), 2).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").cast("string").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "events_ohlc_hourly",
    oracle="""
    WITH e AS (
        SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS bucket,
               event_type, ts, event_id, CAST(value AS DOUBLE) AS v
        FROM events
    ),
    o AS (
        SELECT bucket, event_type, v AS open_v,
               row_number() OVER (PARTITION BY bucket, event_type
                                  ORDER BY ts, event_id) AS rn
        FROM e
    ),
    c AS (
        SELECT bucket, event_type, v AS close_v,
               row_number() OVER (PARTITION BY bucket, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM e
    ),
    agg AS (
        SELECT bucket, event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               min(v) AS low_v, max(v) AS high_v
        FROM e GROUP BY 1, 2
    )
    SELECT a.bucket, a.event_type, a.n_events,
           o.open_v, a.high_v, a.low_v, c.close_v
    FROM agg a
    JOIN o ON o.bucket = a.bucket AND o.event_type = a.event_type
          AND o.rn = 1
    JOIN c ON c.bucket = a.bucket AND c.event_type = a.event_type
          AND c.rn = 1
    """,
)
def events_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC time-series downsampling (the hypertable/financial-rollup
    aggregate): per (hour, event_type) the first and last value BY EVENT
    TIME plus min/max — open/close computed as single min/max aggregates
    over (ts, event_id, value) structs (lexicographic compare makes the
    tie-break deterministic), NOT as windows: one partial-agg groupBy,
    no per-row rank, no join — where the SQL formulation needs two
    row_number windows plus a join back. The struct-min trick is the
    scalable arg-min-by-time shape: each executor keeps one candidate
    per group map-side. Values are the fixture's exact 2-dp doubles —
    no sums, nothing to round."""
    from ..streaming.windows import with_event_time

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = with_event_time(load_events(spark, sf_dir)).select(
        F.date_trunc("hour", "event_time").cast("string").alias("bucket"),
        "event_type",
        "ts",
        "event_id",
        F.col("value").cast("double").alias("v"),
    )
    first_s = F.min(F.struct("ts", "event_id", "v"))
    last_s = F.max(F.struct("ts", "event_id", "v"))
    return ev.groupBy("bucket", "event_type").agg(
        F.count("*").alias("n_events"),
        first_s.alias("__o"),
        F.max("v").alias("high_v"),
        F.min("v").alias("low_v"),
        last_s.alias("__c"),
    ).select(
        "bucket",
        "event_type",
        "n_events",
        F.col("__o.v").alias("open_v"),
        "high_v",
        "low_v",
        F.col("__c.v").alias("close_v"),
    )


@register(
    "events_sliding_window",
    oracle="""
    WITH b AS (
        SELECT event_type,
               date_trunc('hour', ts)
                 + CASE WHEN minute(ts) >= 30 THEN INTERVAL 30 MINUTE
                        ELSE INTERVAL 0 MINUTE END AS b30
        FROM events
    ),
    w AS (
        SELECT event_type, unnest([b30, b30 - INTERVAL 30 MINUTE]) AS ws
        FROM b
    )
    SELECT CAST(ws AS VARCHAR) AS window_start, event_type,
           count(*) AS n_events
    FROM w GROUP BY 1, 2
    """,
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h window / 30 min slide): every event counts in
    two overlapping windows — Spark's F.window explodes them natively."""
    from ..streaming.windows import with_event_time

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = with_event_time(load_events(spark, sf_dir))
    return (
        ev.groupBy(
            F.window("event_time", "1 hour", "30 minutes").alias("w"),
            "event_type",
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").cast("string").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


HOUR_NANOS = 3_600_000_000_000


@register(
    "range_join_events",
    oracle="""
    SELECT e.event_id, e.user_id,
           p.event_id AS purchase_event_id,
           epoch_us(p.ts) - epoch_us(e.ts) AS gap_us
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON e.user_id = p.user_id
     AND p.ts >= e.ts
     AND p.ts <= e.ts + INTERVAL 1 HOUR
    """,
)
def range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases within 1 h after an error by the same user — bucketized
    interval join (operators.temporal.range_join): equi-join on
    (user, time-bucket), never a nested loop."""
    from ..operators.temporal import range_join

    ev = load_events(spark, sf_dir)
    # compare at µs precision — DuckDB's TIMESTAMP drops sub-µs nanos, so
    # a nanos-precision boundary test could disagree at exactly +1h
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", F.expr("ts div 1000").alias("t_us")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.expr("ts div 1000").alias("t_us")
    )
    joined = range_join(
        errors, purchases, key="user_id", left_ts="t_us", right_ts="t_us",
        lower=0, upper=HOUR_NANOS // 1000, payload_cols=["event_id", "t_us"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("event_id_r").alias("purchase_event_id"),
        (F.col("t_us_r") - F.col("t_us")).alias("gap_us"),
    )


# --------------------------------------------------------------------- #
# Semi/anti-join + correlated-subquery patterns (SURVEY.md §2.2 joins)
# --------------------------------------------------------------------- #


INACTIVE_CUTOFF = "2000-01-01 00:00:00"


@register(
    "lateral_latest_order",
    oracle="""
    WITH topc AS (
        SELECT c_custkey FROM customer
        ORDER BY c_acctbal DESC, c_custkey LIMIT 20
    )
    SELECT topc.c_custkey, l.o_orderkey,
           substr(CAST(l.o_orderdate AS VARCHAR), 1, 10) AS latest_order_day
    FROM topc,
    LATERAL (
        SELECT o_orderkey, o_orderdate FROM orders o
        WHERE o.o_custkey = topc.c_custkey
        ORDER BY o_orderdate DESC, o_orderkey LIMIT 1
    ) l
    """,
)
def lateral_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with LIMIT (§2.2 subqueries row): the
    most recent order of each top-20-balance customer, written as SQL
    LATERAL on both engines — Catalyst decorrelates it into a
    DomainJoin/window shape rather than per-row re-execution. Inner
    customers are dropped (LATERAL inner join) if they have no orders;
    day string is tz-free (dates stored at midnight)."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_lat")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_lat")
    return spark.sql("""
    WITH topc AS (
        SELECT c_custkey FROM customer_lat
        ORDER BY c_acctbal DESC, c_custkey LIMIT 20
    )
    SELECT topc.c_custkey, l.o_orderkey,
           CAST(date_from_unix_date(CAST(unix_micros(l.o_orderdate)
                div 86400000000 AS INT)) AS STRING) AS latest_order_day
    FROM topc,
    LATERAL (
        SELECT o_orderkey, o_orderdate FROM orders_lat o
        WHERE o.o_custkey = topc.c_custkey
        ORDER BY o_orderdate DESC, o_orderkey LIMIT 1
    ) l
    """)
    # day via raw-epoch math, NOT CAST(ts AS STRING): the cast formats in
    # the session timezone and would shift the day on non-UTC drivers


@register(
    "customers_without_orders",
    oracle=f"""
    SELECT n.n_name, count(*) AS n_customers
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '{INACTIVE_CUTOFF}')
    GROUP BY n.n_name
    """,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as a left-anti hash join (the right side carries only
    the distinct join key after its pushed date filter), then a broadcast
    dim join for the rollup. The anti join tests *inactivity since a
    cutoff* rather than never-ordered: every fixture customer has at
    least one order, so the unconditioned variant verified an anti join
    with a trivially empty probe side (0 rows at the driver's sf0.01) —
    the cutoff keeps the result non-empty and scale-proportional
    (14/135/1355 customers at sf0.001/0.01/0.1)."""
    c = load(spark, sf_dir, "customer")
    o = (
        load(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate") >= F.timestamp_micros(F.lit(ts_us(INACTIVE_CUTOFF)))
        )
        .select("o_custkey")
        .distinct()
    )
    n = load(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_customers"))
    )


@register(
    "cheapest_supplier_per_part",
    oracle="""
    SELECT l_partkey, l_suppkey AS cheapest_suppkey,
           round(l_extendedprice, 6) AS min_price
    FROM (
        SELECT l_partkey, l_suppkey, l_extendedprice,
               row_number() OVER (
                   PARTITION BY l_partkey
                   ORDER BY l_extendedprice, l_suppkey
               ) AS rn
        FROM lineitem
    ) WHERE rn = 1
    """,
)
def cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated min-per-group subquery, decorrelated into a single
    struct-min aggregation (lexicographic min of (price, suppkey)) — one
    partial-aggregated shuffle, no join-back, no window sort."""
    li = load(spark, sf_dir, "lineitem")
    best = (
        li.groupBy("l_partkey")
        .agg(F.min(F.struct("l_extendedprice", "l_suppkey")).alias("m"))
    )
    return best.select(
        "l_partkey",
        F.col("m.l_suppkey").alias("cheapest_suppkey"),
        F.round(F.col("m.l_extendedprice"), 6).alias("min_price"),
    )


# --------------------------------------------------------------------- #
# Profiling + deterministic sampling (training-data pipeline intake ops)
# --------------------------------------------------------------------- #


@register(
    "profile_documents",
    oracle="""
    SELECT 'doc_id' AS col_name, count(*) AS n_rows,
           CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_null,
           count(DISTINCT doc_id) AS n_distinct,
           CAST(min(doc_id) AS VARCHAR) AS min_value,
           CAST(max(doc_id) AS VARCHAR) AS max_value
    FROM documents
    UNION ALL
    SELECT 'lang', count(*),
           CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(DISTINCT lang),
           CAST(min(lang) AS VARCHAR), CAST(max(lang) AS VARCHAR)
    FROM documents
    UNION ALL
    SELECT 'source', count(*),
           CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(DISTINCT source),
           CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR)
    FROM documents
    UNION ALL
    SELECT 'n_chars', count(*),
           CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           count(DISTINCT n_chars),
           CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
    FROM documents
    """,
)
def profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass per-column profile of the documents corpus (exact
    distinct counts; see operators.profile for the HLL fast path)."""
    from ..operators.profile import profile_table

    docs = load(spark, sf_dir, "documents")
    return profile_table(docs, ["doc_id", "lang", "source", "n_chars"])


@register(
    "stratified_sample_docs",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_sampled,
           min(doc_id) AS min_doc_id
    FROM documents
    WHERE md5(CAST(doc_id AS VARCHAR)) <
          CASE lang WHEN 'en' THEN '80' WHEN 'de' THEN 'g' ELSE '40' END
    GROUP BY lang
    """,
)
def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language rebalancing sample rollup — keep ~50% of 'en', all
    of 'de', ~25% of the rest, report per-stratum size and smallest kept
    id. Hash-verified via the md5 sampler (`deterministic_sample_md5`'s
    technique: membership is a pure function of (key, stratum) that both
    engines compute identically — stable across reruns, partitionings,
    and cluster sizes). The seedable xxhash64 production sampler
    (operators.sampling.stratified_sample) keeps its determinism + rate
    properties pytest-pinned."""
    from ..operators.sampling import stratified_sample_md5

    docs = load(spark, sf_dir, "documents")
    sampled = stratified_sample_md5(
        docs,
        strata_col="lang",
        cut_hex={"en": "80", "de": "g"},
        key="doc_id",
        default_cut_hex="40",
    )
    return sampled.groupBy("lang").agg(
        F.count("*").alias("n_sampled"),
        F.min("doc_id").alias("min_doc_id"),
    )


# --------------------------------------------------------------------- #
# E7 — BM25 keyword ranking (the "BM25/TF-IDF" north-star item)
# --------------------------------------------------------------------- #

BM25_TERMS = ("vector", "join", "scan")
BM25_K = 20


def _bm25_term_sql(i: int, t: str) -> str:
    return f"""
        ln(1 + ("N" - df{i} + 0.5)/(df{i} + 0.5))
        * tf{i} * 2.2 / (tf{i} + 1.2*(1 - 0.75 + 0.75*dl/avgdl))"""


@register(
    "keyword_search_bm25",
    oracle=f"""
    WITH base AS (
        SELECT doc_id,
               len(list_filter(string_split(text,' '), t -> t <> '')) AS dl,
               {", ".join(
                   f"len(list_filter(string_split(text,' '), t -> t = '{t}')) AS tf{i}"
                   for i, t in enumerate(BM25_TERMS)
               )}
        FROM documents
    ),
    stats AS (
        SELECT count(*) AS "N", avg(dl) AS avgdl,
               {", ".join(
                   f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
                   for i in range(len(BM25_TERMS))
               )}
        FROM base
    )
    SELECT doc_id,
           round({" + ".join(_bm25_term_sql(i, t) for i, t in enumerate(BM25_TERMS))}, 4) AS score
    FROM base, stats
    ORDER BY score DESC, doc_id
    LIMIT {BM25_K}
    """,
)
def keyword_search_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{20} docs by Okapi BM25 for a fixed term query. Rounded to 4dp
    BEFORE ranking so the cross-engine order (and the top-k row set) is
    identical despite last-ulp libm ln() differences; the exact-float
    semantics are pinned by the pure-Python reference test instead."""
    docs = load_docs(spark, sf_dir)
    scored = hybrid.bm25_scores(docs, "doc_id", "text", list(BM25_TERMS))
    return (
        scored.select(
            F.col("id").alias("doc_id"), F.round("score", 4).alias("score")
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(BM25_K)
    )


RERANK_K = 5


@register(
    "rerank_token_overlap",
    oracle=f"""
    WITH base AS (
        SELECT doc_id,
               len(list_filter(string_split(text,' '), t -> t <> '')) AS dl,
               {", ".join(
                   f"len(list_filter(string_split(text,' '), t -> t = '{t}')) AS tf{i}"
                   for i, t in enumerate(BM25_TERMS)
               )}
        FROM documents
    ),
    stats AS (
        SELECT count(*) AS "N", avg(dl) AS avgdl,
               {", ".join(
                   f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
                   for i in range(len(BM25_TERMS))
               )}
        FROM base
    ),
    pool AS (
        SELECT doc_id,
               round({" + ".join(_bm25_term_sql(i, t) for i, t in enumerate(BM25_TERMS))}, 4) AS score
        FROM base, stats
        ORDER BY score DESC, doc_id
        LIMIT {BM25_K}
    )
    SELECT p.doc_id,
           CAST(len(list_intersect(
               list_distinct(list_filter(string_split(d.text,' '),
                                         t -> t <> '')),
               [{", ".join(f"'{t}'" for t in BM25_TERMS)}])) AS BIGINT)
               AS overlap,
           p.score
    FROM pool p JOIN documents d ON d.doc_id = p.doc_id
    ORDER BY overlap DESC, p.score DESC, p.doc_id
    LIMIT {RERANK_K}
    """,
)
def rerank_token_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval: BM25 top-{20} candidate pool, then a
    second-stage rerank by distinct-query-term overlap (the
    deterministic stand-in for a cross-encoder — integer-exact, so the
    stage is oracle-verifiable). The pool is broadcast back against
    the corpus to fetch text; rerank cost is |pool|, not |corpus|.
    See operators.hybrid.rerank_token_overlap."""
    docs = load_docs(spark, sf_dir)
    pool = (
        hybrid.bm25_scores(docs, "doc_id", "text", list(BM25_TERMS))
        .select("id", F.round("score", 4).alias("score"))
        .orderBy(F.desc("score"), F.asc("id"))
        .limit(BM25_K)
    )
    res = hybrid.rerank_token_overlap(
        pool, docs, "doc_id", "text", list(BM25_TERMS), RERANK_K
    )
    return res.select(F.col("id").alias("doc_id"), "overlap", "score")


# --------------------------------------------------------------------- #
# Subquery / advanced-relational coverage (SURVEY.md §2.2 category sweep:
# correlated subqueries, semi joins, HAVING join-back, conditional aggs,
# GROUPING SETS, pivot, lag windows — each exercised through Catalyst's
# decorrelation / semi-join / expand / window machinery)
# --------------------------------------------------------------------- #

Q17_BRAND = "Brand#13"


@register(
    "small_qty_revenue",
    oracle=f"""
    SELECT CAST(floor(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4)))
                           AS DOUBLE) / 7.0 * 1000000) AS BIGINT)
               AS avg_yearly_micro,
           count(*) AS n_rows
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = '{Q17_BRAND}'
      AND l.l_quantity < (
            SELECT 0.2 * (CAST(sum(CAST(l2.l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                          / count(*))
            FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
      )
    """,
)
def small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style correlated scalar subquery (avg quantity per part),
    written decorrelated — the shape Catalyst's RewriteCorrelatedScalarQuery
    produces: per-part aggregate joined back on the correlation key. The
    brand filter is applied FIRST and semi-joined into lineitem, so the
    per-part aggregate only scans lineitems of surviving parts (at 100 TB
    this is the difference between scanning 1/25th of lineitem twice and
    scanning all of it). Quantity average is exact (decimal sum / count),
    so the `<` boundary is engine-independent."""
    parts = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_brand") == Q17_BRAND)
        .select("p_partkey")
    )
    li = load(spark, sf_dir, "lineitem").join(
        F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey")
    )
    thresh = li.groupBy(F.col("l_partkey").alias("__pk")).agg(
        (
            F.lit(0.2)
            * (F.sum(dec("l_quantity")).cast("double") / F.count("*"))
        ).alias("__qty_thresh")
    )
    return (
        li.join(F.broadcast(thresh), F.col("l_partkey") == F.col("__pk"))
        .filter(F.col("l_quantity") < F.col("__qty_thresh"))
        .agg(
            F.floor(
                F.sum(dec("l_extendedprice")).cast("double")
                / F.lit(7.0)
                * F.lit(1e6)
            )
            .cast("long")
            .alias("avg_yearly_micro"),
            F.count("*").alias("n_rows"),
        )
    )


@register(
    "late_order_priority",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY o.o_orderpriority
    """,
)
def late_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style EXISTS: orders with at least one lineitem shipped
    more than 60 days after the order date, counted by priority. Expressed
    as a LEFT SEMI join with a mixed equi + range condition — Spark hashes
    on the equi key (orderkey) and evaluates the range predicate inside the
    join, so each order is emitted at most once (no post-join distinct)."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    hit = o.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (
            # fixed 86400s days in epoch space: `+ INTERVAL n DAY` on a
            # session-tz timestamp is DST-aware and diverges from the
            # oracle's naive-timestamp arithmetic under DST timezones
            F.unix_micros(F.col("l_shipdate"))
            > F.unix_micros(F.col("o_orderdate"))
            + F.lit(60 * 86_400_000_000)
        ),
        "left_semi",
    )
    return hit.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))


Q18_MIN_QTY = 250


@register(
    "large_volume_customers",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice,
           CAST(round(sum(CAST(l.l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS total_qty
    FROM customer c
      JOIN orders o   ON o.o_custkey  = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > {Q18_MIN_QTY}
    )
    GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    """,
)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style HAVING + IN-subquery join-back: orders whose total
    lineitem quantity exceeds {250}. The IN becomes a semi join on the
    pre-aggregated (and therefore tiny, ~1% of orders) key set; lineitem is
    aggregated BY ORDERKEY once and reused for both the filter and the
    final total, so lineitem is scanned once, shuffled once. Decimal sums
    make the HAVING boundary exact on both engines."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    per_order = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("__qty"))
        .filter(F.col("__qty") > Q18_MIN_QTY)
    )
    return (
        o.join(per_order, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_totalprice",
            F.round(F.col("__qty"), 2).cast("double").alias("total_qty"),
        )
    )


Q14_START = "1997-01-01 00:00:00"
Q14_END = "1997-02-01 00:00:00"


@register(
    "promo_revenue",
    oracle=f"""
    SELECT round(
             100.0 * (CAST(sum(CASE WHEN p.p_type = 'PROMO'
                              THEN CAST(l.l_extendedprice AS DECIMAL(18,4))
                                   * CAST(1 - l.l_discount AS DECIMAL(18,4))
                              ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                      / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                                 * CAST(1 - l.l_discount AS DECIMAL(18,4))) AS DOUBLE)),
             6) AS promo_pct,
           count(*) AS n_rows
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '{Q14_START}'
      AND l.l_shipdate <  TIMESTAMP '{Q14_END}'
    """,
)
def promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style conditional aggregation: share of one month's
    revenue from PROMO parts. The shipdate range pushes to the parquet
    scan (row-group pruning at scale); part is broadcast; both sums are
    exact decimals so the ratio is bit-identical across engines."""
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.timestamp_micros(F.lit(ts_us(Q14_START))))
        & (F.col("l_shipdate") < F.timestamp_micros(F.lit(ts_us(Q14_END))))
    )
    disc_price = dec("l_extendedprice") * dec(F.lit(1.0) - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc_price).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * (
                    F.sum(promo).cast("double")
                    / F.sum(disc_price).cast("double")
                ),
                6,
            ).alias("promo_pct"),
            F.count("*").alias("n_rows"),
        )
    )


@register(
    "grouping_sets_revenue",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (distinct from the rollup/cube queries —
    an arbitrary, non-hierarchical set list). Spark plans one Expand node
    (3 replicas) + a single hash aggregate, so the shuffle carries at most
    3x|groups| rows per partition."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
        "l_returnflag",
        "l_linestatus",
    ).agg(
        F.round(F.sum(dec("l_quantity")), 2).cast("double").alias("sum_qty"),
        F.count("*").alias("n_rows"),
    )


_PIVOT_PRIORITIES = [
    ("1-URGENT", "n_urgent"),
    ("2-HIGH", "n_high"),
    ("3-MEDIUM", "n_medium"),
    ("4-NOT SPECIFIED", "n_notspec"),
    ("5-LOW", "n_low"),
]


@register(
    "order_priority_pivot",
    oracle="""
    SELECT o_orderstatus,
           count(*) FILTER (WHERE o_orderpriority = '1-URGENT')        AS n_urgent,
           count(*) FILTER (WHERE o_orderpriority = '2-HIGH')          AS n_high,
           count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM')        AS n_medium,
           count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS n_notspec,
           count(*) FILTER (WHERE o_orderpriority = '5-LOW')           AS n_low
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def order_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide) of order counts by priority. The pivot value list
    is pinned, so Spark skips the extra distinct-values job and plans a
    single aggregate with one conditional count per column — identical
    cost to the FILTER-clause formulation."""
    o = load(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", [v for v, _ in _PIVOT_PRIORITIES])
        .count()
    )
    return piv.select(
        "o_orderstatus",
        *[
            F.coalesce(F.col(f"`{v}`"), F.lit(0)).alias(alias)
            for v, alias in _PIVOT_PRIORITIES
        ],
    )


@register(
    "customer_order_gaps",
    oracle="""
    SELECT c.c_mktsegment,
           count(*) AS n_gaps,
           CAST(floor(avg(g.gap_days) * 1000000) AS BIGINT) AS avg_gap_micro,
           CAST(max(g.gap_days) AS INTEGER) AS max_gap_days
    FROM (
        SELECT o_custkey,
               date_diff('day',
                         lag(o_orderdate) OVER (PARTITION BY o_custkey
                                                ORDER BY o_orderdate, o_orderkey),
                         o_orderdate) AS gap_days
        FROM orders
    ) g
    JOIN customer c ON c.c_custkey = g.o_custkey
    WHERE g.gap_days IS NOT NULL
    GROUP BY c.c_mktsegment
    """,
)
def customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() window + date arithmetic: days between consecutive orders per
    customer, aggregated by market segment. One shuffle on custkey for the
    window; the dimension join is broadcast; gaps are exact integer day
    counts so avg() is engine-independent (int sum / count)."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        o.withColumn("__prev", F.lag("o_orderdate").over(w))
        .filter(F.col("__prev").isNotNull())
        .select(
            "o_custkey",
            F.datediff(
                F.col("o_orderdate").cast("date"), F.col("__prev").cast("date")
            ).alias("gap_days"),
        )
    )
    return (
        gaps.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_gaps"),
            F.floor(F.avg("gap_days") * F.lit(1e6)).cast("long").alias("avg_gap_micro"),
            F.max("gap_days").alias("max_gap_days"),
        )
    )


@register(
    "source_regexp_stats",
    oracle=r"""
    SELECT CAST(regexp_extract(source, 'src(\d+)', 1) AS INTEGER) AS src_num,
           count(*) AS n_docs,
           CAST(floor(avg(n_chars) * 1000000) AS BIGINT) AS avg_chars_micro,
           min(n_chars) AS min_chars,
           max(n_chars) AS max_chars
    FROM documents
    GROUP BY 1
    """,
)
def source_regexp_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract coverage (the reference imports it at NMR:65 without
    using it; O6 generalizes its regex surface): parse the numeric id out
    of the source tag and aggregate doc-length stats per source. Pure
    codegen'd string ops; n_chars is integral so avg is exact."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(
            F.regexp_extract("source", r"src(\d+)", 1)
            .cast("int")
            .alias("src_num"),
            "n_chars",
        )
        .groupBy("src_num")
        .agg(
            F.count("*").alias("n_docs"),
            F.floor(F.avg("n_chars") * F.lit(1e6)).cast("long").alias("avg_chars_micro"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


@register(
    "monthly_revenue_trend",
    oracle="""
    WITH m AS (
        SELECT substr(CAST(date_trunc('month', o_orderdate) AS VARCHAR), 1, 7) AS month,
               sum(CAST(o_totalprice AS DECIMAL(18,4))) AS rev,
               count(*) AS n_orders
        FROM orders
        GROUP BY 1
    )
    SELECT month,
           round(CAST(rev AS DOUBLE), 2) AS revenue,
           n_orders,
           CAST(round(sum(rev) OVER (ORDER BY month
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW), 2) AS DOUBLE)
               AS cum_revenue
    FROM m
    """,
)
def monthly_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc + cumulative window frame (ROWS UNBOUNDED PRECEDING):
    monthly order revenue with a running total. The running sum operates on
    the ~80-row monthly aggregate — a deliberate single-partition window
    over a pre-shrunk input (the scale-safe shape; never window the fact
    table unpartitioned). Sums stay decimal until the final cast, so the
    cumulative values are exact on both engines."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    monthly = (
        o.groupBy(
            F.substring(day_date("o_orderdate").cast("string"), 1, 7).alias("month")
        )
        .agg(
            F.sum(dec("o_totalprice")).alias("__rev"),
            F.count("*").alias("n_orders"),
        )
    )
    w = Window.orderBy("month").rowsBetween(Window.unboundedPreceding, 0)
    return monthly.select(
        "month",
        F.round(F.col("__rev"), 2).cast("double").alias("revenue"),
        "n_orders",
        F.round(F.sum("__rev").over(w), 2).cast("double").alias("cum_revenue"),
    )


@register(
    "approx_sketch_stats",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS users_within_5pct,
           CAST(floor(median(CAST(value AS DOUBLE)) * 1000000) AS BIGINT)
               AS p50_micro,
           TRUE AS p50_within_tol
    FROM events GROUP BY event_type
    """,
)
def approx_sketch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates for 100 TB-scale profiling: HyperLogLog++
    distinct counts and quantile sketches, per event_type — now with a
    PARTIAL hash oracle. The sketch estimates themselves are
    engine-specific (DuckDB's HLL ≠ Spark's HLL++ bit-for-bit), so the
    query emits (a) the EXACT companions — SQL-expressible, hash-
    verified — and (b) booleans asserting each sketch lands within a
    tolerance the oracle states as literal TRUE: HLL++ at rsd=0.01
    within 5% of exact (5σ — deterministic for a deterministic sketch),
    and the quantile sketch within the value spread of the exact
    median's ±1%-rank neighborhood (percentile_approx guarantees rank
    error ≤ 1/accuracy). A regression in either sketch flips a boolean
    and fails the driver hash — sketches become externally checkable
    without demanding cross-engine bit equality.

    Scale note: exact DISTINCT shuffles every key and exists here as the
    verification companion; the sketch columns are the shape that
    survives at 100 TB (O(bytes-of-sketch) per partition, associative
    merge). The exact-median companion uses the same micro-int
    truncation policy as the other rational-valued oracles."""
    ev = load_events(spark, sf_dir)
    agg = ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=0.01).alias("__approx_users"),
        F.expr("percentile(CAST(value AS DOUBLE), 0.5)").alias("__p50_exact"),
        F.expr(
            "percentile(CAST(value AS DOUBLE), array(0.49, 0.51))"
        ).alias("__p50_band"),
        F.percentile_approx(
            F.col("value").cast("double"), F.lit(0.5), F.lit(10000)
        ).alias("__p50_sketch"),
    )
    return agg.select(
        "event_type",
        "n_events",
        "exact_users",
        (
            F.abs(F.col("__approx_users") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("users_within_5pct"),
        F.floor(F.col("__p50_exact") * F.lit(1e6))
        .cast("long")
        .alias("p50_micro"),
        (
            (F.col("__p50_sketch") >= F.element_at("__p50_band", 1))
            & (F.col("__p50_sketch") <= F.element_at("__p50_band", 2))
        ).alias("p50_within_tol"),
    )


@register(
    "file_provenance",
    oracle="""
    SELECT 'documents.parquet' AS src_file,
           count(*) AS n_rows,
           count(DISTINCT lang) AS n_langs
    FROM documents
    """,
)
def file_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-provenance lineage (the reference imports ``input_file_name``
    at NMR:65 without using it; O5's binaryFile scan exposes the same
    lineage via its ``path`` column). Uses the ``_metadata.file_name``
    hidden column rather than ``input_file_name()``: the legacy function
    silently returns '' when the plan is served from a cached
    InMemoryRelation, while requesting ``_metadata`` forces a real file
    scan — the reliable idiom for per-file audit/quarantine in multi-file
    ingest. Basename only, so the result is location-independent."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(
            F.col("_metadata.file_name").alias("src_file"),
            "lang",
        )
        .groupBy("src_file")
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("lang").alias("n_langs"),
        )
    )


@register(
    "deterministic_sample_md5",
    oracle="""
    SELECT doc_id, lang
    FROM documents
    WHERE md5(CAST(doc_id AS VARCHAR)) < '4d'
    """,
)
def deterministic_sample_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-engine-deterministic ~30% sample: keep rows whose md5(key)
    hex digest sorts below '4d' (0x4d/0x100 ≈ 30.1%). Same idea as the
    xxhash64 sampler in operators/sampling.py (which is faster and is the
    one to use in production) but md5 exists identically in every engine,
    so THIS sampler is hash-verifiable against the SQL oracle — and it
    demonstrates the property that matters at 100 TB: membership depends
    only on the key, not on partitioning, task order, or a seed RNG, so
    the sample is stable across reruns, engines, and cluster sizes."""
    docs = load(spark, sf_dir, "documents")
    return docs.filter(
        F.md5(F.col("doc_id").cast("string")) < F.lit("4d")
    ).select("doc_id", "lang")


@register(
    "stratified_sample_md5",
    oracle="""
    SELECT doc_id, lang, source
    FROM documents
    WHERE md5(CAST(doc_id AS VARCHAR)) <
          CASE lang WHEN 'en' THEN '80' WHEN 'de' THEN 'g' ELSE '40' END
    """,
)
def stratified_sample_md5_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus rebalancing with the auditable md5 sampler: keep ~50% of 'en'
    (the over-represented stratum), all of 'de', ~25% of everything else.
    Unlike ``df.sample``, membership is a pure function of (key, stratum)
    — stable across reruns, engines, partitionings, and cluster sizes, and
    therefore row-level hash-checkable against the SQL oracle. One
    scan-adjacent filter, no shuffle, no RNG state."""
    from ..operators.sampling import stratified_sample_md5

    docs = load(spark, sf_dir, "documents")
    return stratified_sample_md5(
        docs,
        strata_col="lang",
        cut_hex={"en": "80", "de": "g"},
        key="doc_id",
        default_cut_hex="40",
    ).select("doc_id", "lang", "source")


# --------------------------------------------------------------------- #
