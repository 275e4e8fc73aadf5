"""Driver-contract query registry.

Each entry pairs a PySpark implementation ``(spark, sf_dir) -> DataFrame``
with (where SQL-expressible) an equivalent ANSI-SQL oracle run by DuckDB on
the same parquet files. Column names/aliases match exactly between the two —
the driver sorts columns by name and hashes values (see repo
``__spark_entry__.py`` docstring).

Numeric policy (FIXTURES.md "Type-fidelity"): similarity math in float64 on
both sides; every float output rounded to 6 decimals; deterministic ORDER BY
tie-breaks on the primary key wherever a LIMIT/top-k makes the row *set*
order-sensitive.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import (
    LANG_MARKERS,
    BPE_ISH_PATTERN,
    fingerprint,
    lang_id,
    normalized_fingerprint,
    quality_score,
    token_count,
)
from ..index.vector_index import VectorIndex
from ..operators import dedup, hybrid, textstats
from ..operators import sampling as sampling_ops
from ..operators import temporal as temporal_ops

QueryFn = Callable[[SparkSession, str], DataFrame]


def dec(c, scale: int = 4):
    """Money/measure columns are cast to DECIMAL before SUM so aggregation
    is exact and therefore identical between Spark (parallel partial aggs,
    arbitrary add order) and DuckDB (sequential). Float sums are order-
    dependent; decimal sums are not. See FIXTURES.md type-fidelity notes."""
    c = F.col(c) if isinstance(c, str) else c
    return c.cast(f"decimal(18,{scale})")

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Fixture loader. Pins NTZ inference OFF *before every read* so
    parquet timestamps land in TimestampType with their stored micros as
    the raw internal epoch — making ``unix_micros``-based tz-free math
    valid everywhere. Without the pin the first query to run would
    decide the session's timestamp flavor (load_events also sets this,
    but query execution order must not matter)."""
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def load_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents loader for compute-heavy text operators (shingling,
    minhash/simhash folds, per-token hashing, embedding UDFs).

    At test scale documents.parquet is ONE small file → one input split →
    the whole HOF/UDF pipeline runs on a single core while 31 idle.
    Repartitioning to the cluster's parallelism decouples compute
    partitioning from file layout for ~5 MB of shuffle (measured 2-4x
    wall-clock win on the dedup family). At 100 TB the source is already
    thousands of splits, so the exchange is AQE-coalesced into a no-op
    cost class; cheap aggregate-only queries keep the plain ``load`` to
    avoid the pointless exchange."""
    return load(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )


def load_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings loader for compute-heavy vector operators (pair scans,
    LSH banding, quantizer training). Same rationale as ``load_docs``:
    the fixture is one file → one input split, which serializes
    nested-loop pair scans and band self-joins onto a single core.
    Repartitioning decouples compute parallelism from file layout; at
    100 TB the source already has thousands of splits and AQE coalesces
    the exchange away."""
    return load(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events loader, normalizing ``ts`` to epoch-nanos INT64.

    The fixture has shipped with two physical encodings of ``ts``: INT64
    TIMESTAMP(NANOS) (readable only as raw longs via the legacy conf) and
    TIMESTAMP(MICROS) (a native Spark timestamp). All downstream temporal
    operators do deliberately timezone-free integer epoch math, so both
    encodings are canonicalized here to epoch-nanos longs. NTZ inference
    is disabled so the parquet µs land verbatim in TimestampType's
    internal epoch-micros; ``unix_micros`` then returns the raw stored
    int64 (no session-timezone step anywhere) and ``* 1000`` is an exact
    integer µs→ns widening. DuckDB oracles use ``epoch_ns(ts)`` /
    ``epoch_us(ts)`` on the same raw value — verified identical under an
    adversarial session timezone."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if isinstance(df.schema["ts"].dataType, T.TimestampType):
        df = df.withColumn("ts", F.unix_micros("ts") * F.lit(1000))
    return df



def day_date(col_name: str) -> F.Column:
    """Timezone-free DateType from a (midnight-anchored, UTC-stored)
    timestamp column: raw-epoch day math, no session-timezone step —
    unlike cast-to-date / date_trunc / year(), which all render the
    instant through the session timezone first."""
    return F.date_from_unix_date(
        F.expr(f"CAST(unix_micros({col_name}) div 86400000000 AS INT)")
    )


def year_of(col_name: str) -> F.Column:
    """Timezone-free calendar year of a UTC-stored timestamp column."""
    return F.year(day_date(col_name))


def ts_us(literal: str) -> int:
    """Epoch microseconds of a UTC wall-time literal 'YYYY-MM-DD HH:MM:SS'.

    Timestamp-literal comparisons (`col >= lit(s).cast("timestamp[_ntz]")`)
    resolve the literal through the SESSION TIMEZONE when the column is
    TimestampType, silently shifting filter boundaries on non-UTC
    drivers (caught by the robustness matrix: the inactivity-cutoff
    queries lost the UTC-midnight rows under America/New_York). Raw
    integer epoch comparison has no timezone step on either engine."""
    import datetime as _dt

    fmt = "%Y-%m-%d %H:%M:%S" if " " in literal else "%Y-%m-%d"
    d = _dt.datetime.strptime(literal, fmt).replace(tzinfo=_dt.timezone.utc)
    return int(d.timestamp() * 1_000_000)


NANOS_PER_DAY = 86_400_000_000_000
SESSION_GAP_MICROS = 30 * 60 * 1_000_000  # session gap in µs (oracle-safe unit)


def day_of(ts_nanos) -> F.Column:
    """UTC day string from an epoch-nanos column (tz-independent)."""
    c = F.col(ts_nanos) if isinstance(ts_nanos, str) else ts_nanos
    return F.date_from_unix_date(
        (c / F.lit(NANOS_PER_DAY)).cast("int")
    ).cast("string")

