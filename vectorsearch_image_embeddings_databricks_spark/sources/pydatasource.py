"""Spark 4 Python DataSource API — a custom connector with partitioned
parallel reads and FILTER PUSHDOWN into the source (SURVEY §2 sources
pillar, the API surface that replaces "write a JVM DataSourceV2" for
Python-first teams).

The source here is a deterministic synthetic event generator — the
shape a feed connector (Kafka-snapshot reader, REST paginator, vendor
SDK) takes in production:

- ``partitions()`` splits the keyspace into N independent slices, so
  Spark schedules N parallel read tasks (a driver-side generator loop
  would serialize the ingest — the same anti-pattern as the
  reference's driver-side embedding loop, NMR:236-245).
- ``pushFilters`` accepts ``EqualTo``/``GreaterThan``/``LessThan`` on
  the ``bucket`` column and applies them INSIDE the generator —
  returning the rest for Spark to evaluate. For a real connector this
  is the difference between downloading a shard and downloading the
  firehose; the unit tests pin that supported filters are consumed and
  unsupported ones are handed back.

Determinism contract: row ``i`` of the global keyspace is
``(event_id=i, bucket=i % NBUCKETS, value=(i * KNUTH) % VMOD)`` —
pure integer arithmetic, so a SQL oracle regenerates the exact stream
from ``range(n)`` and the registry query is hash-verifiable end to end.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    InputPartition,
    LessThan,
)
from pyspark.sql.types import StructType

KNUTH = 2654435761  # Knuth multiplicative hash constant
VMOD = 1_000_000
NBUCKETS = 10

SCHEMA = "event_id long, bucket long, value long"


class _Slice(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n_rows = int(options.get("n_rows", 100_000))
        self.n_parts = int(options.get("n_parts", 8))
        self._bucket_filters: list[Filter] = []

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Consume bucket-column comparisons; hand everything else back
        to Spark. (Generator-side filtering — the connector analog of
        parquet predicate pushdown.)"""
        for f in filters:
            if (
                isinstance(f, (EqualTo, GreaterThan, LessThan))
                and tuple(f.attribute) == ("bucket",)
            ):
                self._bucket_filters.append(f)
            else:
                yield f

    def _keep(self, bucket: int) -> bool:
        for f in self._bucket_filters:
            if isinstance(f, EqualTo) and bucket != f.value:
                return False
            if isinstance(f, GreaterThan) and not bucket > f.value:
                return False
            if isinstance(f, LessThan) and not bucket < f.value:
                return False
        return True

    def partitions(self) -> Sequence[InputPartition]:
        per = (self.n_rows + self.n_parts - 1) // self.n_parts
        return [
            _Slice(p * per, min((p + 1) * per, self.n_rows))
            for p in range(self.n_parts)
            if p * per < self.n_rows
        ]

    def read(self, partition: _Slice) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            bucket = i % NBUCKETS
            if self._keep(bucket):
                yield (i, bucket, (i * KNUTH) % VMOD)


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events")`` after
    ``spark.dataSource.register(SyntheticEventsDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> StructType | str:
        return SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return SyntheticEventsReader(self.options)
