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

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    EqualTo,
    Filter,
    GreaterThan,
    InputPartition,
    LessThan,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
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


class TickStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked micro-batch reader: each ``read`` serves at most
    ``batch_size`` rows past the start offset and returns the advanced
    offset; ``readBetweenOffsets`` regenerates any committed range
    bit-for-bit (the replay contract that makes the source
    exactly-once under checkpoint recovery — possible here because the
    stream is a pure function of the offset range, the property a real
    connector gets from its upstream log)."""

    def __init__(self, options: dict) -> None:
        self.cap = int(options.get("n_rows", 1_000))
        self.batch = int(options.get("batch_size", 250))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    @staticmethod
    def _rows(start: int, end: int) -> Iterator[tuple]:
        # a LIST iterator, not a generator: Spark's prefetch cache
        # copy.copy()s the returned iterator and generators don't copy
        return iter(
            [(i, i % NBUCKETS, (i * KNUTH) % VMOD) for i in range(start, end)]
        )

    def read(self, start: dict):
        pos = int(start["pos"])
        end = min(pos + self.batch, self.cap)
        return self._rows(pos, end), {"pos": end}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return self._rows(int(start["pos"]), int(end["pos"]))


class SyntheticTickStreamSource(DataSource):
    """``spark.readStream.format("tick_stream")`` — the streaming twin
    of ``SyntheticEventsDataSource`` (same deterministic integer rows,
    served as offset-tracked micro-batches)."""

    @classmethod
    def name(cls) -> str:
        return "tick_stream"

    def schema(self) -> StructType | str:
        return SCHEMA

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return TickStreamReader(self.options)


@dataclass
class _FileCommit(WriterCommitMessage):
    path: str
    n_rows: int


class ManifestParquetStreamWriter(DataSourceStreamWriter):
    """Exactly-once file sink via a per-batch commit MANIFEST — the
    protocol every transactional file sink (Delta, Iceberg, Spark's own
    FileStreamSink) uses, reduced to its essentials:

    - ``write`` (executors): stage each task's rows as a uniquely-named
      parquet file; the staged file is INVISIBLE to readers — its path
      travels back in the commit message.
    - ``commit`` (driver, once per micro-batch): atomically rename a
      manifest listing exactly the staged files to ``manifest/<batchId>``.
      A re-run of the same batch after a crash rewrites the SAME
      manifest path, so duplicated staging never duplicates reads —
      readers trust manifests, never directory listings.
    - ``abort``: best-effort removal of the staged files.
    """

    def __init__(self, options: dict) -> None:
        self.path = options["path"]

    def write(self, iterator) -> _FileCommit:
        import os
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq_

        rows = list(iterator)
        if not rows:
            # no file for an empty task: an empty pa.table would infer
            # null column types and break the unioned read-back schema
            return _FileCommit(path="", n_rows=0)
        os.makedirs(os.path.join(self.path, "staging"), exist_ok=True)
        fname = os.path.join(
            self.path, "staging", f"part-{uuid.uuid4().hex}.parquet"
        )
        cols = rows[0].__fields__
        table = pa.table({c: [r[c] for r in rows] for c in cols})
        pq_.write_table(table, fname)
        return _FileCommit(path=fname, n_rows=len(rows))

    def commit(self, messages, batchId: int) -> None:
        import json
        import os

        files = [
            {"path": m.path, "n_rows": m.n_rows}
            for m in messages
            if m is not None and m.path
        ]
        mdir = os.path.join(self.path, "manifest")
        os.makedirs(mdir, exist_ok=True)
        # sweep stale .tmp manifests from crashed earlier attempts —
        # anything not yet os.replace'd was never committed and its
        # batch is being (or will be) replayed
        for stale in os.listdir(mdir):
            if stale.endswith(".tmp"):
                try:
                    os.remove(os.path.join(mdir, stale))
                except OSError:
                    pass
        tmp = os.path.join(mdir, f".{batchId}.tmp")
        with open(tmp, "w") as f:
            json.dump({"batchId": batchId, "files": files}, f)
        os.replace(tmp, os.path.join(mdir, str(batchId)))  # atomic

    def abort(self, messages, batchId: int) -> None:
        import os

        for m in messages:
            if m is not None:
                try:
                    os.remove(m.path)
                except OSError:
                    pass


def read_manifest_files(spark, path: str):
    """The reader half of the exactly-once contract: parquet paths come
    from the manifests, never from listing the staging directory (which
    may hold orphaned files from aborted/retried batches)."""
    import json
    import os

    mdir = os.path.join(path, "manifest")
    files: list[str] = []
    # Only numeric entries are committed manifests: a crash between the
    # .tmp write and its atomic os.replace can leave a stale
    # `.{batchId}.tmp` behind, and int() on it would permanently brick
    # the reader half of the exactly-once contract.
    committed = [n for n in os.listdir(mdir) if n.isdigit()]
    for name in sorted(committed, key=int):
        with open(os.path.join(mdir, name)) as f:
            files.extend(e["path"] for e in json.load(f)["files"])
    return spark.read.parquet(*files)


class ManifestParquetSink(DataSource):
    """``df.writeStream.format("manifest_parquet").option("path", …)``."""

    @classmethod
    def name(cls) -> str:
        return "manifest_parquet"

    def schema(self) -> StructType | str:
        return SCHEMA

    def streamWriter(self, schema: StructType, overwrite: bool):
        return ManifestParquetStreamWriter(self.options)
