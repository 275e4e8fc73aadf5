"""Incremental (TRIGGERED-style) index refresh over Structured Streaming
(SURVEY.md §2 O15/O16/E10).

The reference enables Delta Change Data Feed on the embedding table
(``Nomic MultiModal Retrieval.py``:277–278) and creates the vector index
with ``pipeline_type="TRIGGERED"`` (NMR:318) — sync-on-demand, not
continuous. Without Delta locally, the equivalent contract is:

- the source is an append-only directory of parquet files (the change log);
- ``refresh()`` = one ``Trigger.AvailableNow`` streaming run that upserts
  every not-yet-processed file into the index table, tracked exactly-once
  by the streaming checkpoint;
- refresh-equals-full-rebuild is the correctness invariant
  (BASELINE.md target table).

At scale the upsert would be a Delta ``MERGE``; on a plain filesystem we
stage the merged snapshot and atomically swap directories. When the
optional ``delta-spark`` package IS importable, ``IncrementalIndexer``
runs the real thing instead (``fmt='auto'`` → a Delta table sink with
MERGE upserts, ``source_format='delta-cdf'`` → refresh driven by the
table's actual Change Data Feed, NMR:277-278) — see
``sources/delta_support.py``; the parquet emulation remains the
byte-identical fallback everywhere delta-spark is absent.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


class IncrementalIndexer:
    """Keeps a keyed index table in sync with an append-only parquet log."""

    def __init__(
        self,
        source_dir: str,
        index_dir: str,
        checkpoint_dir: str,
        key: str = "vec_id",
        schema: StructType | None = None,
        fmt: str = "auto",
        source_format: str = "parquet",
    ) -> None:
        from ..sources.delta_support import resolve_table_format

        self.source_dir = source_dir
        self.index_dir = index_dir
        self.checkpoint_dir = checkpoint_dir
        self.key = key
        self.schema = schema
        #: sink format: 'auto' → Delta when delta-spark is importable
        #: (MERGE upserts, transactional), parquet snapshot emulation
        #: otherwise — the fallback is byte-identical to the pre-gate
        #: behavior, so registry hashes cannot move.
        self.fmt = resolve_table_format(fmt)
        if source_format not in ("parquet", "delta-cdf"):
            raise ValueError(f"unknown source_format {source_format!r}")
        if source_format == "delta-cdf":
            resolve_table_format("delta")  # loud gate, not silent downgrade
        #: change-log format: 'parquet' = append-only file log (files
        #: tracked exactly-once by the stream checkpoint); 'delta-cdf' =
        #: the table's real Change Data Feed (NMR:277-278) carrying
        #: insert/update/delete rows.
        self.source_format = source_format

    # ------------------------------------------------------------------ #

    def _data_dir(self) -> str:
        return os.path.join(self.index_dir, "data")

    def current(self, spark: SparkSession) -> DataFrame | None:
        path = self._data_dir()
        if self.fmt == "delta":
            from delta.tables import DeltaTable

            if not DeltaTable.isDeltaTable(spark, path):
                return None
            return spark.read.format("delta").load(path)
        if not os.path.exists(path):
            return None
        return spark.read.parquet(path)

    def _write_snapshot(self, merged: DataFrame) -> None:
        """Replace the index table with ``merged`` — Delta overwrite
        (transactional) or the parquet stage-and-swap emulation."""
        data = self._data_dir()
        if self.fmt == "delta":
            merged.write.format("delta").mode("overwrite").save(data)
            return
        staging = os.path.join(self.index_dir, "_staging")
        merged.write.mode("overwrite").parquet(staging)
        if os.path.exists(data):
            shutil.rmtree(data)
        os.replace(staging, data)

    def _upsert_batch(self, batch: DataFrame, batch_id: int) -> None:
        """Upsert one micro-batch: new keys win over existing rows.

        Within a batch, the highest-id file order wins is irrelevant here
        (keys are unique per source row); duplicates inside a batch are
        collapsed deterministically by max of a per-key struct. With an
        append-only log and a Delta sink the upsert is a real MERGE
        (touching only matched files). A ``delta-cdf`` batch
        additionally carries deletes/update-postimages — those are
        folded by ``apply_cdf_batch`` into the next snapshot and
        written whole (a Delta transactional overwrite or the parquet
        stage-and-swap); per-op MERGE+DELETE routing is a straight
        extension if partial rewrites matter at the target scale."""
        spark = batch.sparkSession
        if self.source_format == "delta-cdf":
            from ..sources.delta_support import apply_cdf_batch

            existing = self.current(spark)
            if existing is None:
                existing = spark.createDataFrame(
                    [],
                    batch.drop(
                        "_change_type",
                        "_commit_version",
                        "_commit_timestamp",
                    ).schema,
                )
            self._write_snapshot(apply_cdf_batch(batch, existing, self.key))
            return
        batch = batch.dropDuplicates([self.key])
        if self.fmt == "delta":
            from ..sources.delta_support import merge_upsert

            merge_upsert(spark, self._data_dir(), batch, self.key)
            return
        existing = self.current(spark)
        if existing is None:
            merged = batch
        else:
            merged = existing.join(
                batch.select(self.key), on=self.key, how="left_anti"
            ).unionByName(batch)
        self._write_snapshot(merged)

    # ------------------------------------------------------------------ #

    def refresh(self, spark: SparkSession) -> None:
        """One TRIGGERED sync (NMR:318 semantics): process all new changes
        in the log exactly once, then stop."""
        if self.source_format == "delta-cdf":
            from ..sources.delta_support import read_change_feed

            stream = read_change_feed(spark, self.source_dir)
        else:
            if self.schema is None:
                self.schema = spark.read.parquet(self.source_dir).schema
            stream = (
                spark.readStream.schema(self.schema)
                .option("maxFilesPerTrigger", 16)
                .parquet(self.source_dir)
            )
        q = (
            stream.writeStream.foreachBatch(self._upsert_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def full_rebuild(self, spark: SparkSession) -> DataFrame:
        """The batch recompute the incremental path must equal. For a
        CDF source the table's latest snapshot IS that recompute (the
        feed replays to exactly the current state)."""
        if self.source_format == "delta-cdf":
            return spark.read.format("delta").load(self.source_dir)
        return (
            spark.read.parquet(self.source_dir).dropDuplicates([self.key])
        )

    def verify_equivalence(self, spark: SparkSession) -> bool:
        """Refresh ≡ rebuild check (cheap: count + anti-join both ways)."""
        cur = self.current(spark)
        full = self.full_rebuild(spark)
        if cur is None:
            return full.count() == 0
        a = cur.select(self.key).exceptAll(full.select(self.key)).count()
        b = full.select(self.key).exceptAll(cur.select(self.key)).count()
        return a == 0 and b == 0 and cur.count() == full.count()


class ContinuousRollup:
    """Hypertable-style continuous aggregate: a windowed rollup
    (per-window, per-key counts and value sums) maintained incrementally
    over an append-only event log — the "hypertable rollup" custom
    operator, built on the same TRIGGERED availableNow contract as
    ``IncrementalIndexer``.

    Design: each micro-batch's contribution is reduced to PARTIAL
    aggregates (|windows touched| × |keys| rows — microscopic next to the
    batch) and written under ``partials/batch_id=N``, overwriting that
    subdirectory only. That makes a replayed batch (foreachBatch is
    at-least-once on retry) overwrite its own partials instead of
    double-counting — idempotence without read-modify-write of the whole
    rollup. Reading the rollup is a merge-on-read: sum the partials per
    (window, keys); counts and sums are associative, so
    partial-then-merge equals the direct aggregate (asserted by
    ``verify_equivalence`` and pytest). ``compact()`` folds accumulated
    partials into one, keeping merge-on-read O(|windows|×|keys|) however
    many refreshes have run.

    At 100 TB: the event log is never re-read after its batch is
    processed (the streaming checkpoint tracks files exactly-once), the
    shuffle per refresh is bounded by the batch's partial-aggregate rows,
    and the rollup table itself stays dimension-table sized.
    """

    def __init__(
        self,
        source_dir: str,
        rollup_dir: str,
        checkpoint_dir: str,
        event_time: str = "event_time",
        window: str = "1 day",
        keys: tuple[str, ...] = ("event_type",),
        value_col: str | None = "value",
        schema: StructType | None = None,
    ) -> None:
        self.source_dir = source_dir
        self.rollup_dir = rollup_dir
        self.checkpoint_dir = checkpoint_dir
        self.event_time = event_time
        self.window = window
        self.keys = list(keys)
        self.value_col = value_col
        self.schema = schema

    # ------------------------------------------------------------------ #

    def _partials_dir(self) -> str:
        return os.path.join(self.rollup_dir, "partials")

    def _staging_dir(self) -> str:
        return os.path.join(self.rollup_dir, "_staging")

    def _adopt_staging(self) -> None:
        """Crash recovery for ``compact()``: a directory swap cannot be
        atomic on POSIX (os.replace refuses a non-empty target), so
        compact marks its staging tree ``_COMPLETE`` *before* removing the
        old partials. If a crash lands between those two steps the data
        still exists exactly once — in staging — and every entry point
        adopts it here before reading or writing."""
        staging = self._staging_dir()
        marker = os.path.join(staging, "_COMPLETE")
        partials = self._partials_dir()
        if not os.path.exists(marker):
            return
        if os.path.exists(partials):
            if os.listdir(partials):
                # compact crashed after writing staging but before
                # removing old partials: old tree is still authoritative
                # (staging is a pure re-aggregation of it) — discard
                # staging and let the next compact retry.
                shutil.rmtree(staging)
                return
            os.rmdir(partials)
        os.makedirs(self.rollup_dir, exist_ok=True)
        os.replace(staging, partials)

    def _aggregate(self, df: DataFrame) -> DataFrame:
        aggs = [F.count("*").alias("n_events")]
        out_cols = ["n_events"]
        if self.value_col is not None:
            # decimal, not double: float sums are not associative, so a
            # partial-then-merge double sum would drift bitwise from the
            # one-shot aggregate (and from itself across different batch
            # splits). Decimal addition is exact → maintenance order can
            # never change the rollup's values.
            aggs.append(
                F.sum(F.col(self.value_col).cast("decimal(28,6)")).alias(
                    "sum_value"
                )
            )
            out_cols.append("sum_value")
        return (
            df.groupBy(
                F.window(self.event_time, self.window).alias("w"), *self.keys
            )
            .agg(*aggs)
            .select(
                F.col("w.start").alias("window_start"), *self.keys, *out_cols
            )
        )

    def _write_partials(self, batch: DataFrame, batch_id: int) -> None:
        self._adopt_staging()
        out = os.path.join(self._partials_dir(), f"batch_id={batch_id}")
        self._aggregate(batch).write.mode("overwrite").parquet(out)

    def refresh(self, spark: SparkSession) -> None:
        """One TRIGGERED sync: fold every not-yet-processed log file into
        the rollup exactly once."""
        if self.schema is None:
            self.schema = spark.read.parquet(self.source_dir).schema
        stream = (
            spark.readStream.schema(self.schema)
            .option("maxFilesPerTrigger", 16)
            .parquet(self.source_dir)
        )
        q = (
            stream.writeStream.foreachBatch(self._write_partials)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def current(self, spark: SparkSession) -> DataFrame | None:
        """Merge-on-read of the maintained rollup."""
        self._adopt_staging()
        path = self._partials_dir()
        if not os.path.exists(path) or not os.listdir(path):
            return None
        partials = spark.read.parquet(path).drop("batch_id")
        aggs = [F.sum("n_events").alias("n_events")]
        if self.value_col is not None:
            aggs.append(F.sum("sum_value").alias("sum_value"))
        return partials.groupBy("window_start", *self.keys).agg(*aggs)

    def compact(self, spark: SparkSession) -> None:
        """Fold all partials into a single pre-merged partial (batch_id=-1
        by convention), bounding merge-on-read cost over long histories.

        Crash-safe: the full compacted layout is built in a staging tree,
        marked ``_COMPLETE``, and only then swapped in. A failure at any
        point leaves the rollup recoverable — before the marker the old
        partials are untouched; after it, ``_adopt_staging`` (run by every
        entry point) finishes the swap. The rollup is never observable in
        an empty intermediate state (the IncrementalIndexer
        stage-then-single-swap contract)."""
        merged = self.current(spark)
        if merged is None:
            return
        staging = self._staging_dir()
        if os.path.exists(staging):
            shutil.rmtree(staging)  # stale tree from an earlier crash
        merged.write.mode("overwrite").parquet(
            os.path.join(staging, "batch_id=-1")
        )
        with open(os.path.join(staging, "_COMPLETE"), "w"):
            pass
        partials = self._partials_dir()
        shutil.rmtree(partials)
        os.replace(staging, partials)

    def full_rebuild(self, spark: SparkSession) -> DataFrame:
        """The one-shot batch aggregate the incremental path must equal."""
        return self._aggregate(spark.read.parquet(self.source_dir))

    def verify_equivalence(self, spark: SparkSession) -> bool:
        cur = self.current(spark)
        full = self.full_rebuild(spark)
        if cur is None:
            return full.count() == 0
        cols = full.columns
        a = cur.select(cols).exceptAll(full).count()
        b = full.exceptAll(cur.select(cols)).count()
        return a == 0 and b == 0
