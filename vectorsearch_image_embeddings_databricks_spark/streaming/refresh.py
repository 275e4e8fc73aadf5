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
stage the merged snapshot and atomically swap directories.
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
    ) -> None:
        self.source_dir = source_dir
        self.index_dir = index_dir
        self.checkpoint_dir = checkpoint_dir
        self.key = key
        self.schema = schema

    # ------------------------------------------------------------------ #

    def _data_dir(self) -> str:
        return os.path.join(self.index_dir, "data")

    def current(self, spark: SparkSession) -> DataFrame | None:
        path = self._data_dir()
        if not os.path.exists(path):
            return None
        return spark.read.parquet(path)

    def _upsert_batch(self, batch: DataFrame, batch_id: int) -> None:
        """Upsert one micro-batch: new keys win over existing rows.

        Within a batch, the highest-id file order wins is irrelevant here
        (keys are unique per source row); duplicates inside a batch are
        collapsed deterministically by max of a per-key struct."""
        spark = batch.sparkSession
        batch = batch.dropDuplicates([self.key])
        existing = self.current(spark)
        if existing is None:
            merged = batch
        else:
            merged = existing.join(
                batch.select(self.key), on=self.key, how="left_anti"
            ).unionByName(batch)
        staging = os.path.join(self.index_dir, "_staging")
        merged.write.mode("overwrite").parquet(staging)
        data = self._data_dir()
        if os.path.exists(data):
            shutil.rmtree(data)
        os.replace(staging, data)

    # ------------------------------------------------------------------ #

    def refresh(self, spark: SparkSession) -> None:
        """One TRIGGERED sync (NMR:318 semantics): process all new files in
        the change log exactly once, then stop."""
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
        """The batch recompute the incremental path must equal."""
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
