"""Import-gated Delta Lake integration for the O14/O15 surface.

The reference writes its embedding table as Delta
(``Nomic MultiModal Retrieval.py``:271-272, ``format("delta")``) and
flips ``delta.enableChangeDataFeed`` so the vector index can sync
incrementally (NMR:277-278). This repo's default substitute is
parquet-backed tables + an append-only parquet change log driven by
``Trigger.AvailableNow`` (``streaming/refresh.py``) — semantically
equivalent and fully tested. A user migrating REAL Delta tables hits
the format gap first, so this module closes it when the optional
``delta-spark`` package is importable (same gate pattern as the
torch/PIL encoders in ``embed/encoders.py``):

- ``resolve_table_format('auto')`` → ``'delta'`` iff delta-spark is
  present, else ``'parquet'`` — sinks stay byte-identical on the
  fallback path (the registry rows' hashes cannot move).
- ``merge_upsert`` → a real Delta ``MERGE`` (the at-scale upsert the
  ``IncrementalIndexer`` docstring promises) instead of the
  stage-and-swap snapshot emulation.
- ``enable_change_feed`` / ``read_change_feed`` → NMR:277-278 and the
  delta-sync source: a CDF stream carrying ``_change_type`` per row,
  consumed by ``IncrementalIndexer.refresh`` when
  ``source_format='delta-cdf'``.

Everything here is driven through ordinary DataFrame/SQL calls — no
service clients; the Delta branch is exercised by gate-skipped pytest
(`tests/test_delta_gate.py`) that runs wherever delta-spark is
installed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def delta_available() -> bool:
    """True iff the optional ``delta-spark`` package is importable."""
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


def resolve_table_format(requested: str = "auto") -> str:
    """Pick the managed-table format.

    ``'auto'`` degrades gracefully (delta if importable, else parquet —
    the sandbox/fallback path). An EXPLICIT ``'delta'`` without the
    package is a loud error, not a silent downgrade: the caller asked
    for transactional semantics the parquet emulation does not give
    (concurrent-writer isolation, time travel).
    """
    if requested == "auto":
        return "delta" if delta_available() else "parquet"
    if requested == "delta" and not delta_available():
        raise ImportError(
            "format='delta' requires the optional delta-spark package "
            "(pip install delta-spark); use format='auto' to fall back "
            "to the parquet-backed emulation"
        )
    if requested not in ("delta", "parquet"):
        raise ValueError(f"unknown managed-table format {requested!r}")
    return requested


def configure_builder(builder):
    """Attach the Delta SQL extension + catalog to a SparkSession
    builder (delta-spark's documented ``configure_spark_with_delta_pip``
    wiring). No-op without the package, so callers can apply it
    unconditionally."""
    if not delta_available():
        return builder
    from delta import configure_spark_with_delta_pip

    return configure_spark_with_delta_pip(
        builder.config(
            "spark.sql.extensions",
            "io.delta.sql.DeltaSparkSessionExtension",
        ).config(
            "spark.sql.catalog.spark_catalog",
            "org.apache.spark.sql.delta.catalog.DeltaCatalog",
        )
    )


def merge_upsert(
    spark: SparkSession, target_path: str, batch: DataFrame, key: str
) -> None:
    """Upsert ``batch`` into the Delta table at ``target_path`` with a
    real ``MERGE`` (update-on-match, insert-otherwise) — the operation
    the parquet tier emulates with anti-join + union + directory swap.
    At 100 TB this rewrites only the files holding matched keys
    (data-skipping on the merge condition), not the whole snapshot."""
    from delta.tables import DeltaTable

    if not DeltaTable.isDeltaTable(spark, target_path):
        batch.write.format("delta").mode("overwrite").save(target_path)
        return
    (
        DeltaTable.forPath(spark, target_path)
        .alias("t")
        .merge(batch.alias("s"), f"t.{key} = s.{key}")
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )


def enable_change_feed(spark: SparkSession, path: str) -> None:
    """NMR:277-278: ``ALTER TABLE … SET TBLPROPERTIES
    (delta.enableChangeDataFeed = true)`` on a path-addressed table."""
    resolve_table_format("delta")  # loud gate
    spark.sql(
        f"ALTER TABLE delta.`{path}` "
        "SET TBLPROPERTIES (delta.enableChangeDataFeed = true)"
    )


def read_change_feed(spark: SparkSession, path: str):
    """The delta-sync source (O15): a streaming reader over the table's
    Change Data Feed. Each row carries ``_change_type`` in
    {insert, update_preimage, update_postimage, delete} plus
    ``_commit_version``/``_commit_timestamp`` — exactly the feed the
    reference's TRIGGERED index pipeline consumes (NMR:315-323)."""
    resolve_table_format("delta")  # loud gate
    return (
        spark.readStream.format("delta")
        .option("readChangeData", "true")
        .load(path)
    )


def apply_cdf_batch(batch: DataFrame, current: DataFrame, key: str) -> DataFrame:
    """Fold one CDF micro-batch into ``current`` (pure DataFrame logic —
    shared by the Delta branch and its pytest twin, so the merge
    semantics are pinned even where delta-spark is absent):

    - ``update_preimage`` rows are ignored (the postimage carries the
      new value);
    - inserts + update_postimages upsert by ``key``, latest commit wins
      (within one batch a key appears at most once per commit version —
      ties broken by the highest ``_commit_version``);
    - deletes drop the key unless the same batch re-inserts it at a
      later commit version.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    changes = batch.filter(F.col("_change_type") != "update_preimage")
    w = Window.partitionBy(key).orderBy(F.desc("_commit_version"))
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    upserts = latest.filter(F.col("_change_type") != "delete").drop(
        "_change_type", "_commit_version", "_commit_timestamp"
    )
    touched = latest.select(key)
    return current.join(touched, key, "left_anti").unionByName(upserts)
