"""Incremental index refresh ≡ full rebuild (SURVEY.md §2 O15/E10;
BASELINE.md equivalence target) — the native stand-in for Delta CDF +
TRIGGERED delta-sync (NMR:277–278, :318)."""

from __future__ import annotations

import os

from vectorsearch_image_embeddings_databricks_spark.streaming import IncrementalIndexer

from .conftest import SF_SMALL


def test_incremental_refresh_equals_full_rebuild(spark, tmp_path):
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    src = str(tmp_path / "changelog")
    os.makedirs(src)
    indexer = IncrementalIndexer(
        source_dir=src,
        index_dir=str(tmp_path / "index"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        key="vec_id",
        schema=emb.schema,
    )

    # slice 1 appended → refresh
    emb.filter("vec_id < 200").coalesce(1).write.mode("append").parquet(src)
    indexer.refresh(spark)
    assert indexer.current(spark).count() == 200
    assert indexer.verify_equivalence(spark)

    # slice 2 appended → refresh picks up ONLY the new files (checkpoint)
    emb.filter("vec_id >= 200").coalesce(1).write.mode("append").parquet(src)
    indexer.refresh(spark)
    cur = indexer.current(spark)
    assert cur.count() == 500
    assert indexer.verify_equivalence(spark)

    # idempotence: a refresh with no new files changes nothing
    indexer.refresh(spark)
    assert indexer.current(spark).count() == 500

    # the refreshed index answers queries identically to a fresh index
    from vectorsearch_image_embeddings_databricks_spark.index import VectorIndex

    q = emb.filter("vec_id = 42").collect()[0]["embedding"]
    a = [r["vec_id"] for r in VectorIndex(cur).search(q, k=5).collect()]
    b = [r["vec_id"] for r in VectorIndex(emb).search(q, k=5).collect()]
    assert a == b


def test_refresh_upserts_changed_rows(spark, tmp_path):
    """A re-appended key must replace the old row (upsert, not append)."""
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    src = str(tmp_path / "changelog")
    os.makedirs(src)
    indexer = IncrementalIndexer(
        source_dir=src,
        index_dir=str(tmp_path / "index"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        key="vec_id",
        schema=emb.schema,
    )
    emb.filter("vec_id < 10").coalesce(1).write.mode("append").parquet(src)
    indexer.refresh(spark)
    # same keys again with a different label → second version must win
    emb.filter("vec_id < 10").selectExpr(
        "vec_id", "embedding", "CAST(label + 100 AS INT) AS label"
    ).coalesce(1).write.mode("append").parquet(src)
    indexer.refresh(spark)
    cur = indexer.current(spark)
    assert cur.count() == 10
    assert all(r["label"] >= 100 for r in cur.collect())


def test_continuous_rollup_incremental_equals_batch(spark, tmp_path):
    """The maintained windowed rollup must equal the one-shot batch
    aggregate after each refresh, survive a no-new-data refresh
    unchanged, and stay equivalent through compaction."""
    from vectorsearch_image_embeddings_databricks_spark import registry
    from vectorsearch_image_embeddings_databricks_spark.streaming import ContinuousRollup
    from vectorsearch_image_embeddings_databricks_spark.streaming.windows import with_event_time
    from .conftest import SF_SMALL

    ev = with_event_time(registry.load_events(spark, SF_SMALL)).select(
        "event_time", "event_type", "value"
    )
    src = str(tmp_path / "log")
    rollup = ContinuousRollup(
        source_dir=src,
        rollup_dir=str(tmp_path / "rollup"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        schema=ev.schema,
    )
    thirds = ev.randomSplit([1.0, 1.0, 1.0], seed=7)
    for chunk in thirds:
        chunk.coalesce(1).write.mode("append").parquet(src)
        rollup.refresh(spark)
        assert rollup.verify_equivalence(spark)
    # no-new-data refresh is a no-op
    before = sorted(map(tuple, rollup.current(spark).collect()))
    rollup.refresh(spark)
    assert sorted(map(tuple, rollup.current(spark).collect())) == before
    # compaction changes the layout, never the values
    rollup.compact(spark)
    assert sorted(map(tuple, rollup.current(spark).collect())) == before
    assert rollup.verify_equivalence(spark)


def test_continuous_rollup_compact_crash_recovery(spark, tmp_path):
    """compact() must never leave the rollup observably empty. The swap
    cannot be one atomic rename (POSIX os.replace refuses a non-empty
    target), so the contract is: the data always exists in at least one
    _COMPLETE tree and every entry point finishes an interrupted swap.
    Simulates a crash on each side of the marker."""
    import os
    import shutil

    from vectorsearch_image_embeddings_databricks_spark import registry
    from vectorsearch_image_embeddings_databricks_spark.streaming import ContinuousRollup
    from vectorsearch_image_embeddings_databricks_spark.streaming.windows import with_event_time
    from .conftest import SF_SMALL

    ev = with_event_time(registry.load_events(spark, SF_SMALL)).select(
        "event_time", "event_type", "value"
    )
    src = str(tmp_path / "log")
    rollup = ContinuousRollup(
        source_dir=src,
        rollup_dir=str(tmp_path / "rollup"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        schema=ev.schema,
    )
    ev.coalesce(1).write.mode("append").parquet(src)
    rollup.refresh(spark)
    before = sorted(map(tuple, rollup.current(spark).collect()))

    # crash AFTER the staging tree is complete but BEFORE the swap:
    # partials gone, staging holds the only copy (marked _COMPLETE)
    partials = rollup._partials_dir()
    staging = rollup._staging_dir()
    os.replace(partials, staging)
    open(os.path.join(staging, "_COMPLETE"), "w").close()
    assert sorted(map(tuple, rollup.current(spark).collect())) == before
    assert not os.path.exists(staging)  # swap was finished, not re-read

    # crash DURING the staging write (no marker): old partials stay
    # authoritative and the stale staging tree is discarded by compact()
    os.makedirs(staging)
    open(os.path.join(staging, "junk"), "w").close()
    assert sorted(map(tuple, rollup.current(spark).collect())) == before
    rollup.compact(spark)
    assert sorted(map(tuple, rollup.current(spark).collect())) == before
    assert rollup.verify_equivalence(spark)


def test_tmpdir_scoped_results_survive_unpersist(spark):
    """r8 durability pin (r7 verdict #4): registry rows that read back a
    result from a TemporaryDirectory must return a DataFrame that
    remains collectable after the tmpdir is gone AND after an explicit
    unpersist — cache() is evictable and would recompute from deleted
    files; localCheckpoint(eager=True) truncates lineage for real."""
    from vectorsearch_image_embeddings_databricks_spark import registry as reg

    df = reg.QUERIES["streaming_vector_search"](spark, SF_SMALL)
    before = sorted(tuple(r) for r in df.collect())
    # evict every plausible cache layer: the checkpointed RDD must
    # still serve the data (the tmpdir parquet no longer exists)
    df.unpersist(blocking=True)
    after = sorted(tuple(r) for r in df.collect())
    assert after == before and len(after) > 0
