"""Import-gated Delta Lake path (O14/O15 — r6 verdict "What's missing"
#1): the fallback branch must be byte-identical to the pre-gate parquet
behavior everywhere delta-spark is absent, the explicit-delta branch
must fail loudly rather than silently downgrade, and the CDF merge
SEMANTICS (insert/update/delete folding) are pinned on plain DataFrames
so they hold even where the Delta runtime itself cannot run. The real
Delta end-to-end (MERGE sink + readChangeData stream) is gate-skipped,
same pattern as the torch encoder smoke in test_real_encoders.py."""

import pytest

from vectorsearch_image_embeddings_databricks_spark.sources import delta_support as ds
from vectorsearch_image_embeddings_databricks_spark.streaming import IncrementalIndexer

HAS_DELTA = ds.delta_available()


def test_resolve_format_auto_degrades_gracefully():
    expected = "delta" if HAS_DELTA else "parquet"
    assert ds.resolve_table_format("auto") == expected
    assert ds.resolve_table_format("parquet") == "parquet"
    with pytest.raises(ValueError):
        ds.resolve_table_format("orc")


@pytest.mark.skipif(HAS_DELTA, reason="delta-spark installed")
def test_explicit_delta_is_loud_without_package():
    with pytest.raises(ImportError, match="delta-spark"):
        ds.resolve_table_format("delta")
    with pytest.raises(ImportError):
        IncrementalIndexer("/tmp/x", "/tmp/y", "/tmp/z", fmt="delta")
    with pytest.raises(ImportError):
        IncrementalIndexer(
            "/tmp/x", "/tmp/y", "/tmp/z", source_format="delta-cdf"
        )


def test_indexer_auto_fallback_matches_parquet_tier(spark, tmp_path):
    """fmt='auto' on this sandbox must resolve to parquet and keep the
    refresh ≡ rebuild contract — the branch the committed registry rows
    (incremental_refresh / streaming_cdc_snapshot) run on."""
    src = str(tmp_path / "log")
    spark.createDataFrame(
        [(i, float(i)) for i in range(20)], ["vec_id", "v"]
    ).write.mode("overwrite").parquet(src)
    indexer = IncrementalIndexer(
        src,
        str(tmp_path / "index"),
        str(tmp_path / "ckpt"),
        key="vec_id",
        fmt="auto",
    )
    assert indexer.fmt == ("delta" if HAS_DELTA else "parquet")
    indexer.refresh(spark)
    assert indexer.verify_equivalence(spark)


def test_apply_cdf_batch_semantics(spark):
    """The CDF fold (shared by the Delta branch) on plain DataFrames:
    update_preimage ignored, postimage wins, delete drops the key, a
    later-commit re-insert of a deleted key survives, untouched rows
    pass through."""
    current = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["vec_id", "val"]
    )
    batch = spark.createDataFrame(
        [
            # update key 1: preimage must be ignored, postimage applied
            (1, "a", "update_preimage", 5),
            (1, "A2", "update_postimage", 5),
            # delete key 2
            (2, "b", "delete", 5),
            # insert key 4
            (4, "d", "insert", 5),
            # key 5: deleted at v5 then re-inserted at v6 → survives
            (5, "old", "delete", 5),
            (5, "new", "insert", 6),
        ],
        ["vec_id", "val", "_change_type", "_commit_version"],
    )
    out = {
        r["vec_id"]: r["val"]
        for r in ds.apply_cdf_batch(batch, current, "vec_id").collect()
    }
    assert out == {1: "A2", 3: "c", 4: "d", 5: "new"}


@pytest.mark.skipif(not HAS_DELTA, reason="delta-spark not installed")
def test_delta_end_to_end_merge_and_cdf(spark, tmp_path):
    """Real Delta branch (runs only where delta-spark is installed):
    write a CDF-enabled source table, mutate it, and drive the indexer
    from the actual change feed; the index must equal the table's
    latest snapshot."""
    src = str(tmp_path / "delta_src")
    spark.createDataFrame(
        [(i, float(i)) for i in range(10)], ["vec_id", "v"]
    ).write.format("delta").mode("overwrite").save(src)
    ds.enable_change_feed(spark, src)
    spark.createDataFrame([(3, 99.0), (42, 1.0)], ["vec_id", "v"]).write.format(
        "delta"
    ).mode("append").save(src)
    indexer = IncrementalIndexer(
        src,
        str(tmp_path / "index"),
        str(tmp_path / "ckpt"),
        key="vec_id",
        fmt="delta",
        source_format="delta-cdf",
    )
    indexer.refresh(spark)
    assert indexer.verify_equivalence(spark)
