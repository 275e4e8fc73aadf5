"""Index lifecycle: the named catalog (create/get/list/drop/sync — the
reference's vs_client surface, NMR:294/:315–323/:384), ANN persistence
(fit once, load elsewhere, same answers), and the engine's query_type
routing (exact | ann | hybrid, NMR:386–388)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectorsearch_image_embeddings_databricks_spark.index import IndexCatalog
from vectorsearch_image_embeddings_databricks_spark.index.ann import BRPLSHIndex, IVFIndex

from .conftest import SF_SMALL


def _emb(spark):
    return spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")


def _query_vec(spark, vec_id=0):
    df = _emb(spark)
    return df.filter(F.col("vec_id") == vec_id).collect()[0]["embedding"]


def test_catalog_create_get_list_drop(spark, tmp_path):
    cat = IndexCatalog(spark, str(tmp_path / "indexes"))
    emb = _emb(spark)
    cat.create_index("main", emb, key="vec_id", vector_col="embedding")
    assert cat.exists("main")
    assert [m["name"] for m in cat.list_indexes()] == ["main"]
    assert cat.list_indexes()[0]["dim"] == 64

    idx = cat.get_index("main")
    q = _query_vec(spark)
    got = [r["vec_id"] for r in idx.search(q, k=5).collect()]
    assert got[0] == 0  # self is its own nearest neighbor
    # convenience search == get_index().search
    got2 = [r["vec_id"] for r in cat.search("main", q, k=5).collect()]
    assert got == got2

    with pytest.raises(ValueError):
        cat.create_index("main", emb)  # if_exists="error" default
    cat.create_index("main", emb, if_exists="ignore")

    cat.drop_index("main")
    assert not cat.exists("main")
    with pytest.raises(KeyError):
        cat.get_index("main")


def test_catalog_sync_picks_up_source_changes(spark, tmp_path):
    cat = IndexCatalog(spark, str(tmp_path / "indexes"))
    emb = _emb(spark)
    cat.create_index("sub", emb.filter("vec_id < 100"), key="vec_id")
    assert cat.get_index("sub").df.count() == 100
    # TRIGGERED semantics: nothing changes until sync is called
    synced = cat.sync("sub", emb)
    assert synced.df.count() == emb.count()
    # metadata survived the swap
    assert cat.get_index("sub").key == "vec_id"


def test_catalog_sync_from_registered_table(spark, tmp_path):
    emb = _emb(spark)
    emb.filter("vec_id < 50").write.mode("overwrite").saveAsTable("cat_src")
    try:
        cat = IndexCatalog(spark, str(tmp_path / "indexes"))
        cat.create_index(
            "tbl", spark.table("cat_src"), key="vec_id", source_table="cat_src"
        )
        emb.filter("vec_id < 80").write.mode("overwrite").insertInto("cat_src", overwrite=True)
        assert cat.sync("tbl").df.count() == 80
    finally:
        spark.sql("DROP TABLE IF EXISTS cat_src")


def test_brplsh_save_load_same_answers(spark, tmp_path):
    emb = _emb(spark)
    q = _query_vec(spark)
    ann = BRPLSHIndex(emb, bucket_length=1.0, num_hash_tables=6)
    before = [(r["vec_id"], round(r["score"], 6)) for r in ann.search(q, k=5).collect()]
    ann.save(str(tmp_path / "brplsh"))
    loaded = BRPLSHIndex.load(spark, str(tmp_path / "brplsh"))
    after = [(r["vec_id"], round(r["score"], 6)) for r in loaded.search(q, k=5).collect()]
    assert before == after


def test_ivf_save_load_same_answers(spark, tmp_path):
    emb = _emb(spark)
    q = _query_vec(spark)
    ivf = IVFIndex(emb, nlist=8)
    before = [(r["vec_id"], round(r["score"], 6)) for r in ivf.search(q, k=5, nprobe=4).collect()]
    ivf.save(str(tmp_path / "ivf"))
    loaded = IVFIndex.load(spark, str(tmp_path / "ivf"))
    after = [(r["vec_id"], round(r["score"], 6)) for r in loaded.search(q, k=5, nprobe=4).collect()]
    assert before == after
    # the loaded index can assign NEW rows (assign_via restored — a
    # round-6 regression guard: load() builds via __new__)
    probes = loaded.assign_cells(
        emb.limit(3).select("vec_id", "embedding"), "embedding", 2
    )
    assert probes.count() == 6
    # partitioned layout on disk: centroid_id directories exist
    import os

    dirs = os.listdir(str(tmp_path / "ivf" / "data"))
    assert any(d.startswith("centroid_id=") for d in dirs)


def test_create_index_async_builds_and_polls(spark, tmp_path):
    """Non-blocking build: handle polls to READY, wait() returns a
    queryable index identical to a synchronous build, and the name is
    resolvable afterwards."""
    from vectorsearch_image_embeddings_databricks_spark.index.catalog import IndexCatalog

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    cat = IndexCatalog(spark, str(tmp_path / "cat"))
    h = cat.create_index_async("async_ix", emb)
    idx = h.wait(timeout=120)
    assert h.status() == "READY" and h.ready()
    q = emb.limit(1).collect()[0]["embedding"]
    assert len(idx.search(q, k=3).collect()) == 3
    assert cat.exists("async_ix")


def test_create_index_async_failure_surfaces_in_wait(spark, tmp_path):
    from vectorsearch_image_embeddings_databricks_spark.index.catalog import IndexCatalog
    import pytest

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    cat = IndexCatalog(spark, str(tmp_path / "cat2"))
    cat.create_index("dup", emb)
    h = cat.create_index_async("dup", emb)  # if_exists defaults to error
    with pytest.raises(ValueError, match="already exists"):
        h.wait(timeout=120)
    assert h.status() == "FAILED"
