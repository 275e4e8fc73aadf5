"""Embedding UDF surface (O11/O12/O18) + binaryFile ingestion (O5–O7) +
multimodal column ops (E9) — the end-to-end pipeline the reference runs
driver-side, here fully distributed on a fixture binary dir."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from vectorsearch_image_embeddings_databricks_spark.embed import (
    StubImageEncoder,
    StubTextEncoder,
    embed_column,
)
from vectorsearch_image_embeddings_databricks_spark.embed.udf import assign_ids
from vectorsearch_image_embeddings_databricks_spark.index import VectorIndex
from vectorsearch_image_embeddings_databricks_spark.multimodal import (
    decode_images,
    extract_image_meta,
)
from vectorsearch_image_embeddings_databricks_spark.sources import (
    clean_path,
    ingest_binary_dir,
)

from .conftest import SF_SMALL


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    """Fixture binary dir: fake jpgs (with real magic bytes) + decoys that
    the glob must exclude (FIXTURES.md 'Ingestion fixture')."""
    d = tmp_path_factory.mktemp("images")
    for i in range(10):
        (d / f"img_{i:03d}.jpg").write_bytes(
            b"\xff\xd8\xff\xe0" + f"payload-{i}".encode() * (i + 1)
        )
    (d / "notes.txt").write_bytes(b"not an image")
    (d / "data.png").write_bytes(b"\x89PNG\r\n\x1a\n12345")
    return str(d)


def test_binary_scan_schema_glob_and_path_cleanup(spark, image_dir):
    df = ingest_binary_dir(spark, image_dir, glob="*.jpg")
    assert df.columns == ["path", "modificationTime", "length", "content"]
    rows = df.collect()
    assert len(rows) == 10  # decoys excluded by pathGlobFilter
    assert all(not r["path"].startswith("file:") for r in rows)
    assert all(r["path"].endswith(".jpg") for r in rows)
    assert all(r["length"] == len(r["content"]) for r in rows)


def test_clean_path_strips_dbfs_scheme(spark):
    df = spark.createDataFrame(
        [("dbfs:/Volumes/x/y.jpg",), ("file:/tmp/z.jpg",), ("/plain.jpg",)],
        "path: string",
    )
    out = [r[0] for r in df.select(clean_path("path")).collect()]
    assert out == ["/Volumes/x/y.jpg", "/tmp/z.jpg", "/plain.jpg"]


def test_image_pipeline_end_to_end(spark, image_dir):
    """ingest → embed (distributed stub) → index → self-query ranks first:
    the reference's full pipeline (NMR:161→388) without a driver loop."""
    images = ingest_binary_dir(spark, image_dir, glob="*.jpg")
    emb = embed_column(
        images, "content", lambda: StubImageEncoder(dim=16), drop_failed=True
    )
    emb = assign_ids(emb, "image_id", order_by="path").select(
        "image_id", "path", "embedding"
    )
    rows = emb.collect()
    assert len(rows) == 10
    assert all(len(r["embedding"]) == 16 for r in rows)
    target = rows[3]
    idx = VectorIndex(emb, key="image_id", vector_col="embedding", dim=16)
    top = idx.search(target["embedding"], k=3, columns=["path"]).collect()
    assert top[0]["image_id"] == target["image_id"]
    assert top[0]["score"] == pytest.approx(1.0)


def test_embed_null_on_error_semantics(spark):
    """NMR:211–213: failed rows → null, pipeline continues."""
    df = spark.createDataFrame([(1, "ok"), (2, None), (3, "also ok")], "id: int, t: string")
    out = embed_column(df, "t", lambda: StubTextEncoder(dim=8)).collect()
    by_id = {r["id"]: r["embedding"] for r in out}
    assert by_id[2] is None
    assert len(by_id[1]) == 8
    kept = embed_column(df, "t", lambda: StubTextEncoder(dim=8), drop_failed=True)
    assert kept.count() == 2


def test_embed_is_deterministic_and_distributed(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").limit(50)
    a = embed_column(docs, "text", lambda: StubTextEncoder(dim=32))
    b = embed_column(docs.repartition(7), "text", lambda: StubTextEncoder(dim=32))
    ra = {r["doc_id"]: r["embedding"] for r in a.collect()}
    rb = {r["doc_id"]: r["embedding"] for r in b.collect()}
    assert ra == rb  # partitioning must not change results


def test_extract_image_meta_and_decode(spark, image_dir):
    images = ingest_binary_dir(spark, image_dir, glob="*")
    meta = extract_image_meta(images)
    fmts = {r["path"].split("/")[-1]: r["format"] for r in meta.collect()}
    assert fmts["data.png"] == "png"
    assert fmts["img_000.jpg"] == "jpeg"
    assert fmts["notes.txt"] == "unknown"

    decoded = decode_images(images.filter(F.col("path").endswith(".jpg")))
    rows = decoded.collect()
    assert len(rows) == 10
    assert all(r["width"] >= 64 and r["height"] >= 64 for r in rows)
    # deterministic: same bytes → same fake dimensions
    again = {r["path"]: (r["width"], r["height"]) for r in decode_images(
        ingest_binary_dir(spark, image_dir, glob="*.jpg")).collect()}
    assert all(again[r["path"]] == (r["width"], r["height"]) for r in rows)


def test_decode_pil_raises_cleanly(spark, image_dir):
    images = ingest_binary_dir(spark, image_dir, glob="*.jpg")
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL installed; real decode path available")
    except ImportError:
        with pytest.raises(NotImplementedError, match="stub"):
            decode_images(images, decoder="pil")


def test_resize_images_stub(spark, image_dir):
    from vectorsearch_image_embeddings_databricks_spark.multimodal.images import resize_images

    images = ingest_binary_dir(spark, image_dir, glob="*.jpg")
    out = resize_images(images, 32, 16)
    rows = out.collect()
    assert len(rows) == 10
    assert {(r["width"], r["height"]) for r in rows} == {(32, 16)}
    # stub output bytes: deterministic, sized to the pixel buffer
    assert all(len(r["content"]) == 32 * 16 * 3 for r in rows)
    again = {r["path"]: bytes(r["content"]) for r in out.collect()}
    assert all(bytes(r["content"]) == again[r["path"]] for r in rows)
    with pytest.raises(NotImplementedError):
        resize_images(images, 8, 8, decoder="pil").collect()


def test_sample_frames_flatmap_shape(spark, image_dir):
    """One input row fans out to N frame rows — the mapInPandas flat-map
    shape; frame count derives from byte length (stub: 1 per 4 KiB)."""
    from vectorsearch_image_embeddings_databricks_spark.multimodal.images import sample_frames

    images = ingest_binary_dir(spark, image_dir, glob="*.jpg")
    frames = sample_frames(images, every_ms=500, max_frames=4)
    pdf = frames.toPandas()
    assert pdf.shape[0] >= images.count()  # ≥1 frame per input
    per_path = pdf.groupby("path").size()
    assert per_path.max() <= 4
    # timestamps follow the sampling interval
    sub = pdf[pdf["frame_idx"] == 1]
    assert (sub["ts_ms"] == 500).all()
    # deterministic frame bytes
    one = pdf.iloc[0]
    again = sample_frames(images, every_ms=500, max_frames=4).toPandas()
    match = again[(again["path"] == one["path"]) & (again["frame_idx"] == one["frame_idx"])]
    assert bytes(match.iloc[0]["frame"]) == bytes(one["frame"])
    with pytest.raises(NotImplementedError):
        sample_frames(images, decoder="ffmpeg")


def test_fetch_and_extract_local_zip(tmp_path):
    """O4 (NMR:126–151): download (file:// locally) → unzip → archive
    removed → extracted files ready for ingest."""
    import zipfile

    from vectorsearch_image_embeddings_databricks_spark.sources.fetch import (
        download_file,
        extract_zip,
        fetch_and_extract,
    )

    src = tmp_path / "corpus.zip"
    with zipfile.ZipFile(src, "w") as zf:
        for i in range(3):
            zf.writestr(f"imgs/img_{i}.jpg", b"\xff\xd8\xff\xe0" + bytes([i]) * 10)

    dest = tmp_path / "out"
    extracted = fetch_and_extract(f"file://{src}", str(dest))
    names = sorted(os.path.basename(p) for p in extracted if p.endswith(".jpg"))
    assert names == ["img_0.jpg", "img_1.jpg", "img_2.jpg"]
    assert all(os.path.exists(p) for p in extracted)
    assert not (dest / "corpus.zip").exists()  # archive removed (NMR:149)

    # zip-slip entries are refused
    evil = tmp_path / "evil.zip"
    with zipfile.ZipFile(evil, "w") as zf:
        zf.writestr("../escape.txt", b"nope")
    with pytest.raises(ValueError):
        extract_zip(str(evil), str(tmp_path / "out2"), remove_archive=False)

    # plain local path (no scheme) also works
    src2 = tmp_path / "plain.bin"
    src2.write_bytes(b"abc")
    got = download_file(str(src2), str(tmp_path / "plaincopy"))
    with open(got, "rb") as f:
        assert f.read() == b"abc"


def test_chunk_audio_flatmap_reconstruction(spark):
    """Chunker must emit ceil(len/chunk) rows per payload whose byte
    concatenation is the original payload; empty payloads emit one
    zero-length chunk."""
    import hashlib

    from vectorsearch_image_embeddings_databricks_spark.multimodal.audio import chunk_audio

    payloads = {
        1: b"x" * 100,        # 1 chunk, partial
        2: b"ab" * 96,        # 3 chunks of 64: 64+64+64
        3: b"",               # empty -> 1 zero-length chunk
        4: bytes(range(256)), # 4 full chunks
    }
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in payloads.items()],
        "id long, content binary",
    ).repartition(3)
    out = chunk_audio(df, id_col="id", chunk_bytes=64).collect()

    by_id: dict = {}
    for r in sorted(out, key=lambda r: (r["id"], r["chunk_idx"])):
        by_id.setdefault(r["id"], []).append(r)
    for k, raw in payloads.items():
        rows = by_id[k]
        assert len(rows) == max(1, -(-len(raw) // 64))
        assert [r["chunk_idx"] for r in rows] == list(range(len(rows)))
        assert [r["start_byte"] for r in rows] == [i * 64 for i in range(len(rows))]
        assert sum(r["n_bytes"] for r in rows) == len(raw)
        # md5s identify the exact chunk bytes -> concatenation is lossless
        for i, r in enumerate(rows):
            assert r["chunk_md5"] == hashlib.md5(raw[i * 64 : (i + 1) * 64]).hexdigest()


def test_chunk_audio_librosa_raises_cleanly(spark):
    from vectorsearch_image_embeddings_databricks_spark.multimodal.audio import chunk_audio

    df = spark.createDataFrame([(1, bytearray(b"x"))], "id long, content binary")
    with pytest.raises(NotImplementedError, match="stub"):
        chunk_audio(df, id_col="id", decoder="librosa")


# --------------------------------------------------------------------- #
# Real-encoder seam (O23 / NMR:364–378): the pooling math is pure numpy
# so the exact reference semantics are pinned WITHOUT torch; the model
# forward itself is smoke-tested only where torch exists.
# --------------------------------------------------------------------- #


def test_masked_mean_pool_matches_reference_semantics():
    """mean_pooling (NMR:364–367): masked token mean with clamp(1e-9).
    Hand-computed: only unmasked tokens contribute, divided by their
    count — padding rows never leak into the mean."""
    import numpy as np
    from vectorsearch_image_embeddings_databricks_spark.embed.encoders import masked_mean_pool

    tok = np.array(
        [
            [[1.0, 3.0], [3.0, 5.0], [100.0, 100.0]],  # last token masked
            [[2.0, 4.0], [0.0, 0.0], [0.0, 0.0]],  # single real token
        ]
    )
    mask = np.array([[1, 1, 0], [1, 0, 0]])
    got = masked_mean_pool(tok, mask)
    assert np.allclose(got, [[2.0, 4.0], [2.0, 4.0]])
    # fully-masked row: clamp keeps it finite (reference's clamp(min=1e-9))
    all_masked = masked_mean_pool(tok[:1], np.array([[0, 0, 0]]))
    assert np.isfinite(all_masked).all() and np.allclose(all_masked, 0.0)


def test_layer_norm_then_l2_normalize_pipeline():
    """layer_norm (NMR:375) → F.normalize (NMR:376): rows come out zero
    mean (pre-normalize), unit L2 (post), invariant to per-row affine
    shifts of the input — the property that makes the text pipeline's
    pooled vectors comparable."""
    import numpy as np
    from vectorsearch_image_embeddings_databricks_spark.embed.encoders import (
        l2_normalize,
        layer_norm,
    )

    rng = np.random.default_rng(7)
    x = rng.standard_normal((5, 32))
    normed = layer_norm(x)
    assert np.allclose(normed.mean(axis=-1), 0.0, atol=1e-9)
    out = l2_normalize(normed)
    assert np.allclose(np.linalg.norm(out, axis=-1), 1.0)
    # affine invariance: shift+scale per row changes nothing (up to eps)
    shifted = layer_norm(3.0 * x + 11.0)
    assert np.allclose(layer_norm(x), shifted, atol=1e-6)


def _torch_available() -> bool:
    try:
        import torch  # noqa: F401
        import transformers  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(not _torch_available(), reason="torch/transformers absent")
def test_real_encoders_smoke():  # pragma: no cover - env-dependent
    """Where torch exists: both real encoders construct, embed a tiny
    batch, return unit-norm dim-correct vectors, and null-propagate."""
    import numpy as np
    import pandas as pd
    from vectorsearch_image_embeddings_databricks_spark.embed import (
        RealImageEncoder,
        RealTextEncoder,
    )

    te = RealTextEncoder()
    vecs = te.encode_batch(pd.Series(["hello world", None]))
    assert vecs[1] is None and len(vecs[0]) == te.dim
    assert abs(float(np.linalg.norm(vecs[0])) - 1.0) < 1e-3

    ie = RealImageEncoder()
    out = ie.encode_batch(pd.Series([None, b"not an image"]))
    assert out == [None, None]  # decode failure -> None (NMR:211-213)


def test_real_encoders_raise_cleanly_without_torch():
    """In torch-free environments construction fails fast with
    NotImplementedError (guarded seam, not a latent import crash)."""
    if _torch_available():
        pytest.skip("torch present - covered by the smoke test")
    from vectorsearch_image_embeddings_databricks_spark.embed import (
        RealImageEncoder,
        RealTextEncoder,
    )

    with pytest.raises(NotImplementedError):
        RealTextEncoder()
    with pytest.raises(NotImplementedError):
        RealImageEncoder()


# ------------------------------------------------------------------ #
# Spark 4 Python DataSource (sources/pydatasource.py)
# ------------------------------------------------------------------ #


def test_pydatasource_pushfilters_consumes_bucket_hands_back_rest():
    from pyspark.sql.datasource import EqualTo, GreaterThan
    from vectorsearch_image_embeddings_databricks_spark.sources.pydatasource import (
        SyntheticEventsReader,
    )

    r = SyntheticEventsReader({"n_rows": "100", "n_parts": "4"})
    flt = [EqualTo(("bucket",), 3), GreaterThan(("value",), 10)]
    remaining = list(r.pushFilters(flt))
    # bucket filter consumed, value filter handed back to Spark
    assert remaining == [GreaterThan(("value",), 10)]
    assert r._keep(3) and not r._keep(4)


def test_pydatasource_partitions_cover_keyspace_disjointly():
    from vectorsearch_image_embeddings_databricks_spark.sources.pydatasource import (
        SyntheticEventsReader,
    )

    r = SyntheticEventsReader({"n_rows": "103", "n_parts": "4"})
    parts = r.partitions()
    spans = sorted((p.start, p.end) for p in parts)
    assert spans[0][0] == 0 and spans[-1][1] == 103
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        assert e1 == s2  # contiguous, disjoint


def test_pydatasource_plan_shows_pushed_filter(spark):
    import contextlib
    import io

    from vectorsearch_image_embeddings_databricks_spark import registry
    from .conftest import SF_SMALL

    df = registry.QUERIES["python_datasource_scan"](spark, SF_SMALL)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BatchScan synthetic_events" in plan
    assert "PushedFilters: [EqualTo(bucket,3)]" in plan


def test_tickstream_read_and_replay_agree():
    """readBetweenOffsets must regenerate exactly what the incremental
    reads served for the same offset range — the exactly-once replay
    contract under checkpoint recovery."""
    from vectorsearch_image_embeddings_databricks_spark.sources.pydatasource import (
        TickStreamReader,
    )

    r = TickStreamReader({"n_rows": "1000", "batch_size": "300"})
    off = r.initialOffset()
    served = []
    while int(off["pos"]) < 1000:
        it, off = r.read(off)
        served.extend(it)
    assert len(served) == 1000
    replayed = list(r.readBetweenOffsets({"pos": 0}, {"pos": 1000}))
    assert served == replayed
    # read past the cap returns nothing and holds the offset
    it, same = r.read(off)
    assert list(it) == [] and same == off


def test_manifest_sink_commit_is_idempotent_and_ignores_orphans(spark):
    """Replaying commit() for the same batchId must leave ONE manifest
    (atomic overwrite), and readers must skip staged files that were
    never committed (orphans from aborted/retried batches)."""
    import json
    import os
    import tempfile

    from pyspark.sql import Row
    from vectorsearch_image_embeddings_databricks_spark.sources.pydatasource import (
        ManifestParquetStreamWriter,
        read_manifest_files,
    )

    path = tempfile.mkdtemp(prefix="manifest_test_")
    w = ManifestParquetStreamWriter({"path": path})
    rows = [Row(event_id=i, bucket=i % 10, value=i * 7) for i in range(20)]
    msg = w.write(iter(rows))
    assert msg.n_rows == 20
    # an orphan staged by a failed attempt — never committed
    orphan = w.write(iter(rows))
    w.commit([msg], batchId=0)
    w.commit([msg], batchId=0)  # crash-replay of the same batch
    mdir = os.path.join(path, "manifest")
    assert os.listdir(mdir) == ["0"]
    with open(os.path.join(mdir, "0")) as f:
        assert [e["path"] for e in json.load(f)["files"]] == [msg.path]
    got = read_manifest_files(spark, path)
    assert got.count() == 20  # the orphan's 20 rows are invisible
    assert os.path.exists(orphan.path)  # staged but unread


def test_manifest_sink_empty_task_writes_no_file():
    import tempfile

    from vectorsearch_image_embeddings_databricks_spark.sources.pydatasource import (
        ManifestParquetStreamWriter,
    )

    w = ManifestParquetStreamWriter({"path": tempfile.mkdtemp()})
    msg = w.write(iter([]))
    assert msg.path == "" and msg.n_rows == 0


def test_manifest_reader_survives_stale_tmp_manifest(spark):
    """A crash between the .tmp manifest write and its atomic rename
    leaves `.{batchId}.tmp` in the manifest dir; the reader must skip
    it (and commit() must sweep it) instead of raising on int(name) —
    otherwise one crash permanently bricks the reader half of the
    exactly-once contract."""
    import os
    import tempfile

    from pyspark.sql import Row
    from vectorsearch_image_embeddings_databricks_spark.sources.pydatasource import (
        ManifestParquetStreamWriter,
        read_manifest_files,
    )

    path = tempfile.mkdtemp(prefix="manifest_tmp_test_")
    w = ManifestParquetStreamWriter({"path": path})
    rows = [Row(event_id=i, bucket=i % 10, value=i) for i in range(10)]
    msg = w.write(iter(rows))
    w.commit([msg], batchId=0)
    mdir = os.path.join(path, "manifest")
    # simulate the crashed batch-1 attempt
    stale = os.path.join(mdir, ".1.tmp")
    with open(stale, "w") as f:
        f.write("{not json")
    got = read_manifest_files(spark, path)
    assert got.count() == 10
    # the next successful commit sweeps the stale tmp
    msg2 = w.write(iter(rows))
    w.commit([msg2], batchId=1)
    assert not os.path.exists(stale)
    assert read_manifest_files(spark, path).count() == 20
