"""O22 demo wrapper: the non-UI glue (build → search_once → data_array
unpack → text rendering) is pinned here; the gradio Blocks layer is
import-gated and exercised only where gradio is installed."""

import pytest

from vectorsearch_image_embeddings_databricks_spark import demo

JPEG_MAGIC = b"\xff\xd8\xff\xe0" + b"\x00" * 60


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("demo_images")
    for i in range(8):
        (d / f"img_{i:03d}.jpg").write_bytes(JPEG_MAGIC + bytes([i]) * 32)
    return demo.build_demo_engine(spark, str(d), limit=None)


def test_search_once_shapes(engine):
    out = demo.search_once(engine, "a dog catching a frisbee", top_k=3)
    assert out["query"] == "a dog catching a frisbee"
    da = out["data_array"]
    cols = [c["name"] for c in da["manifest"]["columns"]]
    # (key, *columns, score) with score LAST — the reference's
    # positional contract (NMR:416/452's path[1] unpack)
    assert cols == ["image_id", "filepath", "score"]
    assert da["result"]["row_count"] == 3
    assert len(out["hits"]) == 3
    for path, score in out["hits"]:
        assert path.endswith(".jpg")
        assert isinstance(score, float)
    # scores ranked descending
    scores = [s for _, s in out["hits"]]
    assert scores == sorted(scores, reverse=True)


def test_search_once_deterministic(engine):
    a = demo.search_once(engine, "people riding bicycles", top_k=5)
    b = demo.search_once(engine, "people riding bicycles", top_k=5)
    assert a["hits"] == b["hits"]


def test_format_hits_renders_every_rank(engine):
    out = demo.search_once(engine, "a plate of food", top_k=3)
    text = demo.format_hits(out)
    assert "top-3" in text
    for rank in (1, 2, 3):
        assert f"  {rank}. " in text


def test_gradio_gate_is_loud():
    try:
        import gradio  # noqa: F401

        pytest.skip("gradio installed; gate not reachable")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="gradio"):
        demo.launch_gradio(engine=None)


def test_demo_end_to_end_known_nearest_ordering(spark, tmp_path):
    """r8 (r7 verdict #8): full build_demo_engine → search_once round
    trip with a PLANTED nearest neighbor — the stub-encoder twin of the
    reference's "Not bad!" cell (NMR:449-456). The stub encoders seed
    from md5(bytes), so an image whose bytes equal the query's utf-8
    bytes embeds IDENTICALLY (cosine 1.0) and must rank first; the rest
    of the ordering is pinned against the same stub math computed
    driver-side. No torch, no gradio."""
    import hashlib

    import numpy as np

    query = "a dog catching a frisbee"
    d = tmp_path / "images"
    d.mkdir()
    contents = {}
    # the planted twin: file bytes == query text bytes
    contents["target.jpg"] = query.encode("utf-8")
    for i in range(9):
        contents[f"noise_{i}.jpg"] = b"\xff\xd8\xff\xe0" + bytes([i]) * 40
    for name, payload in contents.items():
        (d / name).write_bytes(payload)

    eng = demo.build_demo_engine(spark, str(d), limit=None)
    out = demo.search_once(eng, query, top_k=10)

    def stub_vec(payload: bytes) -> np.ndarray:
        seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "little")
        v = np.random.default_rng(seed).standard_normal(64)
        return (v / np.linalg.norm(v)).astype(np.float32)

    qv = stub_vec(query.encode("utf-8")).astype(np.float64)
    qv /= np.linalg.norm(qv)
    sims = {}
    for name, payload in contents.items():
        iv = stub_vec(payload).astype(np.float64)
        sims[name] = float(iv @ qv / np.linalg.norm(iv))
    expected = sorted(sims, key=lambda n: -sims[n])

    got = [path.rsplit("/", 1)[-1] for path, _ in out["hits"]]
    assert got == expected
    assert got[0] == "target.jpg"
    # identical md5 seed => identical embedding => cosine exactly ~1
    assert abs(out["hits"][0][1] - 1.0) < 1e-6
    # and the planted twin clears the noise floor decisively
    assert out["hits"][1][1] < 0.9
