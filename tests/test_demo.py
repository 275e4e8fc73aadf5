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
