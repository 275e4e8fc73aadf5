"""O22 — the serving/demo wrapper (NMR:437-530), import-gated.

The reference's last cell is a Gradio Blocks app: a textbox feeds
``search_and_display_images`` which embeds the query, runs the vector
index's top-k, and renders the hit filepaths (NMR:449-484); example
queries and ``demo.launch(share=True)`` finish it (NMR:496-530). It is
presentation-layer glue over the engine call chain this repo already
provides — ``MultiModalEngine.search_images_by_text`` +
``to_data_array`` — so this module is ~the same thin wrapper:

- :func:`search_once` — the non-UI glue (pytest-pinned): one query →
  the reference's ``data_array`` response dict plus the unpacked
  ``(filepath, score)`` pairs the display loop consumes (the
  ``path[1]`` positional idiom, NMR:416/452).
- :func:`launch_gradio` — the Blocks app itself, behind an import gate
  (gradio is not a dependency of the engine; same pattern as
  torch/PIL in ``embed/encoders.py``).
- :func:`run_stdin_loop` — dependency-free fallback REPL so the demo
  exists on any box that can run Spark.

Quickstart (matches README):

    from vectorsearch_image_embeddings_databricks_spark.demo import build_demo_engine, run_stdin_loop
    eng = build_demo_engine(spark, "/path/to/images")
    run_stdin_loop(eng)          # or launch_gradio(eng)
"""

from __future__ import annotations

from collections.abc import Sequence

from .engine import MultiModalEngine
from .index.vector_index import to_data_array

#: NMR:496-503's example prompts (public COCO-query flavor).
EXAMPLE_QUERIES = (
    "a dog catching a frisbee",
    "people riding bicycles in the city",
    "a plate of food on a table",
)


def build_demo_engine(
    spark, image_dir: str, glob: str = "*.jpg", limit: int | None = 500
) -> MultiModalEngine:
    """Ingest → index with the demo cap (NMR:224's ``limit(500)``).
    Stub encoders by default; pass factories for real models."""
    eng = MultiModalEngine(spark)
    eng.ingest_images(image_dir, glob=glob)
    eng.build_index(limit=limit)
    return eng


def search_once(
    engine: MultiModalEngine,
    query_text: str,
    top_k: int = 5,
    query_type: str = "exact",
    columns: Sequence[str] = ("filepath",),
) -> dict:
    """One query through the full reference call chain (NMR:449-456):
    embed → top-k → ``data_array`` dict, plus the positionally-unpacked
    hits the display code consumes. Returns::

        {"query": ..., "data_array": <NMR response dict>,
         "hits": [(filepath, score), ...]}
    """
    res = engine.search_images_by_text(
        query_text, top_k=top_k, columns=list(columns), query_type=query_type
    )
    payload = to_data_array(res)
    rows = payload["result"]["data_array"]
    # filepath sits at position 1 (key, *columns, score) — the exact
    # index the reference's consumers hardcode (NMR:416, NMR:452)
    return {
        "query": query_text,
        "data_array": payload,
        "hits": [(row[1], row[-1]) for row in rows],
    }


def format_hits(result: dict) -> str:
    """Plain-text rendering of a search_once result (the stdin tier's
    stand-in for the matplotlib grid, NMR:413-426)."""
    lines = [f"top-{len(result['hits'])} for {result['query']!r}:"]
    for rank, (path, score) in enumerate(result["hits"], 1):
        lines.append(f"  {rank}. {path}  (score {score:.4f})")
    return "\n".join(lines)


def run_stdin_loop(engine: MultiModalEngine, top_k: int = 5) -> None:
    """Dependency-free interactive loop: read a query, print the hits.
    Empty line / EOF exits."""
    while True:
        try:
            q = input("query> ").strip()
        except EOFError:
            return
        if not q:
            return
        print(format_hits(search_once(engine, q, top_k=top_k)))


def launch_gradio(
    engine: MultiModalEngine,
    top_k: int = 5,
    share: bool = False,
    render_images: bool = False,
):
    """The NMR:437-530 Blocks app over the native engine. Import-gated:
    raises ImportError with install guidance when gradio is absent.
    ``render_images=True`` returns a Gallery of the hit files (needs
    the paths to be real images); default renders the ranked list as
    text, which works with the stub encoders too."""
    try:
        import gradio as gr
    except ImportError as exc:  # pragma: no cover - absent in sandbox
        raise ImportError(
            "the demo UI requires the optional gradio package "
            "(pip install gradio); run_stdin_loop() is the "
            "dependency-free equivalent"
        ) from exc

    def _search(query_text: str):
        result = search_once(engine, query_text, top_k=top_k)
        if render_images:
            return [path for path, _ in result["hits"]]
        return format_hits(result)

    with gr.Blocks(title="Multimodal retrieval demo") as demo:
        gr.Markdown("# Text → image retrieval (native Spark engine)")
        box = gr.Textbox(label="Search query")
        out = gr.Gallery() if render_images else gr.Textbox(label="Results")
        box.submit(_search, inputs=box, outputs=out)
        gr.Examples(list(EXAMPLE_QUERIES), inputs=box)
    demo.launch(share=share)
    return demo
