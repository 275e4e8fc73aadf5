"""User-facing facade replicating the reference notebook's workflow as a
single object — the surface a user of
``auschoi96/vectorsearch_image_embeddings_databricks`` would actually migrate to.

Reference flow → facade method (citations into
``Nomic MultiModal Retrieval.py``):

- ingest images (binaryFile scan + path cleanup + saveAsTable,
  NMR:161–163)                       → :meth:`ingest_images`
- embed + build the vector index (driver loop NMR:233–247 + VS
  delta-sync index NMR:315–326)      → :meth:`build_index` (distributed
  pandas-UDF embedding; native index — one Spark job, no REST service)
- text query (NMR:380–404: embed the question, ``similarity_search``,
  unpack ``result.data_array``)      → :meth:`search_images_by_text`
  (returns a typed DataFrame; honors ``top_k`` — the reference ignores
  its own ``top_k`` arg, SURVEY §1.4) and :func:`to_data_array` for the
  wire-shape-compatible dict.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .embed import StubImageEncoder, StubTextEncoder, embed_column
from .embed.encoders import Encoder
from .embed.udf import assign_ids
from .index.vector_index import VectorIndex
from .sources import ingest_binary_dir
from .sources.catalog import EngineConfig


class MultiModalEngine:
    """Ingest → embed → index → query, on DataFrames end to end."""

    def __init__(
        self,
        spark: SparkSession,
        config: EngineConfig | None = None,
        image_encoder_factory: Callable[[], Encoder] | None = None,
        text_encoder_factory: Callable[[], Encoder] | None = None,
        dim: int = 64,
    ) -> None:
        self.spark = spark
        self.config = config or EngineConfig()
        self.image_encoder_factory = image_encoder_factory or (
            lambda: StubImageEncoder(dim=dim)
        )
        self.text_encoder_factory = text_encoder_factory or (
            lambda: StubTextEncoder(dim=dim)
        )
        self.dim = dim
        self.images: DataFrame | None = None
        self.index: VectorIndex | None = None

    # ------------------------------------------------------------------ #

    def ingest_images(self, directory: str, glob: str = "*.jpg") -> DataFrame:
        """binaryFile scan with glob pushdown + scheme-stripped paths
        (NMR:161–162). Set ``config`` + ``persist()`` to land it as a
        managed table (NMR:163)."""
        self.images = ingest_binary_dir(self.spark, directory, glob=glob)
        return self.images

    def build_index(self, limit: int | None = None) -> VectorIndex:
        """Distributed replacement for the reference's collect-and-loop
        embedding (NMR:227–245) + remote index build (NMR:315–323):
        embed in executor-side Arrow batches, assign stable ids, filter
        failed rows (NMR:239's skip semantics), wrap as a VectorIndex."""
        if self.images is None:
            raise RuntimeError("call ingest_images() first")
        df = self.images
        if limit is not None:  # the demo cap, NMR:224
            df = df.limit(limit)
        emb = embed_column(
            df.select("path", "content"),
            "content",
            self.image_encoder_factory,
            drop_failed=True,
        )
        emb = assign_ids(emb, "image_id", order_by="path").select(
            "image_id", F.col("path").alias("filepath"), "embedding"
        )
        self.index = VectorIndex(
            emb, key="image_id", vector_col="embedding", dim=self.dim
        )
        return self.index

    def embed_text(self, query_text: str) -> list[float]:
        """Driver-side single-query text embedding (NMR:369–378) — pure
        function of its argument (the reference reads a global instead;
        SURVEY §1.4 'known reference bug')."""
        import pandas as pd

        enc = self.text_encoder_factory()
        (vec,) = enc.encode_batch(pd.Series([query_text]))
        if vec is None:
            raise ValueError(f"unencodable query text: {query_text!r}")
        return vec

    def search_images_by_text(
        self,
        query_text: str,
        top_k: int = 5,
        columns: Sequence[str] = ("filepath",),
    ) -> DataFrame:
        """NMR:380–404 semantics with ``top_k`` honored: embed the text,
        exact top-k cosine search, return (image_id, *columns, score)."""
        if self.index is None:
            raise RuntimeError("call build_index() first")
        return self.index.search(
            self.embed_text(query_text), k=top_k, columns=list(columns)
        )


def to_data_array(result: DataFrame, columns: Sequence[str]) -> dict:
    """Adapter to the reference's wire shape (NMR:388 → consumers index
    ``results['result']['data_array']`` positionally, NMR:416/:452):
    rows become positional arrays ``[*columns, score]``."""
    rows = result.select(*columns, "score").collect()
    return {
        "result": {
            "data_array": [
                [r[c] for c in columns] + [r["score"]] for r in rows
            ]
        }
    }
