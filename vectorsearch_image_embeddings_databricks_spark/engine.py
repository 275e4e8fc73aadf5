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
        self._ann = None  # lazily-built BRPLSHIndex for query_type="ann"

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
        self._ann = None  # stale after a rebuild
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
        query_type: str = "exact",
    ) -> DataFrame:
        """NMR:380–404 semantics with ``top_k`` honored: embed the text,
        top-k search, return (image_id, *columns, score).

        ``query_type`` mirrors the reference's declared surface:

        - ``"exact"`` — brute-force cosine (default; the correctness
          oracle for the other two).
        - ``"ann"`` — MLlib BRP-LSH with the deterministic bucket-join
          search (the scale path; replaces the closed VS ANN,
          NMR:315–323). Deterministic, which also means no adaptive
          widening: may return fewer than ``top_k`` rows if the query
          collides with fewer than ``top_k`` corpus rows (tune
          num_hash_tables / bucket_length).
        - ``"hybrid"`` — vector ranking RRF-fused with keyword (BM25)
          relevance of the query terms against ``text_col`` — the
          commented-out ``query_type="hybrid"`` call at NMR:386–387,
          implemented natively.
        """
        if self.index is None:
            raise RuntimeError("call build_index() first")
        qvec = self.embed_text(query_text)
        if query_type == "exact":
            return self.index.search(qvec, k=top_k, columns=list(columns))
        if query_type == "ann":
            from .index.ann import BRPLSHIndex

            if self._ann is None:
                self._ann = BRPLSHIndex(
                    self.index.df,
                    key=self.index.key,
                    vector_col=self.index.vector_col,
                    bucket_length=1.0,
                    num_hash_tables=6,
                )
            res = self._ann.search(qvec, k=top_k)
            payload = self.index.df.select(self.index.key, *columns)
            return res.join(F.broadcast(payload), on=self.index.key).select(
                self.index.key, *columns, "score"
            ).orderBy(F.desc("score"), F.asc(self.index.key))
        if query_type == "hybrid":
            return self._search_hybrid(query_text, qvec, top_k, columns)
        raise ValueError(f"unknown query_type: {query_type!r}")

    @staticmethod
    def _informative_terms(
        docs: DataFrame, text_col: str, terms: list[str], max_df_frac: float = 0.5
    ) -> list[str]:
        """Corpus-relative stopword pruning: drop query terms present in
        more than ``max_df_frac`` of docs. Their idf ≈ 0 (they barely move
        BM25) but they flood the keyword candidate list with ties, which
        degrades RRF. Falls back to all terms if everything is common.
        One tiny single-row aggregate over the corpus."""
        from .functions.text import tokenize

        if not terms:
            return terms
        toks = F.array_distinct(tokenize(text_col))
        row = docs.agg(
            F.count("*").alias("n"),
            *[
                F.sum(F.array_contains(toks, t).cast("long")).alias(f"df{i}")
                for i, t in enumerate(terms)
            ],
        ).collect()[0]
        keep = [
            t
            for i, t in enumerate(terms)
            if row[f"df{i}"] <= max_df_frac * row["n"]
        ]
        return keep or terms

    def _search_hybrid(
        self,
        query_text: str,
        qvec: list[float],
        top_k: int,
        columns: Sequence[str],
        text_col: str = "filepath",
        rrf_k: int = 60,
    ) -> DataFrame:
        """RRF fusion of the exact vector ranking with BM25 keyword
        relevance of the query terms against ``text_col``. Both rankings
        are tiny (≤4·top_k rows after their own top-k cuts), so the
        fusion join is a broadcast — corpus is scanned twice, never
        shuffled."""
        from .operators.hybrid import bm25_scores, rrf_fuse, rank_by

        import re

        key = self.index.key
        depth = max(4 * top_k, top_k)
        vec_rank = rank_by(
            self.index.search(qvec, k=depth, columns=[]), key, "score"
        )
        # same segmentation on both sides: non-alphanumerics → spaces, so
        # a query like "img_007.jpg" keyword-matches path components
        terms = [t for t in re.split(r"[^a-z0-9]+", query_text.lower()) if t]
        kwdocs = self.index.df.withColumn(
            "__kwtext",
            F.lower(F.regexp_replace(F.col(text_col), "[^A-Za-z0-9]+", " ")),
        )
        terms = self._informative_terms(kwdocs, "__kwtext", terms)
        kw = bm25_scores(kwdocs, key, "__kwtext", terms)
        kw_rank = rank_by(
            kw.filter(F.col("score") > 0)
            .orderBy(F.desc("score"), F.asc("id"))
            .limit(depth),
            "id",
            "score",
        )
        fused = rrf_fuse(vec_rank, kw_rank, k0=rrf_k)
        payload = self.index.df.select(F.col(key).alias("id"), *columns)
        return (
            fused.orderBy(F.desc("rrf_score"), F.asc("id"))
            .limit(top_k)
            .join(F.broadcast(payload), on="id")
            .select(
                F.col("id").alias(key),
                *columns,
                F.col("rrf_score").alias("score"),
            )
            .orderBy(F.desc("score"), F.asc(key))
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
