"""Native vector index — replaces the Databricks Vector Search delta-sync
index the reference drives over REST (``Nomic MultiModal Retrieval.py``:
315–326 create, :384 get_index, :388 similarity_search).

Design (SURVEY.md §2 O16–O19):

- The "index" is a DataFrame keyed by a primary-key column with an
  ``array<float>`` vector column — at scale this is a parquet/Delta table,
  so index build is a write and index load is a scan with column pruning.
- **Exact search** is a Catalyst plan: ``scan → cosine-score expression →
  TakeOrderedAndProject(k)``. No shuffle of the corpus: each partition
  computes its local top-k and the driver merges k·numPartitions rows.
  This is the scalable pattern for single-query top-k at 100 TB — the
  corpus is never re-partitioned, score stays in whole-stage codegen.
- **ANN search** uses MLlib ``BucketedRandomProjectionLSH`` (the only OSS
  MLlib ANN); the exact path is both the default for small corpora and the
  recall oracle for the ANN path.
- ``search_batch`` generalizes the reference's one-query-at-a-time REST API
  into a kNN *join* (query table × corpus, per-query top-k).

Scores: cosine similarity, computed in float64. The reference stores only
L2-normalized vectors (NMR:209/:376), for which cosine ≡ dot ≡ monotone in
negative-L2 — ranking is invariant to that choice (§1.4).
"""

from __future__ import annotations

import json
import math
import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vector import cosine_similarity, dim_check, dot

_META_FILE = "_vectorlake_index_meta.json"


def _query_literal(query_vector: Sequence[float]):
    return F.array(*[F.lit(float(x)) for x in query_vector])


class VectorIndex:
    """A queryable vector index over a DataFrame.

    Parameters mirror the reference's ``create_delta_sync_index`` call
    (NMR:319–322): ``primary_key`` → ``key``, ``embedding_vector_column`` →
    ``vector_col``, ``embedding_dimension`` → ``dim``.
    """

    def __init__(
        self,
        df: DataFrame,
        key: str = "vec_id",
        vector_col: str = "embedding",
        dim: int | None = None,
        assume_normalized: bool = False,
    ) -> None:
        self.df = df
        self.key = key
        self.vector_col = vector_col
        self.assume_normalized = assume_normalized
        if dim is None:
            # Reference computes the dim from the first embedding at runtime
            # (NMR:322); we do the same but validate it is consistent.
            first = df.select(F.size(vector_col).alias("d")).limit(1).collect()
            dim = int(first[0]["d"]) if first else 0
        self.dim = dim

    # ------------------------------------------------------------------ #
    # build / persist / load (replaces the VS service index lifecycle)
    # ------------------------------------------------------------------ #

    @classmethod
    def from_table(
        cls, spark: SparkSession, table: str, key: str = "vec_id",
        vector_col: str = "embedding", **kw
    ) -> "VectorIndex":
        return cls(spark.table(table), key=key, vector_col=vector_col, **kw)

    def save(self, path: str, mode: str = "overwrite") -> None:
        """Materialize the index as parquet + JSON metadata (replaces the
        remote index build at NMR:315–323; a 'build' is just a write)."""
        self.df.write.mode(mode).parquet(os.path.join(path, "data"))
        meta = {
            "key": self.key,
            "vector_col": self.vector_col,
            "dim": self.dim,
            "assume_normalized": self.assume_normalized,
        }
        with open(os.path.join(path, _META_FILE), "w") as f:
            json.dump(meta, f)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "VectorIndex":
        """Catalog lookup (replaces ``vs_client.get_index``, NMR:384)."""
        with open(os.path.join(path, _META_FILE)) as f:
            meta = json.load(f)
        df = spark.read.parquet(os.path.join(path, "data"))
        return cls(
            df,
            key=meta["key"],
            vector_col=meta["vector_col"],
            dim=meta["dim"],
            assume_normalized=meta["assume_normalized"],
        )

    # ------------------------------------------------------------------ #
    # query
    # ------------------------------------------------------------------ #

    def _score(self, query_col, query_norm=None, vec_norm=None) -> F.Column:
        """Cosine score. When the query norm is known (literal query vector,
        or precomputed per-query column in the batch path) we fold it into
        a constant instead of re-deriving sqrt(dot(q,q)) per corpus row —
        at 100 TB that halves the per-row arithmetic. ``vec_norm``
        (r9) is the same factoring on the CORPUS side: the batch path
        evaluates the score once per (row × query) pair, so an inline
        corpus norm is re-derived |queries| times per row — pass a
        per-row precomputed column instead (same array, same fold —
        bitwise-identical score)."""
        if self.assume_normalized:
            return dot(self.vector_col, query_col)
        num = dot(self.vector_col, query_col)
        qn = query_norm if query_norm is not None else F.sqrt(dot(query_col, query_col))
        vn = (
            vec_norm
            if vec_norm is not None
            else F.sqrt(dot(self.vector_col, self.vector_col))
        )
        return num / (vn * qn)

    def search(
        self,
        query_vector: Sequence[float],
        k: int = 5,
        columns: Sequence[str] | None = None,
        score_col: str = "score",
    ) -> DataFrame:
        """Exact top-k similarity search (NMR:388 semantics, honored ``k``
        unlike the reference's ignored ``top_k`` arg — SURVEY.md §1.4).

        Returns ``(key, *columns, score)`` ordered by score desc, key asc
        (deterministic tie-break). Physical plan: one codegen'd scan +
        ``TakeOrderedAndProject`` — per-partition top-k, driver merge.
        """
        if len(query_vector) != self.dim:
            raise ValueError(
                f"query dim {len(query_vector)} != index dim {self.dim}"
            )
        cols = [self.key] + [
            c for c in (columns or []) if c != self.key and c != score_col
        ]
        q = _query_literal(query_vector)
        # same sequential fold order as the Catalyst aggregate, driver-side
        acc = 0.0
        for x in query_vector:
            acc += float(x) * float(x)
        qnorm = F.lit(math.sqrt(acc))
        return (
            self.df.select(*cols, self._score(q, query_norm=qnorm).alias(score_col))
            .orderBy(F.desc(score_col), F.asc(self.key))
            .limit(k)
        )

    def search_batch(
        self,
        queries: DataFrame,
        k: int = 5,
        query_key: str = "query_id",
        query_vector_col: str = "query_vec",
        columns: Sequence[str] | None = None,
        score_col: str = "score",
        local_topk: bool = False,
    ) -> DataFrame:
        """kNN join: per row of ``queries``, the top-k nearest corpus rows
        (SURVEY.md §2 E2 — generalizes the one-query REST API).

        The query table is broadcast (it is the small side by construction —
        queries are human/batch inputs, the corpus is the 100 TB side), so
        the corpus is scanned once with no shuffle to produce scores.

        Default plan: per-query top-k via a window on ``query_key`` — the
        shuffle carries |corpus|×|queries| scored rows (AQE-coalesced).
        Fine while that product is modest.

        ``local_topk=True`` is the big-corpus plan: scoring stays in JVM
        codegen, then a partition-LOCAL top-k (``mapInPandas`` over rows
        projected down to exactly (query, key, score) — no vectors or
        payload columns cross into Python, memory bounded at |queries|·k
        per worker) reduces each corpus partition to ≤ |queries|·k
        candidates BEFORE any exchange. The final window then shuffles
        |partitions|·|queries|·k rows instead of |corpus|·|queries| — the
        difference between shuffling the corpus and shuffling a
        result-sized set at 100 TB. Any requested payload ``columns`` are
        re-attached AFTER the final top-k by a broadcast join of the
        (|queries|·k)-row result against the corpus — the corpus is
        probed, never shuffled. Results are identical (same deterministic
        tie-break; pytest-asserted).
        """
        q = F.broadcast(
            queries.select(
                F.col(query_key),
                F.col(query_vector_col).alias("__qv"),
                # per-query norm computed once on the (small) query side
                F.sqrt(dot(query_vector_col, query_vector_col)).alias("__qn"),
            )
        )
        extra = [
            c
            for c in (columns or [])
            if c not in (self.key, score_col, query_key)
        ]
        scored_cols = [self.key] + ([] if local_topk else extra)
        # r9: corpus-row norm computed ONCE per row before the cross
        # join — inline it and the score expression re-derives it per
        # (row × query) pair, |queries|× the arithmetic for the same
        # bitwise value
        corpus = (
            self.df
            if self.assume_normalized
            else self.df.withColumn(
                "__vn", F.sqrt(dot(self.vector_col, self.vector_col))
            )
        )
        scored = corpus.crossJoin(q).select(
            query_key,
            *scored_cols,
            self._score(
                F.col("__qv"),
                query_norm=F.col("__qn"),
                vec_norm=None if self.assume_normalized else F.col("__vn"),
            ).alias(score_col),
        )
        if local_topk:
            scored = self._partition_local_topk(
                scored, k, query_key, score_col
            )
        w = Window.partitionBy(query_key).orderBy(
            F.desc(score_col), F.asc(self.key)
        )
        topk = (
            scored.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .drop("__rn")
        )
        if local_topk and extra:
            payload = self.df.select(self.key, *extra)
            topk = payload.join(F.broadcast(topk), self.key).select(
                query_key, self.key, *extra, score_col
            )
        return topk

    def _partition_local_topk(
        self, scored: DataFrame, k: int, query_key: str, score_col: str
    ) -> DataFrame:
        """Reduce each partition to its local per-query top-k (same
        (score desc, key asc) order as the global tie-break, so the local
        survivors are exactly the rows that can appear in the global
        top-k). Incremental fold over Arrow batches keeps worker memory
        at O(|queries|·k) regardless of partition size."""
        import pandas as pd

        key = self.key

        def fold(it):
            acc: pd.DataFrame | None = None
            for pdf in it:
                both = pdf if acc is None else pd.concat((acc, pdf))
                acc = (
                    both.sort_values(
                        [query_key, score_col, key],
                        ascending=[True, False, True],
                    )
                    .groupby(query_key, sort=False)
                    .head(k)
                )
            if acc is not None:
                yield acc

        from ..shipping import ensure_shipped

        ensure_shipped(scored.sparkSession)
        return scored.mapInPandas(fold, scored.schema)

    # ------------------------------------------------------------------ #
    # integrity
    # ------------------------------------------------------------------ #

    def validate(self) -> DataFrame:
        """Rows violating the index invariants: wrong dimension or null
        components (declarative version of NMR:322's runtime dim probe)."""
        return self.df.filter(~dim_check(self.vector_col, self.dim))


# --------------------------------------------------------------------- #
# result-shape fidelity
# --------------------------------------------------------------------- #

def to_data_array(df: DataFrame, score_col: str = "score") -> dict:
    """Adapter to the reference's ``similarity_search`` response shape:
    ``{'manifest': {'columns': [...]}, 'result': {'data_array': [[...]],
    'row_count': N}}`` with the score LAST in each positional row —
    exactly what the notebook's consumers index into (``path[1]`` at
    NMR:416 and NMR:452). Collects to the driver by design: feed it the
    final k-row search result, never a corpus DataFrame. Typed DataFrames
    remain the engine's primary surface (SURVEY §1.1); this exists so
    code written against the reference's dict shape ports unchanged."""
    cols = [c for c in df.columns if c != score_col] + [score_col]
    rows = [[r[c] for c in cols] for r in df.select(*cols).collect()]
    return {
        "manifest": {"columns": [{"name": c} for c in cols]},
        "result": {"data_array": rows, "row_count": len(rows)},
    }
