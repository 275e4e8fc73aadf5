"""Approximate-nearest-neighbor layer — the native replacement for the
closed Databricks Vector Search ANN service (``Nomic MultiModal
Retrieval.py``:315–326; SURVEY.md §2 O16/O17, E1–E3 scale paths).

Three complementary structures:

- **BRPLSHIndex** — MLlib ``BucketedRandomProjectionLSH`` (Euclidean).
  For L2-normalized vectors (the reference's invariant, NMR:209/:376),
  L2 distance is monotone in cosine (d² = 2 − 2·cos), so Euclidean LSH
  answers cosine queries exactly as ranked. This is the "use what MLlib
  ships" path: fit/persist/load, ``approxNearestNeighbors``.

- **CosineLSHIndex** — native random-hyperplane (sign) LSH built from
  column expressions only: signature bit i = sign(v · r_i). Candidates
  come from equi-joins on banded signatures — the structure that lets a
  100 TB self-similarity join shuffle on bucket keys instead of
  comparing all pairs.

- **IVFIndex** — inverted-file index: MLlib KMeans coarse quantizer;
  corpus stored partitioned by centroid id; a query probes the
  ``nprobe`` nearest centroids, turning top-k into a partition-pruned
  exact search over ~nprobe/k of the data.

Exact search (vector_index.VectorIndex) is the recall oracle for all
three (BASELINE.md: ANN recall@5 ≥ 0.9).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vector import dot
from .vector_index import VectorIndex, _query_literal


# --------------------------------------------------------------------- #
# MLlib BucketedRandomProjectionLSH wrapper
# --------------------------------------------------------------------- #

class BRPLSHIndex:
    """Euclidean-LSH ANN over an array<float> column via MLlib.

    cites: replaces create_delta_sync_index_and_wait (NMR:315–323) +
    similarity_search (NMR:388) with fit() + search().
    """

    def __init__(
        self,
        df: DataFrame,
        key: str = "vec_id",
        vector_col: str = "embedding",
        bucket_length: float = 0.5,
        num_hash_tables: int = 4,
    ) -> None:
        from pyspark.ml.feature import BucketedRandomProjectionLSH
        from pyspark.ml.functions import array_to_vector

        self.key = key
        self.vector_col = vector_col
        self.df = df.withColumn("__vec", array_to_vector(F.col(vector_col)))
        self.model = BucketedRandomProjectionLSH(
            inputCol="__vec",
            outputCol="__hashes",
            bucketLength=bucket_length,
            numHashTables=num_hash_tables,
        ).fit(self.df)
        # hashed corpus cached: at scale this is the materialized index
        self.hashed = self.model.transform(self.df).cache()

    def search(
        self, query_vector: Sequence[float], k: int = 5, score_col: str = "score"
    ) -> DataFrame:
        """ANN top-k. Returns (key, score) with cosine-equivalent score
        (2 − d²)/2 for unit vectors, ranked desc."""
        from pyspark.ml.linalg import Vectors

        q = Vectors.dense([float(x) for x in query_vector])
        res = self.model.approxNearestNeighbors(self.hashed, q, k, distCol="__dist")
        score = (F.lit(2.0) - F.col("__dist") * F.col("__dist")) / F.lit(2.0)
        return res.select(self.key, score.alias(score_col)).orderBy(
            F.desc(score_col), F.asc(self.key)
        )

    def save(self, path: str) -> None:
        """Persist model + hashed corpus (the ANN analogue of the index
        'build' the reference delegates to the VS service, NMR:315–323).
        Loading skips the fit (the expensive, corpus-wide part); re-hashing
        on load is a narrow per-row map, applied lazily."""
        import json
        import os

        self.model.write().overwrite().save(os.path.join(path, "model"))
        self.hashed.drop("__vec", "__hashes").write.mode("overwrite").parquet(
            os.path.join(path, "data")
        )
        with open(os.path.join(path, "_brplsh_meta.json"), "w") as f:
            json.dump({"key": self.key, "vector_col": self.vector_col}, f)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "BRPLSHIndex":
        import json
        import os

        from pyspark.ml.feature import BucketedRandomProjectionLSHModel
        from pyspark.ml.functions import array_to_vector

        with open(os.path.join(path, "_brplsh_meta.json")) as f:
            meta = json.load(f)
        obj = cls.__new__(cls)
        obj.key = meta["key"]
        obj.vector_col = meta["vector_col"]
        obj.model = BucketedRandomProjectionLSHModel.load(
            os.path.join(path, "model")
        )
        obj.df = spark.read.parquet(os.path.join(path, "data")).withColumn(
            "__vec", array_to_vector(F.col(meta["vector_col"]))
        )
        obj.hashed = obj.model.transform(obj.df).cache()
        return obj

    def similarity_join(self, other: DataFrame | None, max_l2: float) -> DataFrame:
        """Pairs within L2 distance threshold (self-join when other is
        None): LSH-bucketed candidate generation + exact distance filter."""
        from pyspark.ml.functions import array_to_vector

        right = (
            self.hashed
            if other is None
            else other.withColumn("__vec", array_to_vector(F.col(self.vector_col)))
        )
        joined = self.model.approxSimilarityJoin(
            self.hashed, right, max_l2, distCol="l2"
        )
        out = joined.select(
            F.col(f"datasetA.{self.key}").alias("id_a"),
            F.col(f"datasetB.{self.key}").alias("id_b"),
            "l2",
        )
        if other is None:
            out = out.filter(F.col("id_a") < F.col("id_b"))
        return out


# --------------------------------------------------------------------- #
# Native random-hyperplane cosine LSH (column expressions only)
# --------------------------------------------------------------------- #

class CosineLSHIndex:
    """Sign-LSH for cosine similarity with banded candidate joins.

    Signature: bit_i = 1 if v·r_i > 0 for ``num_bits`` seeded gaussian
    hyperplanes (driver-generated, embedded as literals — tiny). Bands of
    ``band_bits`` bits become integer keys; near vectors collide in ≥1
    band with high probability. All JVM expressions: xxhash-free, UDF-free.
    """

    def __init__(
        self,
        df: DataFrame,
        key: str = "vec_id",
        vector_col: str = "embedding",
        dim: int | None = None,
        num_bits: int = 16,
        band_bits: int = 4,
        seed: int = 42,
    ) -> None:
        self.key = key
        self.vector_col = vector_col
        self.num_bits = num_bits
        self.band_bits = band_bits
        if dim is None:
            first = df.select(F.size(vector_col).alias("d")).limit(1).collect()
            dim = int(first[0]["d"]) if first else 0
        self.dim = dim
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((num_bits, dim))
        sig_bits = [
            F.when(dot(vector_col, _query_literal(p)) > 0, 1).otherwise(0)
            for p in self.planes
        ]
        nbands = num_bits // band_bits
        band_keys = []
        for b in range(nbands):
            chunk = sig_bits[b * band_bits : (b + 1) * band_bits]
            acc = F.lit(0)
            for bit in chunk:
                acc = acc * 2 + bit
            band_keys.append(F.struct(F.lit(b).alias("band"), acc.alias("bh")))
        self.signed = df.withColumn("__bands", F.array(*band_keys))

    def candidate_pairs(self) -> DataFrame:
        """(id_a, id_b) sharing ≥1 band — the scale path feeding
        operators.dedup.near_dup_pairs_cosine's exact verify."""
        banded = self.signed.select(
            F.col(self.key).alias("id"),
            F.col(self.vector_col).alias("vec"),
            F.explode("__bands").alias("bk"),
        ).select("id", "vec", "bk.band", "bk.bh")
        a, b = banded.alias("a"), banded.alias("b")
        return (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bh") == F.col("b.bh"))
                & (F.col("a.id") < F.col("b.id")),
            )
            .select(
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                F.col("a.vec").alias("vec_a"),
                F.col("b.vec").alias("vec_b"),
            )
            .distinct()
        )

    def similarity_self_join(self, threshold: float) -> DataFrame:
        """Near-dup pairs with cos ≥ threshold: LSH candidates → exact
        cosine verify. Same output schema as the exact operator."""
        from ..functions.vector import cosine_similarity

        return (
            self.candidate_pairs()
            .withColumn("cos", cosine_similarity("vec_a", "vec_b"))
            .filter(F.col("cos") >= threshold)
            .select("id_a", "id_b", "cos")
        )


# --------------------------------------------------------------------- #
# IVF (inverted file) index: KMeans coarse quantizer + partition pruning
# --------------------------------------------------------------------- #

class IVFIndex:
    """IVF-flat: cluster the corpus with KMeans; search probes the
    ``nprobe`` nearest centroids and runs exact top-k inside them.

    At 100 TB the assigned corpus is written partitioned by
    ``centroid_id`` so a probe is a partition-pruned scan (reads
    nprobe/nlist of the data); here the filter plays that role.
    """

    def __init__(
        self,
        df: DataFrame,
        key: str = "vec_id",
        vector_col: str = "embedding",
        nlist: int = 16,
        seed: int = 42,
        max_iter: int = 20,
    ) -> None:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        self.key = key
        self.vector_col = vector_col
        vecs = df.withColumn("__vec", array_to_vector(F.col(vector_col)))
        self.kmeans = KMeans(
            k=nlist,
            seed=seed,
            maxIter=max_iter,
            featuresCol="__vec",
            predictionCol="centroid_id",
        ).fit(vecs)
        self.assigned = self.kmeans.transform(vecs).drop("__vec").cache()
        self.centroids = [np.asarray(c) for c in self.kmeans.clusterCenters()]

    def save(self, path: str) -> None:
        """Persist quantizer + centroid-assigned corpus, written
        *partitioned by centroid_id* so a loaded index probes via
        partition pruning (the on-disk layout the class docstring
        promises for scale)."""
        import json
        import os

        self.kmeans.write().overwrite().save(os.path.join(path, "model"))
        self.assigned.write.mode("overwrite").partitionBy(
            "centroid_id"
        ).parquet(os.path.join(path, "data"))
        with open(os.path.join(path, "_ivf_meta.json"), "w") as f:
            json.dump({"key": self.key, "vector_col": self.vector_col}, f)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "IVFIndex":
        import json
        import os

        from pyspark.ml.clustering import KMeansModel

        with open(os.path.join(path, "_ivf_meta.json")) as f:
            meta = json.load(f)
        obj = cls.__new__(cls)
        obj.key = meta["key"]
        obj.vector_col = meta["vector_col"]
        obj.kmeans = KMeansModel.load(os.path.join(path, "model"))
        obj.assigned = spark.read.parquet(os.path.join(path, "data"))
        obj.centroids = [np.asarray(c) for c in obj.kmeans.clusterCenters()]
        return obj

    def search(
        self,
        query_vector: Sequence[float],
        k: int = 5,
        nprobe: int = 4,
        score_col: str = "score",
    ) -> DataFrame:
        """Probe the nprobe nearest centroids (driver-side — centroids are
        tiny), then exact cosine top-k within them."""
        q = np.asarray(list(query_vector), dtype=float)
        dists = [float(np.linalg.norm(c - q)) for c in self.centroids]
        probes = list(np.argsort(dists)[:nprobe])
        shard = self.assigned.filter(
            F.col("centroid_id").isin([int(p) for p in probes])
        )
        idx = VectorIndex(
            shard, key=self.key, vector_col=self.vector_col, dim=len(q)
        )
        return idx.search(list(query_vector), k=k, score_col=score_col)
