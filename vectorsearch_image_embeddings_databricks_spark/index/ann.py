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

- **IVFIndex** — inverted-file index: sample-trained spherical-KMeans
  coarse quantizer (driver numpy, codegen'd corpus assignment);
  corpus stored partitioned by centroid id; a query probes the
  ``nprobe`` nearest centroids, turning top-k into a partition-pruned
  exact search over ~nprobe/k of the data.

Exact search (vector_index.VectorIndex) is the recall oracle for all
three (BASELINE.md: ANN recall@5 ≥ 0.9).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np

from pyspark.sql import DataFrame, SparkSession, Window
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
        seed: int = 42,
    ) -> None:
        from pyspark.ml.feature import BucketedRandomProjectionLSH
        from pyspark.ml.functions import array_to_vector

        self.key = key
        self.vector_col = vector_col
        self.df = df.withColumn("__vec", array_to_vector(F.col(vector_col)))
        # seed MUST be explicit: pyspark's HasSeed default is
        # hash(class name) — Python string hashing is salted PER
        # INTERPRETER, so the "default" hyperplanes differ from process
        # to process and every downstream answer silently changes
        # across runs (observed as 1-in-3 hash flips of a boundary
        # neighbor before this pin).
        self.model = BucketedRandomProjectionLSH(
            inputCol="__vec",
            outputCol="__hashes",
            bucketLength=bucket_length,
            numHashTables=num_hash_tables,
            seed=seed,
        ).fit(self.df)
        # hashed corpus cached: at scale this is the materialized index
        self.hashed = self.model.transform(self.df).cache()

    def search(
        self,
        query_vector: Sequence[float],
        k: int = 5,
        score_col: str = "score",
        via: str = "buckets",
    ) -> DataFrame:
        """ANN top-k. Returns (key, score) with cosine-equivalent score
        (2 − d²)/2 for unit vectors, ranked desc.

        ``via='buckets'`` (default): candidates are corpus rows sharing
        ≥1 hash bucket with the query, exact-distance top-k with
        (dist, key) tie-breaks. DETERMINISTIC — the candidate set is a
        pure function of the seeded hash model, so repeated runs and
        repartitioned inputs return the identical answer (the property
        the hash-verified registry rows rely on). Sparse-collision
        queries are k-filled by the deterministic adjacent-bucket
        widening ladder (see ``search_batch``), so the result has ``k``
        rows whenever the corpus does — the reference's always-k
        ``similarity_search`` contract (NMR:388) without giving up
        hash-verifiability. NOTE the ladder is EAGER: each widening
        rung ``localCheckpoint(eager=True)``s (multi-action consumers
        must not re-run the scan-and-rank per action), so merely
        BUILDING the returned plan executes the fallback scans for any
        under-k queries — callers composing plans they may never
        collect pay that cost at call time, not action time.

        ``via='mllib'``: MLlib's own ``approxNearestNeighbors``
        multi-probe — it widens candidates to NEARBY buckets via a
        hash-distance threshold chosen by ``approxQuantile``, whose
        result depends on row/partition order: the answer can differ
        RUN TO RUN (observed ~1-in-3 flips of a boundary neighbor on
        the fixture). Kept for recall comparison, not for verified
        paths."""
        from pyspark.ml.linalg import Vectors

        if via == "mllib":
            q = Vectors.dense([float(x) for x in query_vector])
            res = self.model.approxNearestNeighbors(
                self.hashed, q, k, distCol="__dist"
            )
            score = (F.lit(2.0) - F.col("__dist") * F.col("__dist")) / F.lit(2.0)
            return res.select(self.key, score.alias(score_col)).orderBy(
                F.desc(score_col), F.asc(self.key)
            )
        if via != "buckets":
            raise ValueError(f"unknown via {via!r}")
        # one-row delegation to search_batch: a single copy of the
        # candidate-generation and (dist, key) tie-break logic keeps
        # the two paths incapable of desynchronizing
        spark = self.df.sparkSession
        qdf = spark.createDataFrame(
            [(0, [float(x) for x in query_vector])],
            "__qid long, __qvec array<double>",
        )
        return (
            self.search_batch(
                qdf,
                query_key="__qid",
                query_vector_col="__qvec",
                k=k,
                score_col=score_col,
            )
            .select(self.key, score_col)
            .orderBy(F.desc(score_col), F.asc(self.key))
        )

    #: Widening-ladder cap: short queries probe bucket ± δ for δ up to
    #: this radius (doubling rungs), then fall back to exact scan. With
    #: the committed bucket_length values a radius-64 interval spans
    #: dozens of standard deviations of projected mass — a query still
    #: short there is adversarially far from the whole corpus, and the
    #: exact fallback (bounded by |short queries| · |corpus| candidate
    #: ids) is the honest answer.
    _WIDEN_MAX_RADIUS = 64

    def _kfill(
        self,
        ranked: DataFrame,
        rank,
        qv: DataFrame,
        q_keys: DataFrame,
        c_keys: DataFrame,
        corpus_v: DataFrame,
        k: int,
    ) -> DataFrame:
        """Deterministic k-fill (see ``search_batch``): queries whose
        RANKED result holds < k rows re-probe adjacent buckets at
        doubling radius (each rung's ±radius key set is a superset of
        the base probe, so the rung's re-rank REPLACES the short
        query's rows), with an exact-scan terminal rung. The common
        full-recall case costs one checkpoint of the ≤ k·|queries|-row
        result plus one tiny count — the candidate set is never
        re-materialized."""
        ranked = ranked.localCheckpoint(eager=True)

        def short_qids(r: DataFrame) -> list:
            counts = (
                qv.select("__qid")
                .join(
                    r.groupBy("__qid").agg(F.count("*").alias("__n")),
                    "__qid",
                    "left",
                )
                .filter(F.coalesce(F.col("__n"), F.lit(0)) < k)
            )
            return [x["__qid"] for x in counts.select("__qid").collect()]

        shorts = short_qids(ranked)
        if not shorts:
            return ranked
        radius = 1
        while shorts and radius <= self._WIDEN_MAX_RADIUS:
            wq = q_keys.filter(F.col("__qid").isin(shorts)).select(
                "__qid",
                "__table",
                F.explode(
                    F.sequence(
                        F.col("__bucket") - radius,
                        F.col("__bucket") + radius,
                    )
                ).alias("__bucket"),
            )
            wcand = (
                wq.join(c_keys, ["__table", "__bucket"])
                .select("__qid", "__cid")
                .distinct()
            )
            ranked = (
                ranked.filter(~F.col("__qid").isin(shorts))
                .unionByName(rank(wcand))
                .localCheckpoint(eager=True)
            )
            shorts = short_qids(ranked)
            radius *= 2
        if shorts:
            fcand = (
                qv.select("__qid")
                .filter(F.col("__qid").isin(shorts))
                .crossJoin(corpus_v.select("__cid"))
            )
            # checkpoint like every other rung: without it a caller
            # running count()+collect() (any multi-action consumer)
            # re-executes the |shorts| x |corpus| scan-and-rank per
            # action
            ranked = (
                ranked.filter(~F.col("__qid").isin(shorts))
                .unionByName(rank(fcand))
                .localCheckpoint(eager=True)
            )
        return ranked

    @staticmethod
    def _bucket_keys(hashed: DataFrame, id_col: str, id_alias: str) -> DataFrame:
        """(id, table, bucket) postings from a transformed frame — the
        slim join-key form of the model's ``__hashes`` column (each
        table's hash is a 1-element vector holding the bucket index)."""
        from pyspark.ml.functions import vector_to_array

        return hashed.select(
            F.col(id_col).alias(id_alias),
            F.posexplode("__hashes").alias("__table", "__h"),
        ).select(
            id_alias,
            "__table",
            F.element_at(vector_to_array("__h"), 1).cast("long").alias("__bucket"),
        )

    def search_batch(
        self,
        queries: DataFrame,
        query_key: str = "query_id",
        query_vector_col: str = "query_vec",
        k: int = 5,
        score_col: str = "score",
        widen: bool = True,
    ) -> DataFrame:
        """Deterministic batched ANN top-k: ONE bucket equi-join of the
        hashed corpus against the whole query table, exact-distance
        re-rank per query. Returns ``(query_key, key, score)``.

        The candidate join carries BARE IDS on 16-byte (table, bucket)
        keys — the round-4 sf1 lesson: candidate volume is the
        expensive part of an LSH join, and MLlib's
        ``approxSimilarityJoin`` drags both full rows (vectors + all
        hash vectors) through every candidate (measured: JVM OOM at 16
        queries × 20k corpus under a small heap, where this form runs
        in seconds). Survivor pairs are deduped FIRST, then fetch their
        two vectors back by id for the exact L2 re-rank (the same
        sequential-fold ``l2_dist`` the oracles replay).

        ``widen=True`` (default): the deterministic k-fill ladder. A
        sparse-collision query can share no bucket with ``k`` corpus
        rows; since BRP buckets are ORDERED intervals (bucket index =
        ``floor(h/bucketLength)``), the nearest rows outside a query's
        buckets live in ADJACENT buckets — so short queries (and only
        short queries) re-probe ``bucket ± δ`` for a doubling radius
        (1, 2, 4, …, ``_WIDEN_MAX_RADIUS``), and any query still short
        after the ladder falls back to exact scan. The ladder is a pure
        function of the seeded hash model and the candidate COUNTS, so
        results stay deterministic and hash-verifiable while the
        always-k contract of the reference's ``similarity_search``
        (NMR:388) now holds whenever the corpus has ≥ k rows.
        Full-recall configurations never enter the ladder — the check
        ranks FIRST and inspects the ≤ k·|queries|-row result (one
        checkpoint of that tiny table + one count), so the candidate
        set is never re-materialized and committed hash rows are
        unchanged. The per-rung coordination is driver-side but
        bounded by |queries| ids — at 100 TB the widened re-probe
        touches only the short queries' key postings, never the
        corpus. ``widen=False`` keeps the bare bucket join (the
        pre-round-6 behavior, possibly < k rows)."""
        from ..functions.vector import l2_dist

        qv = queries.select(
            F.col(query_key).alias("__qid"),
            F.transform(query_vector_col, lambda x: x.cast("double")).alias(
                "__qv"
            ),
        )
        from pyspark.ml.functions import array_to_vector

        q_hashed = self.model.transform(
            qv.select("__qid", array_to_vector("__qv").alias("__vec"))
        )
        q_keys = self._bucket_keys(q_hashed, "__qid", "__qid")
        c_keys = self._bucket_keys(self.hashed, self.key, "__cid")
        cand = (
            q_keys.join(c_keys, ["__table", "__bucket"])
            .select("__qid", "__cid")
            .distinct()
        )
        corpus_v = self.df.select(
            F.col(self.key).alias("__cid"),
            F.transform(self.vector_col, lambda x: x.cast("double")).alias(
                "__cv"
            ),
        )
        from pyspark.sql import Window

        w = Window.partitionBy("__qid").orderBy(
            F.asc("__dist"), F.asc("__cid")
        )

        def rank(c: DataFrame) -> DataFrame:
            return (
                c.join(qv, "__qid")
                .join(corpus_v, "__cid")
                .select(
                    "__qid", "__cid", l2_dist("__qv", "__cv").alias("__dist")
                )
                .withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") <= k)
                .select("__qid", "__cid", "__dist")
            )

        ranked = rank(cand)
        if widen:
            ranked = self._kfill(
                ranked, rank, qv, q_keys, c_keys, corpus_v, k
            )
        score = (F.lit(2.0) - F.col("__dist") * F.col("__dist")) / F.lit(2.0)
        return ranked.select(
            F.col("__qid").alias(query_key),
            F.col("__cid").alias(self.key),
            score.alias(score_col),
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

    Sizing: the self-join candidate cost is Σ|bucket|² per band, and a
    band has only 2^band_bits buckets — FIXED banding therefore goes
    quadratic in the corpus (the round-4 sf1 smoke measured the pinned
    16/4 configuration at ~190x the 10x-smaller corpus's time). When
    ``num_bits``/``band_bits`` are left None they are derived from the
    corpus count:

    - ``band_bits = clamp(ceil(log2(n / 64)), 4, 20)`` — a ~64-row
      target bucket keeps Σ|bucket|² per band ≈ 64·n (linear);
    - ``bands = band_bits`` (so ``num_bits = band_bits²``) — longer
      band keys lower per-band collision odds, so the band COUNT must
      grow with them to hold recall: at cos 0.95 the per-bit sign-
      agreement probability is ~0.90, giving ≥1-band collision
      probability ≳ 0.98 across the ladder (e.g. 5 bands x 5 bits at
      2k rows, 9 x 9 at 20k). Total candidate cost ≈ log(n)·64·n.

    Auto-sizing targets duplicate-grade pairs (cos ≳ 0.9). LOW
    thresholds need either explicit wide-recall banding or the
    kNN-join / IVF cell-join machinery — sign-LSH recall at cos 0.4 is
    poor at any scalable banding (p_bit ≈ 0.63). The registry row
    (cosine_lsh_near_dup) commits the AUTO path at a dup-grade
    threshold: because band_bits is a deterministic function of
    count(*), its DuckDB oracle re-derives the banding the same way —
    explicit params remain available for fixed-fixture replay.
    """

    def __init__(
        self,
        df: DataFrame,
        key: str = "vec_id",
        vector_col: str = "embedding",
        dim: int | None = None,
        num_bits: int | None = None,
        band_bits: int | None = None,
        seed: int = 42,
        n_rows: int | None = None,
    ) -> None:
        self.key = key
        self.vector_col = vector_col
        self.__banded = None
        if band_bits is None:
            if num_bits is not None:
                band_bits = 4  # legacy shape: 4-bit bands of num_bits
            else:
                import math

                # n_rows: a caller that already counted df (e.g. for a
                # guard) passes it to skip a duplicate count action —
                # the auto-sizing FORMULA is unchanged (r10, guide §1;
                # passing a wrong count is the caller's bug)
                n = df.count() if n_rows is None else int(n_rows)
                band_bits = min(20, max(4, math.ceil(math.log2(max(n, 2) / 64))))
        if num_bits is None:
            num_bits = band_bits * band_bits  # bands = band_bits
        self.num_bits = num_bits
        self.band_bits = band_bits
        if dim is None:
            first = df.select(F.size(vector_col).alias("d")).limit(1).collect()
            dim = int(first[0]["d"]) if first else 0
        self.dim = dim
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((num_bits, dim))
        self.signed = df.withColumn("__bands", self._band_keys(vector_col))

    def _band_keys(self, vector_col: str) -> F.Column:
        """array<struct<band,bh>> band keys for ``vector_col`` under THIS
        index's hyperplanes — reused verbatim for the other side of a
        cross-table join so both sides hash into the same buckets.

        Built as ONE ``F.expr`` SQL string (r9, guide §7.3 family): the
        former Column-API construction issued ~num_bits·dim py4j calls
        (one per plane-component literal) per index USE — measured
        6–8 s of pure driver time per run at 36×64. The SQL text parses
        in one py4j round-trip into the same Catalyst tree: the same
        zip_with(transform(cast double))/aggregate sequential fold over
        the same nearest-double literals (``CAST('<repr>' AS DOUBLE)``
        round-trips exactly — the property the DuckDB oracle already
        relies on), so every bit and band key is bitwise-unchanged
        (pytest pins formula equality against the python reference)."""
        def dot_sql(p) -> str:
            lits = ", ".join(f"CAST('{float(x)!r}' AS DOUBLE)" for x in p)
            return (
                f"aggregate(zip_with(transform(`{vector_col}`, "
                "x -> CAST(x AS DOUBLE)), "
                f"array({lits}), (x, y) -> x * y), "
                "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
            )

        bits = [
            f"(CASE WHEN {dot_sql(p)} > 0 THEN 1 ELSE 0 END)"
            for p in self.planes
        ]
        nbands = self.num_bits // self.band_bits
        band_keys = []
        for b in range(nbands):
            acc = "0"
            for bit in bits[b * self.band_bits : (b + 1) * self.band_bits]:
                acc = f"({acc} * 2 + {bit})"
            band_keys.append(f"named_struct('band', {b}, 'bh', {acc})")
        return F.expr("array(" + ", ".join(band_keys) + ")")

    def _candidate_ids(self) -> DataFrame:
        """Deduped ``(id_a, id_b)`` sharing ≥1 band — the bare-id
        candidate join shared by :meth:`candidate_pairs` and
        :meth:`similarity_self_join`.

        The banded postings are MATERIALIZED once (r9): the signature
        expression is an interpreted HOF fold (~30 µs/row/bit — the
        semantic_dedup measurement), and as a lazy self-join input BOTH
        shuffle-map stages would recompute it over the whole corpus —
        the single signature pass halves the dominant candidate-stage
        cost. |rows|·bands tiny posting rows, id + two ints each.
        Memoized on the index (r10, ADVICE r9): ``candidate_pairs`` and
        ``similarity_self_join`` on one index now share one eager
        posting job instead of each triggering its own at
        DataFrame-construction time."""
        banded = self.__banded
        if banded is None:
            banded = (
                self.signed.select(
                    F.col(self.key).alias("id"),
                    F.explode("__bands").alias("bk"),
                )
                .select("id", "bk.band", "bk.bh")
                .localCheckpoint(eager=True)
            )
            self.__banded = banded
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
            )
            .distinct()
        )

    def candidate_pairs(self) -> DataFrame:
        """(id_a, id_b, vec_a, vec_b) sharing ≥1 band — candidates for an
        exact verify. The band self-join carries BARE IDS (plus the band
        key): candidate volume is the expensive part of an LSH join, and
        shuffling two float vectors per candidate multiplies it ~20x
        (measured at the round-4 sf1 smoke); the deduped survivor set
        fetches its vectors back by id instead."""
        ids = self._candidate_ids()
        fa = self.signed.select(
            F.col(self.key).alias("id_a"),
            F.col(self.vector_col).alias("vec_a"),
        )
        fb = self.signed.select(
            F.col(self.key).alias("id_b"),
            F.col(self.vector_col).alias("vec_b"),
        )
        return ids.join(fa, "id_a").join(fb, "id_b")

    def similarity_self_join(self, threshold: float) -> DataFrame:
        """Near-dup pairs with cos ≥ threshold: LSH candidates → exact
        cosine verify. Same output schema as the exact operator.

        r9: each side's L2 norm is computed once per ROW on the
        survivor fetch and the per-pair verify is a single dot fold —
        the inlined ``cosine_similarity`` re-derived both norms per
        PAIR (three array folds instead of one, ~3× the verify stage's
        arithmetic at a few hundred thousand candidates). The norm of
        the same array is the same float wherever it is computed, so
        ``dot/(na·nb)`` is bitwise-identical to the inlined form."""
        from ..functions.vector import dot as vdot, l2_norm

        ids = self._candidate_ids()
        fa = self.signed.select(
            F.col(self.key).alias("id_a"),
            F.col(self.vector_col).alias("vec_a"),
            l2_norm(self.vector_col).alias("__na"),
        )
        fb = self.signed.select(
            F.col(self.key).alias("id_b"),
            F.col(self.vector_col).alias("vec_b"),
            l2_norm(self.vector_col).alias("__nb"),
        )
        return (
            ids.join(fa, "id_a")
            .join(fb, "id_b")
            .withColumn(
                "cos",
                vdot("vec_a", "vec_b") / (F.col("__na") * F.col("__nb")),
            )
            .filter(F.col("cos") >= threshold)
            .select("id_a", "id_b", "cos")
        )

    def similarity_join(
        self,
        other: DataFrame,
        other_key: str,
        other_vec: str,
        threshold: float,
    ) -> DataFrame:
        """Cross-table near pairs ``(id_a from this index's corpus, id_b
        from other, cos ≥ threshold)``: band ``other`` with the SAME
        hyperplanes so both sides hash into the same buckets, equi-join
        on (band, bh), exact-verify candidates. The two-large-sides scale
        path (embedding decontamination against a big eval pool, bitext
        candidate generation): shuffle keyed on 8-byte band hashes, never
        a cross join; each side's bands are |rows|·nbands postings.

        r9: the band join and its dedup carry BARE IDS (the self-join's
        round-4 slimming applied here — vectors multiplied the
        candidate shuffle and the distinct ~20×), and the verify
        computes each side's norm once per ROW on the survivor fetch:
        ``dot/(na·nb)`` is bitwise-identical to the inlined
        ``cosine_similarity`` (same arrays, same folds)."""
        from ..functions.vector import dot as vdot, l2_norm

        left = self.signed.select(
            F.col(self.key).alias("id_a"),
            F.explode("__bands").alias("bk"),
        ).select("id_a", "bk.band", "bk.bh")
        right = (
            other.withColumn("__obands", self._band_keys(other_vec))
            .select(
                F.col(other_key).alias("id_b"),
                F.explode("__obands").alias("bk"),
            )
            .select("id_b", "bk.band", "bk.bh")
        )
        ids = (
            left.join(right, ["band", "bh"])
            .select("id_a", "id_b")
            .distinct()
        )
        fa = self.signed.select(
            F.col(self.key).alias("id_a"),
            F.col(self.vector_col).alias("vec_a"),
            l2_norm(self.vector_col).alias("__na"),
        )
        fb = other.select(
            F.col(other_key).alias("id_b"),
            F.col(other_vec).alias("vec_b"),
            l2_norm(other_vec).alias("__nb"),
        )
        return (
            ids.join(fa, "id_a")
            .join(fb, "id_b")
            .withColumn(
                "cos",
                vdot("vec_a", "vec_b") / (F.col("__na") * F.col("__nb")),
            )
            .filter(F.col("cos") >= threshold)
            .select("id_a", "id_b", "cos")
        )


# --------------------------------------------------------------------- #
# IVF (inverted file) index: KMeans coarse quantizer + partition pruning
# --------------------------------------------------------------------- #

def _normalize_rows(X: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return X / norms


def _spherical_kmeans(
    sample: np.ndarray, k: int, seed: int, max_iter: int, n_init: int = 8
) -> list[np.ndarray]:
    """Seeded spherical k-means (k-means++ init, Lloyd's iterations,
    unit-norm centroids) on the driver-side training sample.

    Spherical because the index's search metric is COSINE: partitioning
    the sphere by direction matches the query geometry, where Euclidean
    centroids would split clusters by magnitude the metric ignores.
    ``n_init`` independent k-means++ restarts keep the best quantizer by
    inertia (mean max-cosine) — single-shot ++ init is noticeably
    recall-unstable at small nlist. Deterministic for fixed
    (sample, k, seed, max_iter, n_init); early-exits on assignment
    convergence."""
    raw = np.asarray(sample, dtype=np.float64)
    if raw.size == 0:
        # checked before _normalize_rows: numpy's axis error on a
        # 0-row array would otherwise mask this diagnosable condition
        raise ValueError("empty training sample for IVF quantizer")
    S = _normalize_rows(raw)
    n = len(S)
    k = min(k, n)

    def one_run(rng: np.random.Generator) -> tuple[float, np.ndarray]:
        # k-means++ seeding under cosine distance (1 - dot, unit vectors)
        centers = [S[rng.integers(n)]]
        d = np.maximum(1.0 - S @ centers[0], 0.0)
        for _ in range(1, k):
            total = d.sum()
            if total <= 0:
                centers.append(S[rng.integers(n)])
                continue
            centers.append(S[rng.choice(n, p=d / total)])
            d = np.minimum(d, np.maximum(1.0 - S @ centers[-1], 0.0))
        C = np.asarray(centers)
        labels = None
        for _ in range(max_iter):
            sims = S @ C.T
            new_labels = sims.argmax(axis=1)
            if labels is not None and np.array_equal(labels, new_labels):
                break
            labels = new_labels
            for j in range(k):
                members = S[labels == j]
                if len(members):
                    C[j] = members.mean(axis=0)
            C = _normalize_rows(C)
        inertia = float((S @ C.T).max(axis=1).mean())
        return inertia, C

    best = None
    for r in range(n_init):
        inertia, C = one_run(np.random.default_rng(seed + r))
        if best is None or inertia > best[0]:
            best = (inertia, C)
    C = best[1]
    return [C[j] for j in range(k)]


class IVFIndex:
    """IVF-flat: coarse-quantize the corpus against KMeans centroids;
    search probes the ``nprobe`` nearest centroids and runs exact top-k
    inside them.

    Scale design (the way IVF is actually built at corpus scale):
    - The quantizer trains on a bounded **sample** collected to the
      driver (``train_sample`` rows, picked deterministically as the
      smallest ``xxhash64(key)`` values — a TakeOrderedAndProject, one
      scan, no full sort, no full-corpus MLlib job). A KMeans over all
      of 100 TB is wasted work; centroid quality saturates at a few
      thousand samples per centroid.
    - Lloyd's iterations run in numpy on that sample (seeded, so the
      quantizer is bitwise-reproducible).
    - Corpus assignment is ONE codegen'd expression: argmin over the
      nlist squared distances, each ``‖c‖² − 2·v·c`` with the centroid
      embedded as a literal array (the ``v·v`` term is constant across
      centroids and dropped). No Python boundary, no MLlib transform —
      the assignment stays inside whole-stage codegen.

    At 100 TB the assigned corpus is written partitioned by
    ``centroid_id`` (see ``save``) so a probe is a partition-pruned scan
    reading ~nprobe/nlist of the data; here the filter plays that role.
    """

    #: assign_via='auto' switches from the literal-codegen expression to
    #: the Arrow/numpy path above this centroid count. The 200k frontier
    #: run measured the expression ceiling: ~30 s of codegen per fresh
    #: plan at nlist=390x64 dims (ANN_FRONTIER.md) — fine for the
    #: fixture-scale quantizers the hash rows pin (<= 64 cells), a
    #: per-plan tax at production nlist.
    ASSIGN_EXPR_MAX_NLIST = 128

    def __init__(
        self,
        df: DataFrame,
        key: str = "vec_id",
        vector_col: str = "embedding",
        nlist: int = 16,
        seed: int = 42,
        max_iter: int = 20,
        train_sample: int = 4096,
        replication: int = 2,
        centroids: list | None = None,
        assign_via: str = "auto",
    ) -> None:
        self.key = key
        self.vector_col = vector_col
        self.replication = max(1, int(replication))
        if assign_via not in ("auto", "expr", "pandas"):
            raise ValueError(f"unknown assign_via {assign_via!r}")
        self.assign_via = assign_via
        if centroids is not None:
            # explicit-quantizer tier: caller-supplied cell centers skip
            # KMeans entirely. With centroids drawn from the data itself
            # (e.g. the nlist smallest-key rows — the seed_codebooks
            # convention), every stage of an IVF search is replayable in
            # plain SQL, which is what makes the registry's IVF row
            # hash-verifiable instead of rows-only.
            self.centroids = [
                np.asarray([float(x) for x in c], dtype=np.float64)
                for c in centroids
            ]
        else:
            sample = np.asarray(
                [
                    r[0]
                    for r in df.select(vector_col)
                    .orderBy(F.xxhash64(F.col(key), F.lit(seed)))
                    .limit(train_sample)
                    .collect()
                ],
                dtype=np.float64,
            )
            self.centroids = _spherical_kmeans(sample, nlist, seed, max_iter)
        self.assigned = self._assign_topn(
            df, self.vector_col, self.replication
        ).cache()

    # ------------------------------------------------------------------ #
    # assignment dispatch: codegen expression vs Arrow/numpy matmul
    # ------------------------------------------------------------------ #

    def _use_pandas_assign(self) -> bool:
        if self.assign_via == "pandas":
            return True
        if self.assign_via == "expr":
            return False
        return len(self.centroids) > self.ASSIGN_EXPR_MAX_NLIST

    def _assign_topn(
        self, df: DataFrame, vector_col: str, n: int
    ) -> DataFrame:
        """``df`` with an exploded ``centroid_id`` column holding each
        row's top-``n`` cells — through the codegen expression (small
        nlist: stays inside whole-stage codegen, zero Python) or the
        Arrow/numpy matmul (large nlist: the centroid matrix rides the
        closure once per executor and each Arrow batch is ONE
        ``X @ C.T`` — the FAISS coarse-assignment shape — instead of a
         10⁴-literal expression Catalyst spends ~seconds compiling).
        Both paths rank by (dot desc, j asc); the numpy path's stable
        argsort reproduces the struct-sort tie-break exactly. The two
        are identical up to float summation order: the matmul's
        pairwise/SIMD accumulation can differ from the expression
        tier's sequential Catalyst fold by an ULP, which near an exact
        dot-product tie could flip an assignment across the 'auto'
        dispatch boundary — the committed hash rows therefore pin
        quantizers ≤ {ASSIGN_EXPR_MAX_NLIST} cells (always the
        expression path); use an explicit ``assign_via`` when bitwise
        parity across tiers matters. Map-only either way: no shuffle,
        partitioning-invariant."""
        if not self._use_pandas_assign():
            return df.withColumn(
                "centroid_id",
                F.explode(self._assign_expr(n, vector_col)),
            )
        from pyspark.sql.types import IntegerType, StructField, StructType

        C = np.stack(self.centroids)  # (k, d)
        k = min(n, len(self.centroids))
        # fresh StructType: StructType.add MUTATES the DataFrame's
        # cached schema object, desynchronizing df.columns from the plan
        schema = StructType(
            list(df.schema.fields)
            + [StructField("centroid_id", IntegerType(), False)]
        )

        def assign(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.asarray(
                    [np.asarray(v, dtype=np.float64) for v in pdf[vector_col]]
                )
                S = X @ C.T
                # stable argsort on -dot keeps ascending j among ties —
                # identical to the expression path's (d, j) struct sort
                top = np.argsort(-S, axis=1, kind="stable")[:, :k]
                rep = pdf.loc[pdf.index.repeat(k)].reset_index(drop=True)
                rep["centroid_id"] = top.reshape(-1).astype("int32")
                yield rep

        return df.mapInPandas(assign, schema)

    def _assign_expr(self, n: int | None = None, vector_col: str | None = None) -> F.Column:
        """Top-``n`` centroids by v·ĉ_j (cosine assignment — ‖v‖ is
        constant across j) as a pure expression: array_sort over
        (−dot, j) structs (deterministic smallest-j tie-break), sliced.
        ``n`` defaults to ``replication`` (index-side storage assignment).

        replication > 1 is SPANN-style boundary replication: a vector
        near a cell boundary is stored in its runner-up cell(s) too, so
        a query probing the *wrong* side of the boundary still finds it.
        Costs ``replication×`` index storage for a large recall gain at
        fixed nprobe — the knob that makes IVF recall robust without
        probing more of the corpus."""
        vcol = vector_col or self.vector_col
        scored = [
            F.struct(
                (-dot(vcol, _query_literal(c))).alias("d"),
                F.lit(j).alias("j"),
            )
            for j, c in enumerate(self.centroids)
        ]
        ranked = F.slice(
            F.array_sort(F.array(*scored)),
            1,
            min(n or self.replication, len(self.centroids)),
        )
        return F.transform(ranked, lambda s: s["j"])

    def assign_cells(
        self, df: DataFrame, vector_col: str, nprobe: int
    ) -> DataFrame:
        """Attach exploded ``centroid_id`` for the top-``nprobe`` cells of
        each row of an ARBITRARY DataFrame under THIS index's quantizer —
        the distributed-query-side counterpart of ``search``'s
        driver-side probe selection. This is what makes two-large-sides
        kNN (bitext mining) survive scale: both sides shuffle on the
        shared cell key instead of one side being broadcast."""
        return self._assign_topn(df, vector_col, nprobe)

    def assign_cells_small(
        self, df: DataFrame, vector_col: str, nprobe: int, key: str
    ) -> DataFrame:
        """``(key, centroid_id)`` top-``nprobe`` cell assignment for a
        SMALL keyed batch (a query panel) via a broadcast centroid
        TABLE cross-join + per-key window (r9, guide §7.3): the
        expression path embeds nlist·dim literals and Catalyst spends
        seconds PER RUN analyzing the tree (measured 4.4 s of a 4.9 s
        serve at nlist=64) — a 64-row broadcast table plans in
        milliseconds. Ranking is bitwise-identical to
        :meth:`_assign_expr`: the same sequential-fold ``dot`` over
        identical double values (literal vs. table cell), the same
        (dot desc, id asc) tie-break — and it is exactly the
        ``q CROSS JOIN cents`` + row_number shape the adaptive-beam
        SQL oracle replays. Not for the corpus side: the cross-join
        shuffles |df|·nlist rows where the expression path is map-only.

        ``key`` must be UNIQUE per row (ADVICE r9): the ranking window
        partitions by it, so two rows sharing a key value would merge
        their centroid rankings into one top-``nprobe`` list. Query
        panels are keyed batches by construction; use
        :meth:`assign_cells` (per-row, key-agnostic) for anything else.
        """
        spark = df.sparkSession
        cents = spark.createDataFrame(
            [(j, [float(x) for x in c]) for j, c in enumerate(self.centroids)],
            "centroid_id int, __cv array<double>",
        )
        w = Window.partitionBy(key).orderBy(
            F.desc("__cd"), F.asc("centroid_id")
        )
        return (
            df.select(key, vector_col)
            .crossJoin(F.broadcast(cents))
            .withColumn("__cd", dot(vector_col, "__cv"))
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= min(nprobe, len(self.centroids)))
            .select(key, "centroid_id")
        )

    def append(self, new_df: DataFrame) -> "IVFIndex":
        """Grow the index with a new vector batch using the EXISTING
        quantizer — no retrain, no re-assignment of stored vectors. This
        is the incremental contract that makes IVF maintainable at
        corpus scale: assignment is one codegen'd expression over only
        the new rows (at 100 TB: an appended partition per touched
        centroid), where retraining would re-shuffle the whole stored
        corpus. Centroid quality degrades only as the data distribution
        drifts — the operational signal to rebuild is recall monitoring,
        not every ingest. Same-schema requirement is the caller's (the
        union is by name)."""
        assigned = self._assign_topn(
            new_df, self.vector_col, self.replication
        )
        # localCheckpoint per append, not cache(): a cached union chain
        # is lineage-deep — after eviction, N appends re-execute an
        # N-deep Union+assignment plan (the same defect KNNGraphIndex.
        # append fixed in r6). Checkpointing truncates lineage so the
        # plan stays constant-depth regardless of append count. Blocks
        # are executor-local (lost on executor decommission); durable
        # persistence is save()'s job.
        self.assigned = self.assigned.unionByName(assigned).localCheckpoint(
            eager=True
        )
        return self

    def save(self, path: str) -> None:
        """Persist quantizer + centroid-assigned corpus, written
        *partitioned by centroid_id* so a loaded index probes via
        partition pruning (the on-disk layout the class docstring
        promises for scale)."""
        import json
        import os

        self.assigned.write.mode("overwrite").partitionBy(
            "centroid_id"
        ).parquet(os.path.join(path, "data"))
        with open(os.path.join(path, "_ivf_meta.json"), "w") as f:
            json.dump(
                {
                    "key": self.key,
                    "vector_col": self.vector_col,
                    "replication": self.replication,
                    "assign_via": self.assign_via,
                    "centroids": [list(map(float, c)) for c in self.centroids],
                },
                f,
            )

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "IVFIndex":
        import json
        import os

        with open(os.path.join(path, "_ivf_meta.json")) as f:
            meta = json.load(f)
        if "centroids" not in meta:
            raise ValueError(
                f"IVF index at {path!r} uses the legacy save format "
                "(no 'centroids' in _ivf_meta.json; quantizer lived in a "
                "separate KMeans model dir). No migration path — rebuild "
                "the index with IVFIndex(...).save(path)."
            )
        obj = cls.__new__(cls)
        obj.key = meta["key"]
        obj.vector_col = meta["vector_col"]
        obj.replication = meta.get("replication", 1)
        obj.assign_via = meta.get("assign_via", "auto")
        obj.centroids = [np.asarray(c, dtype=np.float64) for c in meta["centroids"]]
        obj.assigned = spark.read.parquet(os.path.join(path, "data"))
        return obj

    def search(
        self,
        query_vector: Sequence[float],
        k: int = 5,
        nprobe: int = 4,
        score_col: str = "score",
    ) -> DataFrame:
        """Probe the nprobe most-aligned centroids (driver-side —
        centroids are tiny), then exact cosine top-k within them. Probe
        order uses the same cosine geometry as assignment: q·ĉ_j with a
        deterministic index tie-break."""
        q = np.asarray(list(query_vector), dtype=float)
        dots = np.array([float(np.dot(c, q)) for c in self.centroids])
        probes = list(np.argsort(-dots, kind="stable")[:nprobe])
        shard = self.assigned.filter(
            F.col("centroid_id").isin([int(p) for p in probes])
        )
        if self.replication > 1:
            # boundary-replicated rows can appear in two probed cells;
            # dedup by key (bounded to the probed nprobe/nlist slice)
            shard = shard.dropDuplicates([self.key])
        idx = VectorIndex(
            shard, key=self.key, vector_col=self.vector_col, dim=len(q)
        )
        return idx.search(list(query_vector), k=k, score_col=score_col)
