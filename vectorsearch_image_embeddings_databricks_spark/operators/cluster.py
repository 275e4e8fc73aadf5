"""Embedding-space clustering for corpus curation.

Topic clustering is a first-class training-data-pipeline operation:
cluster the corpus in embedding space, then sample per cluster (coverage
balancing), prune degenerate clusters (boilerplate/spam concentrates),
or route clusters to different mixture weights. The reference's service
exposes no clustering; this module re-expresses spherical k-means (the
variant matching the engine's cosine metric, §1.4 unit-vector
invariants) Spark-first:

- **Assignment is one codegen'd expression** — ``array_max`` over
  ``struct(cos(v, c_j), -j)`` per row (deterministic smallest-id
  tie-break), built from centroid literals. No join, no shuffle, no
  Python boundary: a map-only stage whatever the corpus size.
- **Centroid recomputation is the posexplode/decimal-mean shape** of
  ``registry.embedding_centroids``: shuffle volume is |k|·dim rows per
  partition (map-side partial aggregation), independent of corpus size.
- **Driver state is k×dim floats** per iteration — the quantizer, never
  the data. Same contract as ``index.ann.IVFIndex``'s trained
  quantizer, whose sampled KMeans this complements with an exact
  full-corpus Lloyd pass.

At 100 TB each Lloyd iteration is therefore one map-only scan + one
k·dim-sized aggregate; iterations is the only multiplier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.vector import cosine_similarity


def _lit_vec(vec) -> F.Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def assign_to_centroids(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[tuple[int, list[float]]],
) -> DataFrame:
    """Attach ``cluster_id`` (argmax cosine, ties to the smallest
    centroid id) and ``cos_micro`` (floor(cos·1e6) — exact integer
    canonical form) to every row. Pure expression over centroid
    literals: map-only, whole-stage-codegen'd, zero shuffle."""
    if not centroids:
        raise ValueError("centroids must be non-empty")
    scored = [
        F.struct(
            cosine_similarity(vec_col, _lit_vec(vec)).alias("s"),
            F.lit(-int(cid)).alias("nc"),
        )
        for cid, vec in centroids
    ]
    return (
        df.withColumn("__best", F.array_max(F.array(*scored)))
        .withColumn("cluster_id", (-F.col("__best.nc")).cast("long"))
        .withColumn(
            "cos_micro",
            F.floor(F.col("__best.s") * F.lit(1e6)).cast("long"),
        )
        .drop("__best")
    )


def cluster_profile(assigned: DataFrame, id_col: str) -> DataFrame:
    """Per-cluster exact-integer stats of an assignment: size, summed
    similarity micro-units (add-order-free), id range. One partial-agg
    groupBy producing |k| rows — the only shuffle in a refine step."""
    return assigned.groupBy("cluster_id").agg(
        F.count("*").alias("n_vecs"),
        F.sum("cos_micro").alias("sum_cos_micro"),
        F.min(id_col).alias("min_member"),
        F.max(id_col).alias("max_member"),
    )


def seed_centroids(
    df: DataFrame, id_col: str, vec_col: str, k: int
) -> list[tuple[int, list[float]]]:
    """Deterministic seeds: the ``k`` smallest-id rows' vectors. A
    bounded driver probe (k rows through TakeOrderedAndProject), not a
    corpus collect."""
    rows = (
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .orderBy("id")
        .limit(k)
        .collect()
    )
    return [(int(r["id"]), list(r["v"])) for r in rows]


def lloyd_iterate(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iterations: int = 3,
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """Full-corpus spherical k-means: ``iterations`` Lloyd steps from
    deterministic smallest-id seeds. Returns (assigned df, centroids).

    Per step: map-only assignment (expression over centroid literals) →
    per-(cluster, dim) decimal mean via posexplode (exact,
    add-order-independent, |k|·dim shuffle rows) → k×dim floats to the
    driver → next step's literals. L2-normalizing the mean yields the
    spherical update (the mean direction maximizes summed cosine)."""
    centroids = seed_centroids(df, id_col, vec_col, k)
    assigned = assign_to_centroids(df, id_col, vec_col, centroids)
    for _ in range(iterations):
        means = (
            assigned.select(
                "cluster_id",
                F.posexplode(
                    F.col(vec_col).cast("array<double>")
                ).alias("pos", "e"),
            )
            .groupBy("cluster_id", "pos")
            .agg(
                (
                    F.sum(F.col("e").cast("decimal(28,12)")).cast("double")
                    / F.count("*")
                ).alias("m")
            )
            .groupBy("cluster_id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "m"))
                ).alias("pm")
            )
            .select(
                "cluster_id",
                F.transform("pm", lambda s: s["m"]).alias("mean_vec"),
            )
            .collect()
        )
        import math

        updated = {}
        for r in means:
            v = list(r["mean_vec"])
            n = math.sqrt(sum(x * x for x in v))
            updated[int(r["cluster_id"])] = [x / n for x in v] if n else v
        # a cluster that received no members this step produces no mean
        # row; carry its previous centroid forward so k never shrinks
        # and every seeded cluster id stays addressable (standard empty-
        # cluster handling — the alternative, dropping it, silently
        # changes k mid-run)
        centroids = [
            (cid, updated.get(cid, prev)) for cid, prev in centroids
        ]
        assigned = assign_to_centroids(df, id_col, vec_col, centroids)
    return assigned, centroids


def balanced_sample_summary(
    assigned: DataFrame, id_col: str, cap: int
) -> DataFrame:
    """Cluster-balanced downsample audit: within each cluster keep the
    ``cap`` rows whose md5(id) hex digest sorts first (the repo's
    auditable deterministic sampler — membership is a pure function of
    the key, stable across engines/partitionings), and report per
    cluster (n_total, n_kept, kept_id_sum).

    This is the curation move clustering exists for: an over-crowded
    topic cluster (boilerplate, spam) is capped while rare clusters
    survive intact — coverage balancing. The rank window is PARTITIONED
    by cluster (no global sort); everything else is one partial-agg
    groupBy to |k| rows."""
    from pyspark.sql import Window

    w = Window.partitionBy("cluster_id").orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    ranked = assigned.withColumn("__rn", F.row_number().over(w))
    return ranked.groupBy("cluster_id").agg(
        F.count("*").alias("n_total"),
        F.sum(F.when(F.col("__rn") <= cap, 1).otherwise(0))
        .cast("long")
        .alias("n_kept"),
        F.sum(
            F.when(F.col("__rn") <= cap, F.col(id_col)).otherwise(0)
        )
        .cast("long")
        .alias("kept_id_sum"),
    )
