"""operators.cluster: spherical k-means assignment + Lloyd iteration."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from vectorsearch_image_embeddings_databricks_spark.operators import cluster

from .conftest import SF_SMALL


def _emb(spark):
    return spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")


def test_assignment_is_map_only_no_shuffle_no_join(spark):
    """Assignment must be a pure projection: no Exchange, no join of any
    kind — the property that makes a Lloyd step one scan at 100 TB."""
    emb = _emb(spark)
    seeds = cluster.seed_centroids(emb, "vec_id", "embedding", 4)
    assigned = cluster.assign_to_centroids(emb, "vec_id", "embedding", seeds)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assigned.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_assignment_semantics_and_tiebreak(spark):
    """Each seed row must be assigned to its own cluster (cos=1 with
    itself); an exact duplicate of seed 0 must tie-break to the
    smallest centroid id."""
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [1.0, 0.0]),   # duplicate of seed 0 -> cos 1.0 with it
        (3, [0.9, 0.1]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    seeds = cluster.seed_centroids(df, "vec_id", "embedding", 2)
    got = {
        r["vec_id"]: (r["cluster_id"], r["cos_micro"])
        for r in cluster.assign_to_centroids(
            df, "vec_id", "embedding", seeds
        ).collect()
    }
    assert got[0] == (0, 1_000_000)
    assert got[1] == (1, 1_000_000)
    assert got[2] == (0, 1_000_000)   # tie between none: cos(seed0)=1
    assert got[3][0] == 0             # closer to seed 0

    with pytest.raises(ValueError):
        cluster.assign_to_centroids(df, "vec_id", "embedding", [])


def test_lloyd_iterations_monotone_and_deterministic(spark):
    """Summed cosine to the assigned centroid (the spherical k-means
    objective) must not decrease across Lloyd steps, and the whole run
    must be bit-deterministic (seeded by smallest ids, exact decimal
    means)."""
    emb = _emb(spark).limit(200)

    def objective(assigned):
        return assigned.agg(F.sum("cos_micro")).collect()[0][0]

    seeds = cluster.seed_centroids(emb, "vec_id", "embedding", 4)
    obj0 = objective(
        cluster.assign_to_centroids(emb, "vec_id", "embedding", seeds)
    )
    prev = obj0
    for iters in (1, 2):
        assigned, cents = cluster.lloyd_iterate(
            emb, "vec_id", "embedding", k=4, iterations=iters
        )
        cur = objective(assigned)
        # tolerance: the final floor(1e6) quantization of the objective
        assert cur >= prev - 4, f"objective fell at iter {iters}"
        prev = cur
    assert cur >= obj0
    # determinism: same call twice -> identical centroids
    _, cents2 = cluster.lloyd_iterate(
        emb, "vec_id", "embedding", k=4, iterations=2
    )
    assert cents == cents2
    # centroids are unit vectors (spherical update)
    for _, v in cents:
        assert abs(sum(x * x for x in v) - 1.0) < 1e-9


def test_balanced_sample_caps_clusters_deterministically(spark):
    """Every cluster keeps at most cap rows; clusters at/below cap are
    untouched; two runs agree (md5 membership is partitioning-free)."""
    emb = _emb(spark)
    seeds = cluster.seed_centroids(emb, "vec_id", "embedding", 4)
    assigned = cluster.assign_to_centroids(emb, "vec_id", "embedding", seeds)
    s1 = {
        r["cluster_id"]: (r["n_total"], r["n_kept"], r["kept_id_sum"])
        for r in cluster.balanced_sample_summary(
            assigned, "vec_id", 50
        ).collect()
    }
    for cid, (tot, kept, _) in s1.items():
        assert kept == min(tot, 50)
    s2 = {
        r["cluster_id"]: (r["n_total"], r["n_kept"], r["kept_id_sum"])
        for r in cluster.balanced_sample_summary(
            assigned.repartition(7), "vec_id", 50
        ).collect()
    }
    assert s1 == s2


def test_lloyd_empty_cluster_carries_centroid_forward(spark):
    """A cluster emptied mid-run must keep its previous centroid (k may
    not silently shrink): two identical-direction seeds tie every
    member to the smaller cluster id, leaving the other empty."""
    from vectorsearch_image_embeddings_databricks_spark.operators.cluster import lloyd_iterate

    rows = [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0])] + [
        (i, [1.0, 0.0]) for i in range(3, 10)
    ] + [(i, [0.0, 1.0]) for i in range(10, 15)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    assigned, cents = lloyd_iterate(
        df, "vec_id", "embedding", k=3, iterations=2
    )
    assert [cid for cid, _ in cents] == [0, 1, 2]
    # cluster 1 (duplicate seed of 0) got no members; its carried
    # centroid is the original seed direction
    assert cents[1][1] == [1.0, 0.0]
    got = {r["cluster_id"] for r in assigned.collect()}
    assert got == {0, 2}
