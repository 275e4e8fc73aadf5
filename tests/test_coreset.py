"""E93-E95 coreset/selection operators: planted-geometry FPS order,
partitioning invariance, prototype-relevance ranking, and the
leakage-safe split's structural invariants."""

import pytest
from pyspark.sql import functions as F

from vectorsearch_image_embeddings_databricks_spark.operators import coreset

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def axes(spark):
    # unit axes + a near-copy of e1: FPS from id 0 must walk
    # 0 -> 2 (first orthogonal by id) -> 3 -> 1 (the near-dup last)
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.04468, 0.0, 0.0]),  # ~unit, cos ~0.999 to id 0
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_kcenter_planted_geometry(axes):
    sel = coreset.greedy_kcenter(axes, "vec_id", "embedding", k=4)
    assert [s["id"] for s in sel] == [0, 2, 3, 1]
    assert sel[0]["dist_micro"] == 0
    # orthogonal picks are at distance 1 (cos 0): micro = 1_000_000
    assert sel[1]["dist_micro"] == 1_000_000
    assert sel[2]["dist_micro"] == 1_000_000
    # the near-dup joins last with a tiny distance
    assert 0 < sel[3]["dist_micro"] < 5_000


def test_kcenter_partitioning_invariant(axes, spark):
    a = coreset.greedy_kcenter(axes, "vec_id", "embedding", k=3)
    b = coreset.greedy_kcenter(
        axes.repartition(7), "vec_id", "embedding", k=3
    )
    assert a == b
    with pytest.raises(ValueError):
        coreset.greedy_kcenter(axes, "vec_id", "embedding", k=0)


def test_kcenter_explicit_seed(axes):
    sel = coreset.greedy_kcenter(
        axes, "vec_id", "embedding", k=2, first_id=2
    )
    assert sel[0]["id"] == 2
    # farthest from e2: ids 0, 1, 3 all at cos 0... ids 0 and 3 exactly
    # orthogonal, id 1 has positive cos -> tie between 0 and 3 broken
    # by id
    assert sel[1]["id"] == 0


def test_domain_relevance_ranks_prototype_neighbors_first(spark):
    protos = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    rows = [
        (10, [0.7071, 0.7071, 0.0, 0.0]),  # mean-cos to protos ~0.707
        (11, [1.0, 0.0, 0.0, 0.0]),        # mean-cos 0.5
        (12, [0.0, 0.0, 1.0, 0.0]),        # mean-cos 0
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = coreset.domain_relevance_select(
        df, protos, "vec_id", "embedding", n=2
    ).collect()
    assert [r["vec_id"] for r in got] == [10, 11]
    assert got[0]["rel_micro"] > got[1]["rel_micro"] > 0
    with pytest.raises(ValueError):
        coreset.domain_relevance_select(df, [], "vec_id", "embedding", 1)


def test_leakage_safe_split_invariants(spark):
    """The registry row's structural guarantees at fixture scale: no
    component straddles the split, every doc lands in exactly one
    split, and both splits are non-degenerate."""
    from vectorsearch_image_embeddings_databricks_spark import registry as reg

    rows = {
        r["split"]: r
        for r in reg.QUERIES["leakage_safe_split"](spark, SF_SMALL).collect()
    }
    assert set(rows) == {"train", "eval"}
    n_docs = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet").count()
    )
    assert rows["train"]["n_docs"] + rows["eval"]["n_docs"] == n_docs
    for r in rows.values():
        assert r["n_straddle"] == 0
        assert 0 < r["n_components"] <= r["n_docs"]


def test_phrase_search_counts_overlapping_occurrences(spark):
    from vectorsearch_image_embeddings_databricks_spark.operators.hybrid import (
        phrase_search,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),   # "a b a" at positions 1 and 3 (overlap)
            (2, "a  b a x"),      # double space: filtered tokens, 1 hit
            (3, "b a b a"),       # "a b a" at position 2
            (4, "x y z"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r["n_occurrences"]
        for r in phrase_search(docs, "doc_id", "text", "a b a").collect()
    }
    assert got == {1: 2, 2: 1, 3: 1}
    # single-term phrase degrades to term frequency
    tf = {
        r["doc_id"]: r["n_occurrences"]
        for r in phrase_search(docs, "doc_id", "text", "b").collect()
    }
    assert tf == {1: 3, 2: 1, 3: 2}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        phrase_search(docs, "doc_id", "text", "  ")


def test_containment_catches_quoted_subset(spark):
    """A short doc quoted whole inside a long one: Jaccard is tiny but
    containment(short -> long) is 1.0 — the case the asymmetric
    operator exists for."""
    from vectorsearch_image_embeddings_databricks_spark.operators import dedup

    short = "alpha beta gamma delta epsilon"
    long = short + " " + " ".join(f"w{i}" for i in range(60))
    docs = spark.createDataFrame(
        [(1, short), (2, long), (3, "zeta eta theta iota kappa")],
        ["doc_id", "text"],
    )
    rows = dedup.containment_pairs(
        docs, "doc_id", "text", n=3, threshold=0.9
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    assert r["cont_ab_micro"] == 1_000_000      # short fully contained
    assert r["cont_ba_micro"] < 200_000         # long barely overlaps back
    # symmetric Jaccard would never flag this pair at a dup threshold
    jac = dedup.near_dup_pairs_jaccard(
        docs, "doc_id", "text", n=3, threshold=0.5
    ).collect()
    assert jac == []


def test_kcenter_incremental_matches_bruteforce_reference(spark):
    """r8 rewrite pin: the incremental min-dist plan (fold ONLY the new
    center with greatest(), localCheckpoint per round) must select the
    exact same centers, in the same order, with the same micro
    distances, as a driver-side brute-force FPS over the collected
    corpus — greatest() is a pure max, so the fold is bitwise-identical
    to re-scoring the whole selection."""
    import math

    import numpy as np

    emb = (
        spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
        .select("vec_id", "embedding")
    )
    sel = coreset.greedy_kcenter(emb, "vec_id", "embedding", k=8)

    rows = sorted(emb.collect(), key=lambda r: r["vec_id"])
    ids = np.array([r["vec_id"] for r in rows])
    vecs = np.array(
        [[float(x) for x in r["embedding"]] for r in rows], dtype=np.float64
    )

    def _fold_dot(a, b):
        # Spark's F.aggregate is a sequential left fold — reproduce its
        # float64 reduction order exactly (numpy @ is pairwise-summed)
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    def _norm(a):
        return math.sqrt(_fold_dot(a, a))

    norms = np.array([_norm(v) for v in vecs])

    def cos_to(c):
        cn = _norm(c)
        return np.array(
            [_fold_dot(v, c) / (nv * cn) for v, nv in zip(vecs, norms)]
        )

    picked = [int(ids[0])]
    best_sim = cos_to(vecs[0])
    expected = [(1, picked[0], 0)]
    for r in range(2, 9):
        mask = np.isin(ids, picked)
        sim_masked = np.where(mask, np.inf, best_sim)
        # (sim asc, id asc) tie-break: ids are sorted, argmin takes first
        j = int(np.argmin(sim_masked))
        expected.append(
            (r, int(ids[j]), math.floor((1.0 - best_sim[j]) * 1_000_000))
        )
        picked.append(int(ids[j]))
        best_sim = np.maximum(best_sim, cos_to(vecs[j]))

    got = [(s["rank"], s["id"], s["dist_micro"]) for s in sel]
    assert got == expected


def test_kcenter_k_exceeds_corpus_and_missing_seed(axes):
    sel = coreset.greedy_kcenter(axes, "vec_id", "embedding", k=10)
    assert [s["rank"] for s in sel] == [1, 2, 3, 4]  # stops at corpus size
    with pytest.raises(ValueError, match="no row"):
        coreset.greedy_kcenter(axes, "vec_id", "embedding", k=2, first_id=99)
