"""index.pq: product quantization — encode semantics, plan shape,
trained-vs-seeded residual quality."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from vectorsearch_image_embeddings_databricks_spark.index import pq

from .conftest import SF_SMALL

DIM = 64
M, K = 4, 4


def _emb(spark):
    return spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")


def test_encode_is_map_only_and_seeds_self_encode(spark):
    """Plan must contain no Exchange/Join (pure projection+explode);
    every seed row must encode to its own code with residual 0 in all
    subspaces."""
    emb = _emb(spark)
    books = pq.seed_codebooks(emb, "vec_id", "embedding", m=M, k=K, dim=DIM)
    enc = pq.encode(emb, "vec_id", "embedding", books, dim=DIM)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        enc.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan
    assert "Join" not in plan
    rows = enc.filter(F.col("id") < K).collect()
    assert len(rows) == K * M
    for r in rows:
        assert r["code"] == r["id"]
        assert r["dist_micro"] == 0


def test_profile_covers_corpus_and_residual_nonneg(spark):
    emb = _emb(spark)
    n = emb.count()
    books = pq.seed_codebooks(emb, "vec_id", "embedding", m=M, k=K, dim=DIM)
    prof = pq.code_profile(
        pq.encode(emb, "vec_id", "embedding", books, dim=DIM)
    ).collect()
    per_sub = {}
    for r in prof:
        per_sub[r["sub"]] = per_sub.get(r["sub"], 0) + r["n_vecs"]
        assert r["sum_dist_micro"] >= 0
    assert per_sub == {j: n for j in range(M)}


def test_trained_codebooks_cut_residual_vs_seeded(spark):
    """Lloyd-trained codebooks must achieve a strictly lower total
    residual than the arbitrary seeded ones (the point of training),
    and be deterministic across calls."""
    emb = _emb(spark)
    seeded = pq.seed_codebooks(emb, "vec_id", "embedding", m=M, k=K, dim=DIM)
    trained = pq.train_codebooks(
        emb, "embedding", m=M, k=K, dim=DIM, sample_size=500,
        id_col="vec_id",
    )
    trained2 = pq.train_codebooks(
        emb, "embedding", m=M, k=K, dim=DIM, sample_size=500,
        id_col="vec_id",
    )
    assert trained == trained2
    # layout-independence: the id-keyed sample makes codebooks identical
    # under a different partitioning of the same rows
    trained3 = pq.train_codebooks(
        emb.repartition(7), "embedding", m=M, k=K, dim=DIM,
        sample_size=500, id_col="vec_id",
    )
    assert trained == trained3

    def residual(books):
        return (
            pq.encode(emb, "vec_id", "embedding", books, dim=DIM)
            .agg(F.sum("dist_micro"))
            .collect()[0][0]
        )

    assert residual(trained) < residual(seeded)


def test_dim_mismatch_rejected(spark):
    emb = _emb(spark)
    with pytest.raises(ValueError):
        pq.seed_codebooks(emb, "vec_id", "embedding", m=5, k=K, dim=DIM)
    books = pq.seed_codebooks(emb, "vec_id", "embedding", m=M, k=K, dim=DIM)
    with pytest.raises(ValueError):
        pq.encode(emb, "vec_id", "embedding", books, dim=63)


def test_adc_search_plan_and_self_hit(spark):
    """ADC over the compact code table must be shuffle/join-free
    (scan -> codegen'd LUT sum -> TakeOrderedAndProject), and the query
    vector's own row (a seed, residual 0 in every subspace) must rank
    first with adc_dist_micro == 0."""
    emb = _emb(spark)
    books = pq.seed_codebooks(emb, "vec_id", "embedding", m=M, k=K, dim=DIM)
    enc = pq.encode_compact(emb, "vec_id", "embedding", books, dim=DIM)
    qvec = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    res = pq.adc_search(enc, qvec, books, dim=DIM, k=5)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        res.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "TakeOrderedAndProject" in plan
    rows = res.collect()
    assert rows[0]["id"] == 0
    assert rows[0]["adc_dist_micro"] == 0
    micro = [r["adc_dist_micro"] for r in rows]
    assert micro == sorted(micro)


def test_encode_compact_matches_exploded_encode(spark):
    """The compact (id, codes[]) layout must agree per-subspace with the
    exploded encode() output."""
    emb = _emb(spark).limit(50)
    books = pq.seed_codebooks(emb, "vec_id", "embedding", m=M, k=K, dim=DIM)
    compact = {
        r["id"]: list(r["codes"])
        for r in pq.encode_compact(
            emb, "vec_id", "embedding", books, dim=DIM
        ).collect()
    }
    exploded = pq.encode(emb, "vec_id", "embedding", books, dim=DIM).collect()
    for r in exploded:
        assert compact[r["id"]][r["sub"]] == r["code"]


def test_adc_lut_portable_and_recall_positive(spark):
    """LUT entries are nonnegative ints; ADC top-20 overlaps the exact
    L2 top-20 (sanity floor, not a tuned recall claim)."""
    emb = _emb(spark)
    books = pq.seed_codebooks(emb, "vec_id", "embedding", m=M, k=K, dim=DIM)
    qvec = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    luts = pq.adc_lut_micro(qvec, books, DIM)
    assert len(luts) == M and all(len(row) == K for row in luts)
    assert all(isinstance(v, int) and v >= 0 for row in luts for v in row)
    enc = pq.encode_compact(emb, "vec_id", "embedding", books, dim=DIM)
    adc_ids = {
        r["id"] for r in pq.adc_search(enc, qvec, books, dim=DIM, k=20).collect()
    }
    from vectorsearch_image_embeddings_databricks_spark.functions.vector import l2_dist

    qlit = F.array(*[F.lit(float(x)) for x in qvec])
    exact_ids = {
        r["vec_id"]
        for r in emb.select("vec_id", l2_dist("embedding", qlit).alias("d"))
        .orderBy("d", "vec_id")
        .limit(20)
        .collect()
    }
    assert len(adc_ids & exact_ids) >= 1


def _cents(spark, nlist=8):
    emb = _emb(spark)
    return [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < nlist).orderBy("vec_id").collect()
    ]


def test_ivfadc_prunes_but_keeps_exhaustive_topk(spark):
    """nprobe < nlist must scan strictly fewer candidates than the
    corpus (the pruning is real), the query's own row (cell 0's seed)
    must survive the probe and rank first, and the probed top-10 must
    overlap the exhaustive-ADC top-10 substantially (sanity floor — at
    sf0.01 the registry query's overlap is exactly 10/10)."""
    emb = _emb(spark)
    cents = _cents(spark)
    books = pq.seed_codebooks(emb, "vec_id", "embedding", m=M, k=K, dim=DIM)
    qvec = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    enc = pq.encode_ivfadc(emb, "vec_id", "embedding", cents, books, dim=DIM)
    probes = pq.probe_cells(qvec, cents, nprobe=3)
    n_corpus = emb.count()
    n_candidates = enc.filter(F.col("cell").isin(probes)).count()
    assert 0 < n_candidates < n_corpus
    probed = [
        r["id"]
        for r in pq.ivfadc_search(
            enc, qvec, cents, books, dim=DIM, nprobe=3, k=10
        ).collect()
    ]
    exhaustive = [
        r["id"]
        for r in pq.adc_search(
            pq.encode_compact(emb, "vec_id", "embedding", books, dim=DIM),
            qvec, books, dim=DIM, k=10,
        ).collect()
    ]
    assert probed[0] == exhaustive[0] == 0
    assert len(set(probed) & set(exhaustive)) >= 5


def test_ivfadc_centroid_rows_assign_to_own_cell(spark):
    """Each centroid-seed vector's best cell is itself (dot(v,v) maximal
    among seeds only when geometry allows — assert the weaker invariant
    that assignment is deterministic and every row lands in exactly one
    cell at replication=1)."""
    emb = _emb(spark)
    cents = _cents(spark)
    assigned = pq.coarse_assign(emb, "vec_id", "embedding", cents)
    n = emb.count()
    assert assigned.count() == n
    assert assigned.select("id").distinct().count() == n
    cells = {r["cell"] for r in assigned.select("cell").distinct().collect()}
    assert cells <= set(range(8))


def test_ivfadc_replication_dedup(spark):
    """replication=2 stores each vector twice; a probe covering both of
    a vector's cells must not return it twice when deduplicate=True."""
    emb = _emb(spark).limit(50)
    cents = _cents(spark)
    books = pq.seed_codebooks(emb, "vec_id", "embedding", m=M, k=K, dim=DIM)
    qvec = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    enc = pq.encode_ivfadc(
        emb, "vec_id", "embedding", cents, books, dim=DIM, replication=2
    )
    assert enc.count() == 100  # 50 rows x 2 cells
    res = pq.ivfadc_search(
        enc, qvec, cents, books, dim=DIM, nprobe=8, k=50, deduplicate=True
    ).collect()
    ids = [r["id"] for r in res]
    assert len(ids) == len(set(ids)) == 50


def test_ivfadc_probe_filter_plan_no_shuffle(spark):
    """At replication=1 the probed ADC search is Filter -> LUT sum ->
    TakeOrderedAndProject with no Exchange (the filter is the partition-
    pruning predicate on cell-partitioned storage), and encode_ivfadc
    computes cell + codes in one projection, so the COMPOSED
    encode+search plan is a single scan stage."""
    emb = _emb(spark)
    cents = _cents(spark)
    books = pq.seed_codebooks(emb, "vec_id", "embedding", m=M, k=K, dim=DIM)
    qvec = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    enc = pq.encode_ivfadc(emb, "vec_id", "embedding", cents, books, dim=DIM)
    res = pq.ivfadc_search(enc, qvec, cents, books, dim=DIM, nprobe=3, k=10)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        res.explain("formatted")
    plan = buf.getvalue()
    # encode (cell + codes in one projection) and probe+score compose
    # into a single scan stage: no join, no shuffle, pre-merge top-k
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "TakeOrderedAndProject" in plan
