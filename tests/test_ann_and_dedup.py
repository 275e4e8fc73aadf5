"""ANN recall vs exact (BASELINE.md: recall@5 ≥ 0.9) + dedup operator
internals (MinHash/SimHash/Jaccard agreement with exact computations)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectorsearch_image_embeddings_databricks_spark.index import VectorIndex
from vectorsearch_image_embeddings_databricks_spark.index.ann import (
    BRPLSHIndex,
    CosineLSHIndex,
    IVFIndex,
)
from vectorsearch_image_embeddings_databricks_spark.operators import dedup

from .conftest import SF_SMALL


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet").cache()


def _recall_at_k(ann_fn, exact_idx, queries, k=5):
    hits = total = 0
    for q in queries:
        exact = {r["vec_id"] for r in exact_idx.search(q, k=k).collect()}
        approx = {r["vec_id"] for r in ann_fn(q, k).collect()}
        hits += len(exact & approx)
        total += k
    return hits / total


def test_brp_lsh_recall(emb):
    exact = VectorIndex(emb, key="vec_id", vector_col="embedding")
    ann = BRPLSHIndex(emb, bucket_length=1.0, num_hash_tables=6)
    queries = [r["embedding"] for r in emb.filter("vec_id < 8").collect()]
    rec = _recall_at_k(lambda q, k: ann.search(q, k), exact, queries)
    assert rec >= 0.9, f"BRP-LSH recall@5 {rec} below target"


def test_brp_lsh_search_is_deterministic_and_seeded(emb):
    """The round-5 robustness finding, pinned: (a) the estimator seed
    is EXPLICIT (pyspark's HasSeed default is a per-interpreter salted
    string hash — two processes would disagree silently); (b) the
    default search path is the bucket equi-join + exact re-rank, whose
    answer is a pure function of the seeded model — identical across
    index rebuilds, input partitionings, and for the batched form."""
    q = emb.filter("vec_id = 3").collect()[0]["embedding"]
    a = BRPLSHIndex(emb, bucket_length=1.0, num_hash_tables=10)
    b = BRPLSHIndex(
        emb.repartition(7), bucket_length=1.0, num_hash_tables=10
    )
    # the seed must actually reach the estimator: a different seed must
    # produce different hyperplanes, hence different bucket structure
    # (in-process both would coincide if the seed were silently ignored;
    # the cross-PROCESS stability of the default is what the robustness
    # matrix pins). Behavioral, not source-grep.
    other = BRPLSHIndex(
        emb, bucket_length=1.0, num_hash_tables=10, seed=7
    )

    def buckets(idx):
        return {
            (r["__cid"], r["__table"], r["__bucket"])
            for r in idx._bucket_keys(idx.hashed, "vec_id", "__cid").collect()
        }

    assert buckets(a) == buckets(b)
    assert buckets(a) != buckets(other)
    ra = [(r["vec_id"], round(r["score"], 9)) for r in a.search(q, k=5).collect()]
    rb = [(r["vec_id"], round(r["score"], 9)) for r in b.search(q, k=5).collect()]
    assert ra == rb
    from pyspark.sql import functions as F

    batch = a.search_batch(
        emb.filter("vec_id = 3").select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        ),
        k=5,
    )
    rbatch = [
        (r["vec_id"], round(r["score"], 9))
        for r in batch.orderBy(F.desc("score"), "vec_id").collect()
    ]
    assert rbatch == ra


def test_brp_lsh_widening_guarantees_k(spark):
    """r5 verdict #4 / advice: the deterministic bucket join could
    return < k rows for a sparse-collision query. The adjacent-bucket
    widening ladder (with exact-scan terminal rung) must k-fill —
    exactly k rows whenever the corpus has ≥ k — while staying
    deterministic across rebuilds and partitionings; ``widen=False``
    must reproduce the old short result on the same adversarial
    setup (proving the premise, not vacuously passing)."""
    import numpy as np

    rng = np.random.default_rng(3)
    base = rng.standard_normal(8)
    base /= np.linalg.norm(base)
    rows = []
    for i in range(30):
        v = base + 0.01 * rng.standard_normal(8)
        v /= np.linalg.norm(v)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    idx = BRPLSHIndex(emb, bucket_length=0.05, num_hash_tables=1)
    q = [float(-x) for x in base]
    from pyspark.sql import functions as F

    qdf = spark.createDataFrame(
        [(0, q)], "query_id long, query_vec array<double>"
    )
    bare = idx.search_batch(qdf, k=5, widen=False)
    assert bare.count() < 5  # the far query IS bucket-sparse here
    got = [
        (r["vec_id"], round(r["score"], 9))
        for r in idx.search(q, k=5).collect()
    ]
    assert len(got) == 5
    assert got == sorted(got, key=lambda t: (-t[1], t[0]))
    idx2 = BRPLSHIndex(
        emb.repartition(7), bucket_length=0.05, num_hash_tables=1
    )
    got2 = [
        (r["vec_id"], round(r["score"], 9))
        for r in idx2.search(q, k=5).collect()
    ]
    assert got == got2
    # widening must not disturb queries that were never short: a corpus
    # member's self-query answer is identical with and without the ladder
    self_q = emb.filter("vec_id = 0").collect()[0]["embedding"]
    sdf = spark.createDataFrame(
        [(0, [float(x) for x in self_q])],
        "query_id long, query_vec array<double>",
    )
    a = [
        (r["vec_id"], round(r["score"], 9))
        for r in idx.search_batch(sdf, k=5, widen=True)
        .orderBy(F.desc("score"), "vec_id").collect()
    ]
    b = [
        (r["vec_id"], round(r["score"], 9))
        for r in idx.search_batch(sdf, k=5, widen=False)
        .orderBy(F.desc("score"), "vec_id").collect()
    ]
    assert a == b and len(a) == 5


def test_ivf_recall_and_pruning(emb):
    exact = VectorIndex(emb, key="vec_id", vector_col="embedding")
    ivf = IVFIndex(emb, nlist=8)
    queries = [r["embedding"] for r in emb.filter("vec_id < 8").collect()]
    rec = _recall_at_k(lambda q, k: ivf.search(q, k=k, nprobe=4), exact, queries)
    assert rec >= 0.9, f"IVF recall@5 {rec} below target"
    # nprobe=all centroids must equal exact search exactly
    q = queries[0]
    full = [r["vec_id"] for r in ivf.search(q, k=5, nprobe=8).collect()]
    ex = [r["vec_id"] for r in exact.search(q, k=5).collect()]
    assert full == ex


def test_cosine_lsh_self_join_candidates(emb):
    """Sign-LSH self-join must find the high-cosine pairs the exact
    operator finds (recall on pairs ≥ 0.6 at these settings) and verify
    them exactly (no false positives above threshold)."""
    exact_pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.near_dup_pairs_cosine(emb, "vec_id", "embedding", 0.4).collect()
    }
    lsh = CosineLSHIndex(emb, num_bits=16, band_bits=4)
    got = lsh.similarity_self_join(0.4).collect()
    got_pairs = {(r["id_a"], r["id_b"]) for r in got}
    assert got_pairs <= exact_pairs  # exact verify ⇒ no false positives
    assert len(got_pairs) / max(len(exact_pairs), 1) >= 0.6


def test_minhash_near_dedup_matches_exact_jaccard(docs):
    """MinHash-LSH near-dedup must group exactly the pairs exact Jaccard
    finds at τ=0.7 on this corpus (clean bimodal similarity structure)."""
    exact_pairs = {
        tuple(sorted((r["id_a"], r["id_b"])))
        for r in dedup.near_dup_pairs_jaccard(
            docs, "doc_id", "text", n=3, threshold=0.7
        ).collect()
    }
    labels = dedup.near_dedup_minhash(
        docs, "doc_id", "text", n=3, threshold=0.7, num_hashes=32, bands=16
    ).collect()
    rep = {r["id"]: r["rep_id"] for r in labels}
    clustered_pairs = {
        tuple(sorted((a, b)))
        for a in rep
        for b in rep
        if a < b and rep[a] == rep[b] and rep[a] is not None
    }
    # every exact near-dup pair ends up in one cluster
    missing = exact_pairs - clustered_pairs
    assert not missing, f"minhash missed {len(missing)} of {len(exact_pairs)}"
    # representatives are cluster minima
    assert all(rep[i] <= i for i in rep)


def test_simhash_deterministic_and_near_dups(docs, spark):
    sig_df = docs.select("doc_id", dedup.simhash("text").alias("sig"))
    sigs = {r["doc_id"]: r["sig"] for r in sig_df.collect()}
    assert all(len(s) == 64 for s in sigs.values())
    # repartitioning must not change signatures
    again = {
        r["doc_id"]: r["sig"]
        for r in docs.repartition(5)
        .select("doc_id", dedup.simhash("text").alias("sig"))
        .collect()
    }
    assert sigs == again
    pairs = dedup.near_dup_pairs_simhash(docs, "doc_id", "text", max_hamming=3)
    rows = pairs.collect()
    assert all(r["hamming"] <= 3 for r in rows)
    # near-dup docs (trigram jaccard ≥0.9 exists in fixture) land at small
    # hamming distance; radius 7 must recover ≥90% of them (approximate
    # method — fixture measurement: radius 3 gets ~78%, radius 7 ~96%)
    exact = dedup.near_dup_pairs_jaccard(docs, "doc_id", "text", 3, 0.9)
    strong = {(r["id_a"], r["id_b"]) for r in exact.collect()}
    wide = dedup.near_dup_pairs_simhash(docs, "doc_id", "text", max_hamming=7)
    found = {(r["id_a"], r["id_b"]) for r in wide.collect()}
    overlap = len(strong & found) / max(len(strong), 1)
    assert overlap >= 0.9, f"simhash r=7 found only {overlap:.0%} of strong near-dups"


def test_dedup_exact_representative_is_min_id(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (5, "b"), (4, "c")], "id: int, k: string"
    )
    out = dedup.dedup_exact(df, ["k"], "id").collect()
    assert sorted((r["k"], r["id"]) for r in out) == [("a", 1), ("b", 3), ("c", 4)]


def test_jaccard_pairs_threshold_filtering(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "a b c d e f"),          # identical → jac 1.0
            (3, "a b c d e g"),          # close
            (4, "x y z w v u"),          # unrelated
        ],
        "id: int, t: string",
    )
    got = {
        (r["id_a"], r["id_b"]): r["jac"]
        for r in dedup.near_dup_pairs_jaccard(df, "id", "t", n=3, threshold=0.3).collect()
    }
    assert got[(1, 2)] == pytest.approx(1.0)
    assert (1, 4) not in got and (2, 4) not in got and (3, 4) not in got
    assert 0.3 <= got[(1, 3)] < 1.0


def test_max_shingle_df_prunes_hot_keys(docs):
    """The stop-shingle cap must not create pairs that don't exist and
    must keep identical-doc pairs reachable."""
    base = dedup.near_dup_pairs_jaccard(docs, "doc_id", "text", 3, 0.9)
    base_pairs = {(r["id_a"], r["id_b"]) for r in base.collect()}
    capped = dedup.near_dup_pairs_jaccard(
        docs, "doc_id", "text", 3, 0.9, max_shingle_df=50
    )
    capped_pairs = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert capped_pairs <= base_pairs


def test_minhash_label_propagation_resolves_long_chains(spark):
    """A 10-doc chain where only ADJACENT docs exceed the Jaccard
    threshold (diameter 9). Plain min-label propagation reaches distance
    max_iter (=4) and would leave the tail mislabeled; pointer jumping
    must collapse the whole chain to rep_id=0 within 4 rounds."""
    words = [f"w{i}" for i in range(30)]
    docs = [
        (i, " ".join(words[i : i + 12]))  # consecutive windows: J(adj)≈0.82
        for i in range(10)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    labels = dedup.near_dedup_minhash(
        df, "doc_id", "text", n=3, threshold=0.7,
        num_hashes=32, bands=16, max_iter=4,
        driver_cc_max_edges=0,  # force the distributed pointer-jump path
    )
    got = {r["id"]: r["rep_id"] for r in labels.collect()}
    assert got == {i: 0 for i in range(10)}


def test_minhash_driver_and_distributed_cc_paths_agree(docs):
    """The size-gated hybrid must be invisible in results: driver-side
    union-find (default gate) and the distributed pointer-jumping loop
    (gate forced to 0) produce identical (id, rep_id) labelings."""
    kw = dict(n=3, threshold=0.7, num_hashes=32, bands=16)
    driver = {
        (r["id"], r["rep_id"])
        for r in dedup.near_dedup_minhash(docs, "doc_id", "text", **kw).collect()
    }
    dist = {
        (r["id"], r["rep_id"])
        for r in dedup.near_dedup_minhash(
            docs, "doc_id", "text", driver_cc_max_edges=0, **kw
        ).collect()
    }
    assert driver == dist


def test_decontaminate_flags_planted_overlap(spark):
    """A train doc that embeds an eval doc's text verbatim must be
    flagged with that eval doc as worst match; clean docs must survive
    remove_contaminated untouched."""
    from vectorsearch_image_embeddings_databricks_spark.operators import decontam

    rows = [
        (0, "alpha beta gamma delta epsilon zeta"),          # eval
        (1, "xx alpha beta gamma delta epsilon zeta yy"),    # contaminated
        (2, "one two three four five six seven eight"),      # clean
        (3, "nine ten eleven twelve thirteen fourteen"),     # clean
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    test = df.filter("doc_id = 0")
    train = df.filter("doc_id != 0")
    rep = decontam.decontaminate_report(
        train, test, "doc_id", "text", n=3, min_shared=2
    ).collect()
    assert len(rep) == 1
    assert rep[0]["train_id"] == 1
    assert rep[0]["worst_test_doc"] == 0
    assert rep[0]["max_shared"] >= 2

    kept = decontam.remove_contaminated(
        train, test, "doc_id", "text", n=3, min_shared=2
    )
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 3]


def test_decontaminate_df_cap_drops_boilerplate_ngrams(spark):
    """An n-gram present in more eval docs than df_cap must not create
    pairs (the fan-out guard): with the cap at 1, a trigram shared by
    both eval docs is excluded and nothing is flagged."""
    from vectorsearch_image_embeddings_databricks_spark.operators import decontam

    boiler = "common header line here"
    rows = [
        (0, boiler + " unique eval zero"),
        (20, boiler + " unique eval twenty"),
        (1, boiler + " totally different body"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    test = df.filter("doc_id in (0, 20)")
    train = df.filter("doc_id = 1")
    flagged = decontam.contamination_pairs(
        train, test, "doc_id", "text", n=3, min_shared=1, df_cap=1
    ).collect()
    assert flagged == []
    # without the cap the boilerplate trigrams DO create pairs
    flagged2 = decontam.contamination_pairs(
        train, test, "doc_id", "text", n=3, min_shared=1, df_cap=None
    ).collect()
    assert len(flagged2) == 2


def test_bitext_margin_recovers_planted_pairs(spark):
    """Planted near-identical cross-set pairs must be mined with the
    highest margins and matched to their true partners."""
    import numpy as np
    from vectorsearch_image_embeddings_databricks_spark.operators import bitext

    rng = np.random.default_rng(7)
    base = rng.standard_normal((6, 16))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    # set A = base; set B = slightly perturbed copies (true partners,
    # same index) plus two random decoys
    pert = base + 0.05 * rng.standard_normal((6, 16))
    pert /= np.linalg.norm(pert, axis=1, keepdims=True)
    decoys = rng.standard_normal((2, 16))
    decoys /= np.linalg.norm(decoys, axis=1, keepdims=True)
    a = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(6)],
        ["vec_id", "embedding"],
    )
    b = spark.createDataFrame(
        [(100 + i, [float(x) for x in pert[i]]) for i in range(6)]
        + [(200 + i, [float(x) for x in decoys[i]]) for i in range(2)],
        ["vec_id", "embedding"],
    )
    got = {
        r["id_a"]: r["id_b"]
        for r in bitext.mine_parallel_pairs(
            a, b, "vec_id", "embedding", k=3, margin_threshold=1.0
        ).collect()
    }
    assert got == {i: 100 + i for i in range(6)}


def test_semantic_dedup_recovers_planted_duplicate_groups(spark):
    """Planted high-cosine duplicate groups (tiny perturbations of the
    same base vector) resolve to min-id components; unique vectors label
    themselves; result matches the exact-pair closure."""
    import numpy as np
    from vectorsearch_image_embeddings_databricks_spark.operators import dedup

    rng = np.random.default_rng(3)
    base = rng.standard_normal((10, 32))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = []
    # group of 3 duplicates of base[0]: ids 0, 100, 200
    for gid in (0, 100, 200):
        v = base[0] + 0.01 * rng.standard_normal(32)
        rows.append((gid, [float(x) for x in v / np.linalg.norm(v)]))
    # pair of duplicates of base[1]: ids 1, 101
    for gid in (1, 101):
        v = base[1] + 0.01 * rng.standard_normal(32)
        rows.append((gid, [float(x) for x in v / np.linalg.norm(v)]))
    # uniques
    for i in range(2, 10):
        rows.append((i, [float(x) for x in base[i]]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {
        r["id"]: r["rep_id"]
        for r in dedup.semantic_dedup(
            df, "vec_id", "embedding", threshold=0.95, nlist=4
        ).collect()
    }
    assert got[0] == got[100] == got[200] == 0
    assert got[1] == got[101] == 1
    for i in range(2, 10):
        assert got[i] == i
    # exact closure agreement: same components as the exact pair operator
    exact_pairs = dedup.near_dup_pairs_cosine(
        df, "vec_id", "embedding", 0.95
    ).select("id_a", "id_b").collect()
    assert {(r["id_a"], r["id_b"]) for r in exact_pairs} == {
        (0, 100), (0, 200), (100, 200), (1, 101)
    }


def test_recursive_reach_equals_cc_closure(spark):
    """The Spark 4 recursive-CTE bounded reachability must produce the
    same (id, rep_id) labeling as the iterative connected-component
    operator (component diameters at fixture scale are well under the
    depth bound)."""
    from vectorsearch_image_embeddings_databricks_spark import registry
    from .conftest import SF_SMALL

    rec = {
        (r["id"], r["rep_id"])
        for r in registry.QUERIES["dup_reach_recursive"](spark, SF_SMALL).collect()
    }
    mh = {
        (r["id"], r["rep_id"])
        for r in registry.QUERIES["minhash_near_dedup"](spark, SF_SMALL).collect()
    }
    assert rec == mh and len(rec) > 0


def test_semdedup_fixture_ivf_cell_recall_is_total(spark):
    """The semantic_dedup registry oracle (recursive closure over EXACT
    cosine pairs) equals the operator's output only if the IVF candidate
    pass finds EVERY exact pair at the fixture threshold. Assert that
    recall directly: cell-scoped candidates ⊇ exact pairs on the planted
    fixture, at the registry's exact parameterization."""
    from vectorsearch_image_embeddings_databricks_spark import registry as reg
    from vectorsearch_image_embeddings_databricks_spark.index.ann import IVFIndex
    from vectorsearch_image_embeddings_databricks_spark.operators import dedup

    aug = reg._semdedup_aug(spark, SF_SMALL)
    exact = {
        (r["id_a"], r["id_b"])
        for r in dedup.near_dup_pairs_cosine(
            aug, "id", "v", reg.SEMDEDUP_THRESHOLD
        ).collect()
    }
    assert exact, "fixture must plant at least one duplicate pair"
    ivf = IVFIndex(aug, key="id", vector_col="v", nlist=16, replication=2)
    a = ivf.assigned.select(F.col("id").alias("id_a"), "centroid_id")
    b = ivf.assigned.select(F.col("id").alias("id_b"), "centroid_id")
    cand = {
        (r["id_a"], r["id_b"])
        for r in a.join(b, "centroid_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .collect()
    }
    assert exact <= cand  # recall 1.0 — every exact pair shares a cell
    # and the end-to-end labeling matches the exact closure
    got = {
        r["id"]: r["rep_id"]
        for r in dedup.semantic_dedup(
            aug, "id", "v", threshold=reg.SEMDEDUP_THRESHOLD,
            nlist=16, replication=2,
        ).collect()
    }
    dups = {i: r for i, r in got.items() if i != r}
    assert len(dups) == 30  # 20 exact copies + 10 perturbed copies
    for i, r in dups.items():
        assert r == i % 100000


def test_bitext_ivf_tier_matches_exact_at_full_probe(spark):
    """strategy='ivf' with nprobe=nlist probes every cell, so candidates
    cover all pairs and the mined output must EQUAL the exact tier
    (same tie-breaks) — the graceful-degradation contract that lets the
    exact tier oracle the ANN plumbing end-to-end."""
    from vectorsearch_image_embeddings_databricks_spark.operators import bitext

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    a = emb.filter(F.col("label") == 0)
    b = emb.filter(F.col("label") == 1)
    kw = dict(k=3, margin_threshold=1.0)
    exact = {
        (r["id_a"], r["id_b"], round(r["margin"], 9))
        for r in bitext.mine_parallel_pairs(
            a, b, "vec_id", "embedding", strategy="exact", **kw
        ).collect()
    }
    ivf = {
        (r["id_a"], r["id_b"], round(r["margin"], 9))
        for r in bitext.mine_parallel_pairs(
            a, b, "vec_id", "embedding", strategy="ivf",
            nlist=8, nprobe=8, replication=2, **kw
        ).collect()
    }
    assert ivf == exact and exact


def test_bitext_ivf_tier_plan_has_no_full_corpus_broadcast(spark):
    """The ivf tier's candidate generation must be an equi-join on the
    cell key — no broadcast-nested-loop or cartesian of the other-side
    corpus anywhere (the exact tier's designed-in scale-killer)."""
    import contextlib
    import io

    from vectorsearch_image_embeddings_databricks_spark.operators import bitext

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    a = emb.filter(F.col("label") == 0)
    b = emb.filter(F.col("label") == 1)
    df = bitext._topk_ivf(a, b, "vec_id", "embedding", k=3, nlist=8, nprobe=2)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_near_dup_pairs_cosine_ann_tier_recall_and_plan(spark):
    """The ann_index= tier must (a) recover every duplicate-grade pair
    the exact tier finds on the planted semdedup fixture, (b) emit a
    subset of the exact pair set (candidates are exact-verified), and
    (c) plan as equi-joins — no cartesian/nested-loop of the corpus."""
    import contextlib
    import io

    from vectorsearch_image_embeddings_databricks_spark import registry as reg
    from vectorsearch_image_embeddings_databricks_spark.index.ann import (
        CosineLSHIndex,
    )
    from vectorsearch_image_embeddings_databricks_spark.operators import dedup

    aug = reg._semdedup_aug(spark, SF_SMALL)
    exact = {
        (r["id_a"], r["id_b"])
        for r in dedup.near_dup_pairs_cosine(
            aug, "id", "v", reg.SEMDEDUP_THRESHOLD
        ).collect()
    }
    idx = CosineLSHIndex(aug, key="id", vector_col="v", num_bits=16, band_bits=4)
    ann_df = dedup.near_dup_pairs_cosine(
        aug, "id", "v", reg.SEMDEDUP_THRESHOLD, ann_index=idx
    )
    ann = {(r["id_a"], r["id_b"]) for r in ann_df.collect()}
    assert ann <= exact          # exact verify: no false positives
    assert ann == exact          # duplicate-grade pairs always collide
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ann_df.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # mismatched index wiring is rejected loudly
    import pytest as _pytest

    with _pytest.raises(ValueError):
        dedup.near_dup_pairs_cosine(aug, "id", "WRONG", 0.9, ann_index=idx)


def test_ivf_append_grows_index_without_retrain(spark):
    """append() must (a) leave the quantizer untouched, (b) assign new
    vectors exactly as construction-time assignment would, and (c) make
    appended vectors findable by search."""
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    old = emb.filter(F.col("vec_id") < 400)
    new = emb.filter(F.col("vec_id") >= 400)
    ivf = IVFIndex(old, nlist=8, max_iter=8)
    cent_before = [list(c) for c in ivf.centroids]
    ivf.append(new)
    assert [list(c) for c in ivf.centroids] == cent_before  # no retrain
    # appended rows assigned identically to a fresh assignment pass
    # under the same centroids
    fresh = {
        (r["vec_id"], r["centroid_id"])
        for r in new.withColumn(
            "centroid_id", F.explode(ivf._assign_expr())
        ).collect()
    }
    got = {
        (r["vec_id"], r["centroid_id"])
        for r in ivf.assigned.filter(F.col("vec_id") >= 400).collect()
    }
    assert got == fresh and got
    # an appended vector is its own nearest neighbor at full probe
    q = emb.filter(F.col("vec_id") == 450).collect()[0]["embedding"]
    top = ivf.search(q, k=1, nprobe=8).collect()
    assert top and top[0]["vec_id"] == 450


def test_ivf_append_plan_stays_constant_depth(spark, tmp_path):
    """r9 verdict #3: append() must localCheckpoint the assignment
    union — cache() is not durable, and after eviction N appends would
    re-execute an N-deep Union+assignment lineage (the defect class
    KNNGraphIndex.append fixed in r6). After >=3 appends the assigned
    plan must contain NO Union at all (lineage truncated to the
    checkpoint scan), and the index must still serve search and save
    even after its blocks are explicitly unpersisted."""
    import contextlib
    import io

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    ivf = IVFIndex(emb.filter(F.col("vec_id") < 200), nlist=8, max_iter=8)
    for lo, hi in [(200, 300), (300, 400), (400, 500)]:
        ivf.append(
            emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
        )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ivf.assigned.explain("formatted")
    plan = buf.getvalue()
    assert "Union" not in plan, plan
    # survives block loss: unpersist (simulated eviction) must leave the
    # index recomputable/servable — the checkpointed RDD is the source
    ivf.assigned.unpersist()
    q = emb.filter(F.col("vec_id") == 450).collect()[0]["embedding"]
    assert ivf.search(q, k=1, nprobe=8).collect()[0]["vec_id"] == 450
    ivf.save(str(tmp_path / "ivf"))
    loaded = IVFIndex.load(spark, str(tmp_path / "ivf"))
    assert loaded.assigned.count() == ivf.assigned.count()


def test_ann_recall_report_meets_baseline_bar(spark):
    """The driver-visible recall audit must clear BASELINE.md's bar:
    mean recall@5 >= 0.9 at nprobe=4/nlist=8, and be deterministic
    across runs (seeded quantizer, deterministic tie-breaks)."""
    from vectorsearch_image_embeddings_databricks_spark import registry as reg

    rows = {
        r["query_id"]: r["recall_micro"]
        for r in reg.QUERIES["ann_recall_report"](spark, SF_SMALL).collect()
    }
    assert len(rows) == 20
    mean = sum(rows.values()) / len(rows) / 1e6
    assert mean >= 0.9, f"mean recall {mean}"
    again = {
        r["query_id"]: r["recall_micro"]
        for r in reg.QUERIES["ann_recall_report"](spark, SF_SMALL).collect()
    }
    assert again == rows


def test_embedding_decontaminate_flags_planted_neighbor(spark):
    """A train vector nearly identical to an eval vector must be flagged
    with that eval id as worst match; an orthogonal train vector must
    not appear. Exact integer micro aggregation: max_cos_micro of a
    near-identical pair is ~1e6."""
    from vectorsearch_image_embeddings_databricks_spark.operators import (
        decontam,
    )

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),       # eval
        (1, [0.999, 0.001, 0.0, 0.0]),   # contaminated train
        (2, [0.0, 1.0, 0.0, 0.0]),       # clean train (orthogonal)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    test = df.filter("vec_id = 0")
    train = df.filter("vec_id != 0")
    rep = decontam.embedding_decontaminate_report(
        train, test, "vec_id", "embedding", threshold=0.9
    ).collect()
    assert len(rep) == 1
    assert rep[0]["train_id"] == 1
    assert rep[0]["worst_test_doc"] == 0
    assert rep[0]["n_test_matches"] == 1
    assert rep[0]["max_cos_micro"] >= 999_000


def test_embedding_decontaminate_ann_tier_cross_join(spark):
    """The CosineLSHIndex cross-table tier must (a) be a subset of the
    exact tier (exact verify — no false positives), (b) recover every
    duplicate-grade planted pair (cos >= 0.95 collides in >=1 band with
    prob ~0.99 at 16 bits / 4-bit bands), and (c) plan as an equi-join —
    no cartesian / broadcast-nested-loop of the two corpora."""
    import contextlib
    import io

    from vectorsearch_image_embeddings_databricks_spark.index.ann import (
        CosineLSHIndex,
    )
    from vectorsearch_image_embeddings_databricks_spark.operators import (
        decontam,
    )

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    # eval = jittered copies of train vectors 0..4 -> planted cos ~ 1
    train = emb.filter("vec_id < 100").select("vec_id", "embedding")
    test = (
        emb.filter("vec_id < 5")
        .select(
            (F.col("vec_id") + 1000).alias("vec_id"),
            F.transform(
                "embedding", lambda x: x * F.lit(1.0001) + F.lit(1e-5)
            ).alias("embedding"),
        )
    )
    exact = {
        (r["train_id"], r["test_id"])
        for r in decontam.embedding_contamination_pairs(
            train, test, "vec_id", "embedding", threshold=0.9
        ).collect()
    }
    planted = {(i, i + 1000) for i in range(5)}
    assert planted <= exact
    idx = CosineLSHIndex(
        train, key="vec_id", vector_col="embedding",
        num_bits=16, band_bits=4,
    )
    ann_df = decontam.embedding_contamination_pairs(
        train, test, "vec_id", "embedding", threshold=0.9, ann_index=idx
    )
    ann = {(r["train_id"], r["test_id"]) for r in ann_df.collect()}
    assert ann <= exact
    assert planted <= ann
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ann_df.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # mismatched index wiring is rejected loudly
    with pytest.raises(ValueError):
        decontam.embedding_contamination_pairs(
            train, test, "vec_id", "embedding", ann_index=CosineLSHIndex(
                train.withColumnRenamed("vec_id", "other"),
                key="other", vector_col="embedding",
            ),
        )


def test_jaccard_prefix_filter_is_lossless(docs, spark):
    for thr in (0.5, 0.7, 0.85):
        base = {
            (r["id_a"], r["id_b"], round(r["jac"], 9))
            for r in dedup.near_dup_pairs_jaccard(
                docs, "doc_id", "text", n=3, threshold=thr
            ).collect()
        }
        pf = {
            (r["id_a"], r["id_b"], round(r["jac"], 9))
            for r in dedup.near_dup_pairs_jaccard(
                docs, "doc_id", "text", n=3, threshold=thr,
                prefix_filter=True,
            ).collect()
        }
        assert pf == base, f"threshold {thr}"


def test_jaccard_prefix_filter_explodes_fewer_postings(docs, spark):
    # the candidate join reads prefix postings only: strictly fewer rows
    # than the full inverted index for any threshold > 0
    from vectorsearch_image_embeddings_databricks_spark.functions.text import (
        word_shingles,
    )
    from pyspark.sql import functions as F

    sh = docs.select(
        F.col("doc_id").alias("__id"),
        word_shingles("text", n=3).alias("__sh"),
    ).withColumn("__sz", F.size("__sh"))
    full = sh.select(F.explode("__sh")).count()
    prefix_len = sh.select(
        F.sum(
            F.col("__sz")
            - F.floor(F.lit(0.7) * F.col("__sz")).cast("int")
            + 1
        ).alias("p")
    ).collect()[0]["p"]
    assert prefix_len < full * 0.55  # at t=0.7 prefixes are ≤ ~37% + 1


def test_ivf_pandas_assignment_equals_expression_path(emb):
    """The large-nlist assignment tier (round 6 — the 200k frontier
    measured ~30 s of codegen per plan at nlist=390 literal centroids):
    mapInPandas matmul assignment must match the codegen expression on
    this fixture — same storage assignment, same query-side probes,
    same append — including the (dot desc, j asc) tie-break, and
    invariant to input partitioning. (The paths are identical up to
    float summation order — BLAS pairwise vs sequential fold — so this
    is an empirical pin on real data, not a bitwise theorem; an exact
    dot-product near-tie could legally flip a cell. The committed hash
    rows stay ≤ 64 cells / expression tier for that reason.)"""
    expr_ivf = IVFIndex(emb, nlist=16, replication=3, assign_via="expr")
    pd_ivf = IVFIndex(emb, nlist=16, replication=3, assign_via="pandas")

    def pairs(df):
        return {
            (r["vec_id"], r["centroid_id"])
            for r in df.select("vec_id", "centroid_id").collect()
        }

    assert pairs(pd_ivf.assigned) == pairs(expr_ivf.assigned)
    # query-side probes (assign_cells) agree too
    queries = emb.filter("vec_id < 12").select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    a = expr_ivf.assign_cells(queries, "qv", 4)
    b = pd_ivf.assign_cells(queries.repartition(5), "qv", 4)
    assert {
        (r["qid"], r["centroid_id"]) for r in a.collect()
    } == {(r["qid"], r["centroid_id"]) for r in b.collect()}
    # append path under the pandas tier
    old = emb.filter("vec_id < 400")
    grow = IVFIndex(old, nlist=8, replication=2, assign_via="pandas")
    grow.append(emb.filter("vec_id >= 400"))
    ref = IVFIndex(old, nlist=8, replication=2, assign_via="expr")
    ref.append(emb.filter("vec_id >= 400"))
    assert pairs(grow.assigned) == pairs(ref.assigned)
    # 'auto' picks the expression path at fixture nlist (hash rows pin
    # it) and the pandas path past the documented ceiling
    assert not IVFIndex(emb, nlist=8)._use_pandas_assign()
    auto_big = IVFIndex(emb, nlist=8, assign_via="auto")
    auto_big.centroids = [auto_big.centroids[0]] * 129
    assert auto_big._use_pandas_assign()
    with pytest.raises(ValueError, match="assign_via"):
        IVFIndex(emb, nlist=8, assign_via="blas")


def test_ivf_explicit_centroids_skip_training(emb):
    """The explicit-quantizer tier (what makes the registry IVF row
    hash-verifiable): caller-supplied centroids are used verbatim (no
    KMeans), full-probe search equals exact search, and pruning is real
    at nprobe < nlist."""
    seeds = [
        [float(x) for x in r["embedding"]]
        for r in emb.filter("vec_id < 8").orderBy("vec_id").collect()
    ]
    ivf = IVFIndex(emb, nlist=8, replication=1, centroids=seeds)
    assert len(ivf.centroids) == 8
    for given, kept in zip(seeds, ivf.centroids):
        assert given == list(kept)
    exact = VectorIndex(emb, key="vec_id", vector_col="embedding")
    q = seeds[0]
    full = [r["vec_id"] for r in ivf.search(q, k=5, nprobe=8).collect()]
    ex = [r["vec_id"] for r in exact.search(q, k=5).collect()]
    assert full == ex
    # a pruned probe scans a strict subset of the corpus
    probed = ivf.assigned.filter(
        F.col("centroid_id").isin([0, 1])
    ).count()
    assert 0 < probed < emb.count()


def test_keep_best_pairs_route_through_prefix_tier(docs, spark):
    """The registry's near_dedup_keep_best candidate stage must read
    prefix postings (PPJoin tier), not the full inverted index: the
    lazy pair plan carries the __prefix explode."""
    from vectorsearch_image_embeddings_databricks_spark.registry import _keep_best_pairs

    pairs = _keep_best_pairs(
        docs.select(F.col("doc_id"), F.col("text"))
    )
    plan = pairs._jdf.queryExecution().analyzed().toString()
    assert "__prefix" in plan, plan


def test_simhash_md5_twin_matches_python_reference(spark):
    """The md5 bit-source tier (what makes simhash_near_dup
    hash-verifiable): Spark's signature must equal a from-scratch
    Python md5 SimHash, including the signed bit-63 packing and the
    empty-doc zero signature; exact duplicates land at hamming 0 in
    both hash tiers."""
    import hashlib

    texts = [
        (1, "hello world foo"),
        (2, "hello world foo"),
        (3, "utterly different text entirely"),
        (4, ""),
    ]
    df = spark.createDataFrame(texts, "id long, text string")
    got = {
        r["id"]: r["sig"]
        for r in df.select(
            "id", dedup.simhash_packed("text", hash_fn="md5").alias("sig")
        ).collect()
    }

    def ref(text):
        votes = [0] * 64
        for w in [t for t in text.split(" ") if t]:
            h = hashlib.md5(w.encode()).hexdigest()[:16]
            for b in range(64):
                d = int(h[b // 4], 16)
                votes[b] += 1 if (d >> (b % 4)) & 1 else -1
        s = sum(
            (-(1 << 63) if b == 63 else (1 << b))
            for b in range(64)
            if votes[b] > 0
        )
        return s - (1 << 64) if s >= (1 << 63) else s

    for i, t in texts:
        assert got[i] == ref(t), (i, got[i], ref(t))
    for hf in ("md5", "xxhash64"):
        pairs = dedup.near_dup_pairs_simhash(
            df, "id", "text", max_hamming=0, hash_fn=hf
        ).collect()
        assert [(p["id_a"], p["id_b"], p["hamming"]) for p in pairs] == [
            (1, 2, 0)
        ]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="hash_fn"):
        df.select(dedup.simhash_packed("text", hash_fn="sha1"))


def test_semantic_dedup_prefilter_equals_exhaustive_verify(emb, spark):
    """The sign-word Hamming gate is a probabilistic SUPERSET filter at
    duplicate-grade thresholds: labels with the gate on must equal the
    exhaustive-verify labels on the planted-duplicate geometry."""
    rows = [(i, [1.0 if j == i % 8 else 0.001 * (i % 3) for j in range(16)])
            for i in range(60)]
    rows += [(100 + i, rows[i][1]) for i in range(0, 60, 5)]  # exact dups
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    a = {
        r["id"]: r["rep_id"]
        for r in dedup.semantic_dedup(
            df, "vec_id", "embedding", threshold=0.95, nlist=4,
            hamming_prefilter=True,
        ).collect()
    }
    b = {
        r["id"]: r["rep_id"]
        for r in dedup.semantic_dedup(
            df, "vec_id", "embedding", threshold=0.95, nlist=4,
            hamming_prefilter=False,
        ).collect()
    }
    assert a == b
    assert a[100] == a[0]  # planted dup collapsed


def test_cosine_lsh_auto_sizing_scales_with_corpus(spark):
    """Auto banding: ~64-row target buckets (band_bits grows with
    log2 n) and bands = band_bits, so candidate cost stays ~linear."""
    import math

    small = spark.createDataFrame(
        [(i, [float((i * 7 + j) % 13) for j in range(8)]) for i in range(128)],
        "vec_id long, embedding array<double>",
    )
    big = spark.createDataFrame(
        [(i, [float((i * 7 + j) % 13) for j in range(8)]) for i in range(4096)],
        "vec_id long, embedding array<double>",
    )
    s = CosineLSHIndex(small)
    b = CosineLSHIndex(big)
    assert s.band_bits == 4 and s.num_bits == 16
    assert b.band_bits == math.ceil(math.log2(4096 / 64)) == 6
    assert b.num_bits == 36
    # explicit params still honored verbatim (oracle replay contract)
    e = CosineLSHIndex(small, num_bits=16, band_bits=4)
    assert (e.num_bits, e.band_bits) == (16, 4)


def test_cosine_lsh_oracle_ladder_matches_auto_sizing():
    """The cosine_lsh_near_dup oracle replays auto-sizing in SQL with a
    12-bit ladder cap (the operator clamps at 20). Pin the two contracts
    the oracle's correctness rests on:

    1. the SQL formula least(12, greatest(4, ceil(log2(n/64)))) equals
       the operator's band_bits for every corpus up to 64 * 2**12 rows
       (past that the committed row would need a wider ladder);
    2. numpy fills standard_normal((n, d)) row-major from one PCG64
       stream, so the first bb**2 rows of the oracle's 144-plane draw
       ARE the (bb**2, 64) planes the operator generates.
    """
    import math

    import numpy as np

    from vectorsearch_image_embeddings_databricks_spark.registry.hybrid_ann_streaming import (
        _LSH_MAX_BAND_BITS,
    )

    def py_auto(n: int) -> int:
        return min(20, max(4, math.ceil(math.log2(max(n, 2) / 64))))

    def sql_ladder(n: int) -> int:
        return min(
            _LSH_MAX_BAND_BITS,
            max(4, math.ceil(math.log2(max(n, 2) / 64))),
        )

    # every corpus size the ladder claims to cover, including the exact
    # power-of-two boundaries where ceil(log2) steps
    sizes = [1, 2, 100, 550, 2200, 22000, 65536, 65537, 262143, 262144]
    sizes += [64 * 2**k for k in range(1, 13)] + [64 * 2**k + 1 for k in range(1, 12)]
    for n in sizes:
        if n <= 64 * 2**_LSH_MAX_BAND_BITS:
            assert py_auto(n) == sql_ladder(n), n

    full = np.random.default_rng(42).standard_normal(
        (_LSH_MAX_BAND_BITS**2, 64)
    )
    for bb in (4, 6, 9, 12):
        sliced = np.random.default_rng(42).standard_normal((bb * bb, 64))
        assert np.array_equal(full[: bb * bb], sliced)
