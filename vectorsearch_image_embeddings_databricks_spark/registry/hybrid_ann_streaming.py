# Auto-split from the former single-file registry (round 4): one
# contiguous, order-preserving slice; every @register call still
# runs in the original order via registry/__init__.py.
from __future__ import annotations  # noqa: F401
from ._core import (  # noqa: F401
    DataFrame,
    F,
    SparkSession,
    VectorIndex,
    Window,
    dedup,
    hybrid,
    load,
    load_docs,
    load_embeddings,
    load_events,
    register,
)
from .knn_vector_dedup import (  # noqa: F401
    COSINE_PAIR_THRESHOLD,
    JACCARD_THRESHOLD,
    KNN_K,
    KNN_QUERY_ID,
)

# O20/E7/E8 — hybrid search: keyword + vector, RRF-fused
# --------------------------------------------------------------------- #

HYBRID_TERMS = ["table", "join", "merge"]
HYBRID_TOPK = 10
HYBRID_POOL = 20 * HYBRID_TOPK  # bounded candidate pool per ranking side


@register(
    "hybrid_rrf",
    oracle=f"""
    WITH q AS (
        SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = {KNN_QUERY_ID}
    ),
    kw AS (
        SELECT doc_id AS id,
               len(list_filter(list_distinct(list_filter(string_split(text,' '), t -> t <> '')),
                               t -> t IN ('table','join','merge'))) AS kw_score
        FROM documents
    ),
    kwr AS (
        SELECT id, rank FROM (
            SELECT id, row_number() OVER (ORDER BY kw_score DESC, id) AS rank
            FROM kw WHERE kw_score > 0
        ) WHERE rank <= {HYBRID_POOL}
    ),
    vs AS (
        SELECT e.vec_id AS id, list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS s
        FROM embeddings e, q
    ),
    vsr AS (
        SELECT id, rank FROM (
            SELECT id, row_number() OVER (ORDER BY s DESC, id) AS rank FROM vs
        ) WHERE rank <= {HYBRID_POOL}
    ),
    f AS (
        SELECT coalesce(a.id, b.id) AS id,
               coalesce(1.0/(60 + a.rank), 0) + coalesce(1.0/(60 + b.rank), 0) AS rrf
        FROM kwr a FULL OUTER JOIN vsr b ON a.id = b.id
    )
    SELECT id, CAST(floor(rrf * 1000000) AS BIGINT) AS rrf_micro
    FROM f ORDER BY rrf DESC, id LIMIT {HYBRID_TOPK}
    """,
)
def hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval (the reference's commented query_type='hybrid',
    NMR:386–387): keyword rank (distinct-term overlap) ⊕ vector rank
    (cosine), fused by Reciprocal Rank Fusion. Docs and embeddings join
    positionally (doc_id ≡ vec_id in the fixtures).

    Scale shape: BOTH rank pools are bounded to 20·k rows via
    ``orderBy().limit(pool)`` — a distributed TakeOrderedAndProject —
    *before* the unpartitioned rank window ever runs, so the single-task
    window only sees ≤200 rows regardless of corpus size (no eager
    count() job, no corpus-wide global sort; the oracle applies the same
    bounded-pool semantics)."""
    docs = load_docs(spark, sf_dir)
    emb = load(spark, sf_dir, "embeddings")
    qvec = (
        emb.filter(F.col("vec_id") == KNN_QUERY_ID).select("embedding").collect()[0][0]
    )
    kw = hybrid.term_overlap_scores(docs, "doc_id", "text", HYBRID_TERMS)
    kw_pool = kw.orderBy(F.desc("kw_score"), F.asc("doc_id")).limit(HYBRID_POOL)
    kw_ranked = hybrid.rank_by(kw_pool, "doc_id", "kw_score")
    idx = VectorIndex(emb, key="vec_id", vector_col="embedding", dim=len(qvec))
    vec_scored = idx.search(qvec, k=HYBRID_POOL)
    vec_ranked = hybrid.rank_by(vec_scored, "vec_id", "score")
    fused = hybrid.rrf_fuse(kw_ranked, vec_ranked)
    return (
        fused.orderBy(F.desc("rrf_score"), F.asc("id"))
        .limit(HYBRID_TOPK)
        .select(
            "id",
            F.floor(F.col("rrf_score") * F.lit(1e6)).cast("long").alias("rrf_micro"),
        )
    )


# --------------------------------------------------------------------- #
# Rows-only queries (no SQL oracle — ANN/stateful/UDF ops; the driver
# records a rows-only check, pytest pins their semantics: recall vs the
# exact operators in tests/test_ann_and_dedup.py, equivalence in
# tests/test_streaming_refresh.py).
# --------------------------------------------------------------------- #

@register(
    "embed_documents_stub",
    oracle="""
    SELECT doc_id,
           CAST(CASE WHEN text IS NULL THEN NULL ELSE 64 END AS INTEGER) AS dim,
           CAST(CASE WHEN text IS NULL THEN NULL ELSE 1.0 END AS DOUBLE) AS norm
    FROM documents
    """,
)
def embed_documents_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O11/O12/O18: distributed embedding via iterator pandas UDF with the
    deterministic stub encoder (no model downloads). The vector values are
    engine-specific (md5-seeded RNG — pytest checks them); what the oracle
    CAN verify end-to-end is the UDF contract: every non-null input row
    comes back with a dim-64, unit-L2-norm vector and null inputs propagate
    to null embeddings (NMR:211–213 error semantics)."""
    from ..embed import StubTextEncoder, embed_column
    from ..functions.vector import l2_norm

    # pandas-UDF stages want FEWER, FULLER partitions than the codegen'd
    # HOF ops load_docs serves: each partition pays a python-worker +
    # Arrow-channel setup, so 32 workers for 5k rows is spawn-dominated
    # (measured ~2x slower and far noisier than 8). At corpus scale the
    # source's own splits set the parallelism and no repartition runs.
    docs = load(spark, sf_dir, "documents").repartition(8)
    emb = embed_column(docs, "text", lambda: StubTextEncoder(dim=64))
    return emb.select(
        "doc_id",
        F.size("embedding").cast("int").alias("dim"),
        F.round(l2_norm("embedding"), 4).cast("double").alias("norm"),
    )


@register(
    "ann_lsh_knn",
    oracle=f"""
    WITH q AS (
        SELECT embedding::DOUBLE[] AS qv FROM embeddings
        WHERE vec_id = {KNN_QUERY_ID}
    )
    SELECT e.vec_id,
           round((2.0 - list_distance(e.embedding::DOUBLE[], q.qv)
                      * list_distance(e.embedding::DOUBLE[], q.qv)) / 2.0,
                 6) AS score
    FROM embeddings e CROSS JOIN q
    ORDER BY list_distance(e.embedding::DOUBLE[], q.qv), e.vec_id
    LIMIT {KNN_K}
    """,
)
def ann_lsh_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O16/O19 ANN path: MLlib BucketedRandomProjectionLSH top-k.

    Converted from rows-only to a hash row via the pq_adc_recall
    pattern (r4 verdict #6): MLlib's internal hash functions are not
    SQL-replayable, but the *contract this configuration must meet* is —
    at seed 42 / bucket_length 1.0 / 10 tables the bucket-equi-join
    candidate set provably contains the true top-k on every fixture
    corpus (measured 80/80 at sf0.001/0.01/0.1/1), and the search
    re-ranks candidates by exact distance, so a healthy index returns
    exactly the exact-L2 top-k with the (2 - d^2)/2 score the wrapper
    derives. The oracle computes that expected answer; any
    hashing/wrapper regression that drops a true neighbor flips the
    hash. Determinism needed TWO pins (round-5 robustness finding):
    an explicit model seed (pyspark's HasSeed default is a per-process
    salted string hash — hyperplanes differed per interpreter) and the
    bucket-join search path (MLlib's approxNearestNeighbors picks its
    candidate threshold by approxQuantile, which is row-order
    dependent). Recall additionally pytest-pinned >= 0.9."""
    from ..index.ann import BRPLSHIndex

    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == KNN_QUERY_ID).collect()[0]["embedding"]
    ann = BRPLSHIndex(emb, bucket_length=1.0, num_hash_tables=10)
    return ann.search(q, k=KNN_K).select(
        "vec_id", F.round("score", 6).alias("score")
    )


BRP_AUDIT_QUERIES = 16
BRP_AUDIT_K = 5


@register(
    "brp_lsh_recall",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        FROM embeddings WHERE vec_id < {BRP_AUDIT_QUERIES}
    ),
    exact AS (
        SELECT q.query_id, e.vec_id,
               row_number() OVER (
                   PARTITION BY q.query_id
                   ORDER BY list_distance(e.embedding::DOUBLE[], q.qv),
                            e.vec_id) AS rn
        FROM embeddings e CROSS JOIN q
    )
    SELECT query_id, CAST({BRP_AUDIT_K} AS BIGINT) AS k,
           CAST(count(*) AS BIGINT) AS n_hit
    FROM exact WHERE rn <= {BRP_AUDIT_K}
    GROUP BY query_id
    """,
)
def brp_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E35-family recall audit of the BRP-LSH tier over a {16}-query
    panel: per query, |LSH top-k ∩ exact-L2 top-k|. The oracle pins the
    FULL-RECALL expectation (n_hit = k for every query — derived from
    the exact top-k, not a literal), which this LSH configuration
    deterministically meets on the fixture corpus (seed 42 /
    bucket_length 1.0 / 10 tables: 80/80 at sf0.001 through sf1); a
    regression in MLlib wrapping, bucketing params, the seeded
    hyperplanes, or the score/tie conventions drops a hit and flips the
    hash. The exact side is the distributed crossJoin → per-query
    window (scan-bounded); the LSH side is ONE batched bucket
    equi-join of the hashed corpus against the whole query panel
    (`BRPLSHIndex.search_batch` — the deterministic path; see
    BRPLSHIndex.search for why MLlib's multi-probe cannot back a hash
    row)."""
    from ..functions.vector import l2_dist
    from ..index.ann import BRPLSHIndex

    emb = load_embeddings(spark, sf_dir)
    idx = BRPLSHIndex(emb, key="vec_id", vector_col="embedding",
                      bucket_length=1.0, num_hash_tables=10)
    ann = idx.search_batch(
        emb.filter(F.col("vec_id") < BRP_AUDIT_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        ),
        k=BRP_AUDIT_K,
    ).select("query_id", "vec_id")
    q = emb.filter(F.col("vec_id") < BRP_AUDIT_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("__qv"),
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("__d"), F.asc("vec_id"))
    exact = (
        emb.crossJoin(q)
        .select(
            "query_id", "vec_id",
            l2_dist("embedding", "__qv").alias("__d"),
        )
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= BRP_AUDIT_K)
        .select("query_id", "vec_id")
    )
    return (
        ann.join(exact, ["query_id", "vec_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hit"))
        .select(
            "query_id",
            F.lit(BRP_AUDIT_K).cast("long").alias("k"),
            F.col("n_hit"),
        )
    )


ANN_IVF_NLIST = 8   # seeded cells: centroids = embeddings of vec_id < 8
ANN_IVF_NPROBE = 4


@register(
    "ann_ivf_knn",
    oracle=f"""
    WITH cents AS (
        SELECT vec_id AS cell, embedding::DOUBLE[] AS cv
        FROM embeddings WHERE vec_id < {ANN_IVF_NLIST}
    ),
    q AS (
        SELECT embedding::DOUBLE[] AS qv FROM embeddings
        WHERE vec_id = {KNN_QUERY_ID}
    ),
    assign AS (
        SELECT e.vec_id, c.cell,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY list_inner_product(e.embedding::DOUBLE[], c.cv)
                            DESC, c.cell) AS rn
        FROM embeddings e CROSS JOIN cents c
    ),
    probes AS (
        SELECT cell FROM (
            SELECT c.cell,
                   row_number() OVER (
                       ORDER BY list_inner_product(q.qv, c.cv) DESC,
                                c.cell) AS rn
            FROM cents c CROSS JOIN q
        ) WHERE rn <= {ANN_IVF_NPROBE}
    )
    SELECT e.vec_id,
           round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6)
               AS score
    FROM embeddings e
    JOIN assign a ON a.vec_id = e.vec_id AND a.rn = 1
    JOIN probes p ON p.cell = a.cell
    CROSS JOIN q
    ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qv) DESC,
             e.vec_id
    LIMIT {KNN_K}
    """,
)
def ann_ivf_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN: coarse quantizer + partition-pruned exact search
    (the 100 TB scale path for repeated queries). Hash-verified via the
    seeded-quantizer technique ``ivf_adc_topk`` established: the cell
    centers are the embeddings of the ``nlist`` smallest vec_ids (one
    bounded driver probe), so assignment (argmax inner product, ties to
    the smaller cell), probe selection (top-nprobe cells by q·c), and
    the exact cosine top-k inside the probed cells all replay in plain
    SQL. The trained-KMeans production twin is IVFIndex's default path,
    recall-pinned in pytest and audited by ``ann_recall_report``."""
    from ..index.ann import IVFIndex

    emb = load(spark, sf_dir, "embeddings")
    seed_rows = (
        emb.filter(F.col("vec_id") < ANN_IVF_NLIST)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    cents = [[float(x) for x in r["embedding"]] for r in seed_rows]
    q = seed_rows[KNN_QUERY_ID]["embedding"]
    ivf = IVFIndex(
        emb, nlist=ANN_IVF_NLIST, replication=1, centroids=cents
    )
    return ivf.search(q, k=KNN_K, nprobe=ANN_IVF_NPROBE).select(
        "vec_id", F.round("score", 6).alias("score")
    )


GRAPH_DEGREE = 6
GRAPH_BEAM = 8
GRAPH_HOPS = 2
GRAPH_ENTRIES = (0, 1, 2, 3)
GRAPH_NQ = 6

#: Shared exact-graph builds, keyed on (application, sf_dir, degree):
#: knn_graph_beam / knn_graph_beam_adaptive walk the SAME full-corpus
#: exact graph — rebuilding the deliberately quadratic oracle-tier
#: build once per row spent ~23 s of the 133 s bench suite on identical
#: work (r5 verdict #3). The memo hands every row in one session the
#: one localCheckpoint'd edge table; keying on applicationId keeps a
#: checkpoint from leaking across SparkSessions (a checkpointed
#: DataFrame dies with its session).
_EXACT_GRAPH_MEMO: dict = {}


def _shared_exact_graph(spark: SparkSession, sf_dir: str, degree: int):
    from ..index.graph_ann import build_knn_graph

    key = (spark.sparkContext.applicationId, sf_dir, degree)
    g = _EXACT_GRAPH_MEMO.get(key)
    if g is None:
        emb = load_embeddings(spark, sf_dir)
        g = build_knn_graph(
            emb, "vec_id", "embedding", degree=degree
        ).localCheckpoint(eager=True)
        if len(_EXACT_GRAPH_MEMO) >= 8:  # bound driver references
            _EXACT_GRAPH_MEMO.clear()
        _EXACT_GRAPH_MEMO[key] = g
    return g


def _graph_hop_sql(i: int) -> str:
    """One unrolled beam-search hop: neighbors of beam b{i} not already
    in it, scored, unioned, re-beamed — the SQL mirror of
    index.graph_ann.beam_search's loop body."""
    return f"""
    n{i + 1} AS (
        SELECT DISTINCT b{i}.qid, g.dst AS id
        FROM b{i} JOIN g ON g.src = b{i}.id
        WHERE NOT EXISTS (
            SELECT 1 FROM b{i} x WHERE x.qid = b{i}.qid AND x.id = g.dst
        )
    ),
    s{i + 1} AS (
        SELECT n{i + 1}.qid, n{i + 1}.id,
               list_cosine_similarity(q.qv, v.vec) AS s
        FROM n{i + 1}
        JOIN q ON q.qid = n{i + 1}.qid
        JOIN v ON v.id = n{i + 1}.id
    ),
    u{i + 1} AS (
        SELECT qid, id, s FROM b{i}
        UNION ALL SELECT qid, id, s FROM s{i + 1}
    ),
    b{i + 1} AS (
        SELECT qid, id, s FROM (
            SELECT u{i + 1}.*, row_number() OVER (
                PARTITION BY qid ORDER BY s DESC, id) AS rn
            FROM u{i + 1}
        ) WHERE rn <= {GRAPH_BEAM}
    )"""


@register(
    "knn_graph_beam",
    oracle=f"""
    WITH v AS (
        SELECT vec_id AS id, embedding::DOUBLE[] AS vec FROM embeddings
    ),
    e0 AS (
        SELECT a.id AS src, b.id AS dst,
               row_number() OVER (
                   PARTITION BY a.id
                   ORDER BY list_cosine_similarity(a.vec, b.vec) DESC,
                            b.id) AS rn
        FROM v a JOIN v b ON a.id <> b.id
    ),
    g AS (SELECT src, dst FROM e0 WHERE rn <= {GRAPH_DEGREE}),
    q AS (SELECT id AS qid, vec AS qv FROM v WHERE id < {GRAPH_NQ}),
    s0 AS (
        SELECT q.qid, v.id, list_cosine_similarity(q.qv, v.vec) AS s
        FROM q JOIN v ON v.id IN {GRAPH_ENTRIES}
    ),
    b0 AS (
        SELECT qid, id, s FROM (
            SELECT s0.*, row_number() OVER (
                PARTITION BY qid ORDER BY s DESC, id) AS rn
            FROM s0
        ) WHERE rn <= {GRAPH_BEAM}
    ),
    {",".join(_graph_hop_sql(i).lstrip() for i in range(GRAPH_HOPS))}
    SELECT qid AS query_id, id AS vec_id, round(s, 6) AS score
    FROM (
        SELECT b{GRAPH_HOPS}.*, row_number() OVER (
            PARTITION BY qid ORDER BY s DESC, id) AS rn
        FROM b{GRAPH_HOPS}
    ) WHERE rn <= {KNN_K}
    """,
)
def knn_graph_beam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph ANN tier (the HNSW-class answer to ANN_FRONTIER.md's
    finding that cell-pruning recall tracks scanned corpus fraction on
    structure-free data): exact-built kNN graph (degree {6}) + batched
    NSW beam search (beam {8}, {2} hops, fixed entry points) for a
    6-query batch, top-{5} per query. Per-query probe cost is
    entries + hops·beam·degree — INDEPENDENT of corpus size, the
    property no quantization tier has. Fully deterministic (fixed
    entries, (score desc, id) tie-breaks), so build + walk replay in
    unrolled SQL hop for hop. Scale build is strategy='ivf'
    (cell-join candidates — pytest-pinned); see index.graph_ann."""
    from ..index.graph_ann import beam_search

    emb = load_embeddings(spark, sf_dir)
    # shared with knn_graph_beam_adaptive: ONE checkpointed build per
    # (session, sf, degree). knn_graph_update builds its own graphs —
    # its old-corpus build and post-update rebuild differ from this one.
    graph = _shared_exact_graph(spark, sf_dir, GRAPH_DEGREE)
    queries = emb.filter(F.col("vec_id") < GRAPH_NQ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    res = beam_search(
        graph, emb, queries, "vec_id", "embedding",
        k=KNN_K, beam=GRAPH_BEAM, hops=GRAPH_HOPS,
        entry_ids=list(GRAPH_ENTRIES),
    )
    return res.select(
        "query_id", "vec_id", F.round("score", 6).alias("score")
    )


GRAPH_ENTRY_NPROBE = 4


@register(
    "knn_graph_beam_adaptive",
    oracle=f"""
    WITH v AS (
        SELECT vec_id AS id, embedding::DOUBLE[] AS vec FROM embeddings
    ),
    e0 AS (
        SELECT a.id AS src, b.id AS dst,
               row_number() OVER (
                   PARTITION BY a.id
                   ORDER BY list_cosine_similarity(a.vec, b.vec) DESC,
                            b.id) AS rn
        FROM v a JOIN v b ON a.id <> b.id
    ),
    g AS (SELECT src, dst FROM e0 WHERE rn <= {GRAPH_DEGREE}),
    q AS (SELECT id AS qid, vec AS qv FROM v WHERE id < {GRAPH_NQ}),
    cents AS (
        SELECT id AS cell, vec AS cv FROM v WHERE id < {ANN_IVF_NLIST}
    ),
    assign AS (
        SELECT v.id, c.cell,
               row_number() OVER (
                   PARTITION BY v.id
                   ORDER BY list_inner_product(v.vec, c.cv) DESC, c.cell)
                   AS rn
        FROM v CROSS JOIN cents c
    ),
    reps AS (
        SELECT cell, id FROM (
            SELECT a.cell, v.id,
                   row_number() OVER (
                       PARTITION BY a.cell
                       ORDER BY list_cosine_similarity(v.vec, c.cv) DESC,
                                v.id) AS rn
            FROM assign a
            JOIN v ON v.id = a.id
            JOIN cents c ON c.cell = a.cell
            WHERE a.rn = 1
        ) WHERE rn = 1
    ),
    qc AS (
        SELECT q.qid, c.cell,
               row_number() OVER (
                   PARTITION BY q.qid
                   ORDER BY list_inner_product(q.qv, c.cv) DESC, c.cell)
                   AS rn
        FROM q CROSS JOIN cents c
    ),
    ent AS (
        SELECT DISTINCT qc.qid, r.id
        FROM qc JOIN reps r ON r.cell = qc.cell
        WHERE qc.rn <= {GRAPH_ENTRY_NPROBE}
    ),
    s0 AS (
        SELECT ent.qid, ent.id, list_cosine_similarity(q.qv, v.vec) AS s
        FROM ent JOIN q ON q.qid = ent.qid JOIN v ON v.id = ent.id
    ),
    b0 AS (
        SELECT qid, id, s FROM (
            SELECT s0.*, row_number() OVER (
                PARTITION BY qid ORDER BY s DESC, id) AS rn
            FROM s0
        ) WHERE rn <= {GRAPH_BEAM}
    ),
    {",".join(_graph_hop_sql(i).lstrip() for i in range(GRAPH_HOPS))}
    SELECT qid AS query_id, id AS vec_id, round(s, 6) AS score
    FROM (
        SELECT b{GRAPH_HOPS}.*, row_number() OVER (
            PARTITION BY qid ORDER BY s DESC, id) AS rn
        FROM b{GRAPH_HOPS}
    ) WHERE rn <= {KNN_K}
    """,
)
def knn_graph_beam_adaptive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The QUERY-ADAPTIVE entry tier of the graph-ANN walk (r4 verdict
    #4), hash-verified end to end: entries come from the IVF coarse
    quantizer (each query's top-{GRAPH_ENTRY_NPROBE} cells contribute
    their most-central member) instead of a fixed id list — HNSW's
    routing layer re-expressed as two window ranks and a cell join.
    Seeded-centroid convention (cells = embeddings of the {ANN_IVF_NLIST}
    smallest vec_ids, the ann_ivf_knn technique) makes the entry
    derivation SQL-replayable; the walk itself is the same unrolled
    beam oracle as knn_graph_beam. Probe cost unchanged
    (entries + hops·beam·degree, corpus-size-independent); what moves
    is WHERE the walk starts — inside the query's own neighborhood
    (measured in ANN_FRONTIER.md: >= recall at <= rows scored vs the
    fixed-entry row at equal beam/hops)."""
    from ..index.ann import IVFIndex
    from ..index.graph_ann import beam_search, ivf_entry_points

    emb = load_embeddings(spark, sf_dir)
    seed_rows = (
        emb.filter(F.col("vec_id") < ANN_IVF_NLIST)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    cents = [[float(x) for x in r["embedding"]] for r in seed_rows]
    ivf = IVFIndex(
        emb, key="vec_id", vector_col="embedding",
        nlist=ANN_IVF_NLIST, replication=1, centroids=cents,
    )
    graph = _shared_exact_graph(spark, sf_dir, GRAPH_DEGREE)
    queries = emb.filter(F.col("vec_id") < GRAPH_NQ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    entries = ivf_entry_points(
        ivf, queries, "vec_id", nprobe=GRAPH_ENTRY_NPROBE, per_cell=1
    )
    res = beam_search(
        graph, emb, queries, "vec_id", "embedding",
        k=KNN_K, beam=GRAPH_BEAM, hops=GRAPH_HOPS, entries=entries,
    )
    return res.select(
        "query_id", "vec_id", F.round("score", 6).alias("score")
    )


ANN_RECALL_NQ = 20    # recall audited over query vectors vec_id < 20
ANN_RECALL_REPL = 2   # SPANN-style boundary replication of the corpus


@register(
    "ann_recall_report",
    oracle=f"""
    WITH cents AS (
        SELECT vec_id AS cell, embedding::DOUBLE[] AS cv
        FROM embeddings WHERE vec_id < {ANN_IVF_NLIST}
    ),
    q AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        FROM embeddings WHERE vec_id < {ANN_RECALL_NQ}
    ),
    assign AS (
        SELECT vec_id, cell FROM (
            SELECT e.vec_id, c.cell,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY list_inner_product(e.embedding::DOUBLE[],
                                                   c.cv) DESC, c.cell) AS rn
            FROM embeddings e CROSS JOIN cents c)
        WHERE rn <= {ANN_RECALL_REPL}
    ),
    probes AS (
        SELECT query_id, cell FROM (
            SELECT q.query_id, c.cell,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY list_inner_product(q.qv, c.cv) DESC,
                                c.cell) AS rn
            FROM q CROSS JOIN cents c)
        WHERE rn <= {ANN_IVF_NPROBE}
    ),
    cand AS (
        SELECT DISTINCT p.query_id, a.vec_id
        FROM probes p JOIN assign a ON a.cell = p.cell
    ),
    approx AS (
        SELECT query_id, vec_id FROM (
            SELECT c.query_id, c.vec_id,
                   row_number() OVER (
                       PARTITION BY c.query_id
                       ORDER BY list_cosine_similarity(
                           e.embedding::DOUBLE[], q.qv) DESC,
                                c.vec_id) AS rn
            FROM cand c
            JOIN embeddings e ON e.vec_id = c.vec_id
            JOIN q ON q.query_id = c.query_id)
        WHERE rn <= {KNN_K}
    ),
    exact AS (
        SELECT query_id, vec_id FROM (
            SELECT q.query_id, e.vec_id,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY list_cosine_similarity(
                           e.embedding::DOUBLE[], q.qv) DESC,
                                e.vec_id) AS rn
            FROM embeddings e CROSS JOIN q)
        WHERE rn <= {KNN_K}
    )
    SELECT q.query_id,
           CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
           CAST((coalesce(h.hits, 0) * 1000000) // {KNN_K} AS BIGINT)
               AS recall_micro
    FROM q
    LEFT JOIN (
        SELECT x.query_id, count(*) AS hits
        FROM exact x JOIN approx a USING (query_id, vec_id)
        GROUP BY x.query_id) h ON h.query_id = q.query_id
    """,
)
def ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible ANN quality audit: per-query recall@5 of the IVF
    tier (nprobe=4 of nlist=8, corpus boundary-replicated ×2) against
    the exact kNN join, over 20 query vectors — the quantity a real
    deployment monitors for quantizer drift. Hash-verified end to end:
    the quantizer is the SEEDED tier (cells = embeddings of the nlist
    smallest vec_ids, the ``ann_ivf_knn``/``ivf_adc_topk`` convention),
    so assignment, boundary replication, probe selection, the candidate
    equi-join, both top-k windows, AND the measured recall itself all
    replay in plain SQL — the audit measures REAL pruning loss (queries
    below full recall stay in the output as non-1.0 rows, every query
    always present via the left join). The trained-KMeans production
    quantizer keeps its own recall pin in pytest (mean ≥ 0.9). Both
    sides are distributed plans: exact = broadcast-query kNN join,
    approx = shared-quantizer cell equi-join
    (operators.bitext._topk_ivf — the same machinery bitext mining
    uses, exercised here as a batch ANN join)."""
    from ..operators.bitext import _topk_ivf

    emb = load(spark, sf_dir, "embeddings")
    seed_rows = (
        emb.filter(F.col("vec_id") < ANN_IVF_NLIST)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    cents = [[float(x) for x in r["embedding"]] for r in seed_rows]
    queries = emb.filter(F.col("vec_id") < ANN_RECALL_NQ)
    idx = VectorIndex(emb, key="vec_id", vector_col="embedding")
    exact = idx.search_batch(
        queries.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        ),
        k=KNN_K,
    ).select("query_id", F.col("vec_id").alias("nb"))
    approx = _topk_ivf(
        queries, emb, "vec_id", "embedding", k=KNN_K,
        nlist=ANN_IVF_NLIST, nprobe=ANN_IVF_NPROBE,
        replication=ANN_RECALL_REPL, centroids=cents,
    ).select(F.col("id_a").alias("query_id"), F.col("id_b").alias("nb"))
    hits = (
        exact.join(approx, ["query_id", "nb"], "left_semi")
        .groupBy("query_id")
        .agg(F.count("*").alias("hits"))
    )
    return (
        queries.select(F.col("vec_id").alias("query_id"))
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("hits", F.lit(0)).cast("long").alias("hits"),
            F.expr(f"(coalesce(hits, 0) * 1000000) div {KNN_K}")
            .cast("long")
            .alias("recall_micro"),
        )
    )


BITEXT_K = 4
BITEXT_MARGIN = 1.0


@register(
    "bitext_mine_margin",
    oracle=f"""
    WITH a AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE label = 0),
    b AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE label = 1),
    ab AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               list_cosine_similarity(a.v, b.v) AS cos,
               row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY list_cosine_similarity(a.v, b.v) DESC, b.vec_id)
                   AS rn
        FROM a, b
    ),
    abk AS (SELECT * FROM ab WHERE rn <= {BITEXT_K}),
    ba AS (
        SELECT b.vec_id AS id_b, a.vec_id AS id_a,
               list_cosine_similarity(a.v, b.v) AS cos,
               row_number() OVER (PARTITION BY b.vec_id
                   ORDER BY list_cosine_similarity(a.v, b.v) DESC, a.vec_id)
                   AS rn
        FROM a, b
    ),
    bak AS (SELECT * FROM ba WHERE rn <= {BITEXT_K}),
    ma AS (SELECT id_a, avg(cos) AS m FROM abk GROUP BY 1),
    mb AS (SELECT id_b, avg(cos) AS m FROM bak GROUP BY 1),
    mg AS (
        SELECT k.id_a, k.id_b, k.cos / (0.5 * (ma.m + mb.m)) AS margin
        FROM abk k JOIN ma USING (id_a) JOIN mb USING (id_b)
    ),
    best AS (
        SELECT *, row_number() OVER (PARTITION BY id_a
                      ORDER BY margin DESC, id_b) AS rn
        FROM mg
    )
    SELECT id_a, id_b, round(margin, 6) AS margin
    FROM best WHERE rn = 1 AND margin > {BITEXT_MARGIN}
    """,
)
def bitext_mine_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-criterion parallel-pair mining (Artetxe & Schwenk; the
    CCMatrix/LASER bitext recipe) between the label-0 and label-1
    embedding sets: best hubness-normalized partner per query vector
    above the margin threshold. Exact tier here (it is the oracle); at
    corpus scale pass ``strategy='ivf'`` to route both directions
    through the shared-quantizer cell equi-join (wired + pytest-pinned:
    full-probe ivf ≡ exact, plan has no corpus broadcast). See
    operators.bitext."""
    from ..operators import bitext

    emb = load_embeddings(spark, sf_dir)
    a = emb.filter(F.col("label") == 0)
    b = emb.filter(F.col("label") == 1)
    res = bitext.mine_parallel_pairs(
        a, b, "vec_id", "embedding", k=BITEXT_K,
        margin_threshold=BITEXT_MARGIN,
    )
    return res.select("id_a", "id_b", F.round("margin", 6).alias("margin"))


@register(
    "ann_ivf_exhaustive",
    oracle=f"""
    WITH q AS (
        SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = {KNN_QUERY_ID}
    )
    SELECT e.vec_id,
           round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) AS score
    FROM embeddings e, q
    ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qv) DESC, e.vec_id
    LIMIT {KNN_K}
    """,
)
def ann_ivf_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF probed exhaustively (nprobe = nlist) must reproduce exact
    top-k — the lossless-partitioning property of the inverted file:
    every vector is reachable through its assigned cell(s) and the
    boundary-replication dedup drops only true duplicates. This gives
    the ANN machinery (quantizer → assignment → probe → dedup → top-k) a
    hash-verified driver row, complementing the approximate nprobe<nlist
    query whose output is recall-pinned in pytest instead."""
    from ..index.ann import IVFIndex

    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == KNN_QUERY_ID).collect()[0]["embedding"]
    ivf = IVFIndex(emb, nlist=8, max_iter=8)
    return ivf.search(q, k=KNN_K, nprobe=8).select(
        "vec_id", F.round("score", 6).alias("score")
    )


# Dup-grade threshold for the LSH row: sign-LSH precision is usable in
# the near-duplicate regime (cos >= 0.8), not the similarity-JOIN regime
# (the exact pair row's 0.4) — the round-4 sf1 smoke measured ~25M
# candidates for ~50k true pairs at 0.4. The fixture corpus has no
# natural pairs above 0.8, so the row plants deterministic near-dup
# twins: for every vec_id % 10 == 0 (with a successor row), a twin at
# id+1_000_000 whose vector is 0.9*v + 0.1*v_next — pure double
# arithmetic both engines compute bitwise-identically from the parquet
# values, giving cos(twin, original) ≈ 0.99. Twin count scales with the
# corpus, so the row stays meaningful at every sf.
LSH_DUP_THRESHOLD = 0.8
_LSH_TWIN_OFFSET = 1_000_000
_LSH_MAX_BAND_BITS = 12  # SQL ladder cap: matches the operator's
# auto-derived band_bits for every corpus up to 64 * 2**12 = 262,144
# rows (the operator clamps at 20; tests pin formula equality below
# the ladder cap). 144 = 12**2 hyperplanes cover every num_bits the
# ladder can request, and because numpy fills standard_normal((n, d))
# row-major from one PCG64 stream, the first k**2 rows of the 144-row
# draw ARE the (k**2, d) draw the operator generates (pytest-pinned).


def _lsh_oracle_sql() -> str:
    """Restate the AUTO-SIZED CosineLSHIndex (num_bits/band_bits=None,
    seed=42) in SQL, including the sizing rule itself:

    - ``band_bits = least(12, greatest(4, ceil(log2(n / 64))))`` derived
      from ``count(*)`` of the twin-augmented corpus — the same ~64-row
      target-bucket rule as ``CosineLSHIndex.__init__`` (index/ann.py),
      so the committed registry row inherits the operator's linear
      candidate cost instead of a fixed banding that goes quadratic
      (the round-4 sf1 smoke measured pinned 16/4 at 31.6x for 10x data).
    - ``bands = band_bits``; bit i = sign(v · plane_i) with the SAME
      seeded gaussian hyperplanes (repr round-trips the float64s; both
      engines parse decimal literals to nearest double). All 144 ladder
      bits are computed and band b slices bits[b*bb+1 .. b*bb+bb] — the
      slice of the 144-row plane matrix equals the operator's own
      (bb², dim) draw because numpy fills the matrix from one stream.
    - Band keys here are the sliced bit LISTS (DuckDB joins on list
      equality); the operator folds the same bits into integers — the
      fold is injective, so bucket membership (hence the candidate set)
      is identical.
    - Candidates carry bare ids; vectors are fetched back for the
      survivor verify only (the same round-4 slimming the operator got).
    """
    import numpy as np

    nb = _LSH_MAX_BAND_BITS * _LSH_MAX_BAND_BITS
    planes = np.random.default_rng(42).standard_normal((nb, 64))
    bits = ",\n            ".join(
        "(CASE WHEN list_dot_product(v, ["
        + ", ".join(repr(float(x)) for x in p)
        + "]) > 0 THEN 1 ELSE 0 END)"
        for p in planes
    )
    return f"""
    WITH base AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    twin AS (
        SELECT a.vec_id + {_LSH_TWIN_OFFSET} AS vec_id,
               list_transform(range(1, 65), i -> 0.9*a.v[i] + 0.1*b.v[i]) AS v
        FROM base a JOIN base b ON b.vec_id = a.vec_id + 1
        WHERE a.vec_id % 10 = 0
    ),
    corpus AS (SELECT * FROM base UNION ALL SELECT * FROM twin),
    params AS (
        SELECT least({_LSH_MAX_BAND_BITS}, greatest(4,
                   CAST(ceil(log2(greatest(count(*), 2) / 64.0)) AS INT)))
               AS bb
        FROM corpus
    ),
    bitted AS (
        SELECT vec_id, [
            {bits}
        ] AS bits FROM corpus
    ),
    bexp AS (
        SELECT vec_id, g.i AS band,
               list_slice(bits, g.i * bb + 1, g.i * bb + bb) AS bh
        FROM bitted, params,
             (SELECT unnest(range({_LSH_MAX_BAND_BITS})) AS i) g
        WHERE g.i < bb
    ),
    cand AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        FROM bexp a JOIN bexp b
          ON a.band = b.band AND a.bh = b.bh AND a.vec_id < b.vec_id
    )
    SELECT c.id_a, c.id_b,
           round(list_cosine_similarity(fa.v, fb.v), 6) AS cos
    FROM cand c
    JOIN corpus fa ON fa.vec_id = c.id_a
    JOIN corpus fb ON fb.vec_id = c.id_b
    WHERE list_cosine_similarity(fa.v, fb.v) >= {LSH_DUP_THRESHOLD}
    """


@register("cosine_lsh_near_dup", oracle=_lsh_oracle_sql())
def cosine_lsh_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 scale path: sign-LSH candidates + exact cosine verify (subset
    of the exact pair operator by construction), committed at the
    operator's AUTO-SIZED banding — the sizing rule (~64-row target
    buckets, bands = band_bits) is a deterministic function of the
    corpus count, so the oracle replays it from ``count(*)`` and the
    committed configuration is the one that survives 10x data (the
    round-4 pinned 16/4 banding measured 31.6x time at 10x; auto-sizing
    measured ~linear). Dup-grade threshold + planted twin pairs: see
    LSH_DUP_THRESHOLD above. Hash-verified end to end: planes, sizing,
    banding, candidate set and verify all replay in SQL."""
    from ..index.ann import CosineLSHIndex

    emb = load_embeddings(spark, sf_dir)
    base = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    nxt = base.select(
        (F.col("vec_id") - 1).alias("vec_id"),
        F.col("embedding").alias("__next"),
    )
    twins = (
        base.join(nxt, "vec_id")
        .filter(F.col("vec_id") % 10 == 0)
        .select(
            (F.col("vec_id") + F.lit(_LSH_TWIN_OFFSET)).alias("vec_id"),
            F.zip_with(
                "embedding",
                "__next",
                lambda x, y: F.lit(0.9) * x + F.lit(0.1) * y,
            ).alias("embedding"),
        )
    )
    # The index reads the corpus several times (the sizing count, the
    # dim probe, both sides of the banded self-join, and the survivor
    # vector fetch) — materialize the twin-augmented corpus ONCE so the
    # join that builds it isn't re-executed per consumer. At 100 TB
    # this is "write the augmented table, then index it".
    corpus = base.unionByName(twins).localCheckpoint(eager=True)
    # Ladder-coverage guard (round-5 advice): the SQL oracle's band_bits
    # ladder stops at _LSH_MAX_BAND_BITS while the operator's auto-sizer
    # clamps at 20 — above 64 * 2**12 corpus rows (twins included) the
    # two would diverge BY CONSTRUCTION and the driver would report a
    # bare hash mismatch. Surface the real condition instead; the
    # operator itself has no such ceiling.
    n_corpus = corpus.count()
    if n_corpus > 64 * 2**_LSH_MAX_BAND_BITS:
        raise ValueError(
            f"cosine_lsh_near_dup: corpus of {n_corpus} rows exceeds the "
            f"committed oracle's band_bits ladder (cap {_LSH_MAX_BAND_BITS} "
            f"= {64 * 2**_LSH_MAX_BAND_BITS} rows); extend "
            "_LSH_MAX_BAND_BITS (and its plane ladder) to replay larger "
            "corpora — the OPERATOR's auto-sizing clamps at 20 and is "
            "unaffected"
        )
    # r10: the ladder guard above already counted the checkpointed
    # corpus — pass it through so the index skips a duplicate sizing
    # count, and pin dim=64 (the committed oracle hard-codes 64-dim
    # planes) so the dim probe action is skipped too. Formula and
    # banding unchanged — same count, same planes.
    lsh = CosineLSHIndex(
        corpus, key="vec_id", vector_col="embedding",
        dim=64, n_rows=n_corpus,
    )
    res = lsh.similarity_self_join(LSH_DUP_THRESHOLD)
    return res.select("id_a", "id_b", F.round("cos", 6).alias("cos"))


@register(
    "minhash_near_dedup",
    oracle=f"""
    WITH RECURSIVE w AS (
        SELECT doc_id, list_filter(string_split(text,' '), t -> t <> '') AS ws
        FROM documents
    ),
    s AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   range(1, greatest(len(ws) - 2, 1) + 1),
                   i -> array_to_string(
                       list_filter([ws[i], ws[i+1], ws[i+2]], x -> x IS NOT NULL), ' ')
               )) AS sh
        FROM w
    ),
    p AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM s a JOIN s b ON a.doc_id < b.doc_id
        WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
                / len(list_distinct(list_concat(a.sh, b.sh)))
              >= {JACCARD_THRESHOLD}
    ),
    e AS (SELECT id_a AS u, id_b AS v FROM p
          UNION SELECT id_b, id_a FROM p),
    reach(u, v) AS (
        SELECT u, v FROM e
        UNION
        SELECT e.u, reach.v FROM e JOIN reach ON reach.u = e.v
    )
    SELECT u AS id, min(v) AS rep_id
    FROM reach GROUP BY u HAVING min(v) < u
    """,
)
def minhash_near_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5: MinHash-LSH near-dedup with connected-component representatives
    (pytest asserts it recovers exactly the exact-Jaccard pairs here).

    Oracle: DuckDB recursive-CTE transitive closure over the exact
    trigram-shingle Jaccard pair set (same shingle SQL as
    near_dup_pairs_jaccard), rep = component min. LSH recall is 1.0 at
    fixture scale with 32 hashes / 16 bands (pytest-pinned), so the
    banded path must coincide with the exact closure — the driver now
    hash-checks the full (id, rep_id) labeling."""
    docs = load_docs(spark, sf_dir)
    labels = dedup.near_dedup_minhash(
        docs, "doc_id", "text", n=3, threshold=JACCARD_THRESHOLD,
        num_hashes=32, bands=16,
    )
    return labels.filter(F.col("id") != F.col("rep_id")).orderBy("id")


RECURSIVE_REACH_DEPTH = 4


@register(
    "dup_reach_recursive",
    oracle=f"""
    WITH RECURSIVE w AS (
        SELECT doc_id, list_filter(string_split(text,' '), t -> t <> '') AS ws
        FROM documents
    ),
    s AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   range(1, greatest(len(ws) - 2, 1) + 1),
                   i -> array_to_string(
                       list_filter([ws[i], ws[i+1], ws[i+2]], x -> x IS NOT NULL), ' ')
               )) AS sh
        FROM w
    ),
    p AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM s a JOIN s b ON a.doc_id < b.doc_id
        WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
                / len(list_distinct(list_concat(a.sh, b.sh)))
              >= {JACCARD_THRESHOLD}
    ),
    e AS (SELECT id_a AS u, id_b AS v FROM p
          UNION ALL SELECT id_b, id_a FROM p),
    reach(u, v, lvl) AS (
        SELECT u, v, 1 FROM e
        UNION ALL
        SELECT e.u, reach.v, reach.lvl + 1
        FROM e JOIN reach ON reach.u = e.v
        WHERE reach.lvl < {RECURSIVE_REACH_DEPTH}
    )
    SELECT u AS id, min(v) AS rep_id
    FROM (SELECT DISTINCT u, v FROM reach)
    GROUP BY u HAVING min(v) < u
    """,
)
def dup_reach_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 RECURSIVE CTE over the exact-Jaccard dup graph:
    depth-bounded reachability (UNION ALL + level guard — Spark's
    recursive CTEs don't support the deduplicating UNION, so an
    unbounded cyclic closure would not terminate) with a DISTINCT
    collapse, rep = min reachable id. Equals the full connected-component
    closure whenever component diameter ≤ 4
    (pytest-pinned against near_dedup_minhash at fixture scale) — the
    declarative counterpart of the operator family's iterative label
    propagation. Both engines run the same bounded recursion. The pair
    stage routes through the PPJoin prefix tier (lossless — identical
    edge set, Σ df_prefix² candidate cost)."""
    docs = load_docs(spark, sf_dir)
    # materialize-once: the recursive CTE references this view once per
    # recursion level on BOTH union branches, and a lazy view would
    # re-run the whole candidate join each time (measured: minutes at
    # sf0.1 — the smoke's worst re-evaluation multiplier)
    pairs = (
        dedup.near_dup_pairs_jaccard(
            docs, "doc_id", "text", n=3, threshold=JACCARD_THRESHOLD,
            prefix_filter=True,
        )
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    view = "dup_pairs_recursive_src"
    pairs.createOrReplaceTempView(view)
    return spark.sql(f"""
    WITH RECURSIVE e AS (
        SELECT id_a AS u, id_b AS v FROM {view}
        UNION ALL SELECT id_b, id_a FROM {view}
    ),
    reach(u, v, lvl) AS (
        SELECT u, v, 1 FROM e
        UNION ALL
        SELECT e.u, reach.v, reach.lvl + 1
        FROM e JOIN reach ON reach.u = e.v
        WHERE reach.lvl < {RECURSIVE_REACH_DEPTH}
    )
    SELECT u AS id, min(v) AS rep_id
    FROM (SELECT DISTINCT u, v FROM reach)
    GROUP BY u HAVING min(v) < u
    """)


@register(
    "simhash_near_dup",
    oracle="""
    WITH w AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), t -> t <> '') AS toks
        FROM documents
    ),
    tok AS (SELECT doc_id, unnest(toks) AS t FROM w),
    bits AS (
        SELECT doc_id, b.b,
               CASE WHEN (instr('0123456789abcdef',
                                substr(md5(t), b.b // 4 + 1, 1)) - 1)
                         & (1 << (b.b % 4)) > 0
                    THEN 1 ELSE -1 END AS vote
        FROM tok, (SELECT unnest(range(64)) AS b) b
    ),
    votes AS (SELECT doc_id, b, sum(vote) AS v FROM bits GROUP BY 1, 2),
    sig AS (
        SELECT w.doc_id,
               CAST(coalesce(sum(CASE WHEN v > 0 THEN
                   CASE WHEN b = 63 THEN -9223372036854775807 - 1
                        ELSE (CAST(1 AS BIGINT) << CAST(b AS INTEGER)) END
                   ELSE 0 END), 0) AS BIGINT) AS sig
        FROM w LEFT JOIN votes ON votes.doc_id = w.doc_id
        GROUP BY 1
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sig, b.sig)) <= 3
    """,
)
def simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs at Hamming ≤ 3 via pigeonhole band joins
    (any pair within distance τ agrees exactly on one of τ+1 bit
    blocks, so candidates come from equi-joins — never a cross join;
    the band trick is LOSSLESS, which is why the oracle may check all
    pairs directly). Hash-verified through the md5 bit-source twin
    (bit b of a token = bit b%4 of hex digit b//4 of md5(token) —
    engine-identical, python-reference-pinned in pytest); the xxhash64
    production tier shares every stage but the token hash."""
    docs = load_docs(spark, sf_dir)
    return dedup.near_dup_pairs_simhash(
        docs, "doc_id", "text", max_hamming=3, hash_fn="md5"
    )


SEMDEDUP_THRESHOLD = 0.95
SEMDEDUP_REACH_DEPTH = 4


def _semdedup_aug(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The semantic-dedup fixture: the embeddings table plus planted
    duplicate-grade copies derived DETERMINISTICALLY from it (the raw
    fixture has no pair above cos 0.52, so without planting the operator
    would only ever prove the trivial all-self labeling). Every vec_id
    divisible by 25 gains an exact copy at id+100000; every vec_id
    divisible by 50 additionally gains a perturbed copy at id+200000
    (first component +0.003 → cos ≈ 0.999996 to its original, far above
    the 0.95 threshold, while the closest non-planted pair sits at 0.513
    — no threshold-flip hazard). Both engines build the identical table:
    float→double casts and the +0.003 are exact IEEE ops."""
    emb = load_embeddings(spark, sf_dir)
    base = emb.select(
        F.col("vec_id").cast("long").alias("id"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    c1 = emb.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 100000).cast("long").alias("id"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    c2 = emb.filter(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + 200000).cast("long").alias("id"),
        F.concat(
            F.array(F.col("embedding")[0].cast("double") + F.lit(0.003)),
            F.slice(F.col("embedding").cast("array<double>"), 2, 1 << 20),
        ).alias("v"),
    )
    return base.unionByName(c1).unionByName(c2)


@register(
    "semantic_dedup",
    oracle=f"""
    WITH RECURSIVE aug AS (
        SELECT CAST(vec_id AS BIGINT) AS id, embedding::DOUBLE[] AS v
        FROM embeddings
        UNION ALL
        SELECT CAST(vec_id + 100000 AS BIGINT), embedding::DOUBLE[]
        FROM embeddings WHERE vec_id % 25 = 0
        UNION ALL
        SELECT CAST(vec_id + 200000 AS BIGINT),
               list_concat([embedding[1]::DOUBLE + 0.003],
                           (embedding::DOUBLE[])[2:])
        FROM embeddings WHERE vec_id % 50 = 0
    ),
    p AS (
        SELECT a.id AS id_a, b.id AS id_b
        FROM aug a JOIN aug b ON a.id < b.id
        WHERE list_cosine_similarity(a.v, b.v) >= {SEMDEDUP_THRESHOLD}
    ),
    e AS (SELECT id_a AS u, id_b AS w FROM p
          UNION ALL SELECT id_b, id_a FROM p),
    reach(u, w, lvl) AS (
        SELECT u, w, 1 FROM e
        UNION ALL
        SELECT e.u, reach.w, reach.lvl + 1
        FROM e JOIN reach ON reach.u = e.w
        WHERE reach.lvl < {SEMDEDUP_REACH_DEPTH}
    ),
    lbl AS (SELECT u, min(w) AS mw FROM (SELECT DISTINCT u, w FROM reach)
            GROUP BY u)
    SELECT a.id, least(a.id, coalesce(l.mw, a.id)) AS rep_id
    FROM aug a LEFT JOIN lbl l ON l.u = a.id
    """,
)
def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) end-to-end with a HARD oracle:
    IVF-cell-scoped candidate pairs → exact cosine verify → connected
    components, on the planted-duplicate fixture (``_semdedup_aug``).
    The oracle is the recursive-CTE component closure over the EXACT
    cosine pair set — equal to the operator's output exactly when the
    IVF candidate pass has recall 1.0 at the duplicate-grade threshold
    (near-identical vectors share cells by construction; replication=2
    covers cell-boundary stragglers — pytest asserts the recall
    separately so a miss here is attributable)."""
    aug = _semdedup_aug(spark, sf_dir)
    return dedup.semantic_dedup(
        aug, "id", "v",
        threshold=SEMDEDUP_THRESHOLD, nlist=16, replication=2,
    )


@register(
    "incremental_refresh",
    oracle="""
    SELECT vec_id, label FROM embeddings
    """,
)
def incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O15/E10: TRIGGERED-style availableNow refresh over a two-slice
    change log; returns the final index. The refreshed index's final
    state must equal the source table itself (the reference's delta-sync
    contract, NMR:278/318) — exactly SQL-expressible, so the driver now
    hash-checks it instead of a rows-only count. Equivalence with full
    rebuild is additionally asserted inside and in pytest."""
    import tempfile

    from ..streaming import IncrementalIndexer

    emb = load(spark, sf_dir, "embeddings")
    with tempfile.TemporaryDirectory() as tmp:
        src = f"{tmp}/changelog"
        indexer = IncrementalIndexer(
            source_dir=src,
            index_dir=f"{tmp}/index",
            checkpoint_dir=f"{tmp}/ckpt",
            key="vec_id",
            schema=emb.schema,
        )
        emb.filter("vec_id < 250").coalesce(1).write.mode("append").parquet(src)
        indexer.refresh(spark)
        emb.filter("vec_id >= 250").coalesce(1).write.mode("append").parquet(src)
        indexer.refresh(spark)
        assert indexer.verify_equivalence(spark)
        final = indexer.current(spark).select("vec_id", "label")
        # localCheckpoint survives the tmpdir delete (cache is evictable and
        # would recompute from the gone path); note blocks live only on
        # executors — on a real cluster, executor loss after the tmpdir
        # delete loses the result, so production would write a table
        final = final.localCheckpoint(eager=True)
        return final


@register(
    "continuous_rollup",
    oracle="""
    SELECT substr(CAST(ts AS VARCHAR), 1, 10) AS day,
           event_type,
           count(*) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(28,6))), 4) AS DOUBLE)
               AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def continuous_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: per-day per-type event
    counts/value-sums maintained incrementally (partials per batch,
    merge-on-read, compaction) over a two-slice append log.

    The maintained rollup's final state ≡ the one-shot daily aggregate —
    the continuous-aggregate contract — and that final state IS
    SQL-expressible, so the driver hash-checks it: decimal partial sums
    are exact (associative), making incremental == one-shot bitwise, and
    the day key is derived tz-free from the window start's raw epoch
    (unix_micros — no session-timezone formatting step). Spark's time
    windows align to the UTC epoch, so `substr(ts, 1, 10)` on the naive
    stored timestamp is the same bucketing."""
    import tempfile

    from ..streaming import ContinuousRollup
    from ..streaming.windows import with_event_time

    ev = with_event_time(load_events(spark, sf_dir)).select(
        "event_time", "event_type", "value"
    )
    mid = ev.select(
        F.expr("percentile(CAST(event_time AS DOUBLE), 0.5)").alias("m")
    ).collect()[0]["m"]
    with tempfile.TemporaryDirectory() as tmp:
        src = f"{tmp}/changelog"
        rollup = ContinuousRollup(
            source_dir=src,
            rollup_dir=f"{tmp}/rollup",
            checkpoint_dir=f"{tmp}/ckpt",
            schema=ev.schema,
        )
        ev.filter(F.col("event_time").cast("double") < mid).coalesce(
            1
        ).write.mode("append").parquet(src)
        rollup.refresh(spark)
        ev.filter(F.col("event_time").cast("double") >= mid).coalesce(
            1
        ).write.mode("append").parquet(src)
        rollup.refresh(spark)
        rollup.compact(spark)
        assert rollup.verify_equivalence(spark)
        day = F.date_from_unix_date(
            F.expr("unix_micros(window_start) div 86400000000").cast("int")
        ).cast("string")
        final = rollup.current(spark).select(
            day.alias("day"),
            "event_type",
            "n_events",
            F.col("sum_value").cast("double").alias("sum_value"),
        ).withColumn("sum_value", F.round("sum_value", 4))
        # localCheckpoint survives the tmpdir delete (cache is evictable and
        # would recompute from the gone path); note blocks live only on
        # executors — on a real cluster, executor loss after the tmpdir
        # delete loses the result, so production would write a table
        final = final.localCheckpoint(eager=True)
        return final


@register(
    "image_pipeline",
    oracle="""
    WITH sel AS (SELECT doc_id, text FROM documents WHERE doc_id < 20),
    f AS (
        SELECT 'img_' || lpad(CAST(doc_id AS VARCHAR), 4, '0') || '.jpg'
                   AS filename,
               4 + octet_length(encode(text)) AS n_bytes
        FROM sel
    )
    SELECT CAST(row_number() OVER (ORDER BY filename) - 1 AS INTEGER)
               AS image_id,
           filename,
           CAST(n_bytes AS BIGINT) AS n_bytes,
           CAST(32 AS INTEGER) AS dim,
           CAST(1.0 AS DOUBLE) AS norm
    FROM f
    """,
)
def image_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5–O12 end to end: binary ingest (glob-pruned scan, path cleanup) →
    distributed stub embedding → index → self-query. The fixture dir is
    derived deterministically from the documents table.

    Everything deterministic about the pipeline is oracle-checked: ids
    (path-ordered row_number), filenames, payload byte counts from the
    binaryFile scan, embedding dim, and unit L2 norm (NMR:209 semantics).
    The self-query step runs inside and asserts the exact-search identity
    property (querying with image 0's own vector returns image 0 at
    rank 1, cos=1) — its scores are stub-specific, so they stay out of
    the oracle-compared output."""
    import os
    import tempfile

    from ..embed import StubImageEncoder, embed_column
    from ..embed.udf import assign_ids
    from ..functions.vector import l2_norm
    from ..sources import ingest_binary_dir

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    payloads = [
        (r["doc_id"], b"\xff\xd8\xff\xe0" + r["text"].encode("utf-8"))
        for r in docs.collect()
    ]
    with tempfile.TemporaryDirectory() as tmp:
        for i, payload in payloads:
            with open(os.path.join(tmp, f"img_{i:04d}.jpg"), "wb") as f:
                f.write(payload)
        images = ingest_binary_dir(spark, tmp, glob="*.jpg")
        emb = embed_column(
            images, "content", lambda: StubImageEncoder(dim=32), drop_failed=True
        )
        emb = assign_ids(emb, "image_id", order_by="path").select(
            "image_id",
            F.element_at(F.split("path", "/"), -1).alias("filename"),
            F.col("length").alias("n_bytes"),
            "embedding",
        )
        idx = VectorIndex(emb, key="image_id", vector_col="embedding", dim=32)
        target = emb.filter(F.col("image_id") == 0).collect()[0]["embedding"]
        top = idx.search(target, k=1).collect()[0]
        assert top["image_id"] == 0 and round(top["score"], 6) == 1.0
        res = emb.select(
            "image_id",
            "filename",
            "n_bytes",
            F.size("embedding").alias("dim"),
            F.round(l2_norm("embedding"), 4).cast("double").alias("norm"),
        )
        res = res.localCheckpoint(eager=True)  # truncate lineage: cache is evictable
        return res


# --------------------------------------------------------------------- #


GRAPH_APPEND_SPLIT = 400  # old corpus = vec_id < split; append the rest


@register(
    "knn_graph_append",
    oracle=f"""
    WITH v AS (
        SELECT vec_id AS id, embedding::DOUBLE[] AS vec FROM embeddings
    ),
    e0 AS (
        SELECT a.id AS src, b.id AS dst,
               row_number() OVER (
                   PARTITION BY a.id
                   ORDER BY list_cosine_similarity(a.vec, b.vec) DESC,
                            b.id) AS rn
        FROM v a JOIN v b ON a.id <> b.id
    )
    SELECT src, dst FROM e0 WHERE rn <= {GRAPH_DEGREE}
    """,
)
def knn_graph_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E90: incremental kNN-graph maintenance — the graph-tier
    delta-sync (NMR:278's change feed driving NMR:315-323's TRIGGERED
    refresh, the contract IVFIndex.append already carries for the cell
    tier). Build the exact graph on the first {400} vectors, APPEND the
    remainder without a rebuild: candidates are only
    old-edges ∪ (old × new) ∪ (new × all) — a stored node's
    top-degree list can only change where a NEW vector enters it, so
    the append provably equals the full-corpus exact graph, which is
    exactly what the oracle computes. The old × old work is never
    repeated; at corpus scale ``strategy='ivf'`` restricts both
    products to shared-quantizer cell mates (pytest-pinned) so an
    append touches ~|new|·replication rows of the stored corpus."""
    from ..index.graph_ann import append_knn_graph, build_knn_graph

    emb = load_embeddings(spark, sf_dir)
    old = emb.filter(F.col("vec_id") < GRAPH_APPEND_SPLIT)
    new = emb.filter(F.col("vec_id") >= GRAPH_APPEND_SPLIT)
    # r9: no eager checkpoint of the stored graph — the matmul-tier
    # append references it exactly once (the stored-edge re-score), so
    # the build folds into the append's single lazy plan instead of
    # paying a separate driver action + materialization
    g_old = build_knn_graph(
        old, "vec_id", "embedding", degree=GRAPH_DEGREE
    )
    return append_knn_graph(
        g_old, old, new, "vec_id", "embedding", degree=GRAPH_DEGREE
    )


# --------------------------------------------------------------------- #

GRAPH_UPD_CAP = 600  # oracle-tier corpus cap (the replay is quadratic)
GRAPH_UPD_LO = 380  # ids [LO, SPLIT) are re-delivered with NEW vectors
GRAPH_UPD_SPLIT = 400  # old corpus = id < SPLIT; inserts = the rest


@register(
    "knn_graph_update",
    oracle=f"""
    WITH raw AS (
        SELECT vec_id AS id, embedding::DOUBLE[] AS vec FROM embeddings
        WHERE vec_id < {GRAPH_UPD_CAP}
    ),
    eff AS (  -- post-update corpus: updated ids rotate their vector
        SELECT id,
               CASE WHEN id >= {GRAPH_UPD_LO} AND id < {GRAPH_UPD_SPLIT}
                    THEN vec[2:64] || vec[1:1] ELSE vec END AS vec
        FROM raw
    ),
    gold AS (  -- stored graph: exact kNN over the PRE-update old corpus
        SELECT src, dst FROM (
            SELECT a.id AS src, b.id AS dst,
                   row_number() OVER (PARTITION BY a.id
                       ORDER BY list_cosine_similarity(a.vec, b.vec) DESC,
                                b.id) AS rn
            FROM raw a JOIN raw b ON a.id <> b.id
            WHERE a.id < {GRAPH_UPD_SPLIT} AND b.id < {GRAPH_UPD_SPLIT}
        ) WHERE rn <= {GRAPH_DEGREE}
    ),
    ids AS (SELECT id FROM raw),
    cand AS (  -- append candidates: gold ∪ (old × new) ∪ (new × all)
        SELECT src, dst FROM gold
        UNION
        SELECT o.id, n.id FROM ids o, ids n
        WHERE o.id < {GRAPH_UPD_LO} AND n.id >= {GRAPH_UPD_LO}
        UNION
        SELECT n.id, a.id FROM ids n, ids a
        WHERE n.id >= {GRAPH_UPD_LO} AND n.id <> a.id
    ),
    gapp AS (  -- re-scored on CURRENT vectors, per-src top-degree
        SELECT src, dst FROM (
            SELECT c.src, c.dst,
                   row_number() OVER (PARTITION BY c.src
                       ORDER BY list_cosine_similarity(s.vec, d.vec) DESC,
                                c.dst) AS rn
            FROM cand c
            JOIN eff s ON s.id = c.src
            JOIN eff d ON d.id = c.dst
        ) WHERE rn <= {GRAPH_DEGREE}
    ),
    sym AS (  -- one NN-descent round: symmetrize, 2-hop, re-rank
        SELECT src, dst FROM gapp UNION SELECT dst, src FROM gapp
    ),
    rcand AS (
        SELECT src, dst FROM sym
        UNION
        SELECT a.src, b.dst FROM sym a JOIN sym b ON a.dst = b.src
        WHERE a.src <> b.dst
    ),
    grep AS (
        SELECT src, dst FROM (
            SELECT c.src, c.dst,
                   row_number() OVER (PARTITION BY c.src
                       ORDER BY list_cosine_similarity(s.vec, d.vec) DESC,
                                c.dst) AS rn
            FROM rcand c
            JOIN eff s ON s.id = c.src
            JOIN eff d ON d.id = c.dst
        ) WHERE rn <= {GRAPH_DEGREE}
    ),
    rebuild AS (  -- ground truth: full exact graph of the updated corpus
        SELECT src, dst FROM (
            SELECT a.id AS src, b.id AS dst,
                   row_number() OVER (PARTITION BY a.id
                       ORDER BY list_cosine_similarity(a.vec, b.vec) DESC,
                                b.id) AS rn
            FROM eff a JOIN eff b ON a.id <> b.id
        ) WHERE rn <= {GRAPH_DEGREE}
    )
    SELECT category,
           CAST(count(*) AS BIGINT) AS n_edges,
           CAST(sum(m) AS BIGINT) AS n_match,
           CAST((sum(m) * 1000000) // count(*) AS BIGINT) AS overlap_micro
    FROM (
        SELECT CASE WHEN g.src < {GRAPH_UPD_LO} THEN 'stored'
                    WHEN g.src < {GRAPH_UPD_SPLIT} THEN 'updated'
                    ELSE 'inserted' END AS category,
               CASE WHEN r.src IS NULL THEN 0 ELSE 1 END AS m
        FROM grep g
        LEFT JOIN rebuild r ON r.src = g.src AND r.dst = g.dst
    )
    GROUP BY category
    """,
)
def knn_graph_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E90's UPDATE path (r5 verdict #2), pinned end to end: a change
    batch re-delivers {20} existing ids with NEW vectors (the
    change-feed case, NMR:278) alongside genuine inserts; the stored
    graph takes :func:`append_knn_graph` (new wins on id collision,
    every candidate re-scored on current vectors) and ONE NN-descent
    repair round (:func:`refine_knn_graph` — updates are not exactly
    locally repairable: a changed vector evicted from a stored node's
    list has its replacement outside the local candidate set). Output =
    per-source-category edge agreement of the repaired graph vs a FULL
    REBUILD of the updated corpus (integer micro) — the repair contract
    as a hash row, with the >= 0.99-overlap bound pinned in pytest.
    Every stage (append candidate set, re-score, symmetrized 2-hop,
    re-rank, rebuild) replays in the oracle. Corpus capped at {600}
    ids: the replay is deliberately quadratic (the oracle tier); the
    production build/append path is strategy='ivf', covered by
    ``knn_graph_ivf_recall`` and the append/bound pytests."""
    from ..index.graph_ann import (
        append_knn_graph,
        build_knn_graph,
        refine_knn_graph,
    )

    emb = (
        load_embeddings(spark, sf_dir)
        .filter(F.col("vec_id") < GRAPH_UPD_CAP)
        .select("vec_id", "embedding")
    )
    old = emb.filter(F.col("vec_id") < GRAPH_UPD_SPLIT)
    updated = emb.filter(
        (F.col("vec_id") >= GRAPH_UPD_LO)
        & (F.col("vec_id") < GRAPH_UPD_SPLIT)
    ).select(
        "vec_id",
        F.concat(
            F.slice("embedding", 2, 63), F.slice("embedding", 1, 1)
        ).alias("embedding"),
    )
    inserts = emb.filter(F.col("vec_id") >= GRAPH_UPD_SPLIT)
    new = updated.unionByName(inserts)
    # r9: g_old is referenced exactly once by the matmul-tier append
    # (stored-edge re-score), so it stays lazy; `appended` keeps its
    # checkpoint — refine references the edge table multiple times per
    # round (sym, reversed, 2-hop closure). r10 (guide §2.4): refine no
    # longer checkpoints its final round, so the whole row runs in TWO
    # actions — the appended barrier, then ONE job computing refine +
    # rebuild (independent subtrees, scheduled concurrently) + audit —
    # instead of four sequential checkpointed stages.
    g_old = build_knn_graph(
        old, "vec_id", "embedding", degree=GRAPH_DEGREE
    )
    appended = append_knn_graph(
        g_old, old, new, "vec_id", "embedding", degree=GRAPH_DEGREE
    ).localCheckpoint(eager=True)
    effective = old.filter(F.col("vec_id") < GRAPH_UPD_LO).unionByName(new)
    repaired = refine_knn_graph(
        appended, effective, "vec_id", "embedding",
        degree=GRAPH_DEGREE, rounds=1,
    )
    rebuild = build_knn_graph(
        effective, "vec_id", "embedding", degree=GRAPH_DEGREE
    )
    category = (
        F.when(F.col("src") < GRAPH_UPD_LO, "stored")
        .when(F.col("src") < GRAPH_UPD_SPLIT, "updated")
        .otherwise("inserted")
    )
    agg = (
        repaired.join(
            rebuild.withColumn("__m", F.lit(1)), ["src", "dst"], "left"
        )
        .select(
            category.alias("category"),
            F.coalesce("__m", F.lit(0)).alias("__m"),
        )
        .groupBy("category")
        .agg(
            F.count("*").cast("long").alias("n_edges"),
            F.sum("__m").cast("long").alias("n_match"),
        )
    )
    return agg.select(
        "category",
        "n_edges",
        "n_match",
        F.expr("(n_match * 1000000) div n_edges")
        .cast("long")
        .alias("overlap_micro"),
    )


#: The committed full-recall configuration, found by the sf1 frontier
#: sweep (SCALE_SF1.md): the decisive knobs are BUILD quality —
#: replication 8 (nprobe=8 at build), degree 16, one NN-descent round —
#: plus per_cell=2 adaptive entries; b48/h6 reaches 8/8 full recall at
#: 20k vectors (b64/h8 and b64/h8/np16 verified identical). nlist is
#: FIXED at the value verified across sf0.01/0.1/1 (64); a production
#: deployment scales nlist ~ n/target_cell_rows and re-verifies the
#: audit (the row fails loudly, not silently, if recall drops).
GRAPH_IVF_NQ = 8
#: degree 16, not the frontier study's production default of 32
#: (ANN_FRONTIER.md: d16→d32 is +0.05–0.13 recall at every budget on
#: 200k structure-free vectors): THIS row already reaches 8/8 FULL
#: recall at d16 at every verified sf (0.01/0.1/1), so doubling the
#: edge table buys nothing here — scale degree when the audit drops
#: below full recall, which is exactly what this row makes visible.
GRAPH_IVF_DEGREE = 16
GRAPH_IVF_NLIST = 64
GRAPH_IVF_BEAM = 48
GRAPH_IVF_HOPS = 6
GRAPH_IVF_NPROBE = 8

#: Session memo for the one-time ivf graph build (r6 verdict #3 applied
#: to the ivf tier, r6 plan-audit #1): the build (train quantizer,
#: blocked matmul, NN-descent round) dominated the bench suite at ~24 s
#: while the serve side costs ~1 s. Same keying discipline as
#: _EXACT_GRAPH_MEMO — applicationId scopes the localCheckpoint'd
#: tables to their session.
_IVF_GRAPH_MEMO: dict = {}


def _shared_ivf_graph_index(spark: SparkSession, sf_dir: str):
    from ..index.graph_ann import KNNGraphIndex

    key = (
        spark.sparkContext.applicationId, sf_dir,
        GRAPH_IVF_DEGREE, GRAPH_IVF_NLIST, GRAPH_IVF_NPROBE,
    )
    idx = _IVF_GRAPH_MEMO.get(key)
    if idx is None:
        emb = load_embeddings(spark, sf_dir)
        idx = KNNGraphIndex.build(
            emb, "vec_id", "embedding",
            degree=GRAPH_IVF_DEGREE, strategy="ivf",
            nlist=GRAPH_IVF_NLIST, nprobe=GRAPH_IVF_NPROBE, seed=42,
            per_cell=2, refine_rounds=1,
        )
        if len(_IVF_GRAPH_MEMO) >= 4:  # bound driver references
            _IVF_GRAPH_MEMO.clear()
        _IVF_GRAPH_MEMO[key] = idx
    return idx


@register(
    "knn_graph_ivf_recall",
    oracle=f"""
    SELECT vec_id AS query_id,
           CAST({KNN_K} AS BIGINT) AS hits,
           CAST(1000000 AS BIGINT) AS recall_micro
    FROM embeddings WHERE vec_id < {GRAPH_IVF_NQ}
    """,
)
def knn_graph_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION graph tier as a hash row (r5 verdict #5): build
    the kNN graph with the corpus-scale recipe (strategy='ivf' —
    trained quantizer, blocked per-cell matmul, one NN-descent repair
    round), serve an {8}-query panel through the persisted-index
    surface (``KNNGraphIndex`` — quantizer-routed adaptive entries from
    MATERIALIZED reps), and audit beam recall@{5} against the exact
    top-k in integer micro. The expected-if-healthy oracle pattern
    (``brp_lsh_recall`` / ``quantile_sketch_audit``): the committed
    configuration reaches FULL recall deterministically (seeded
    quantizer, (score, id) tie-breaks), so the oracle states the
    healthy expectation — {5}/{5} hits per query — and any build or
    walk regression surfaces as a hash mismatch. This gives the graph
    family an sf1-scalable value row (the exact-build rows' oracles
    are deliberately quadratic and stop at sf0.1). The build is
    session-memoized (``_shared_ivf_graph_index``) — a bench or driver
    run pays it once, every later execution serves from the
    checkpointed index."""
    emb = load_embeddings(spark, sf_dir)
    idx = _shared_ivf_graph_index(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < GRAPH_IVF_NQ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    got = idx.search(
        queries, k=KNN_K, beam=GRAPH_IVF_BEAM, hops=GRAPH_IVF_HOPS,
        nprobe=GRAPH_IVF_NPROBE,
    )
    exact = VectorIndex(
        emb, key="vec_id", vector_col="embedding"
    ).search_batch(queries, k=KNN_K)
    hits = exact.select("query_id", "vec_id").join(
        got.select("query_id", "vec_id"),
        ["query_id", "vec_id"],
        "left_semi",
    )
    return (
        queries.select("query_id")
        .join(
            hits.groupBy("query_id").agg(F.count("*").alias("__h")),
            "query_id",
            "left",
        )
        .select(
            "query_id",
            F.coalesce("__h", F.lit(0)).cast("long").alias("hits"),
        )
        .withColumn(
            "recall_micro",
            F.expr(f"(hits * 1000000) div {KNN_K}").cast("long"),
        )
    )


# --------------------------------------------------------------------- #

GRAPH_DEL_MOD = 37
GRAPH_DEL_RES = 5  # delete ids with vec_id % 37 == 5 (~2.7% of corpus)


@register(
    "knn_graph_delete",
    oracle=f"""
    WITH v AS (
        SELECT vec_id AS id, embedding::DOUBLE[] AS vec FROM embeddings
        WHERE vec_id % {GRAPH_DEL_MOD} <> {GRAPH_DEL_RES}
    ),
    e0 AS (
        SELECT a.id AS src, b.id AS dst,
               row_number() OVER (
                   PARTITION BY a.id
                   ORDER BY list_cosine_similarity(a.vec, b.vec) DESC,
                            b.id) AS rn
        FROM v a JOIN v b ON a.id <> b.id
    )
    SELECT src, dst FROM e0 WHERE rn <= {GRAPH_DEGREE}
    """,
)
def knn_graph_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E92: graph-tier DELETE — the third change-feed operation
    (NMR:278), completing the CDC triad with inserts (knn_graph_append)
    and updates (knn_graph_update). Deletions only REMOVE competitors,
    so a stored source none of whose top-degree neighbors was deleted
    keeps its exact list; only AFFECTED sources (those that lost an
    edge) refill against the remaining corpus. The repaired graph
    therefore provably EQUALS the exact graph of the remaining corpus —
    which is exactly what the oracle computes (the append-identity
    pattern). Repair cost is |affected|·|remaining| with |affected|
    bounded by the deleted batch's in-degree, never a rebuild; the
    stored graph here is the session-shared memoized build (zero extra
    build in a bench run). ``strategy='ivf'`` restricts the refill to
    stored-quantizer cell mates (pytest-pinned via the lifecycle
    class)."""
    from ..index.graph_ann import delete_knn_graph

    emb = load_embeddings(spark, sf_dir)
    g = _shared_exact_graph(spark, sf_dir, GRAPH_DEGREE)
    dele = emb.filter(
        F.col("vec_id") % GRAPH_DEL_MOD == GRAPH_DEL_RES
    ).select("vec_id")
    return delete_knn_graph(
        g, emb, dele, "vec_id", "embedding", degree=GRAPH_DEGREE
    )


GRAPH_IVF_DEL_RES = 11  # delete vec_id % 37 == 11 (keeps queries 0..7)

#: The post-DELETE index is memoized like the builds: a delete is
#: one-time maintenance (the same cost class as the ivf build the r6
#: verdict asked to memoize), so repeat executions in a session serve
#: the audit from the repaired index instead of re-running the refill.
#: The memoized twin is a copy() — the shared build memo stays pristine.
_IVF_DELETED_MEMO: dict = {}


def _shared_deleted_ivf_index(spark: SparkSession, sf_dir: str):
    key = (spark.sparkContext.applicationId, sf_dir, GRAPH_IVF_DEL_RES)
    idx = _IVF_DELETED_MEMO.get(key)
    if idx is None:
        emb = load_embeddings(spark, sf_dir)
        idx = _shared_ivf_graph_index(spark, sf_dir).copy()
        idx.delete(
            emb.filter(
                F.col("vec_id") % GRAPH_DEL_MOD == GRAPH_IVF_DEL_RES
            ).select("vec_id")
        )
        if len(_IVF_DELETED_MEMO) >= 4:
            _IVF_DELETED_MEMO.clear()
        _IVF_DELETED_MEMO[key] = idx
    return idx


@register(
    "knn_graph_ivf_delete_recall",
    oracle=f"""
    SELECT vec_id AS query_id,
           CAST({KNN_K} AS BIGINT) AS hits,
           CAST(1000000 AS BIGINT) AS recall_micro
    FROM embeddings WHERE vec_id < {GRAPH_IVF_NQ}
    """,
)
def knn_graph_ivf_delete_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION delete path as a hash row (r6 verdict #6): the
    exact-tier delete row's oracle is deliberately quadratic and stops
    at sf0.1, so this is the graph CDC triad's sf1-scalable value row.
    Take the session-memoized ivf-built index (the knn_graph_ivf_recall
    build — full-recall config), ``copy()`` it (the memo stays servable
    for other rows), DELETE ~2.7% of the corpus through the persisted
    lifecycle (``strategy='ivf'`` — refill restricted to stored-
    quantizer cell mates at the build's probe width, ADVICE r6:
    ``delete`` now defaults nprobe to the stored replication), then
    serve the 8-query panel and audit recall@{KNN_K} against the exact
    top-k OVER THE REMAINING CORPUS. Expected-if-healthy oracle
    (``knn_graph_ivf_recall`` pattern): the committed config keeps FULL
    recall through the delete (verified sf0.01/0.1/1), so any repair
    regression — missed refill, stale reps, dangling edges — surfaces
    as a hash mismatch. The repaired index is session-memoized
    (``_shared_deleted_ivf_index`` — a delete is one-time maintenance,
    the same cost class as the memoized builds), so bench samples
    measure the serve+audit path."""
    emb = load_embeddings(spark, sf_dir)
    idx = _shared_deleted_ivf_index(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < GRAPH_IVF_NQ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    got = idx.search(
        queries, k=KNN_K, beam=GRAPH_IVF_BEAM, hops=GRAPH_IVF_HOPS,
        nprobe=GRAPH_IVF_NPROBE,
    )
    remaining = emb.filter(
        F.col("vec_id") % GRAPH_DEL_MOD != GRAPH_IVF_DEL_RES
    )
    exact = VectorIndex(
        remaining, key="vec_id", vector_col="embedding"
    ).search_batch(queries, k=KNN_K)
    hits = exact.select("query_id", "vec_id").join(
        got.select("query_id", "vec_id"),
        ["query_id", "vec_id"],
        "left_semi",
    )
    return (
        queries.select("query_id")
        .join(
            hits.groupBy("query_id").agg(F.count("*").alias("__h")),
            "query_id",
            "left",
        )
        .select(
            "query_id",
            F.coalesce("__h", F.lit(0)).cast("long").alias("hits"),
        )
        .withColumn(
            "recall_micro",
            F.expr(f"(hits * 1000000) div {KNN_K}").cast("long"),
        )
    )


# --------------------------------------------------------------------- #

MAXSIM_NQ = 6
MAXSIM_POOL = 16
MAXSIM_NTOK = 8  # 64-dim embedding sliced into 8 tokens x 8 dims


def _maxsim_sql_expr() -> str:
    """The MaxSim sum as a LEFT-ASSOCIATED ``+`` chain of greatest()
    terms — the same evaluation order maxsim_score's sequential outer
    fold uses, so the OUTER float sums are bitwise identical. Caveat
    (ADVICE r6): the INNER token dot is DuckDB ``list_inner_product``
    vs Spark's sequential zip_with/aggregate fold — orderings that can
    differ by an ULP, so a dot landing within an ULP of a greatest()
    tie or of a 6dp rounding boundary could in principle flip the hash
    row. The 8-dim token slices keep the folds short (observed green at
    sf0.01/0.1/1); if the row ever flakes, suspect this seam first and
    widen the rounding margin."""
    terms = []
    for i in range(MAXSIM_NTOK):
        dots = ", ".join(
            f"list_inner_product(q.qtoks[{i + 1}], d.toks[{j + 1}])"
            for j in range(MAXSIM_NTOK)
        )
        terms.append(f"greatest({dots})")
    return " + ".join(terms)


@register(
    "maxsim_rerank",
    oracle=f"""
    WITH v AS (
        SELECT vec_id AS id, embedding::DOUBLE[] AS vec FROM embeddings
    ),
    t AS (
        SELECT id,
               [{", ".join(f"vec[{8 * i + 1}:{8 * i + 8}]" for i in range(MAXSIM_NTOK))}]
                   AS toks,
               vec
        FROM v
    ),
    q AS (
        SELECT id AS qid, toks AS qtoks, vec AS qvec
        FROM t WHERE id < {MAXSIM_NQ}
    ),
    pool AS (
        SELECT qid, id FROM (
            SELECT q.qid, v.id,
                   row_number() OVER (PARTITION BY q.qid
                       ORDER BY list_cosine_similarity(q.qvec, v.vec) DESC,
                                v.id) AS rn
            FROM q CROSS JOIN v
        ) WHERE rn <= {MAXSIM_POOL}
    ),
    scored AS (
        SELECT p.qid, p.id, {_maxsim_sql_expr()} AS ms
        FROM pool p
        JOIN t d ON d.id = p.id
        JOIN q ON q.qid = p.qid
    )
    SELECT qid AS query_id, id AS vec_id, round(ms, 6) AS maxsim
    FROM (
        SELECT scored.*, row_number() OVER (
            PARTITION BY qid ORDER BY ms DESC, id) AS rn
        FROM scored
    ) WHERE rn <= {KNN_K}
    """,
)
def maxsim_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E91: ColBERT-style late-interaction retrieval (Khattab & Zaharia,
    SIGIR'20) as the two-stage architecture it deploys — stage 1 is the
    cheap single-vector kNN (broadcast-query scan, the E2 machinery)
    bounding a {16}-doc pool per query; stage 2 re-scores the pool with
    MaxSim (every query token takes its best-matching document token,
    Σ max q·d) and keeps top-{5}. Rerank cost is
    |pool|·|q_tok|·|d_tok|·dim — independent of corpus size; the MaxSim
    expression is pure nested Catalyst HOFs (zero Python). Token
    vectors are deterministic 8x8 slices of the stored embedding, so
    the WHOLE pipeline — slicing, pool selection, per-token maxima, the
    left-associated float sum — replays in SQL (value-exact after 6dp
    rounding of the irrational scores)."""
    from ..operators.hybrid import maxsim_rerank

    emb = load_embeddings(spark, sf_dir)
    toks = F.array(
        *[F.slice("embedding", 1 + 8 * i, 8) for i in range(MAXSIM_NTOK)]
    )
    corpus_t = emb.select("vec_id", toks.alias("d_toks"))
    queries = emb.filter(F.col("vec_id") < MAXSIM_NQ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        toks.alias("q_toks"),
    )
    idx = VectorIndex(emb, key="vec_id", vector_col="embedding")
    pool = idx.search_batch(
        queries.select("query_id", "query_vec"), k=MAXSIM_POOL
    ).select("query_id", "vec_id")
    cand = pool.join(corpus_t, "vec_id").join(
        F.broadcast(queries.select("query_id", "q_toks")), "query_id"
    )
    res = maxsim_rerank(
        cand, "query_id", "vec_id", "q_toks", "d_toks", k=KNN_K
    )
    return res.select(
        "query_id", "vec_id", F.round("maxsim", 6).alias("maxsim")
    )


@register(
    "mutual_knn_pairs",
    oracle=f"""
    WITH v AS (
        SELECT vec_id AS id, embedding::DOUBLE[] AS vec FROM embeddings
    ),
    e0 AS (
        SELECT a.id AS src, b.id AS dst,
               row_number() OVER (
                   PARTITION BY a.id
                   ORDER BY list_cosine_similarity(a.vec, b.vec) DESC,
                            b.id) AS rn
        FROM v a JOIN v b ON a.id <> b.id
    ),
    g AS (SELECT src, dst FROM e0 WHERE rn <= {GRAPH_DEGREE})
    SELECT a.src AS id_a, a.dst AS id_b
    FROM g a JOIN g b ON b.src = a.dst AND b.dst = a.src
    WHERE a.src < a.dst
    """,
)
def mutual_knn_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E98: mutual (reciprocal) kNN pairs — a IS in b's top-k AND b is
    in a's top-k. The standard reliable-pair filter on top of a kNN
    graph (CCMatrix keeps mutual candidates; image-dedup stacks use
    mutual-NN as the high-precision tier; NN-descent's convergence
    measure is mutual-edge mass): one-directional neighbors are
    hubness-prone, mutual ones rarely are. Spark: ONE self-equi-join of
    the stored edge table on the reversed key — |V|·degree rows joined
    on (src, dst), never the corpus; here the edges come from the
    session-shared memoized exact build (zero extra build in a bench
    run; the production tier is the ivf-built KNNGraphIndex's edges,
    same join). Output is pure integers."""
    from ..index.graph_ann import mutual_pairs

    return mutual_pairs(_shared_exact_graph(spark, sf_dir, GRAPH_DEGREE))


KNNCLS_LO = 100   # eval slice: vec_id in [100, 140) — 40 held-out queries
KNNCLS_HI = 140


@register(
    "knn_label_classify",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
               label AS true_label
        FROM embeddings
        WHERE vec_id >= {KNNCLS_LO} AND vec_id < {KNNCLS_HI}
    ),
    c AS (
        SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings
        WHERE vec_id < {KNNCLS_LO} OR vec_id >= {KNNCLS_HI}
    ),
    nb AS (
        SELECT query_id, true_label, label FROM (
            SELECT q.query_id, q.true_label, c.label,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY list_cosine_similarity(c.v, q.qv) DESC,
                                c.vec_id) AS rn
            FROM q CROSS JOIN c)
        WHERE rn <= {KNN_K}
    ),
    votes AS (
        SELECT query_id, true_label, label, count(*) AS cnt
        FROM nb GROUP BY 1, 2, 3
    ),
    pred AS (
        SELECT query_id, true_label, label AS pred_label FROM (
            SELECT votes.*, row_number() OVER (
                PARTITION BY query_id
                ORDER BY cnt DESC, label) AS rn
            FROM votes)
        WHERE rn = 1
    )
    SELECT query_id,
           CAST(true_label AS BIGINT) AS true_label,
           CAST(pred_label AS BIGINT) AS pred_label,
           CAST(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END
                AS BIGINT) AS correct
    FROM pred
    """,
)
def knn_label_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E99: kNN classification eval — predict each held-out vector's
    label by majority vote of its top-{KNN_K} neighbors in the rest of
    the corpus (the classic similarity-search application, and the
    standard embedding-quality probe: kNN accuracy tracks linear-probe
    accuracy). The eval slice is EXCLUDED from the corpus (no
    self-vote leakage). Spark: the E2 broadcast-query kNN join returns
    (query, neighbor, label); the vote is one tiny groupBy + a single
    argmax aggregate over (count, −label) structs (majority with
    deterministic smaller-label tie-break — no window). Output is pure
    integers: (query_id, true_label, pred_label, correct)."""
    emb = load_embeddings(spark, sf_dir)
    queries = emb.filter(
        (F.col("vec_id") >= KNNCLS_LO) & (F.col("vec_id") < KNNCLS_HI)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("label").cast("long").alias("true_label"),
    )
    corpus = emb.filter(
        (F.col("vec_id") < KNNCLS_LO) | (F.col("vec_id") >= KNNCLS_HI)
    )
    idx = VectorIndex(corpus, key="vec_id", vector_col="embedding")
    nbrs = idx.search_batch(
        queries.select("query_id", "query_vec"), k=KNN_K, columns=["label"]
    )
    pred = (
        nbrs.groupBy("query_id", "label")
        .agg(F.count("*").alias("__cnt"))
        .groupBy("query_id")
        .agg(
            F.max(
                F.struct(
                    F.col("__cnt").alias("c"),
                    (-F.col("label")).alias("nl"),
                )
            ).alias("__best")
        )
        .select(
            "query_id",
            (-F.col("__best.nl")).cast("long").alias("pred_label"),
        )
    )
    return (
        queries.select("query_id", "true_label")
        .join(pred, "query_id")
        .select(
            "query_id",
            "true_label",
            "pred_label",
            F.when(F.col("pred_label") == F.col("true_label"), 1)
            .otherwise(0)
            .cast("long")
            .alias("correct"),
        )
    )


SVS_NQ = 20  # streamed query panel: vec_id < 20, fed in two slices


@register(
    "streaming_vector_search",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        FROM embeddings WHERE vec_id < {SVS_NQ}
    ),
    scored AS (
        SELECT q.query_id, e.vec_id,
               list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS s
        FROM embeddings e CROSS JOIN q
    )
    SELECT query_id, vec_id, round(s, 6) AS score
    FROM (SELECT *, row_number() OVER (
              PARTITION BY query_id ORDER BY s DESC, vec_id) AS rn
          FROM scored)
    WHERE rn <= {KNN_K}
    """,
)
def streaming_vector_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E100: streaming vector search — the ONLINE-SERVING shape of the
    reference's ``get_index`` → ``similarity_search`` loop (NMR:384-388,
    where queries arrive one request at a time): a query STREAM joined
    per micro-batch against the static index. Two query slices fed
    through availableNow file micro-batches; each batch runs the E2
    broadcast-query kNN join (per-batch cost ∝ |batch|·corpus-scan,
    stateless — no watermark needed because the index side is static);
    results append to a sink whose FINAL content must equal the one-shot
    batch kNN join over all queries — which IS the SQL oracle
    (value-exact, the streaming_enrichment discipline). At 100 TB the
    per-batch join is the local_topk plan and the corpus is never
    shuffled; query slices arrive at whatever cadence the trigger
    picks."""
    import tempfile
    import uuid

    from .relational_events import _write_ordered_slices

    emb = load(spark, sf_dir, "embeddings")
    idx = VectorIndex(emb, key="vec_id", vector_col="embedding")
    queries = emb.filter(F.col("vec_id") < SVS_NQ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    with tempfile.TemporaryDirectory() as tmp:
        src = f"{tmp}/query_log"
        out = f"{tmp}/results_{uuid.uuid4().hex[:8]}"
        _write_ordered_slices(
            src,
            [
                queries.filter(F.col("query_id") < SVS_NQ // 2),
                queries.filter(F.col("query_id") >= SVS_NQ // 2),
            ],
        )

        def serve(batch: DataFrame, batch_id: int) -> None:
            idx.search_batch(batch, k=KNN_K).write.mode("append").parquet(
                out
            )

        stream = (
            spark.readStream.schema(queries.schema)
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(src)
        )
        q = (
            stream.writeStream.foreachBatch(serve)
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # localCheckpoint, not cache(): a cached DataFrame is evictable
        # and would recompute from the deleted tmpdir; the checkpoint
        # truncates lineage so eviction can't re-read the gone path.
        # (Blocks are executor-local, not fault-tolerant: on a real
        # cluster an executor loss here loses the result — production
        # would persist to a table instead of a session-scoped tmpdir.)
        final = (
            spark.read.parquet(out)
            .select(
                "query_id", "vec_id", F.round("score", 6).alias("score")
            )
            .localCheckpoint(eager=True)
        )
    return final
