# Auto-split from the former single-file registry (round 4): one
# contiguous, order-preserving slice; every @register call still
# runs in the original order via registry/__init__.py.
from __future__ import annotations  # noqa: F401
from ._core import (  # noqa: F401
    DataFrame,
    F,
    SparkSession,
    T,
    dec,
    load,
    load_docs,
    load_embeddings,
    load_events,
    register,
)
from .knn_vector_dedup import (  # noqa: F401
    KNN_QUERY_ID,
)

# Embedding analytics: per-label centroids (the aggregation half of an
# IVF/k-means build — index/ann.py's coarse quantizer uses exactly this
# shape as its update step)
# --------------------------------------------------------------------- #

@register(
    "embedding_centroids",
    oracle="""
    SELECT label, pos,
           CAST(floor(CAST(sum(CAST(e AS DECIMAL(18,9))) AS DOUBLE)
                      / count(*) * 1000000) AS BIGINT) AS centroid_micro,
           count(*) AS n_vecs
    FROM (SELECT label,
                 unnest(embedding::DOUBLE[]) AS e,
                 CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS pos
          FROM embeddings)
    GROUP BY label, pos
    """,
)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean vector, one row per (label, dimension).

    posexplode turns the n×d corpus into n·d scalar rows; the groupBy is a
    single shuffle keyed on (label, pos) with map-side partial aggregation,
    so shuffle volume is |labels|·d rows per partition regardless of corpus
    size — the shape that survives 100 TB. Decimal sums keep the mean
    add-order-independent (float policy, see module docstring)."""
    emb = load(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "e"),
    )
    return ex.groupBy("label", "pos").agg(
        F.floor(
            F.sum(F.col("e").cast("decimal(18,9)")).cast("double")
            / F.count("*")
            * F.lit(1e6)
        )
        .cast("long")
        .alias("centroid_micro"),
        F.count("*").alias("n_vecs"),
    )


KMEANS_K = 8


@register(
    "kmeans_assign",
    oracle=f"""
    WITH seeds AS (
        SELECT vec_id AS cid, embedding::DOUBLE[] AS sv
        FROM embeddings WHERE vec_id < {KMEANS_K}
    ),
    sims AS (
        SELECT e.vec_id, s.cid,
               list_cosine_similarity(e.embedding::DOUBLE[], s.sv) AS cos
        FROM embeddings e CROSS JOIN seeds s
    ),
    best AS (
        SELECT vec_id, cid, cos,
               row_number() OVER (
                   PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn
        FROM sims
    )
    SELECT cid AS cluster_id, CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(CAST(floor(cos * 1000000) AS BIGINT)) AS BIGINT)
               AS sum_cos_micro,
           min(vec_id) AS min_member, max(vec_id) AS max_member
    FROM best WHERE rn = 1 GROUP BY cid
    """,
)
def kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spherical k-means assignment profile — the clustering step of a
    coverage-balancing curation pipeline (cluster the corpus, then
    sample/weight per cluster). Seeds are the k smallest-id vectors
    (deterministic); assignment is ONE codegen'd argmax-cosine
    expression over centroid literals (map-only, zero shuffle — the
    oracle's |n|·k cross join is exactly what the operator avoids);
    the profile groupBy emits |k| rows in exact integer micro units.
    Full multi-iteration Lloyd (same per-step shapes) is
    operators.cluster.lloyd_iterate, pytest-pinned for convergence."""
    from ..operators import cluster

    emb = load_embeddings(spark, sf_dir)
    seeds = cluster.seed_centroids(emb, "vec_id", "embedding", KMEANS_K)
    assigned = cluster.assign_to_centroids(emb, "vec_id", "embedding", seeds)
    return cluster.cluster_profile(assigned, "vec_id")


CLUSTER_SAMPLE_CAP = 40


@register(
    "cluster_balanced_sample",
    oracle=f"""
    WITH seeds AS (
        SELECT vec_id AS cid, embedding::DOUBLE[] AS sv
        FROM embeddings WHERE vec_id < {KMEANS_K}
    ),
    sims AS (
        SELECT e.vec_id, s.cid,
               list_cosine_similarity(e.embedding::DOUBLE[], s.sv) AS cos
        FROM embeddings e CROSS JOIN seeds s
    ),
    best AS (
        SELECT vec_id, cid,
               row_number() OVER (
                   PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn
        FROM sims
    ),
    assigned AS (SELECT vec_id, cid FROM best WHERE rn = 1),
    ranked AS (
        SELECT vec_id, cid,
               row_number() OVER (
                   PARTITION BY cid
                   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS srn
        FROM assigned
    )
    SELECT cid AS cluster_id,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(CASE WHEN srn <= {CLUSTER_SAMPLE_CAP} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN srn <= {CLUSTER_SAMPLE_CAP} THEN vec_id
                         ELSE 0 END) AS BIGINT) AS kept_id_sum
    FROM ranked GROUP BY cid
    """,
)
def cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coverage-balanced curation: cap every topic cluster at
    40 docs using the auditable md5 sampler, so
    over-crowded clusters (boilerplate concentrates there) shrink while
    rare clusters survive intact. Composition of the map-only k-means
    assignment with a cluster-PARTITIONED rank window (no global sort)
    — both shapes already plan-tested individually. See
    operators.cluster.balanced_sample_summary."""
    from ..operators import cluster

    emb = load_embeddings(spark, sf_dir)
    seeds = cluster.seed_centroids(emb, "vec_id", "embedding", KMEANS_K)
    assigned = cluster.assign_to_centroids(emb, "vec_id", "embedding", seeds)
    return cluster.balanced_sample_summary(
        assigned, "vec_id", CLUSTER_SAMPLE_CAP
    )


PQ_M = 4          # subspaces
PQ_K = 4          # codes per subspace
PQ_SUB = 16       # dims per subspace (64 / PQ_M)


@register(
    "pq_encode_stats",
    oracle=f"""
    WITH seeds AS (
        SELECT vec_id AS code, embedding::DOUBLE[] AS sv
        FROM embeddings WHERE vec_id < {PQ_K}
    ),
    subs AS (SELECT CAST(i AS BIGINT) AS sub FROM range({PQ_M}) t(i)),
    pairs AS (
        SELECT e.vec_id, s.sub, c.code,
               list_distance(
                   (e.embedding::DOUBLE[])[
                       CAST(s.sub * {PQ_SUB} + 1 AS INT):
                       CAST(s.sub * {PQ_SUB} + {PQ_SUB} AS INT)],
                   (c.sv)[
                       CAST(s.sub * {PQ_SUB} + 1 AS INT):
                       CAST(s.sub * {PQ_SUB} + {PQ_SUB} AS INT)]) AS d
        FROM embeddings e CROSS JOIN subs s CROSS JOIN seeds c
    ),
    best AS (
        SELECT vec_id, sub, code, d,
               row_number() OVER (
                   PARTITION BY vec_id, sub ORDER BY d, code) AS rn
        FROM pairs
    )
    SELECT sub, code, CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(CAST(floor(d * 1000000) AS BIGINT)) AS BIGINT)
               AS sum_dist_micro
    FROM best WHERE rn = 1 GROUP BY 1, 2
    """,
)
def pq_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encode + per-(subspace, code) audit — the
    vector-compression layer a native multi-billion-vector index needs
    (m·log2(k) bits per vector instead of d·32). Deterministic seeded
    codebooks (sub-vectors of the {4} smallest-id rows) make the whole
    encode SQL-expressible; the encode itself is a map-only codegen'd
    argmin per subspace (the oracle's double cross join is exactly what
    it avoids), and the profile shuffle is m·k rows regardless of
    corpus size. Production tier trains per-subspace Lloyd on a bounded
    driver sample (index/pq.py::train_codebooks, pytest-pinned)."""
    from ..index import pq

    emb = load_embeddings(spark, sf_dir)
    books = pq.seed_codebooks(
        emb, "vec_id", "embedding", m=PQ_M, k=PQ_K, dim=PQ_M * PQ_SUB
    )
    enc = pq.encode(emb, "vec_id", "embedding", books, dim=PQ_M * PQ_SUB)
    return pq.code_profile(enc)


def _pq_seed_rows(emb: DataFrame, n: int) -> list:
    """ONE bounded driver probe shared by every PQ/IVFADC query: the n
    smallest-id (vec_id, embedding) rows — the query vector, the seeded
    PQ codebook rows, and the seeded coarse centroids are all slices of
    this list, so one collect (one Spark job) replaces three."""
    return (
        emb.filter(F.col("vec_id") < n)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )


def _seed_books_from_rows(rows: list, m: int, sub: int) -> list:
    """seed_codebooks' exact output, built from an already-collected row
    list (same rows: the k smallest ids), avoiding a second driver job."""
    return [
        [
            (int(r["vec_id"]), [float(x) for x in r["embedding"][j * sub : (j + 1) * sub]])
            for r in rows
        ]
        for j in range(m)
    ]


ADC_K = 10         # pq_adc_topk result size
ADC_RECALL_K = 20  # pq_adc_recall pool size

# Shared oracle CTE prefix: seeded codebooks, per-vector best codes, and
# the query-side ADC lookup table — identical distance/floor convention
# to pq_encode_stats (hash-verified), so the integer sums are portable.
_ADC_CTES = f"""
    WITH seeds AS (
        SELECT vec_id AS code, embedding::DOUBLE[] AS sv
        FROM embeddings WHERE vec_id < {PQ_K}
    ),
    subs AS (SELECT CAST(i AS BIGINT) AS sub FROM range({PQ_M}) t(i)),
    q AS (
        SELECT embedding::DOUBLE[] AS qv
        FROM embeddings WHERE vec_id = {KNN_QUERY_ID}
    ),
    pairs AS (
        SELECT e.vec_id, s.sub, c.code,
               list_distance(
                   (e.embedding::DOUBLE[])[
                       CAST(s.sub * {PQ_SUB} + 1 AS INT):
                       CAST(s.sub * {PQ_SUB} + {PQ_SUB} AS INT)],
                   (c.sv)[
                       CAST(s.sub * {PQ_SUB} + 1 AS INT):
                       CAST(s.sub * {PQ_SUB} + {PQ_SUB} AS INT)]) AS d
        FROM embeddings e CROSS JOIN subs s CROSS JOIN seeds c
    ),
    best AS (
        SELECT vec_id, sub, code,
               row_number() OVER (
                   PARTITION BY vec_id, sub ORDER BY d, code) AS rn
        FROM pairs
    ),
    lut AS (
        SELECT s.sub, c.code,
               CAST(floor(1000000 * list_distance(
                   (q.qv)[
                       CAST(s.sub * {PQ_SUB} + 1 AS INT):
                       CAST(s.sub * {PQ_SUB} + {PQ_SUB} AS INT)],
                   (c.sv)[
                       CAST(s.sub * {PQ_SUB} + 1 AS INT):
                       CAST(s.sub * {PQ_SUB} + {PQ_SUB} AS INT)])) AS BIGINT)
                   AS dm
        FROM subs s CROSS JOIN seeds c CROSS JOIN q
    )
"""


@register(
    "pq_adc_topk",
    oracle=f"""
    {_ADC_CTES}
    SELECT b.vec_id, CAST(sum(l.dm) AS BIGINT) AS adc_dist_micro
    FROM best b JOIN lut l ON b.sub = l.sub AND b.code = l.code
    WHERE b.rn = 1
    GROUP BY b.vec_id
    ORDER BY adc_dist_micro, b.vec_id
    LIMIT {ADC_K}
    """,
)
def pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over the PQ-encoded corpus — the
    query path of a FAISS-class compressed index (Jégou et al. §IV.A):
    the corpus is stored as m small codes per vector, the query builds an
    m·k integer lookup table driver-side, and the scan does m array
    lookups per row. Plan: compact-code projection (map-only, fused with
    the scan) → codegen'd element_at sum → TakeOrderedAndProject(k) —
    no shuffle, per-row cost O(m) independent of d. The oracle replays
    the encode + LUT join in SQL; dist convention (per-sub Euclidean,
    micro-floored) is shared with the hash-verified pq_encode_stats."""
    from ..index import pq

    emb = load_embeddings(spark, sf_dir)
    rows = _pq_seed_rows(emb, PQ_K)
    qvec = rows[KNN_QUERY_ID]["embedding"]
    books = _seed_books_from_rows(rows, PQ_M, PQ_SUB)
    enc = pq.encode_compact(
        emb, "vec_id", "embedding", books, dim=PQ_M * PQ_SUB
    )
    res = pq.adc_search(enc, qvec, books, dim=PQ_M * PQ_SUB, k=ADC_K)
    return res.select(F.col("id").alias("vec_id"), "adc_dist_micro")


@register(
    "pq_adc_recall",
    oracle=f"""
    {_ADC_CTES},
    adc AS (
        SELECT b.vec_id
        FROM best b JOIN lut l ON b.sub = l.sub AND b.code = l.code
        WHERE b.rn = 1
        GROUP BY b.vec_id
        ORDER BY CAST(sum(l.dm) AS BIGINT), b.vec_id
        LIMIT {ADC_RECALL_K}
    ),
    exact AS (
        SELECT e.vec_id
        FROM embeddings e CROSS JOIN q
        ORDER BY list_distance(e.embedding::DOUBLE[], q.qv), e.vec_id
        LIMIT {ADC_RECALL_K}
    )
    SELECT CAST({ADC_RECALL_K} AS BIGINT) AS k,
           CAST(count(*) AS BIGINT) AS n_hit,
           round(count(*) / {ADC_RECALL_K}.0, 6) AS recall
    FROM adc JOIN exact USING (vec_id)
    """,
)
def pq_adc_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{20} audit of ADC search against the exact L2 top-k — the
    quality gauge every compressed-index deployment monitors (quantizer
    drift shows up here before it shows up in user metrics). Both sides
    are deterministic (seeded codebooks, id tie-breaks) so the overlap
    count is hash-verifiable. ADC side reads only the compact code
    table; exact side is the scan → TakeOrderedAndProject baseline; the
    final join is k×k rows."""
    from ..index import pq
    from ..functions.vector import l2_dist

    emb = load_embeddings(spark, sf_dir)
    rows = _pq_seed_rows(emb, PQ_K)
    qvec = rows[KNN_QUERY_ID]["embedding"]
    books = _seed_books_from_rows(rows, PQ_M, PQ_SUB)
    enc = pq.encode_compact(
        emb, "vec_id", "embedding", books, dim=PQ_M * PQ_SUB
    )
    adc_ids = pq.adc_search(
        enc, qvec, books, dim=PQ_M * PQ_SUB, k=ADC_RECALL_K
    ).select(F.col("id").alias("vec_id"))
    qlit = F.array(*[F.lit(float(x)) for x in qvec])
    exact_ids = (
        emb.select("vec_id", l2_dist(F.col("embedding"), qlit).alias("d"))
        .orderBy("d", "vec_id")
        .limit(ADC_RECALL_K)
        .select("vec_id")
    )
    return adc_ids.join(exact_ids, "vec_id").agg(
        F.lit(ADC_RECALL_K).cast("long").alias("k"),
        F.count("*").alias("n_hit"),
        F.round(F.count("*") / F.lit(float(ADC_RECALL_K)), 6).alias("recall"),
    )


IVFADC_NLIST = 8    # coarse cells (seeded: vec_id < NLIST are centroids)
IVFADC_NPROBE = 3   # cells scanned per query
IVFADC_K = 10


@register(
    "ivf_adc_topk",
    oracle=f"""
    {_ADC_CTES},
    cents AS (
        SELECT vec_id AS cell, embedding::DOUBLE[] AS cv
        FROM embeddings WHERE vec_id < {IVFADC_NLIST}
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
        ) WHERE rn <= {IVFADC_NPROBE}
    )
    SELECT b.vec_id, CAST(sum(l.dm) AS BIGINT) AS adc_dist_micro
    FROM best b
    JOIN lut l ON b.sub = l.sub AND b.code = l.code
    JOIN assign a ON a.vec_id = b.vec_id AND a.rn = 1
    JOIN probes p ON p.cell = a.cell
    WHERE b.rn = 1
    GROUP BY b.vec_id
    ORDER BY adc_dist_micro, b.vec_id
    LIMIT {IVFADC_K}
    """,
)
def ivf_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full FAISS-IVFADC query path (Jégou et al. §V): coarse-
    quantize the corpus into 8 cells, PQ-encode, then
    search = probe the 3 query-nearest cells and
    ADC-score ONLY their code lists. Composes E44 (PQ storage) with the
    IVF pruning layer: the scan reads ~nprobe/nlist of the codes table
    (cell-partitioned at scale), scoring is the codegen'd LUT sum, and
    the whole plan is shuffle-free at replication=1. Seeded centroids/
    codebooks keep every stage SQL-expressible — the same oracle tier
    as pq_encode_stats; the trained-quantizer production twin is
    IVFIndex + train_codebooks (recall-pinned in pytest)."""
    from ..index import pq

    emb = load_embeddings(spark, sf_dir)
    # one driver probe: query vector, coarse centroids, and PQ codebook
    # rows are all slices of the same NLIST smallest-id rows
    rows = _pq_seed_rows(emb, max(IVFADC_NLIST, PQ_K))
    qvec = rows[KNN_QUERY_ID]["embedding"]
    cents = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in rows[:IVFADC_NLIST]
    ]
    books = _seed_books_from_rows(rows[:PQ_K], PQ_M, PQ_SUB)
    enc = pq.encode_ivfadc(
        emb, "vec_id", "embedding", cents, books, dim=PQ_M * PQ_SUB
    )
    res = pq.ivfadc_search(
        enc, qvec, cents, books, dim=PQ_M * PQ_SUB,
        nprobe=IVFADC_NPROBE, k=IVFADC_K,
    )
    return res.select(F.col("id").alias("vec_id"), "adc_dist_micro")


MATRYOSHKA_DIM = 16   # truncated prefix dims (of 64)
MATRYOSHKA_K = 20


@register(
    "matryoshka_recall",
    oracle=f"""
    WITH q AS (
        SELECT embedding::DOUBLE[] AS qv,
               (embedding::DOUBLE[])[1:{MATRYOSHKA_DIM}] AS qt
        FROM embeddings WHERE vec_id = {KNN_QUERY_ID}
    ),
    trunc AS (
        SELECT e.vec_id
        FROM embeddings e CROSS JOIN q
        ORDER BY list_cosine_similarity(
            (e.embedding::DOUBLE[])[1:{MATRYOSHKA_DIM}], q.qt) DESC,
            e.vec_id
        LIMIT {MATRYOSHKA_K}
    ),
    full_k AS (
        SELECT e.vec_id
        FROM embeddings e CROSS JOIN q
        ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qv)
                 DESC, e.vec_id
        LIMIT {MATRYOSHKA_K}
    )
    SELECT CAST({MATRYOSHKA_DIM} AS BIGINT) AS dim,
           CAST({MATRYOSHKA_K} AS BIGINT) AS k,
           CAST(count(*) AS BIGINT) AS n_hit,
           round(count(*) / {MATRYOSHKA_K}.0, 6) AS recall
    FROM trunc JOIN full_k USING (vec_id)
    """,
)
def matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-representation evaluation (Kusupati et al. 2022, the
    dimension-truncation trick modern embedding APIs expose): top-k by
    cosine over the FIRST 16 dims vs the full 4×
    16-dim top-k, reported as recall@20. The
    deployment question this answers: how much recall survives a 4×
    cheaper index? Both sides are scan → TakeOrderedAndProject (no
    shuffle); the truncated side's slice happens inside the scan
    projection, and at scale the truncated index would be its own 4×
    smaller table."""
    from ..functions.vector import cosine_similarity

    emb = load_embeddings(spark, sf_dir)
    qvec = (
        emb.filter(F.col("vec_id") == KNN_QUERY_ID)
        .select("embedding")
        .collect()[0][0]
    )
    q_full = F.array(*[F.lit(float(x)) for x in qvec])
    q_trunc = F.array(*[F.lit(float(x)) for x in qvec[:MATRYOSHKA_DIM]])
    trunc = (
        emb.select(
            "vec_id",
            cosine_similarity(
                F.slice("embedding", 1, MATRYOSHKA_DIM), q_trunc
            ).alias("s"),
        )
        .orderBy(F.desc("s"), "vec_id")
        .limit(MATRYOSHKA_K)
        .select("vec_id")
    )
    full_k = (
        emb.select(
            "vec_id", cosine_similarity("embedding", q_full).alias("s")
        )
        .orderBy(F.desc("s"), "vec_id")
        .limit(MATRYOSHKA_K)
        .select("vec_id")
    )
    return trunc.join(full_k, "vec_id").agg(
        F.lit(MATRYOSHKA_DIM).cast("long").alias("dim"),
        F.lit(MATRYOSHKA_K).cast("long").alias("k"),
        F.count("*").alias("n_hit"),
        F.round(F.count("*") / F.lit(float(MATRYOSHKA_K)), 6).alias(
            "recall"
        ),
    )


@register(
    "formats_roundtrip_stats",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars_csv,
           CAST(sum(length(text)) AS BIGINT) AS sum_text_orc
    FROM documents GROUP BY lang
    """,
)
def formats_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sink/source fidelity for the non-parquet formats (O7/O14 beyond
    pytest): the documents table is written to ORC (self-describing,
    carries the text) and CSV (explicit schema on read — inference is
    banned by sources.formats), read back through sources.formats, and
    the per-lang stats of the two roundtripped copies joined — equal to
    the direct-scan oracle ONLY if both roundtrips preserved every row
    and value (CSV quoting/escaping included). At scale these writes
    are the standing-table layout job; per-call here is fixture-sized.
    """
    import os
    import tempfile

    from ..sources import formats

    docs = load_docs(spark, sf_dir).select(
        "doc_id", "text", "lang", "n_chars"
    )
    base = tempfile.mkdtemp(prefix="fmt_roundtrip_")
    orc_path = os.path.join(base, "docs_orc")
    csv_path = os.path.join(base, "docs_csv")
    formats.write_table(docs, orc_path, "orc")
    formats.write_table(
        docs.select("doc_id", "lang", "n_chars"), csv_path, "csv"
    )
    orc = formats.read_table(spark, orc_path, "orc").select(
        "doc_id", F.length("text").alias("text_len")
    )
    csv = formats.read_table(
        spark,
        csv_path,
        "csv",
        schema=T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("lang", T.StringType()),
                T.StructField("n_chars", T.LongType()),
            ]
        ),
    )
    return csv.join(orc, "doc_id").groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("sum_chars_csv"),
        F.sum("text_len").alias("sum_text_orc"),
    )


DRIFT_BUCKETS = 8        # fixed-width n_chars histogram buckets
DRIFT_BUCKET_WIDTH = 32  # chars per bucket (last bucket open-ended)


@register(
    "source_drift_chi2",
    oracle=f"""
    WITH b AS (
        SELECT source,
               least(n_chars // {DRIFT_BUCKET_WIDTH},
                     {DRIFT_BUCKETS - 1}) AS bucket
        FROM documents
    ),
    obs AS (
        SELECT source, bucket, count(*) AS o FROM b GROUP BY 1, 2
    ),
    src_tot AS (SELECT source, count(*) AS ns FROM b GROUP BY 1),
    gbuck AS (SELECT bucket, count(*) AS g FROM b GROUP BY 1),
    n_all AS (SELECT count(*) AS n FROM b),
    terms AS (
        SELECT s.source, g.bucket,
               coalesce(o.o, 0) AS o,
               CAST(s.ns AS DOUBLE) * CAST(g.g AS DOUBLE)
                   / CAST(n_all.n AS DOUBLE) AS e
        FROM src_tot s CROSS JOIN gbuck g CROSS JOIN n_all
        LEFT JOIN obs o ON o.source = s.source AND o.bucket = g.bucket
    )
    SELECT source,
           CAST(sum(CAST(floor(1000000 *
                (CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e) / e)
                AS BIGINT)) AS BIGINT) AS chi2_micro,
           CAST(count(*) AS BIGINT) AS n_buckets
    FROM terms GROUP BY source
    ORDER BY chi2_micro DESC, source
    """,
)
def source_drift_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor (the data-quality gate a training
    pipeline runs per ingest batch): χ² statistic of each source's
    doc-length histogram against the corpus-wide distribution over
    8 fixed-width buckets. Per-bucket terms are
    micro-floored to integers BEFORE the cross-bucket sum, so the
    statistic is engine-exact (a float sum over buckets would be
    order-dependent). Plan: the corpus is scanned ONCE into the
    histogram-sized obs table (checkpointed — |sources|×|buckets|
    rows); the marginals (per-source, per-bucket, grand total) are
    rollups OF obs, never a second corpus pass; the dense grid is
    broadcast-class joins over those rollups."""
    docs = load_docs(spark, sf_dir)
    b = docs.select(
        "source",
        F.least(
            F.expr(f"n_chars div {DRIFT_BUCKET_WIDTH}"),
            F.lit(DRIFT_BUCKETS - 1),
        ).alias("bucket"),
    )
    obs = (
        b.groupBy("source", "bucket")
        .agg(F.count("*").alias("o"))
        .localCheckpoint(eager=True)
    )
    src_tot = obs.groupBy("source").agg(F.sum("o").alias("ns"))
    glob = obs.groupBy("bucket").agg(F.sum("o").alias("g"))
    n_all = obs.agg(F.sum("o").alias("n"))
    grid = (
        src_tot.crossJoin(F.broadcast(glob))
        .crossJoin(F.broadcast(n_all))
        .join(obs, ["source", "bucket"], "left")
        .select(
            "source",
            "bucket",
            F.coalesce("o", F.lit(0)).alias("o"),
            (
                F.col("ns").cast("double")
                * F.col("g").cast("double")
                / F.col("n").cast("double")
            ).alias("e"),
        )
    )
    term = F.floor(
        F.lit(1_000_000)
        * (F.col("o").cast("double") - F.col("e"))
        * (F.col("o").cast("double") - F.col("e"))
        / F.col("e")
    ).cast("long")
    return (
        grid.groupBy("source")
        .agg(
            F.sum(term).alias("chi2_micro"),
            F.count("*").alias("n_buckets"),
        )
        .orderBy(F.desc("chi2_micro"), "source")
    )


@register(
    "dpp_returnflag_revenue",
    oracle="""
    WITH dim AS (
        SELECT DISTINCT l_returnflag AS flag,
               CASE WHEN l_returnflag = 'R' THEN 'returned'
                    ELSE 'kept' END AS category
        FROM lineitem
    )
    SELECT d.category,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                          * CAST(1 - l.l_discount AS DECIMAL(18,4))), 2)
               AS DOUBLE) AS revenue
    FROM lineitem l JOIN dim d ON l.l_returnflag = d.flag
    WHERE d.category = 'returned'
    GROUP BY d.category
    """,
)
def dpp_returnflag_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning (§4 'partition pruning' row, the
    runtime half): the fact table is laid out directory-partitioned on
    the join key, the dim side carries the selective filter on a
    NON-join column, and Catalyst injects a `dynamicpruning` subquery
    into the fact scan's PartitionFilters — at 100 TB the scan lists
    and reads ONLY the partitions the filtered dim survives, without
    the filter ever being written against the fact table. The plan is
    asserted to contain the dynamic-pruning expression at build time
    (same runtime-assert pattern as bucketed_join_revenue); values
    hash-match the plain-join oracle. Both tables are re-written
    per-call as the fixture-sized analog of the standing layout job."""
    import os
    import tempfile

    from ..plans.inspect import explain_str
    from ..sources.layout import write_partitioned

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"
    )
    base = tempfile.mkdtemp(prefix="dpp_")
    fact_path = os.path.join(base, "lineitem_by_flag")
    dim_path = os.path.join(base, "returnflag_dim")
    write_partitioned(li, fact_path, ["l_returnflag"])
    dim = (
        li.select(F.col("l_returnflag").alias("flag"))
        .distinct()
        .withColumn(
            "category",
            F.when(F.col("flag") == "R", F.lit("returned")).otherwise(
                F.lit("kept")
            ),
        )
    )
    dim.write.mode("overwrite").parquet(dim_path)
    fact = spark.read.parquet(fact_path)
    dim_r = spark.read.parquet(dim_path).filter(
        F.col("category") == "returned"
    )
    out = (
        fact.join(dim_r, fact["l_returnflag"] == dim_r["flag"])
        .groupBy("category")
        .agg(
            F.count("*").alias("n_items"),
            F.round(
                F.sum(
                    dec("l_extendedprice")
                    * dec(F.lit(1.0) - F.col("l_discount"))
                ),
                2,
            ).cast("double").alias("revenue"),
        )
    )
    plan = explain_str(out)
    assert "dynamicpruning" in plan, plan  # the scan must prune at runtime
    return out


@register(
    "time_weighted_avg_user",
    oracle="""
    WITH e AS (
        SELECT user_id, event_id, epoch_us(ts) AS tsu,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM events
    ),
    stepped AS (
        SELECT user_id, cents,
               lead(tsu) OVER (
                   PARTITION BY user_id ORDER BY tsu, event_id)
                   - tsu AS dt
        FROM e
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_intervals,
           CAST((sum(CAST(cents AS HUGEINT) * dt) * 10000) // sum(dt)
               AS BIGINT) AS twa_micro
    FROM stepped WHERE dt IS NOT NULL
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def time_weighted_avg_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average per user with LOCF interpolation
    (TimescaleDB's time_weight — the hypertable aggregate naive AVG
    gets wrong whenever observations are unevenly spaced): each value
    holds until the user's next event; twa = Σ value·Δt / Σ Δt. Exact
    long/decimal integer arithmetic end to end (value scaled to cents,
    epoch-nanos intervals, integral division) so the hash gate needs no
    float policy at all. One user-partitioned lead() window + one
    partial-agg groupBy. See operators.temporal.time_weighted_avg."""
    from ..operators.temporal import time_weighted_avg

    ev = load_events(spark, sf_dir).select(
        "user_id",
        "event_id",
        # µs intervals keep Σ cents·Δt inside int64 (ns would overflow
        # past ~hour-scale gaps × 3-figure values); fixture ts is
        # µs-resolution so div 1000 is exact
        F.expr("ts div 1000").alias("ts_us"),
        (dec("value", 2) * 100).cast("long").alias("cents"),
    )
    return time_weighted_avg(
        ev, ["user_id"], "ts_us", "cents", tiebreak_col="event_id"
    ).orderBy("user_id")


@register(
    "winsorized_value_stats",
    oracle="""
    WITH e AS (
        SELECT event_type, event_id,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM events
    ),
    r AS (
        SELECT event_type, cents,
               row_number() OVER (
                   PARTITION BY event_type ORDER BY cents, event_id) AS rk,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM e
    ),
    b AS (
        SELECT event_type,
               min(CASE WHEN rk = (n + 19) // 20 THEN cents END) AS lo,
               max(CASE WHEN rk = (n * 19 + 19) // 20 THEN cents END) AS hi
        FROM r GROUP BY 1
    )
    SELECT r.event_type,
           CAST(count(*) AS BIGINT) AS n,
           b.lo AS lo_cents,
           b.hi AS hi_cents,
           CAST(sum(least(greatest(r.cents, b.lo), b.hi)) AS BIGINT)
               AS sum_winsorized_cents
    FROM r JOIN b USING (event_type)
    GROUP BY r.event_type, b.lo, b.hi
    """,
)
def winsorized_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized per-type value aggregate — clamp each event type's
    values to its own EXACT [p05, p95] order statistics before summing
    (the outlier-trimming step naive AVG pipelines skip). The grouped
    rank is computed scalably: a (group, value) range exchange +
    partition-local windows + a bounded (group × partition) offset grid
    — never `row_number() OVER (PARTITION BY event_type)`, which would
    put each type's entire 100 TB slice on one reducer (the oracle uses
    exactly that naive window, which is fine single-node). All long
    arithmetic (values in cents) — no float policy anywhere. See
    operators.quantiles."""
    from ..operators.quantiles import winsorized_stats

    ev = load_events(spark, sf_dir).select(
        "event_type",
        "event_id",
        (dec("value", 2) * 100).cast("long").alias("cents"),
    )
    return winsorized_stats(ev, "event_type", "cents", "event_id").select(
        "event_type",
        "n",
        F.col("lo_bound").alias("lo_cents"),
        F.col("hi_bound").alias("hi_cents"),
        F.col("sum_winsorized").alias("sum_winsorized_cents"),
    )


PYDS_ROWS = 100_000  # synthetic Python-DataSource keyspace size
PYDS_BUCKET = 3      # pushed-down bucket filter


@register(
    "python_datasource_scan",
    oracle=f"""
    SELECT CAST(count(*) AS BIGINT) AS n_events,
           CAST(min(i) AS BIGINT) AS min_id,
           CAST(max(i) AS BIGINT) AS max_id,
           CAST(sum((i * 2654435761) % 1000000) AS BIGINT) AS sum_value
    FROM range({PYDS_ROWS}) t(i)
    WHERE i % 10 = {PYDS_BUCKET}
    """,
)
def python_datasource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 Python DataSource API end to end: a custom partitioned
    connector (sources/pydatasource.py) with FILTER PUSHDOWN — the
    ``bucket = 3`` predicate is consumed by the reader's
    ``pushFilters`` and applied inside the generator, so each of the
    parallel read tasks emits ~1/{10} of its slice instead of Spark
    post-filtering the firehose. The generator is pure integer
    arithmetic, so the oracle regenerates the identical stream from
    ``range(n)`` — a hash gate over a custom connector, partitioning
    and pushdown included."""
    from ..sources.pydatasource import SyntheticEventsDataSource

    # pushdown into Python sources is opt-in (Spark 4 runtime conf)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        spark.dataSource.register(SyntheticEventsDataSource)
    except Exception:
        pass  # already registered in this session
    df = (
        spark.read.format("synthetic_events")
        .option("n_rows", str(PYDS_ROWS))
        .option("n_parts", "8")
        .load()
        .filter(F.col("bucket") == PYDS_BUCKET)
    )
    return df.agg(
        F.count("*").alias("n_events"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
        F.sum("value").alias("sum_value"),
    )


PYDS_STREAM_ROWS = 1_000
PYDS_STREAM_BATCH = 250  # 4 micro-batches of offset progression


@register(
    "python_stream_source_rollup",
    oracle=f"""
    SELECT i % 10 AS bucket,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum((i * 2654435761) % 1000000) AS BIGINT) AS sum_value
    FROM range({PYDS_STREAM_ROWS}) t(i)
    GROUP BY 1 ORDER BY 1
    """,
)
def python_stream_source_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 STREAMING Python DataSource end to end
    (SimpleDataSourceStreamReader): the tick_stream source serves its
    keyspace as offset-tracked micro-batches (250 rows
    per read), the stream runs until the sink holds the full keyspace
    (1000 rows — ≥4 micro-batches of real offset
    progression, asserted below), and the per-bucket rollup of the sink
    hash-matches the range(n) oracle. readBetweenOffsets regenerates
    any committed range, which is the exactly-once replay contract a
    real connector needs under checkpoint recovery."""
    import time
    import uuid

    from ..sources.pydatasource import SyntheticTickStreamSource

    try:
        spark.dataSource.register(SyntheticTickStreamSource)
    except Exception:
        pass
    sink = f"tick_sink_{uuid.uuid4().hex[:12]}"
    stream = (
        spark.readStream.format("tick_stream")
        .option("n_rows", str(PYDS_STREAM_ROWS))
        .option("batch_size", str(PYDS_STREAM_BATCH))
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(sink)
        .trigger(processingTime="0 seconds")
        .start()
    )
    def _sink_rows() -> int:
        try:
            return spark.table(sink).count()
        except Exception:
            return 0  # memory sink registers its view on first batch

    try:
        deadline = time.time() + 120
        # adaptive backoff (r10): the fixed 0.2 s poll added up to one
        # period of pure detection latency per run; start fine-grained
        # and back off so a fast drain is seen almost immediately while
        # a slow one still polls at the old cadence. Batch counts and
        # results are driven by batch_size, not poll frequency.
        delay = 0.01
        while _sink_rows() < PYDS_STREAM_ROWS:
            if time.time() > deadline:
                raise TimeoutError("tick_stream never drained its keyspace")
            time.sleep(delay)
            delay = min(delay * 1.6, 0.2)
    finally:
        q.stop()
        q.awaitTermination()
    n_batches = len(
        [p for p in q.recentProgress if p["numInputRows"] > 0]
    )
    assert n_batches >= 2, f"expected multi-batch offset progression, got {n_batches}"
    out = (
        spark.table(sink)
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .orderBy("bucket")
    )
    out = out.localCheckpoint(eager=True)  # durable past the memory-sink drop (cache is evictable)
    spark.catalog.dropTempView(sink)
    return out


@register(
    "python_stream_sink_roundtrip",
    oracle=f"""
    SELECT i % 10 AS bucket,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum((i * 2654435761) % 1000000) AS BIGINT) AS sum_value
    FROM range({PYDS_STREAM_ROWS}) t(i)
    GROUP BY 1 ORDER BY 1
    """,
)
def python_stream_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 custom STREAMING SINK (DataSourceStreamWriter) with an
    exactly-once commit manifest: the tick stream is written through
    ManifestParquetSink — executors stage uniquely-named parquet files,
    the driver atomically publishes a per-batch manifest, and the
    read-back trusts manifests only (never the staging listing, which
    may hold orphans from retried batches). The per-bucket rollup of
    the manifest read must hash-match the range(n) oracle — proving no
    batch was lost or double-published across the micro-batch
    sequence. Completes the connector trio: batch read (pushdown),
    stream read (offset replay), stream write (transactional commit)."""
    import tempfile
    import uuid

    from ..sources.pydatasource import (
        ManifestParquetSink,
        SyntheticTickStreamSource,
        read_manifest_files,
    )

    for src_cls in (SyntheticTickStreamSource, ManifestParquetSink):
        try:
            spark.dataSource.register(src_cls)
        except Exception:
            pass
    sink_dir = tempfile.mkdtemp(prefix="manifest_sink_")
    stream = (
        spark.readStream.format("tick_stream")
        .option("n_rows", str(PYDS_STREAM_ROWS))
        # 2 micro-batches: enough to prove the multi-batch manifest
        # sequence while each batch pays a python-runner spawn
        .option("batch_size", str(PYDS_STREAM_ROWS // 2))
        .load()
    )
    chk = f"{sink_dir}/_chk_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("manifest_parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", chk)
        .trigger(processingTime="0 seconds")
        .start()
    )
    import os
    import time

    def _committed() -> int:
        mdir = os.path.join(sink_dir, "manifest")
        if not os.path.isdir(mdir):
            return 0
        import json

        total = 0
        for name in os.listdir(mdir):
            if name.startswith("."):
                continue
            with open(os.path.join(mdir, name)) as f:
                total += sum(e["n_rows"] for e in json.load(f)["files"])
        return total

    try:
        deadline = time.time() + 120
        # adaptive backoff (r10) — see python_stream_source_rollup; the
        # manifest probe is a local file stat, so fine-grained early
        # polls are nearly free
        delay = 0.01
        while _committed() < PYDS_STREAM_ROWS:
            if time.time() > deadline:
                raise TimeoutError("manifest sink never committed the keyspace")
            time.sleep(delay)
            delay = min(delay * 1.6, 0.2)
    finally:
        q.stop()
        q.awaitTermination()
    out = (
        read_manifest_files(spark, sink_dir)
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .orderBy("bucket")
    )
    out = out.localCheckpoint(eager=True)  # truncate lineage: cache is evictable
    return out


TRIANGLE_MIN_SUPPORT = 2  # co-purchase edges need >= this many orders


@register(
    "triangle_count_parts",
    oracle=f"""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= {TRIANGLE_MIN_SUPPORT}
    ),
    deg AS (
        SELECT x, count(*) AS d
        FROM (SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e)
        GROUP BY 1
    ),
    o AS (
        SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
                    THEN e.u ELSE e.v END AS a,
               CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.u < e.v)
                    THEN e.v ELSE e.u END AS b
        FROM e JOIN deg du ON du.x = e.u JOIN deg dv ON dv.x = e.v
    ),
    wedges AS (
        SELECT w1.a, w1.b AS p, w2.b AS q
        FROM o w1 JOIN o w2 ON w1.a = w2.a AND w1.b < w2.b
    ),
    closing AS (SELECT a AS p, b AS q FROM o
                UNION ALL SELECT b AS p, a AS q FROM o)
    SELECT (SELECT count(*) FROM o) AS n_edges,
           (SELECT count(*) FROM wedges) AS n_wedges,
           (SELECT count(*) FROM wedges w WHERE EXISTS (
                SELECT 1 FROM closing c WHERE c.p = w.p AND c.q = w.q))
               AS n_triangles
    """,
)
def triangle_count_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count over the part co-purchase graph (edges =
    part pairs sharing ≥ 2 orders) — degree-
    oriented per Suri & Vassilvitskii (WWW'11): orienting each edge
    low-degree→high-degree caps every vertex's wedge fan-out at
    O(√|E|), so the candidate set is O(|E|^1.5) TOTAL regardless of
    skew — the fix for the "curse of the last reducer" that kills the
    naive PARTITION BY vertex formulation on any celebrity vertex. The
    count is orientation-invariant, so the oracle replays the same
    degree orientation in SQL and must agree exactly (n_wedges pins the
    orientation itself, not just the final count). See
    operators.graph.triangle_count."""
    from ..operators.graph import triangle_count

    li = load(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    a = op.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("u"))
    b = op.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("v"))
    edges = (
        a.join(b, "o")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= TRIANGLE_MIN_SUPPORT)
        .select("u", "v")
    )
    return triangle_count(edges, src="u", dst="v")


ES_SAMPLE_K = 25


@register(
    "weighted_sample_docs",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id AS id, CAST(n_chars AS BIGINT) AS weight,
               ln((CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
                                1, 6)) AS BIGINT) + 1.0) / {16**6}.0)
                   / CAST(n_chars AS DOUBLE) AS k
        FROM documents WHERE n_chars > 0
    )
    SELECT id, weight, round(k, 6) AS es_key
    FROM scored
    ORDER BY k DESC, id
    LIMIT {ES_SAMPLE_K}
    """,
)
def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis-Spirakis):
    keep the 25 docs with the largest u^(1/w), w = doc
    length — the one-pass, shuffle-free mixture-sampling primitive
    ("sample N docs ∝ quality"). u is md5-seeded (cross-engine
    deterministic); selection is scan → TakeOrderedAndProject. See
    operators.sampling.weighted_sample_es."""
    from ..operators.sampling import weighted_sample_es

    return weighted_sample_es(
        load_docs(spark, sf_dir), "doc_id", "n_chars", ES_SAMPLE_K
    )


K_ANON_K = 8  # minimum safe equivalence-class size


@register(
    "k_anonymity_audit",
    oracle=f"""
    WITH classes AS (
        SELECT c_nationkey, c_mktsegment, count(*) AS class_size
        FROM customer GROUP BY 1, 2
    )
    SELECT CAST(count(*) AS BIGINT) AS n_classes,
           CAST(sum(class_size) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN class_size < {K_ANON_K} THEN 1 ELSE 0 END)
               AS BIGINT) AS n_violating_classes,
           CAST(sum(CASE WHEN class_size < {K_ANON_K} THEN class_size
                    ELSE 0 END) AS BIGINT) AS n_rows_at_risk,
           CAST(min(class_size) AS BIGINT) AS min_class,
           CAST(max(class_size) AS BIGINT) AS max_class
    FROM classes
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the (nation, market-segment) quasi-
    identifier pair: any equivalence class smaller than k=8
    re-identifies its members and must be suppressed or generalized
    before the table ships to training — the structured-data
    counterpart of pii_scrub_stats (E23). One partial-agg groupBy to
    |classes| rows, then a single-row rollup; nothing touches the
    driver."""
    cust = load(spark, sf_dir, "customer")
    classes = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").alias("class_size")
    )
    risk = F.col("class_size") < K_ANON_K
    return classes.agg(
        F.count("*").alias("n_classes"),
        F.sum("class_size").alias("n_rows"),
        F.sum(risk.cast("long")).alias("n_violating_classes"),
        F.sum(F.when(risk, F.col("class_size")).otherwise(F.lit(0))).alias(
            "n_rows_at_risk"
        ),
        F.min("class_size").alias("min_class"),
        F.max("class_size").alias("max_class"),
    )


# --------------------------------------------------------------------- #
