# Auto-split from the former single-file registry (round 4): one
# contiguous, order-preserving slice; every @register call still
# runs in the original order via registry/__init__.py.
from __future__ import annotations  # noqa: F401
from ._core import (  # noqa: F401
    BPE_ISH_PATTERN,
    DataFrame,
    F,
    LANG_MARKERS,
    ORACLE,
    SparkSession,
    VectorIndex,
    dedup,
    fingerprint,
    lang_id,
    load,
    load_docs,
    load_embeddings,
    normalized_fingerprint,
    quality_score,
    register,
    textstats,
    token_count,
)

# --------------------------------------------------------------------- #
# E1 / O19 — exact kNN top-k, the reference's core query (NMR:388)
# --------------------------------------------------------------------- #

KNN_K = 5
KNN_QUERY_ID = 0  # query vector = embedding of vec_id 0 (deterministic)


@register(
    "knn_exact",
    oracle=f"""
    WITH q AS (
        SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = {KNN_QUERY_ID}
    )
    SELECT e.vec_id, e.label,
           round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) AS score
    FROM embeddings e, q
    ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qv) DESC, e.vec_id
    LIMIT {KNN_K}
    """,
)
def knn_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-query exact top-k over the embeddings corpus.

    Plan: parquet scan (embedding+vec_id+label pruned) → codegen'd cosine
    expression → TakeOrderedAndProject(k). No shuffle; scales to an
    arbitrarily large corpus (per-partition top-k, driver merges k rows per
    partition).
    """
    emb = load(spark, sf_dir, "embeddings")
    qvec = (
        emb.filter(F.col("vec_id") == KNN_QUERY_ID)
        .select("embedding")
        .collect()[0][0]
    )
    idx = VectorIndex(emb, key="vec_id", vector_col="embedding", dim=len(qvec))
    res = idx.search(qvec, k=KNN_K, columns=["label"])
    return res.select("vec_id", "label", F.round("score", 6).alias("score"))


@register(
    "knn_filtered",
    oracle=f"""
    WITH q AS (
        SELECT embedding::DOUBLE[] AS qv, label AS qlabel
        FROM embeddings WHERE vec_id = {KNN_QUERY_ID}
    )
    SELECT e.vec_id, e.label,
           round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 6) AS score
    FROM embeddings e, q
    WHERE e.label <> q.qlabel AND e.vec_id % 2 = 0
    ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qv) DESC, e.vec_id
    LIMIT {KNN_K}
    """,
)
def knn_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED vector search — the reference service's ``filters``
    parameter (metadata predicates ANDed into similarity_search): top-k
    restricted to rows passing the predicate. In this engine a filter is
    just a DataFrame filter BEFORE index construction, so Catalyst
    pushes it into the parquet scan and the top-k never scores excluded
    rows — versus post-filtering k results (which under-returns) or
    service-side filter evaluation per candidate. Same
    scan → codegen'd cosine → TakeOrderedAndProject plan as knn_exact."""
    emb = load(spark, sf_dir, "embeddings")
    row = emb.filter(F.col("vec_id") == KNN_QUERY_ID).collect()[0]
    qvec, qlabel = row["embedding"], row["label"]
    filtered = emb.filter(
        (F.col("label") != qlabel) & (F.col("vec_id") % 2 == 0)
    )
    idx = VectorIndex(
        filtered, key="vec_id", vector_col="embedding", dim=len(qvec)
    )
    res = idx.search(qvec, k=KNN_K, columns=["label"])
    return res.select("vec_id", "label", F.round("score", 6).alias("score"))


# --------------------------------------------------------------------- #
# E2 — kNN join: query table × corpus, per-query top-k
# --------------------------------------------------------------------- #

@register(
    "knn_batch",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        FROM embeddings WHERE vec_id < 10
    ),
    scored AS (
        SELECT q.query_id, e.vec_id,
               list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS s
        FROM embeddings e CROSS JOIN q
    )
    SELECT query_id, vec_id, round(s, 6) AS score
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY s DESC, vec_id) AS rn
          FROM scored)
    WHERE rn <= {KNN_K}
    """,
)
def knn_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN join: 10 query vectors × corpus, top-5 each. Query side is
    broadcast; corpus scanned once, scored in codegen; per-query top-k via
    window on the (tiny) query_id key."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    idx = VectorIndex(emb, key="vec_id", vector_col="embedding")
    res = idx.search_batch(queries, k=KNN_K)
    return res.select("query_id", "vec_id", F.round("score", 6).alias("score"))


@register(
    "knn_batch_bigcorpus",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        FROM embeddings WHERE vec_id < 10
    ),
    scored AS (
        SELECT q.query_id, e.vec_id,
               list_cosine_similarity(e.embedding::DOUBLE[], q.qv) AS s
        FROM embeddings e CROSS JOIN q
    )
    SELECT query_id, vec_id, round(s, 6) AS score
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY s DESC, vec_id) AS rn
          FROM scored)
    WHERE rn <= {KNN_K}
    """,
)
def knn_batch_bigcorpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB kNN-join plan: identical semantics to knn_batch (same
    oracle) but with partition-local top-k reduction before the exchange —
    the shuffle carries |partitions|·|queries|·k candidate rows, never
    |corpus|·|queries| scored rows."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    idx = VectorIndex(emb, key="vec_id", vector_col="embedding")
    res = idx.search_batch(queries, k=KNN_K, local_topk=True)
    return res.select("query_id", "vec_id", F.round("score", 6).alias("score"))


# --------------------------------------------------------------------- #
# E11 — vector normalization / integrity checks
# --------------------------------------------------------------------- #

@register(
    "vector_norms",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dim,
           round(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x))), 6) AS l2,
           round(list_sum(list_transform(embedding::DOUBLE[], x -> abs(x))), 6) AS l1
    FROM embeddings
    """,
)
def vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector integrity stats (unit-norm invariant, NMR:209/:376)."""
    from ..functions.vector import l2_norm

    emb = load(spark, sf_dir, "embeddings")
    l1 = F.aggregate(
        F.transform("embedding", lambda x: F.abs(x.cast("double"))),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(l2_norm("embedding"), 6).alias("l2"),
        F.round(l1, 6).alias("l1"),
    )


# --------------------------------------------------------------------- #
# E3 — embedding-cosine near-duplicate pairs (exact path)
# --------------------------------------------------------------------- #

COSINE_PAIR_THRESHOLD = 0.4


@register(
    "near_dup_pairs_cosine",
    oracle=f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= {COSINE_PAIR_THRESHOLD}
    """,
)
def near_dup_pairs_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_embeddings(spark, sf_dir)
    res = dedup.near_dup_pairs_cosine(
        emb, "vec_id", "embedding", threshold=COSINE_PAIR_THRESHOLD
    )
    return res.select("id_a", "id_b", F.round("cos", 6).alias("cos"))


# --------------------------------------------------------------------- #
# E3/E5 — exact n-gram-shingle Jaccard near-dup pairs (inverted index)
# --------------------------------------------------------------------- #

JACCARD_THRESHOLD = 0.7


@register(
    "near_dup_pairs_jaccard",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, list_filter(string_split(text,' '), t -> t <> '') AS ws
        FROM documents
    ),
    s AS (
        -- mirrors functions.text.word_shingles: windows 1..max(len-2,1),
        -- nulls past the end skipped (Spark concat_ws semantics)
        SELECT doc_id,
               list_distinct(list_transform(
                   range(1, greatest(len(ws) - 2, 1) + 1),
                   i -> array_to_string(
                       list_filter([ws[i], ws[i+1], ws[i+2]], x -> x IS NOT NULL), ' ')
               )) AS sh
        FROM w
    ),
    p AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               len(list_intersect(a.sh, b.sh))::DOUBLE
                 / len(list_distinct(list_concat(a.sh, b.sh))) AS jac
        FROM s a JOIN s b ON a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, CAST(floor(jac * 1000000) AS BIGINT) AS jac_micro FROM p WHERE jac >= {JACCARD_THRESHOLD}
    """,
)
def near_dup_pairs_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trigram-shingle Jaccard ≥ 0.7 via inverted-index join (no
    cross join; see operators.dedup). Oracle recomputes pairwise (fine at
    500 docs; the Spark plan is the one that scales)."""
    docs = load_docs(spark, sf_dir)
    res = dedup.near_dup_pairs_jaccard(
        docs, "doc_id", "text", n=3, threshold=JACCARD_THRESHOLD
    )
    return res.select(
        "id_a",
        "id_b",
        F.floor(F.col("jac") * F.lit(1e6)).cast("long").alias("jac_micro"),
    )


@register("near_dup_pairs_ppjoin", oracle=ORACLE["near_dup_pairs_jaccard"])
def near_dup_pairs_ppjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME exact-Jaccard pair set through the PPJoin prefix-filter
    tier (Xiao et al. WWW'08): df-ascending prefixes bound the candidate
    join at Σ df_prefix(s)² — the 100 TB path for stop-shingle-heavy web
    corpora, where the full inverted index's Σ df(s)² explodes. Lossless
    by the prefix theorem (J ≥ t ⟹ the first shared shingle falls in
    both prefixes); verified here against the identical oracle, and
    pinned equal to the baseline tier by pytest. At this fixture's
    near-unique shingle distribution the baseline tier is faster — the
    crossover favors prefixes exactly when df² blows up. See
    operators.dedup._jaccard_prefix_filtered."""
    docs = load_docs(spark, sf_dir)
    res = dedup.near_dup_pairs_jaccard(
        docs, "doc_id", "text", n=3, threshold=JACCARD_THRESHOLD,
        prefix_filter=True,
    )
    return res.select(
        "id_a",
        "id_b",
        F.floor(F.col("jac") * F.lit(1e6)).cast("long").alias("jac_micro"),
    )


# --------------------------------------------------------------------- #
# E4 — exact dedup (summary + normalized-key duplicate groups)
# --------------------------------------------------------------------- #

@register(
    "dedup_exact_summary",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           count(DISTINCT text) AS n_distinct_text,
           count(DISTINCT md5(array_to_string(list_sort(list_distinct(
               list_filter(string_split(text,' '), t -> t <> ''))), ' '))) AS n_distinct_bags
    FROM documents GROUP BY lang
    """,
)
def dedup_exact_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates semantics as a per-language summary: raw-text
    distinct vs canonical bag-of-words distinct (catches shuffled dups)."""
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("text").alias("n_distinct_text"),
        F.countDistinct(normalized_fingerprint("text")).alias("n_distinct_bags"),
    )


@register(
    "duplicate_groups",
    oracle="""
    SELECT md5(array_to_string(list_sort(list_distinct(
               list_filter(string_split(text,' '), t -> t <> ''))), ' ')) AS dup_key,
           min(doc_id) AS rep_id,
           count(*) AS dup_count
    FROM documents
    GROUP BY 1 HAVING count(*) >= 2
    """,
)
def duplicate_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate groups under the canonical bag-of-words key with the
    deterministic min-id representative (single hash shuffle)."""
    docs = load(spark, sf_dir, "documents")
    return dedup.duplicate_groups(
        docs, normalized_fingerprint("text"), "doc_id", min_size=2
    )


# --------------------------------------------------------------------- #
# Train/eval decontamination — n-gram overlap between corpus splits
# --------------------------------------------------------------------- #

DECONTAM_MIN_SHARED = 3
DECONTAM_DF_CAP = 50


@register(
    "ngram_decontaminate",
    oracle=f"""
    WITH w AS (
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
    -- g <> '' drops the sentinel shingle emitted for token-less docs,
    -- matching operators.decontam._postings exactly for ALL
    -- parameterizations (not just the registered min_shared)
    texp AS (SELECT * FROM (SELECT doc_id, unnest(sh) AS g FROM s
             WHERE doc_id % 20 = 0) WHERE g <> ''),
    keep AS (SELECT g FROM texp GROUP BY g
             HAVING count(*) <= {DECONTAM_DF_CAP}),
    trexp AS (SELECT * FROM (SELECT doc_id, unnest(sh) AS g FROM s
              WHERE doc_id % 20 <> 0) WHERE g <> ''),
    pairs AS (
        SELECT tr.doc_id AS train_id, te.doc_id AS test_id,
               CAST(count(*) AS BIGINT) AS shared
        FROM trexp tr
        JOIN (SELECT t.* FROM texp t JOIN keep k ON k.g = t.g) te
          ON tr.g = te.g
        GROUP BY 1, 2 HAVING count(*) >= {DECONTAM_MIN_SHARED}
    ),
    per_train AS (
        SELECT train_id,
               CAST(count(*) AS BIGINT) AS n_test_matches,
               max(shared) AS max_shared
        FROM pairs GROUP BY train_id
    )
    SELECT m.train_id, m.n_test_matches, m.max_shared,
           min(p.test_id) AS worst_test_doc
    FROM per_train m JOIN pairs p
      ON p.train_id = m.train_id AND p.shared = m.max_shared
    GROUP BY 1, 2, 3
    """,
)
def ngram_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination: train docs (doc_id % 20 != 0) sharing
    ≥ min_shared distinct trigrams with any eval doc (doc_id % 20 = 0).
    Inverted-index broadcast join on int64 n-gram hashes with an
    eval-side document-frequency cap — the pre-training contamination
    sweep of an LLM data pipeline (GPT-3-style n-gram decontamination),
    never a cross join. See operators.decontam."""
    from ..operators import decontam

    docs = load_docs(spark, sf_dir)
    test = docs.filter(F.col("doc_id") % 20 == 0)
    train = docs.filter(F.col("doc_id") % 20 != 0)
    return decontam.decontaminate_report(
        train,
        test,
        "doc_id",
        "text",
        n=3,
        min_shared=DECONTAM_MIN_SHARED,
        df_cap=DECONTAM_DF_CAP,
    )


EMBED_DECON_THRESHOLD = 0.3


@register(
    "embedding_decontaminate",
    oracle=f"""
    WITH pairs AS (
        SELECT a.vec_id AS train_id, b.vec_id AS test_id,
               CAST(floor(list_cosine_similarity(
                   a.embedding::DOUBLE[], b.embedding::DOUBLE[]) * 1000000)
                 AS BIGINT) AS cos_micro
        FROM embeddings a JOIN embeddings b
          ON a.vec_id % 20 <> 0 AND b.vec_id % 20 = 0
        WHERE list_cosine_similarity(
                  a.embedding::DOUBLE[], b.embedding::DOUBLE[])
              >= {EMBED_DECON_THRESHOLD}
    ),
    per_train AS (
        SELECT train_id, CAST(count(*) AS BIGINT) AS n_test_matches,
               max(cos_micro) AS max_cos_micro
        FROM pairs GROUP BY train_id
    )
    SELECT m.train_id, m.n_test_matches, m.max_cos_micro,
           min(p.test_id) AS worst_test_doc
    FROM per_train m JOIN pairs p
      ON p.train_id = m.train_id AND p.cos_micro = m.max_cos_micro
    GROUP BY 1, 2, 3
    """,
)
def embedding_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic (embedding-space) train/eval decontamination — the tier
    the n-gram sweep misses: a paraphrased eval answer shares no trigram
    but sits next to the eval point in embedding space. Eval vectors
    (vec_id % 20 = 0) are broadcast and scored against the train corpus
    with the codegen'd cosine fold — no corpus shuffle; the report
    aggregates the (tiny) contamination pair set in exact integer micro
    units. See operators.decontam.embedding_decontaminate_report."""
    from ..operators import decontam

    emb = load_embeddings(spark, sf_dir)
    test = emb.filter(F.col("vec_id") % 20 == 0)
    train = emb.filter(F.col("vec_id") % 20 != 0)
    return decontam.embedding_decontaminate_report(
        train, test, "vec_id", "embedding", threshold=EMBED_DECON_THRESHOLD
    )


# --------------------------------------------------------------------- #
# Sequence packing + mixture rebalancing — batch-construction operators
# --------------------------------------------------------------------- #

PACK_BUDGET = 256
PACK_STREAMS = 4


@register(
    "pack_sequences",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               CAST(len(list_filter(string_split(text,' '), x -> x <> ''))
                    AS BIGINT) AS tokens
        FROM documents
    ),
    m AS (
        SELECT doc_id, tokens, doc_id % {PACK_STREAMS} AS stream,
               sum(tokens) OVER (
                   PARTITION BY doc_id % {PACK_STREAMS}
                   ORDER BY tokens DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum
        FROM t
    ),
    b AS (
        SELECT CAST(stream * 1000000000 + (cum - tokens) // {PACK_BUDGET}
                    AS BIGINT) AS bin_id,
               tokens
        FROM m
    )
    SELECT bin_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(tokens) AS BIGINT) AS token_sum,
           CAST((sum(tokens) * 1000000) // {PACK_BUDGET} AS BIGINT)
               AS utilization_micro
    FROM b GROUP BY bin_id
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training batches: longest-first offset
    binning inside parallel packing streams (every window PARTITIONED —
    no global sort), token budget 256. Per-bin doc counts,
    token totals, and utilization; integer-exact, window math mirrored
    verbatim in the oracle. See operators.packing."""
    from ..operators import packing

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", token_count("text").alias("tokens")
    )
    return packing.pack_report(
        docs, "doc_id", "tokens", budget=PACK_BUDGET, num_streams=PACK_STREAMS
    )


CHUNK_PACK_WINDOW = 32
CHUNK_PACK_BUDGET = 256
CHUNK_PACK_STREAMS = 4


@register(
    "chunk_pack_pipeline",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, list_filter(string_split(text,' '), t -> t <> '') AS ws
        FROM documents
    ),
    c AS (
        SELECT doc_id, len(ws) AS n,
               CASE WHEN len(ws) <= {CHUNK_PACK_WINDOW} THEN 1
                    ELSE 1 + (len(ws) - 1) // {CHUNK_PACK_WINDOW} END AS nc
        FROM w
    ),
    ch AS (
        SELECT doc_id * 10000 + chunk_id AS chunk_key,
               CAST(least({CHUNK_PACK_WINDOW},
                          n - chunk_id * {CHUNK_PACK_WINDOW}) AS BIGINT)
                   AS tokens
        FROM (SELECT doc_id, n, unnest(range(nc)) AS chunk_id FROM c)
    ),
    m AS (
        SELECT chunk_key, tokens,
               chunk_key % {CHUNK_PACK_STREAMS} AS stream,
               sum(tokens) OVER (
                   PARTITION BY chunk_key % {CHUNK_PACK_STREAMS}
                   ORDER BY tokens DESC, chunk_key
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum
        FROM ch
    ),
    b AS (
        SELECT CAST(stream * 1000000000
                    + (cum - tokens) // {CHUNK_PACK_BUDGET} AS BIGINT)
                   AS bin_id,
               tokens
        FROM m
    )
    SELECT bin_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(tokens) AS BIGINT) AS token_sum,
           CAST((sum(tokens) * 1000000) // {CHUNK_PACK_BUDGET} AS BIGINT)
               AS utilization_micro
    FROM b GROUP BY bin_id
    """,
)
def chunk_pack_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end context construction: CHUNK every document into
    non-overlapping 32-token windows (stride = window — the training
    split, not the RAG overlap split), then PACK the chunks into
    256-token training bins with the streamed offset binner. This is the
    composition a pretraining data pipeline actually runs (chunk →
    pack → batch manifest), exercised as ONE registry query so the
    interaction — chunk token counts feeding the packer's windows — is
    hash-verified, not just each stage alone. Plan: the row-local chunk
    stage adds no shuffle, so the whole pipeline costs exactly the
    packer's one partitioned-window pass."""
    from ..operators import packing

    docs = load_docs(spark, sf_dir)
    chunks = packing.chunk_tokens(
        docs, "doc_id", "text",
        window=CHUNK_PACK_WINDOW, stride=CHUNK_PACK_WINDOW,
    ).select(
        (F.col("doc_id") * 10000 + F.col("chunk_id")).alias("chunk_key"),
        F.col("n_chunk_tokens").cast("long").alias("tokens"),
    )
    return packing.pack_report(
        chunks, "chunk_key", "tokens",
        budget=CHUNK_PACK_BUDGET, num_streams=CHUNK_PACK_STREAMS,
    )


MIXTURE_TARGETS_MICRO = {
    "en": 400_000,
    "de": 150_000,
    "es": 150_000,
    "fr": 150_000,
    "zh": 150_000,
}


@register(
    "mixture_rebalance",
    oracle=f"""
    WITH c AS (
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY lang
    ),
    t AS (
        SELECT lang, n_docs,
               CASE lang
                   {' '.join(f"WHEN '{k}' THEN CAST({v} AS BIGINT)" for k, v in MIXTURE_TARGETS_MICRO.items())}
               END AS tgt
        FROM c
    ),
    b AS (
        SELECT min((n_docs * 1000000) // tgt) AS budget
        FROM t WHERE tgt IS NOT NULL
    )
    SELECT t.lang, t.n_docs,
           CAST(coalesce((t.tgt * b.budget) // 1000000, 0) AS BIGINT)
               AS n_keep,
           CAST((coalesce((t.tgt * b.budget) // 1000000, 0) * 1000000)
                // t.n_docs AS BIGINT) AS rate_micro
    FROM t, b
    """,
)
def mixture_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing plan: per-language keep counts/rates that hit a target
    corpus mixture (en 40%, others 15%) without upsampling — the binding
    stratum is kept in full. Integer-exact plan; one partial-agg groupBy
    plus a broadcast scalar. See operators.sampling.mixture_rebalance_plan."""
    from ..operators.sampling import mixture_rebalance_plan

    docs = load(spark, sf_dir, "documents")
    return mixture_rebalance_plan(docs, "lang", MIXTURE_TARGETS_MICRO)


# --------------------------------------------------------------------- #
# E6 — text analysis: fingerprints, token counts, corpus stats, top terms
# --------------------------------------------------------------------- #

@register(
    "doc_fingerprints",
    oracle="""
    SELECT doc_id, md5(text) AS fp,
           md5(array_to_string(list_sort(list_distinct(
               list_filter(string_split(text,' '), t -> t <> ''))), ' ')) AS fp_normalized,
           n_chars
    FROM documents
    """,
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        fingerprint("text").alias("fp"),
        normalized_fingerprint("text").alias("fp_normalized"),
        "n_chars",
    )


@register(
    "rolling_fingerprints",
    oracle="""
    SELECT doc_id, u.fp AS fp
    FROM (
      SELECT doc_id,
             list_sort(list_distinct(list_filter(
                 list_transform(range(1, GREATEST(length(text)-7, 1) + 1),
                                i -> md5(substr(text, i::INT, 8))),
                 h -> substr(h, 32, 1) IN ('0','8')))) AS fps
      FROM documents
    ), unnest(fps) AS u(fp)
    """,
)
def rolling_fingerprints_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star "document fingerprinting (rolling hash)": every 8-char
    gram hashed, content-defined 1/8 selection (md5 suffix residue), one
    row per (doc, selected fingerprint). Shared substrings produce equal
    fingerprints at any position — the containment/partial-overlap
    primitive whole-doc hashing can't provide."""
    from ..functions.text import rolling_fingerprints

    docs = load_docs(spark, sf_dir)
    return docs.select(
        "doc_id", F.explode(rolling_fingerprints("text")).alias("fp")
    )


@register(
    "token_counts",
    oracle=f"""
    SELECT doc_id,
           CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS INTEGER) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS INTEGER) AS bpe_tokens,
           CAST(length(text) AS INTEGER) AS n_chars_check
    FROM documents
    """,
)
def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish regex token counting (north-star 'token
    counting'); n_chars recomputed as a cross-check of the fixture."""
    from ..functions.text import bpe_ish_tokens

    docs = load_docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        token_count("text").alias("ws_tokens"),
        F.size(bpe_ish_tokens("text")).alias("bpe_tokens"),
        F.length("text").alias("n_chars_check"),
    )


@register(
    "udtf_token_explode",
    oracle=r"""
    SELECT token, count(*) AS n
    FROM (
        SELECT unnest(list_filter(regexp_split_to_array(text, '\s+'),
                                  t -> t <> '')) AS token
        FROM documents
    )
    GROUP BY token
    ORDER BY n DESC, token
    LIMIT 20
    """,
)
def udtf_token_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface (Spark 4 table functions): a generator UDTF
    explodes each document into tokens via LATERAL join, then a plain
    relational agg ranks the top-20. The UDTF is the slow path by design
    (SURVEY §2.4 — everything else stays in built-ins); this query exists
    to cover the UDTF API itself, exactly as ``generate_image_embedding``
    covers the scalar-UDF surface (NMR:202–213). Token semantics match the
    oracle: split on whitespace runs, drop empties (ASCII corpus, so
    Python's unicode ``\\s`` ≡ the oracle regex)."""
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="token: string")
    class SplitTokens:
        def eval(self, text: str):
            if text:
                for tok in re.split(r"\s+", text):
                    if tok:
                        yield (tok,)

    spark.udtf.register("split_tokens", SplitTokens)
    load_docs(spark, sf_dir).createOrReplaceTempView("_udtf_docs")
    exploded = spark.sql(
        "SELECT t.token FROM _udtf_docs, LATERAL split_tokens(text) AS t"
    )
    return (
        exploded.groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(20)
    )


@register(
    "corpus_stats",
    oracle="""
    WITH sums AS (
        SELECT lang, source,
               count(*) AS n_docs,
               CAST(sum(length(text)) AS BIGINT) AS total_chars,
               CAST(sum(len(list_filter(string_split(text,' '), t -> t <> '')))
                    AS BIGINT) AS total_tokens
        FROM documents GROUP BY lang, source
    )
    SELECT lang, source, n_docs, total_chars, total_tokens,
           CAST((total_chars * 1000000) // n_docs AS BIGINT) AS avg_chars_micro,
           CAST((total_tokens * 1000000) // n_docs AS BIGINT) AS avg_tokens_micro
    FROM sums
    """,
)
def corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalization-proof stats: integer totals stay BIGINT on both
    sides (DuckDB sum() over ints is HUGEINT → cast in the oracle), and
    averages are exact micro-scaled integers ((sum*1e6) div n) instead of
    rounded doubles, so no float ulp/rounding policy can diverge."""
    docs = load(spark, sf_dir, "documents")
    return textstats.corpus_stats(docs, "text", ["lang", "source"])


@register(
    "top_terms",
    oracle="""
    WITH terms AS (
        SELECT lang, unnest(list_filter(string_split(text,' '), t -> t <> '')) AS term
        FROM documents
    ),
    c AS (SELECT lang, term, count(*) AS cnt FROM terms GROUP BY lang, term)
    SELECT lang, term, cnt, rank
    FROM (SELECT *, CAST(row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, term) AS INTEGER) AS rank FROM c)
    WHERE rank <= 5
    """,
)
def top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_docs(spark, sf_dir)
    return textstats.top_terms(docs, "text", "lang", top_n=5)


@register(
    "text_quality",
    oracle="""
    WITH x AS (
        SELECT doc_id,
            (length(text) - length(regexp_replace(text, '[A-Za-z ]', '', 'g')))::DOUBLE
                / length(text) AS alpha,
            (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE
                / length(text) AS digit,
            len(list_filter(string_split(text,' '), t -> t <> '')) AS toks,
            length(replace(text, ' ', '')) AS nospace
        FROM documents
    )
    SELECT doc_id,
           CAST(floor(least(1.0, greatest(0.0,
               alpha * 0.6
               + greatest(0.0, 1.0 - abs(CASE WHEN toks = 0 THEN 0.0
                                              ELSE nospace::DOUBLE / toks END - 5.0) / 5.0) * 0.3
               + (1.0 - digit) * 0.1)) * 1000000) AS BIGINT) AS quality_micro
    FROM x
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring (north-star 'quality scoring'). Note the
    oracle needs DuckDB's 'g' flag to match Spark's replace-all default."""
    docs = load_docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.floor(quality_score("text") * F.lit(1e6)).cast("long").alias("quality_micro"),
    )


_CURATION_SQL_BASE = """
    WITH x AS (
        SELECT lang,
            (length(text) - length(regexp_replace(text, '[A-Za-z ]', '', 'g')))::DOUBLE
                / length(text) AS alpha,
            (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE
                / length(text) AS digit,
            len(list_filter(string_split(text,' '), t -> t <> '')) AS toks,
            length(replace(text, ' ', '')) AS nospace,
            len(list_distinct(list_transform(
                range(1, greatest(len(list_filter(string_split(text,' '), t -> t <> '')) - 2, 1) + 1),
                i -> array_to_string(list_filter(
                    [list_filter(string_split(text,' '), t -> t <> '')[i],
                     list_filter(string_split(text,' '), t -> t <> '')[i+1],
                     list_filter(string_split(text,' '), t -> t <> '')[i+2]],
                    x -> x IS NOT NULL), ' ')
            ))) AS d3
        FROM documents
    ),
    r AS (
        SELECT lang,
            (toks >= 50) AS r_min_tokens,
            (toks <= 100000) AS r_max_tokens,
            (CASE WHEN toks = 0 THEN 0.0 ELSE nospace::DOUBLE / toks END
                 BETWEEN 3.0 AND 10.0) AS r_word_len,
            (alpha >= 0.8) AS r_alpha,
            (digit <= 0.2) AS r_digits,
            (1.0 - d3::DOUBLE / greatest(toks - 2, 1) <= 0.05) AS r_repetition
        FROM x
    )
"""


@register(
    "curation_rules_summary",
    oracle=_CURATION_SQL_BASE
    + """
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(r_min_tokens::INT) AS BIGINT) AS pass_min_tokens,
           CAST(sum(r_max_tokens::INT) AS BIGINT) AS pass_max_tokens,
           CAST(sum(r_word_len::INT) AS BIGINT) AS pass_word_len,
           CAST(sum(r_alpha::INT) AS BIGINT) AS pass_alpha,
           CAST(sum(r_digits::INT) AS BIGINT) AS pass_digits,
           CAST(sum(r_repetition::INT) AS BIGINT) AS pass_repetition,
           CAST(sum((r_min_tokens AND r_max_tokens AND r_word_len
                     AND r_alpha AND r_digits AND r_repetition)::INT)
                AS BIGINT) AS n_keep
    FROM r GROUP BY lang
    """,
)
def curation_rules_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style curation rule bundle: per-language pass counts for
    each named quality rule (token bounds, mean word length, alpha/digit
    ratios, trigram repetition) and the docs surviving all of them — the
    rule-attrition report a quality-filter stack emits before training.
    Single scan, partial-agg groupBy; every rule is a codegen'd
    expression restated verbatim in the oracle
    (functions.text.curation_rules)."""
    from ..functions.text import curation_rules

    docs = load_docs(spark, sf_dir)
    rules = curation_rules("text")
    keep = None
    for expr in rules.values():
        keep = expr if keep is None else (keep & expr)
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        *[
            F.sum(expr.cast("long")).alias(f"pass_{name}")
            for name, expr in rules.items()
        ],
        F.sum(keep.cast("long")).alias("n_keep"),
    )


@register(
    "pii_scrub_stats",
    oracle=r"""
    SELECT lang,
           CAST(sum(len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))) AS BIGINT)
               AS n_email,
           CAST(sum(len(regexp_extract_all(text, 'https?://[^ ]+'))) AS BIGINT)
               AS n_url,
           CAST(sum(len(regexp_extract_all(text, '[0-9]{6,}'))) AS BIGINT)
               AS n_long_digits,
           CAST(sum(length(text) - length(
               regexp_replace(regexp_replace(regexp_replace(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '', 'g'),
                   'https?://[^ ]+', '', 'g'),
                   '[0-9]{6,}', '', 'g'))) AS BIGINT) AS chars_scrubbed
    FROM documents GROUP BY lang
    """,
)
def pii_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub audit: per-language match counts for each scrub pattern
    (emails, URLs, long digit runs — functions.text.SCRUB_PATTERNS) and
    total characters removed by the redaction chain. Counts are per
    pattern on the raw text; chars_scrubbed applies the same chain the
    production ``redact_patterns`` uses (empty replacement here so the
    removal is measurable). All JVM regexp — no UDFs."""
    from ..functions.text import SCRUB_PATTERNS, pattern_counts, redact_patterns

    docs = load_docs(spark, sf_dir)
    per_doc = docs.select(
        "lang",
        *pattern_counts("text"),
        (
            F.length("text")
            - F.length(redact_patterns("text", replacement=""))
        ).alias("__scrubbed"),
    )
    return per_doc.groupBy("lang").agg(
        *[
            F.sum(f"n_{name}").alias(f"n_{name}")
            for name in SCRUB_PATTERNS
        ],
        F.sum("__scrubbed").alias("chars_scrubbed"),
    )


@register(
    "lm_perplexity_buckets",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               unnest(list_filter(string_split(text,' '), t -> t <> '')) AS t
        FROM documents
    ),
    v AS (SELECT t, count(*) AS c FROM toks GROUP BY t),
    tot AS (SELECT sum(c) AS n, count(*) AS vs FROM v),
    p AS (SELECT v.t, (v.c + 1.0) / (tot.n + 1.0 * tot.vs) AS p FROM v, tot),
    d AS (
        SELECT toks.doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               avg(-ln(p.p)) AS nll
        FROM toks JOIN p USING (t) GROUP BY toks.doc_id
    )
    SELECT doc_id, n_tokens,
           round(nll, 6) AS nll,
           CAST(ntile(3) OVER (ORDER BY round(nll, 6), doc_id)
                AS INTEGER) AS bucket
    FROM d
    """,
)
def lm_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality filter: per-doc mean negative log-likelihood
    under an add-1-smoothed unigram LM self-trained on the corpus,
    bucketed head/middle/tail (ntile(3), deterministic (nll, id) order).
    Where CCNet scores with KenLM, the pipeline shape (train → score →
    quantile-bucket → keep the head) is identical and fully
    engine-internal here. See operators.textstats.unigram_nll for the
    scale notes (the global ntile moves to precomputed quantile cuts at
    corpus size)."""
    docs = load_docs(spark, sf_dir)
    res = textstats.unigram_nll(docs, "doc_id", "text", alpha=1.0, n_buckets=3)
    return res.select(
        F.col("id").alias("doc_id"),
        "n_tokens",
        F.round("nll", 6).alias("nll"),
        "bucket",
    )


@register(
    "repetition_summary",
    oracle="""
    WITH w AS (
        SELECT doc_id,
               list_filter(string_split(text,' '), t -> t <> '') AS ws
        FROM documents
    ),
    t AS (
        SELECT doc_id, ws, len(ws) AS total,
               len(list_distinct(ws)) AS dct
        FROM w WHERE len(ws) >= 2
    ),
    b AS (
        SELECT doc_id,
               unnest(list_transform(range(1, total),
                                     i -> ws[i] || ' ' || ws[i+1])) AS bg
        FROM t
    ),
    cnt AS (SELECT doc_id, bg, count(*) AS c FROM b GROUP BY 1, 2),
    top AS (SELECT doc_id, max(c) AS topc FROM cnt GROUP BY 1),
    per AS (
        SELECT t.doc_id,
               ((t.total - t.dct) * 1000000) // t.total AS dupm,
               (top.topc * 1000000) // (t.total - 1) AS topm
        FROM t JOIN top ON top.doc_id = t.doc_id
    )
    SELECT CAST(dupm // 100000 AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(topm) AS BIGINT) AS sum_top_bigram_micro,
           CAST(max(dupm) AS BIGINT) AS max_dup_word_micro
    FROM per GROUP BY 1
    """,
)
def repetition_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter signals (dup-word fraction,
    top-bigram share), decile-bucketed over the corpus. The per-doc
    top-bigram count is a run-length fold over the row's SORTED bigram
    array — one codegen'd projection, zero shuffles (the oracle's
    explode→count→max re-aggregation is exactly the shuffle the
    operator avoids); the summary is one ≤10-row groupBy. See
    operators.textstats.repetition_metrics."""
    return textstats.repetition_summary(
        load_docs(spark, sf_dir), "doc_id", "text"
    )


PMI_MIN_COUNT = 5
PMI_TOP = 20


@register(
    "pmi_collocations",
    oracle=f"""
    WITH w AS (
        SELECT list_filter(string_split(text,' '), t -> t <> '') AS ws
        FROM documents
    ),
    u AS (SELECT unnest(ws) AS t FROM w),
    uni AS (SELECT t, CAST(count(*) AS BIGINT) AS cu FROM u GROUP BY t),
    n AS (SELECT sum(cu) AS nn FROM uni),
    bg AS (
        SELECT unnest(list_transform(range(1, len(ws)),
                                     i -> [ws[i], ws[i+1]])) AS p
        FROM w WHERE len(ws) >= 2
    ),
    bgc AS (
        SELECT p[1] AS wa, p[2] AS wb, CAST(count(*) AS BIGINT) AS c_ab
        FROM bg GROUP BY 1, 2
    ),
    b AS (SELECT sum(c_ab) AS bb FROM bgc)
    SELECT g.wa, g.wb, g.c_ab,
           round(ln((g.c_ab::DOUBLE * n.nn::DOUBLE * n.nn::DOUBLE)
                    / (b.bb::DOUBLE * ua.cu::DOUBLE * ub.cu::DOUBLE)),
                 6) AS pmi
    FROM bgc g
    JOIN uni ua ON ua.t = g.wa
    JOIN uni ub ON ub.t = g.wb, n, b
    WHERE g.c_ab >= {PMI_MIN_COUNT}
    ORDER BY g.c_ab DESC, g.wa, g.wb
    LIMIT {PMI_TOP}
    """,
)
def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: PMI of adjacent token pairs — the signal a
    vocab/tokenizer pipeline uses to pick multiword merge candidates.
    One token-key shuffle (unigrams, materialized once for both join
    sides), one bigram-key shuffle, scalar broadcasts; row-set ordering
    is integer-count + string tie-breaks so the float PMI never decides
    membership. See operators.textstats.pmi_collocations."""
    return textstats.pmi_collocations(
        load_docs(spark, sf_dir), "text",
        min_count=PMI_MIN_COUNT, top=PMI_TOP,
    )


def _lang_score_sql(lang: str) -> str:
    markers = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
    return (
        "CASE WHEN len(list_filter(string_split(text,' '), t -> t <> '')) = 0 THEN 0.0 "
        f"ELSE len(list_filter(list_filter(string_split(text,' '), t -> t <> ''), w -> w IN ({markers})))::DOUBLE "
        "/ len(list_filter(string_split(text,' '), t -> t <> '')) END"
    )


@register(
    "lang_id_pred",
    oracle=f"""
    WITH s AS (
        SELECT doc_id, lang AS true_lang,
               {_lang_score_sql('de')} AS s_de,
               {_lang_score_sql('en')} AS s_en,
               {_lang_score_sql('es')} AS s_es,
               {_lang_score_sql('fr')} AS s_fr,
               regexp_matches(text, '[\\x{{4e00}}-\\x{{9fff}}]') AS cjk
        FROM documents
    )
    SELECT doc_id, true_lang,
           CASE WHEN cjk THEN 'zh'
                WHEN greatest(s_de, s_en, s_es, s_fr) < 0.05 THEN 'und'
                WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
                WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
                WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
                ELSE 'fr' END AS pred_lang
    FROM s
    """,
)
def lang_id_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID (north-star 'language-ID n-gram
    heuristic'); prediction + ground-truth label for accuracy rollups."""
    docs = load_docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.col("lang").alias("true_lang"),
        lang_id("text").alias("pred_lang"),
    )


# --------------------------------------------------------------------- #
