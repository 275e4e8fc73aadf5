# Auto-split from the former single-file registry (round 4): one
# contiguous, order-preserving slice; every @register call still
# runs in the original order via registry/__init__.py.
from __future__ import annotations  # noqa: F401
from ._core import (  # noqa: F401
    DataFrame,
    F,
    NANOS_PER_DAY,
    SparkSession,
    VectorIndex,
    Window,
    dec,
    dedup,
    load,
    load_docs,
    load_embeddings,
    load_events,
    normalized_fingerprint,
    quality_score,
    register,
    sampling_ops,
    temporal_ops,
    textstats,
    token_count,
)
from .knn_vector_dedup import (  # noqa: F401
    JACCARD_THRESHOLD,
    KNN_K,
    KNN_QUERY_ID,
)
from .relational_events import (  # noqa: F401
    _write_ordered_slices,
)
from .hybrid_ann_streaming import (  # noqa: F401
    RECURSIVE_REACH_DEPTH,
)

# North-star composition — end-to-end training-data curation pipeline
# --------------------------------------------------------------------- #

CURATION_MIN_TOKS = 15
CURATION_MIN_QUALITY = 0.965
CURATION_SAMPLE_HEX = "80"  # md5(doc_id) < 0x80/0x100 ≈ 50%


@register(
    "curation_pipeline",
    oracle=f"""
    WITH x AS (
        SELECT doc_id, lang, text,
            (length(text) - length(regexp_replace(text, '[A-Za-z ]', '', 'g')))::DOUBLE
                / length(text) AS alpha,
            (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE
                / length(text) AS digit,
            len(list_filter(string_split(text,' '), t -> t <> '')) AS toks,
            length(replace(text, ' ', '')) AS nospace
        FROM documents
    ),
    scored AS (
        SELECT doc_id, lang, text, toks,
            least(1.0, greatest(0.0,
                alpha * 0.6
                + greatest(0.0, 1.0 - abs(CASE WHEN toks = 0 THEN 0.0
                                               ELSE nospace::DOUBLE / toks END - 5.0) / 5.0) * 0.3
                + (1.0 - digit) * 0.1)) AS quality
        FROM x
    ),
    filtered AS (
        SELECT *, md5(array_to_string(list_sort(list_distinct(
                   list_filter(string_split(text,' '), t -> t <> ''))), ' ')) AS fp
        FROM scored
        WHERE toks >= {CURATION_MIN_TOKS} AND quality >= {CURATION_MIN_QUALITY}
    ),
    deduped AS (
        SELECT f.* FROM filtered f
        JOIN (SELECT fp, min(doc_id) AS doc_id FROM filtered GROUP BY fp) r
          ON f.fp = r.fp AND f.doc_id = r.doc_id
    ),
    sampled AS (
        SELECT * FROM deduped
        WHERE md5(CAST(doc_id AS VARCHAR)) < '{CURATION_SAMPLE_HEX}'
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(toks) AS BIGINT) AS sum_tokens,
           CAST(floor(CAST(sum(CAST(quality AS DECIMAL(18,12))) AS DOUBLE)
                      / count(*) * 1000000) AS BIGINT) AS avg_quality_micro
    FROM sampled
    GROUP BY lang
    """,
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data curation, composed entirely from this
    package's operators — the north-star pipeline in one plan:

      quality/length scoring (functions.text.quality_score/token_count)
      → filter (toks ≥ 15, quality ≥ 0.965)
      → exact near-order dedup on the canonical bag-of-words fingerprint
        keeping the smallest doc_id (operators.dedup.dedup_exact)
      → key-deterministic ~50% sample (md5(doc_id), stable across
        engines, partitioning and cluster size)
      → per-language corpus stats.

    One Catalyst plan end-to-end: scan → project(score) → filter →
    one hash shuffle for the dedup groupBy → broadcast-back join →
    final partial+final agg. The only wide exchange is keyed on the
    fingerprint, which is uniformly distributed (md5), so no skew at
    100 TB; every scalar stage is whole-stage-codegen'd (no Python)."""
    docs = load_docs(spark, sf_dir)
    scored = docs.select(
        "doc_id",
        "lang",
        "text",
        token_count("text").alias("toks"),
        quality_score("text").alias("quality"),
    )
    filtered = scored.filter(
        (F.col("toks") >= CURATION_MIN_TOKS)
        & (F.col("quality") >= CURATION_MIN_QUALITY)
    ).withColumn("fp", normalized_fingerprint("text"))
    deduped = dedup.dedup_exact(filtered, keys=["fp"], id_col="doc_id")
    sampled = deduped.filter(
        F.md5(F.col("doc_id").cast("string")) < F.lit(CURATION_SAMPLE_HEX)
    )
    return sampled.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("toks").alias("sum_tokens"),
        F.floor(
            F.sum(F.col("quality").cast("decimal(18,12)")).cast("double")
            / F.count("*")
            * F.lit(1e6)
        )
        .cast("long")
        .alias("avg_quality_micro"),
    )


# --------------------------------------------------------------------- #
# §4 shuffle/skew row — salted large×large join (results ≡ plain join)
# --------------------------------------------------------------------- #

SALT_FACTOR = 8


@register(
    "salted_priority_revenue",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                          * CAST(1 - l.l_discount AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS revenue,
           count(*) AS n_lineitems
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def salted_priority_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by order priority through operators.skew.salted_join — the
    skew-mitigation path for a large×large equi-join whose left side has
    pathological hot keys (a single hot key lands in one task even under
    AQE skew handling; salting spreads it over SALT_FACTOR sub-keys and
    replicates the right side SALT_FACTOR ways). Salting is
    correctness-neutral — the oracle is the PLAIN join — which is exactly
    the property that makes it safe to switch on at 100 TB. The salt
    comes from a hash of the row, not rand(), so task retries are safe."""
    from ..operators.skew import salted_join

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount", "l_linenumber"
    )
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(
        li, o, key="l_orderkey", salt=SALT_FACTOR, salt_from="l_linenumber"
    )
    revenue = F.sum(dec("l_extendedprice") * dec(F.lit(1.0) - F.col("l_discount")))
    return joined.groupBy("o_orderpriority").agg(
        F.round(revenue, 2).cast("double").alias("revenue"),
        F.count("*").alias("n_lineitems"),
    )


# --------------------------------------------------------------------- #
# Round-3 LLM-pipeline additions: chunking, DSIR weighting, keep-best
# dedup, tokenizer-vocabulary coverage
# --------------------------------------------------------------------- #

CHUNK_WINDOW = 32
CHUNK_STRIDE = 24


@register(
    "chunk_documents",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, list_filter(string_split(text,' '), t -> t <> '') AS ws
        FROM documents
    ),
    c AS (
        SELECT doc_id, ws, len(ws) AS n,
               CASE WHEN len(ws) <= {CHUNK_WINDOW} THEN 1
                    ELSE 1 + (len(ws) - {CHUNK_WINDOW} + {CHUNK_STRIDE} - 1)
                             // {CHUNK_STRIDE} END AS nc
        FROM w
    ),
    e AS (SELECT doc_id, ws, n, unnest(range(nc)) AS chunk_id FROM c)
    SELECT doc_id,
           CAST(chunk_id AS INTEGER) AS chunk_id,
           CAST(least({CHUNK_WINDOW}, n - chunk_id * {CHUNK_STRIDE}) AS INTEGER)
               AS n_chunk_tokens,
           array_to_string(
               ws[chunk_id * {CHUNK_STRIDE} + 1 :
                  chunk_id * {CHUNK_STRIDE} + {CHUNK_WINDOW}], ' ')
               AS chunk_text
    FROM e
    """,
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-token-window chunking with overlap (window 32, stride 24)
    — the context construction step of RAG indexing and long-document
    training. Entirely row-local (tokenize → integer chunk count →
    posexplode → slice): scan → generate → project, zero shuffles; the
    oracle restates the integer chunk arithmetic verbatim. See
    operators.packing.chunk_tokens."""
    from ..operators.packing import chunk_tokens

    docs = load_docs(spark, sf_dir)
    return chunk_tokens(
        docs, "doc_id", "text", window=CHUNK_WINDOW, stride=CHUNK_STRIDE
    )


@register(
    "dsir_importance_weights",
    oracle="""
    WITH toks AS (
        SELECT doc_id, (lang = 'en')::INT AS is_t,
               unnest(list_filter(string_split(text,' '), t -> t <> '')) AS t
        FROM documents
    ),
    v AS (SELECT t, count(*) AS c_s, sum(is_t) AS c_t FROM toks GROUP BY t),
    tot AS (SELECT sum(c_s) AS ns, sum(c_t) AS nt, count(*) AS vs FROM v),
    p AS (
        SELECT v.t,
               ln((v.c_t + 1.0) / (tot.nt + 1.0 * tot.vs))
             - ln((v.c_s + 1.0) / (tot.ns + 1.0 * tot.vs)) AS lr
        FROM v, tot
    )
    SELECT toks.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(avg(p.lr), 6) AS logratio
    FROM toks JOIN p USING (t) GROUP BY toks.doc_id
    """,
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weighting (Xie et al. 2023): per-doc mean
    log-ratio of a target-domain unigram LM (here: the English slice)
    against the whole-corpus LM — the score a data-selection pass
    resamples by. One token shuffle feeds BOTH models (the target's
    counts are a filtered aggregate of the same explode); see
    operators.textstats.dsir_logratio for the scale shape."""
    docs = load_docs(spark, sf_dir)
    res = textstats.dsir_logratio(
        docs, "doc_id", "text", target_pred=(F.col("lang") == "en"), alpha=1.0
    )
    return res.select(
        F.col("id").alias("doc_id"),
        "n_tokens",
        F.round("logratio", 6).alias("logratio"),
    )


@register(
    "dedup_keep_best",
    oracle="""
    WITH q AS (
        SELECT doc_id,
               md5(array_to_string(list_sort(list_distinct(
                   list_filter(string_split(text,' '), t -> t <> ''))), ' '))
                   AS dup_key,
               floor(least(1.0, greatest(0.0,
                   (length(text) - length(regexp_replace(text, '[A-Za-z ]', '', 'g')))::DOUBLE
                       / length(text) * 0.6
                   + greatest(0.0, 1.0 - abs(
                         CASE WHEN len(list_filter(string_split(text,' '), t -> t <> '')) = 0
                              THEN 0.0
                              ELSE length(replace(text, ' ', ''))::DOUBLE
                                   / len(list_filter(string_split(text,' '), t -> t <> ''))
                         END - 5.0) / 5.0) * 0.3
                   + (1.0 - (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE
                       / length(text)) * 0.1)) * 1000000)::BIGINT AS q_micro
        FROM documents
    ),
    r AS (
        SELECT dup_key, doc_id, q_micro,
               row_number() OVER (PARTITION BY dup_key
                                  ORDER BY q_micro DESC, doc_id) AS rn,
               count(*) OVER (PARTITION BY dup_key) AS dup_count
        FROM q
    )
    SELECT dup_key, doc_id AS best_id,
           CAST(dup_count AS BIGINT) AS dup_count,
           q_micro AS best_quality_micro
    FROM r WHERE rn = 1
    """,
)
def dedup_keep_best_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware exact dedup: for every canonical bag-of-words key,
    keep the HIGHEST-quality capture (micro-int quality, min-id
    tie-break) — the production dedup policy (a page crawled five times
    keeps its best capture, not an arbitrary or min-id one). Spark side
    is ONE key-shuffle argmax aggregate (max over (score, −id) structs,
    partial-agg friendly — no window, no self-join); the oracle uses the
    equivalent window formulation. Integer micro-quality keeps the
    argmax policy-free across engines."""
    docs = load_docs(spark, sf_dir)
    res = dedup.dedup_keep_best(
        docs,
        key=normalized_fingerprint("text"),
        id_col="doc_id",
        score=F.floor(quality_score("text") * F.lit(1e6)).cast("long"),
    )
    return res.select(
        "dup_key",
        "best_id",
        "dup_count",
        F.col("best_score").alias("best_quality_micro"),
    )


_QUALITY_MICRO_SQL = """floor(least(1.0, greatest(0.0,
    (length(text) - length(regexp_replace(text, '[A-Za-z ]', '', 'g')))::DOUBLE
        / length(text) * 0.6
    + greatest(0.0, 1.0 - abs(
          CASE WHEN len(list_filter(string_split(text,' '), t -> t <> '')) = 0
               THEN 0.0
               ELSE length(replace(text, ' ', ''))::DOUBLE
                    / len(list_filter(string_split(text,' '), t -> t <> ''))
          END - 5.0) / 5.0) * 0.3
    + (1.0 - (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE
        / length(text)) * 0.1)) * 1000000)::BIGINT"""


def _keep_best_pairs(docs: DataFrame) -> DataFrame:
    """near_dedup_keep_best's candidate stage: exact trigram-Jaccard
    pairs through the PPJoin prefix-filter tier (prefix postings only in
    the candidate join — plan-pinned by
    test_keep_best_pairs_route_through_prefix_tier)."""
    return dedup.near_dup_pairs_jaccard(
        docs, "doc_id", "text", n=3, threshold=JACCARD_THRESHOLD,
        prefix_filter=True,
    ).select("id_a", "id_b")


@register(
    "near_dedup_keep_best",
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
    ),
    lbl AS (SELECT u AS id, least(u, min(v)) AS rep
            FROM (SELECT DISTINCT u, v FROM reach) GROUP BY u),
    q AS (SELECT doc_id, {_QUALITY_MICRO_SQL} AS q_micro FROM documents),
    r AS (
        SELECT lbl.rep, lbl.id, q.q_micro,
               row_number() OVER (PARTITION BY lbl.rep
                                  ORDER BY q.q_micro DESC, lbl.id) AS rn,
               count(*) OVER (PARTITION BY lbl.rep) AS cs
        FROM lbl JOIN q ON q.doc_id = lbl.id
    )
    SELECT rep AS rep_id, id AS best_id,
           CAST(cs AS BIGINT) AS cluster_size,
           q_micro AS best_quality_micro
    FROM r WHERE rn = 1
    """,
)
def near_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-dup dedup with the production keep policy: resolve exact
    trigram-Jaccard duplicate components (the same closure machinery the
    whole near-dedup family shares), then keep the HIGHEST-quality
    member of each multi-doc cluster (micro-int quality, min-id
    tie-break) — where min-id labeling keeps an arbitrary capture,
    curation stacks keep the best one. Spark: PPJoin prefix-filtered
    pair join (the Σ df_prefix² candidate bound — lossless, so the pair
    set is identical to the baseline tier) → size-gated connected
    components → one argmax aggregate per component. Oracle:
    recursive-CTE closure + window argmax (exact because the fixture's
    component diameter ≤ the recursion depth, pinned by the
    dup_reach_recursive pytest)."""
    docs = load_docs(spark, sf_dir)
    pairs = _keep_best_pairs(docs).localCheckpoint(eager=True)
    labels = dedup.resolve_components(
        docs.select(F.col("doc_id").alias("id")), pairs
    )
    scored = docs.select(
        F.col("doc_id").alias("id"),
        F.floor(quality_score("text") * F.lit(1e6)).cast("long").alias("__q"),
    )
    return (
        labels.join(scored, "id")
        .groupBy("rep_id")
        .agg(
            F.max(
                F.struct(F.col("__q").alias("s"), (-F.col("id")).alias("ni"))
            ).alias("__best"),
            F.count("*").alias("cluster_size"),
        )
        .filter(F.col("cluster_size") >= 2)
        .select(
            "rep_id",
            (-F.col("__best.ni")).alias("best_id"),
            "cluster_size",
            F.col("__best.s").alias("best_quality_micro"),
        )
    )


VOCAB_COVERAGE_SIZE = 100


@register(
    "vocab_oov_stats",
    oracle=f"""
    WITH toks AS (
        SELECT lang AS grp,
               unnest(list_filter(string_split(text,' '), t -> t <> '')) AS t
        FROM documents
    ),
    vocab AS (
        SELECT t FROM (
            SELECT t, count(*) AS c FROM toks GROUP BY t
            ORDER BY c DESC, t LIMIT {VOCAB_COVERAGE_SIZE}
        )
    )
    SELECT grp,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(*) FILTER (WHERE vocab.t IS NULL) AS BIGINT) AS n_oov,
           CAST((count(*) FILTER (WHERE vocab.t IS NULL) * 1000000)
               // count(*) AS BIGINT) AS oov_micro
    FROM toks LEFT JOIN vocab ON toks.t = vocab.t
    GROUP BY grp
    """,
)
def vocab_oov_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary coverage audit: top-200 corpus vocabulary
    (count desc, token asc — deterministic), per-language token totals
    and out-of-vocab rates. The vocabulary is a TakeOrderedAndProject
    that reaches the corpus as a broadcast left-join — the corpus never
    shuffles on more than the token key. See
    operators.textstats.oov_stats."""
    docs = load_docs(spark, sf_dir)
    return textstats.oov_stats(
        docs, "doc_id", "text", "lang", vocab_size=VOCAB_COVERAGE_SIZE
    )


ZORDER_BITS = 10
ZORDER_BUCKET_SHIFT = 14
_ZMASK = (1 << ZORDER_BITS) - 1


def _morton_sql(a: str, b: str, bits: int) -> str:
    """The morton_key bit interleave as engine-portable div/mod
    arithmetic (identical on BIGINT in Spark and DuckDB)."""
    terms = []
    for i in range(bits):
        terms.append(f"(({a} // {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({b} // {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


@register(
    "zorder_layout",
    oracle=f"""
    WITH k AS (
        SELECT o_custkey % {_ZMASK + 1} AS a,
               (epoch_us(o_orderdate) // 86400000000) % {_ZMASK + 1} AS b
        FROM orders
    ),
    z AS (
        SELECT a, b,
               ({_morton_sql('a', 'b', ZORDER_BITS)})
                   // {1 << ZORDER_BUCKET_SHIFT} AS bucket
        FROM k
    )
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           min(a) AS a_min, max(a) AS a_max,
           min(b) AS b_min, max(b) AS b_max
    FROM z GROUP BY bucket
    """,
)
def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) clustering report over orders keyed by
    (customer, order-day) — the lakehouse ``OPTIMIZE ZORDER BY``
    primitive as pure integer bit arithmetic. Each Morton-prefix bucket
    (= a range-partitioned file of a z-ordered write) reports its
    bounding box; small aligned rectangles are what let per-file min/max
    stats prune predicates on EITHER key dimension at 100 TB. Day
    numbers come from raw epoch math (timezone-proof, same policy as
    every temporal query here). See operators.layout."""
    from ..operators.layout import zorder_layout_report

    orders = load(spark, sf_dir, "orders")
    epoch_day = F.expr(
        "CAST(unix_micros(o_orderdate) div 86400000000 AS BIGINT)"
    )
    return zorder_layout_report(
        orders,
        F.col("o_custkey") % F.lit(_ZMASK + 1),
        epoch_day % F.lit(_ZMASK + 1),
        bits=ZORDER_BITS,
        bucket_shift=ZORDER_BUCKET_SHIFT,
    )


# --------------------------------------------------------------------- #
# Cross-doc segment dedup with reassembly (CCNet/RefinedWeb line dedup —
# the REMOVAL complement of the boilerplate detector)
# --------------------------------------------------------------------- #

SEGDEDUP_LEN = 8   # tokens per segment (stand-in for a newline line)
SEGDEDUP_MAX_DF = 2  # segment survives in ≤ this many distinct docs


@register(
    "segment_dedup_docs",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS ws
        FROM documents
    ),
    segs AS (
        SELECT doc_id, i AS idx,
               array_to_string(
                   list_slice(ws, i * {SEGDEDUP_LEN} + 1,
                              i * {SEGDEDUP_LEN} + {SEGDEDUP_LEN}), ' ') AS seg
        FROM w, unnest(range(0, CAST(ceil(len(ws) / {SEGDEDUP_LEN}.0) AS BIGINT)))
                 AS u(i)
        WHERE len(ws) > 0
    ),
    dfreq AS (
        SELECT seg, count(DISTINCT doc_id) AS df FROM segs GROUP BY seg
    ),
    j AS (
        SELECT s.doc_id, s.idx, s.seg, d.df <= {SEGDEDUP_MAX_DF} AS kept
        FROM segs s JOIN dfreq d USING (seg)
    )
    SELECT doc_id,
           CAST(count(*) AS INTEGER) AS n_segs,
           CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS INTEGER) AS n_kept,
           md5(coalesce(
               string_agg(CASE WHEN kept THEN seg END, ' ' ORDER BY idx),
               '')) AS clean_md5
    FROM j GROUP BY doc_id
    """,
)
def segment_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level cross-doc dedup with reassembly: fixed 8-token
    segments shared by more than SEGDEDUP_MAX_DF (2) distinct documents
    are removed from every document and the survivors re-joined in
    order; output is a per-doc attrition row plus the md5 of the
    rewritten text (content-addressed handle for the cleaned corpus).
    Two key shuffles (segment-key doc-frequency with map-side partials,
    then doc-key reassembly bounded by the row's own length); the
    frequency side joins via SHUFFLE_HASH, never broadcast — it is
    segment-vocabulary-sized. See operators.dedup.segment_dedup."""
    return dedup.segment_dedup(
        load_docs(spark, sf_dir), "doc_id", "text",
        seg_len=SEGDEDUP_LEN, max_df=SEGDEDUP_MAX_DF,
    )


# --------------------------------------------------------------------- #
# Batch CDC apply (MERGE INTO semantics over the change-feed hook,
# NMR:277-278 consumed as upsert/delete instead of SCD2 history)
# --------------------------------------------------------------------- #

#: shared by cdc_apply_orders AND streaming_cdc_snapshot: the streaming
#: variant's whole point is that its sequential per-micro-batch apply
#: equals THIS one-shot global MERGE, so both queries must verify
#: against the identical oracle text.
_CDC_MERGE_ORACLE = """
    WITH ch AS (
        SELECT o_custkey AS k,
               epoch_us(o_orderdate) // 86400000000 AS d,
               o_orderkey AS ok,
               CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op,
               CAST(o_totalprice AS DECIMAL(18,2)) AS bal
        FROM orders
    ),
    latest AS (
        SELECT k, op, bal FROM (
            SELECT k, op, bal,
                   row_number() OVER (PARTITION BY k
                                      ORDER BY d DESC, ok DESC) AS rn
            FROM ch) t
        WHERE rn = 1
    )
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_live,
           CAST(round(sum(CASE WHEN l.op = 'U' THEN l.bal
                          ELSE CAST(c.c_acctbal AS DECIMAL(18,2)) END), 2)
                AS DOUBLE) AS balance
    FROM customer c LEFT JOIN latest l ON l.k = c.c_custkey
    WHERE l.op IS NULL OR l.op <> 'D'
    GROUP BY c.c_mktsegment
    """


def _order_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The orders table read as a CDC change log: key = customer,
    sequence = (order day, order key), op = delete when finalized else
    upsert, payload = the order total as the new balance. Shared by the
    batch and streaming MERGE queries so their change semantics cannot
    drift apart."""
    from ..operators import cdc

    return load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"),
        F.expr("unix_micros(o_orderdate) div 86400000000").alias("d"),
        F.col("o_orderkey").alias("ok"),
        F.when(F.col("o_orderstatus") == "F", F.lit(cdc.OP_DELETE))
        .otherwise(F.lit(cdc.OP_UPSERT))
        .alias("op"),
        dec("o_totalprice", 2).alias("bal"),
    )


@register("cdc_apply_orders", oracle=_CDC_MERGE_ORACLE)
def cdc_apply_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-style CDC apply: the orders table read as a change log
    against the customer snapshot — each order is an account-balance
    upsert (or a delete when finalized), sequenced by (order day, order
    key); the latest change per customer wins. Latest-per-key is a
    single argmax aggregate (max over struct(seq…, op, payload) — one
    key shuffle WITH map-side partials, never a row_number window over
    the change log); the merge is one full-outer key join. Output: the
    merged snapshot rolled up per market segment. See
    operators.cdc.apply_cdc."""
    from ..operators import cdc

    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", dec("c_acctbal", 2).alias("bal")
    )
    merged = cdc.apply_cdc(
        cust, _order_changes(spark, sf_dir), "c_custkey",
        seq_cols=["d", "ok"], op_col="op", payload_cols=["bal"],
    )
    return merged.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_live"),
        F.round(F.sum("bal"), 2).cast("double").alias("balance"),
    )


# --------------------------------------------------------------------- #
# BPE merge-candidate counting (tokenizer-training inner statistic)
# --------------------------------------------------------------------- #

BPE_TOP = 20


@register(
    "bpe_merge_candidates",
    oracle=f"""
    WITH w AS (
        SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS t
        FROM documents
    ),
    wc AS (SELECT t, CAST(count(*) AS BIGINT) AS f FROM w GROUP BY t),
    p AS (
        SELECT substr(t, CAST(i AS INTEGER), 1) AS a,
               substr(t, CAST(i AS INTEGER) + 1, 1) AS b, f
        FROM wc, unnest(range(1, length(t))) AS u(i)
        WHERE length(t) >= 2
    )
    SELECT a, b, CAST(sum(f) AS BIGINT) AS pair_count
    FROM p GROUP BY a, b
    ORDER BY pair_count DESC, a, b
    LIMIT {BPE_TOP}
    """,
)
def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top adjacent-symbol pairs by corpus frequency — the first merge
    iteration of BPE tokenizer training. The corpus is touched exactly
    once (token-key shuffle to the word-frequency table); all pair work
    explodes from DISTINCT words weighted by count, so the second
    shuffle is vocabulary-sized regardless of corpus size. See
    operators.textstats.bpe_pair_counts."""
    return textstats.bpe_pair_counts(
        load_docs(spark, sf_dir), "text", top=BPE_TOP
    )


# --------------------------------------------------------------------- #
# Temperature-based multilingual sampling quotas (mBERT/XLM-R α = 1/2)
# --------------------------------------------------------------------- #

TEMP_SAMPLE_TOTAL = 200


@register(
    "temperature_mixture_quotas",
    oracle=f"""
    WITH c AS (
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY lang
    ),
    w AS (
        SELECT lang, n_docs,
               CAST(floor(sqrt(n_docs) * 1000000) AS BIGINT) AS weight_micro
        FROM c
    ),
    t AS (SELECT CAST(sum(CAST(weight_micro AS HUGEINT)) AS HUGEINT) AS tw
          FROM w),
    b AS (
        SELECT lang, n_docs, weight_micro,
               CAST((CAST({TEMP_SAMPLE_TOTAL} AS HUGEINT) * weight_micro)
                    // t.tw AS BIGINT) AS base,
               (CAST({TEMP_SAMPLE_TOTAL} AS HUGEINT) * weight_micro) % t.tw
                   AS rem
        FROM w, t
    ),
    s AS (SELECT CAST({TEMP_SAMPLE_TOTAL} AS BIGINT) - sum(base) AS short
          FROM b),
    r AS (SELECT b.*, row_number() OVER (ORDER BY rem DESC, lang) AS rk
          FROM b)
    SELECT lang, n_docs, weight_micro,
           CAST(base + CASE WHEN rk <= s.short THEN 1 ELSE 0 END AS BIGINT)
               AS quota
    FROM r, s
    """,
)
def temperature_mixture_quotas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language sampling quotas under α = 1/2 temperature smoothing
    (the multilingual-LLM upsampling recipe): quota ∝ sqrt(n_lang).
    sqrt is IEEE-correctly-rounded so the micro-int weight is engine-
    identical; the quota split is DECIMAL(38,0)/HUGEINT integer
    arithmetic (int64 overflows at corpus scale) with the floor-division
    shortfall redistributed by largest remainder so quotas sum to the
    requested total exactly. One partial-agg groupBy + two scalar
    broadcasts + a rank window over the bounded |langs|-row table. See
    operators.sampling.temperature_quotas."""
    return sampling_ops.temperature_quotas(
        load_docs(spark, sf_dir), "lang", total=TEMP_SAMPLE_TOTAL
    )


# --------------------------------------------------------------------- #
# Markov event-transition matrix (clickstream next-event counts)
# --------------------------------------------------------------------- #


@register(
    "event_transitions",
    oracle="""
    WITH s AS (
        SELECT event_type AS from_state,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS to_state
        FROM events
    )
    SELECT from_state, to_state, CAST(count(*) AS BIGINT) AS n_transitions
    FROM s WHERE to_state IS NOT NULL
    GROUP BY from_state, to_state
    """,
)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts over the per-user event
    stream, ordered by (ts, event_id) so same-timestamp neighbors are
    deterministic. One user-partitioned window (no global sort) + a
    |states|²-row groupBy. See operators.temporal.event_transitions."""
    ev = load_events(spark, sf_dir)
    return temporal_ops.event_transitions(
        ev, "user_id", ["ts", "event_id"], "event_type"
    )


# --------------------------------------------------------------------- #
# Multi-step windowed funnel (ClickHouse windowFunnel as a HOF fold)
# --------------------------------------------------------------------- #

WFUNNEL_STEPS = ["signup", "view", "click", "purchase"]
WFUNNEL_SPAN_US = 6 * 3600 * 1_000_000  # 6 hours, µs (ns on the Spark side)


@register(
    "window_funnel_steps",
    oracle=f"""
    WITH e AS (
        SELECT user_id, event_type, epoch_us(ts) AS t FROM events
    ),
    s1 AS (SELECT user_id, min(t) AS t1 FROM e
           WHERE event_type = '{WFUNNEL_STEPS[0]}' GROUP BY user_id),
    s2 AS (SELECT e.user_id, min(t) AS t2, min(t1) AS t1
           FROM e JOIN s1 USING (user_id)
           WHERE event_type = '{WFUNNEL_STEPS[1]}'
             AND t > t1 AND t - t1 <= {WFUNNEL_SPAN_US}
           GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, min(t) AS t3, min(t1) AS t1
           FROM e JOIN s2 USING (user_id)
           WHERE event_type = '{WFUNNEL_STEPS[2]}'
             AND t > t2 AND t - t1 <= {WFUNNEL_SPAN_US}
           GROUP BY e.user_id),
    s4 AS (SELECT e.user_id, min(t) AS t4
           FROM e JOIN s3 USING (user_id)
           WHERE event_type = '{WFUNNEL_STEPS[3]}'
             AND t > t3 AND t - t1 <= {WFUNNEL_SPAN_US}
           GROUP BY e.user_id)
    SELECT CAST(v.step AS INTEGER) AS step, v.step_name,
           CAST(v.n AS BIGINT) AS n_entities
    FROM (VALUES
        (1, '{WFUNNEL_STEPS[0]}', (SELECT count(*) FROM s1)),
        (2, '{WFUNNEL_STEPS[1]}', (SELECT count(*) FROM s2)),
        (3, '{WFUNNEL_STEPS[2]}', (SELECT count(*) FROM s3)),
        (4, '{WFUNNEL_STEPS[3]}', (SELECT count(*) FROM s4))
    ) AS v(step, step_name, n)
    """,
)
def window_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-step windowed funnel (signup → view → click → purchase within
    6 hours of the first signup, strict order, first-match semantics) —
    the ClickHouse ``windowFunnel`` aggregate. The implementation is a
    single groupBy + codegen'd ``aggregate``-HOF fold per user (events
    sorted row-locally, bounded by the user's own history); the naive
    SQL shape the oracle uses is |steps| sequential corpus joins —
    first-match semantics make the two provably equal, which is what
    lets a fold-based operator carry a value-exact oracle at all. See
    operators.temporal.window_funnel."""
    ev = load_events(spark, sf_dir)
    return temporal_ops.window_funnel(
        ev, "user_id", "ts", "event_id", "event_type",
        steps=WFUNNEL_STEPS, span=WFUNNEL_SPAN_US * 1000,
    )


# --------------------------------------------------------------------- #
# Scalar (SQ8) and binary sign-bit quantization — the compression tiers
# below PQ (index/quant.py); scoring is pure integer arithmetic
# --------------------------------------------------------------------- #

EMB_DIM = 64


@register(
    "sq8_quant_topk",
    oracle=f"""
    WITH dims AS (SELECT unnest(range(1, {EMB_DIM + 1})) AS i),
    mm AS (
        SELECT i, min(e.embedding[i]::DOUBLE) AS mn,
               max(e.embedding[i]::DOUBLE) AS mx
        FROM embeddings e, dims GROUP BY i
    ),
    arrs AS (
        SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs FROM mm
    ),
    enc AS (
        SELECT e.vec_id, e.label,
               list_transform(range(1, {EMB_DIM + 1}), i ->
                   CASE WHEN (a.mxs[i] - a.mns[i]) > 0
                        THEN LEAST(255, GREATEST(0,
                             CAST(floor((e.embedding[i]::DOUBLE - a.mns[i])
                                        * 255.0 / (a.mxs[i] - a.mns[i]))
                                  AS BIGINT)))
                        ELSE 0 END) AS codes
        FROM embeddings e, arrs a
    ),
    qw AS (
        SELECT list_transform(range(1, {EMB_DIM + 1}), i ->
                   CAST(floor(e.embedding[i]::DOUBLE
                              * (a.mxs[i] - a.mns[i]) * 1000000.0)
                        AS BIGINT)) AS w
        FROM embeddings e, arrs a WHERE e.vec_id = {KNN_QUERY_ID}
    )
    SELECT enc.vec_id, enc.label,
           CAST(list_sum(list_transform(range(1, {EMB_DIM + 1}),
                i -> enc.codes[i] * qw.w[i])) AS BIGINT) AS score_int
    FROM enc, qw
    ORDER BY score_int DESC, enc.vec_id
    LIMIT {KNN_K}
    """,
)
def sq8_quant_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric SQ8 top-k (FAISS ScalarQuantizer + ADC): per-dim
    min/max trained in ONE dim-key aggregation (d rows of driver state —
    the IVF/PQ trainer contract); the query folds into micro-int ADC
    weights so scoring is a map-only codegen'd INTEGER dot product that
    is rank-faithful to the true inner product (the dropped term is
    corpus-constant); top-k is TakeOrderedAndProject. Zero shuffle on
    the search path; integer scores make the oracle hash-exact. See
    index.quant.sq8_topk."""
    from ..index import quant

    emb = load_embeddings(spark, sf_dir)
    qvec = (
        emb.filter(F.col("vec_id") == KNN_QUERY_ID)
        .select("embedding")
        .collect()[0][0]
    )
    mins, maxes = quant.sq8_train(emb, "embedding", EMB_DIM)
    return quant.sq8_topk(
        emb, "vec_id", "embedding", qvec, mins, maxes,
        k=KNN_K, extra_cols=["label"],
    )


@register(
    "binary_quant_knn",
    oracle=f"""
    WITH b AS (
        SELECT vec_id, label,
               list_transform(range(0, {EMB_DIM // 32}), j ->
                   CAST(list_sum(list_transform(range(0, 32), i ->
                       CASE WHEN embedding[j * 32 + i + 1] > 0
                            THEN CAST(1 AS BIGINT) << i
                            ELSE CAST(0 AS BIGINT) END)) AS BIGINT)
               ) AS words
        FROM embeddings
    ),
    q AS (SELECT words AS qw FROM b WHERE vec_id = {KNN_QUERY_ID})
    SELECT b.vec_id, b.label,
           CAST(list_sum(list_transform(range(1, {EMB_DIM // 32 + 1}),
                k -> bit_count(xor(b.words[k], q.qw[k])))) AS BIGINT)
               AS hamming
    FROM b, q
    ORDER BY hamming, b.vec_id
    LIMIT {KNN_K}
    """,
)
def binary_quant_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantization kNN: the corpus packed to ONE int64 of sign
    bits per vector (32x compression — the candidate tier of modern BQ
    vector stores), ranked by Hamming distance ``bit_count(XOR)``.
    Map-only encode, zero-shuffle TakeOrderedAndProject; integer
    distances ⇒ hash-exact oracle. See index.quant."""
    from ..index import quant

    emb = load_embeddings(spark, sf_dir)
    qvec = (
        emb.filter(F.col("vec_id") == KNN_QUERY_ID)
        .select("embedding")
        .collect()[0][0]
    )
    return quant.binary_topk(
        emb, "vec_id", "embedding", qvec, k=KNN_K, extra_cols=["label"]
    )


# --------------------------------------------------------------------- #
# Incremental ingest dedup (new batch vs already-ingested history)
# --------------------------------------------------------------------- #


@register(
    "incremental_dedup_ingest",
    oracle="""
    WITH hist AS (SELECT md5(coalesce(text, '')) AS h FROM documents
                  WHERE doc_id % 10 <> 0),
    b AS (SELECT doc_id, md5(coalesce(text, '')) AS h FROM documents
          WHERE doc_id % 10 = 0),
    fst AS (SELECT h, min(doc_id) AS first_id FROM b GROUP BY h),
    hh AS (SELECT DISTINCT h FROM hist WHERE h IN (SELECT h FROM b))
    SELECT b.doc_id,
           CASE WHEN hh.h IS NOT NULL THEN 'history_dup'
                WHEN b.doc_id > fst.first_id THEN 'batch_dup'
                ELSE 'novel' END AS status
    FROM b JOIN fst USING (h) LEFT JOIN hh ON hh.h = b.h
    """,
)
def incremental_dedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup: the doc_id %10 == 0 slice plays the
    newly-crawled batch, the rest the ingested history. The batch's
    distinct hash set is broadcast against ONE map-side semi-join pass
    over history — the 100 TB side never shuffles; within-batch
    first-occurrence is an argmin on the batch alone. See
    operators.dedup.incremental_dedup."""
    docs = load_docs(spark, sf_dir)
    history = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    return dedup.incremental_dedup(history, batch, "doc_id", "text")


# --------------------------------------------------------------------- #
# Exact integer z-score outlier gate (per-user anomaly counts)
# --------------------------------------------------------------------- #


@register(
    "value_outliers_zscore",
    oracle="""
    WITH e AS (
        SELECT user_id,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM events
    ),
    st AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS n,
               sum(cents) AS s, sum(cents * cents) AS q
        FROM e GROUP BY user_id
    )
    SELECT e.user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN (st.n * e.cents - st.s)
                              * (st.n * e.cents - st.s)
                         > 4 * (st.n * st.q - st.s * st.s)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM e JOIN st USING (user_id)
    GROUP BY e.user_id
    """,
)
def value_outliers_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user |x − μ| > 2σ anomaly counts with the mean/variance kept
    as exact integer sums (cents) and the test cross-multiplied to
    (n·x − S)² > 4(n·Q − S²) — float μ/σ would make the verdict depend
    on partial-aggregation order; integers cannot. One key shuffle to
    |users| stat rows, one join back, one rollup. See
    operators.quantiles.integer_zscore_outliers."""
    from ..operators.quantiles import integer_zscore_outliers

    ev = load_events(spark, sf_dir).select(
        "user_id",
        (dec("value", 2) * 100).cast("long").alias("cents"),
    )
    return integer_zscore_outliers(ev, "user_id", "cents", k=2)


# --------------------------------------------------------------------- #
# Top per-user-day event paths (journey/path mining)
# --------------------------------------------------------------------- #

PATHS_TOP = 20


@register(
    "top_event_paths",
    oracle=f"""
    WITH p AS (
        SELECT user_id, epoch_us(ts) // 86400000000 AS day,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        FROM events GROUP BY 1, 2
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n_journeys
    FROM p GROUP BY path
    ORDER BY n_journeys DESC, path
    LIMIT {PATHS_TOP}
    """,
)
def top_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Journey path mining: each (user, UTC day) becomes its ordered
    event-type path string; output the most common journeys. One
    (user, day) groupBy whose collect is bounded by the entity-day's
    own history (row-local sort — no window), then a path-key rollup.
    Order totalized by (ts, event_id)."""
    ev = load_events(spark, sf_dir)
    day = F.expr(f"ts div {NANOS_PER_DAY}")  # exact integer ns→day
    path = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("ts"), F.col("event_id"), F.col("event_type")
                    )
                )
            ),
            lambda x: x["event_type"],
        ),
        ">",
    )
    return (
        ev.groupBy(F.col("user_id"), day.alias("__day"))
        .agg(path.alias("path"))
        .groupBy("path")
        .agg(F.count("*").alias("n_journeys"))
        .orderBy(F.desc("n_journeys"), "path")
        .limit(PATHS_TOP)
    )


# --------------------------------------------------------------------- #
# Count-min sketch heavy hitters (mergeable d·w-int sketch, value-exact
# because the hash family is md5-derived and replayable)
# --------------------------------------------------------------------- #

CMS_DEPTH = 4
CMS_WIDTH = 64
CMS_TOP = 10


def _cms_cell_sql(tok: str, j: str) -> str:
    return (
        f"CAST(concat('0x', substr(md5(concat({tok}, '#', "
        f"CAST({j} AS VARCHAR))), 1, 6)) AS BIGINT) % {CMS_WIDTH}"
    )


@register(
    "cms_heavy_hitters",
    oracle=f"""
    WITH toks AS (
        SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS t
        FROM documents
    ),
    occ AS (SELECT t, j FROM toks, unnest(range(0, {CMS_DEPTH})) AS u(j)),
    sketch AS (
        SELECT j, {_cms_cell_sql('t', 'j')} AS cell,
               CAST(count(*) AS BIGINT) AS cnt
        FROM occ GROUP BY 1, 2
    ),
    exact AS (
        SELECT t, CAST(count(*) AS BIGINT) AS exact_count
        FROM toks GROUP BY t
        ORDER BY exact_count DESC, t LIMIT {CMS_TOP}
    ),
    probe AS (
        SELECT e.t, e.exact_count, u.j,
               {_cms_cell_sql('e.t', 'u.j')} AS cell
        FROM exact e, unnest(range(0, {CMS_DEPTH})) AS u(j)
    )
    SELECT p.t AS token, p.exact_count,
           min(coalesce(s.cnt, 0)) AS cms_estimate
    FROM probe p LEFT JOIN sketch s ON s.j = p.j AND s.cell = p.cell
    GROUP BY p.t, p.exact_count
    ORDER BY p.exact_count DESC, token
    """,
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch audit: exact top-10 token counts next to
    their sketch estimates. The build shuffles at most d·w rows per
    task (map-side combine onto the 256 cells); per-slice sketches
    merge by cell-wise SUM. md5-derived hashing makes even the
    overestimates engine-exact. See operators.sketch."""
    from ..operators import sketch

    return sketch.cms_heavy_hitters(
        load_docs(spark, sf_dir), "text",
        top=CMS_TOP, depth=CMS_DEPTH, width=CMS_WIDTH,
    )


# --------------------------------------------------------------------- #
# Streaming CDC apply: the E66 MERGE driven by an availableNow change
# feed, one apply_cdc per micro-batch, final snapshot hash-verified
# --------------------------------------------------------------------- #


@register("streaming_cdc_snapshot", oracle=_CDC_MERGE_ORACLE)
def streaming_cdc_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The E66 CDC MERGE driven as a STREAM: the order change log is fed
    in two sequence-ordered availableNow micro-batches; ``foreachBatch``
    applies each batch to the running snapshot with the same
    ``apply_cdc`` operator, swapping snapshot versions per batch (the
    lakehouse MERGE-per-micro-batch pattern). Because slices are split
    BY SEQUENCE (order day) and each apply collapses its batch to
    latest-per-key, the sequential composition provably equals the
    one-shot global latest-per-key MERGE — which is exactly what the
    oracle computes. Change rows carry the full image (balance +
    segment), the real-CDC convention that makes delete-then-reinsert
    lossless."""
    import tempfile
    import uuid

    from ..operators import cdc

    cust = load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_mktsegment").alias("seg"),
        dec("c_acctbal", 2).alias("bal"),
    )
    seg_dim = load(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("seg")
    )
    changes = _order_changes(spark, sf_dir).join(
        F.broadcast(seg_dim), "c_custkey"
    )
    mid = changes.select(
        F.expr("percentile(CAST(d AS DOUBLE), 0.5)").alias("m")
    ).collect()[0]["m"]
    with tempfile.TemporaryDirectory() as tmp:
        src = f"{tmp}/cdc_log"
        _write_ordered_slices(
            src,
            [changes.filter(F.col("d") < mid),
             changes.filter(F.col("d") >= mid)],
        )
        state = {"path": f"{tmp}/snap_base"}
        cust.write.parquet(state["path"])

        def apply_batch(batch_df, batch_id):
            snap = batch_df.sparkSession.read.parquet(state["path"])
            merged = cdc.apply_cdc(
                snap, batch_df, "c_custkey",
                seq_cols=["d", "ok"], op_col="op",
                payload_cols=["bal", "seg"],
            )
            new_path = f"{tmp}/snap_{batch_id}_{uuid.uuid4().hex[:8]}"
            merged.write.parquet(new_path)
            state["path"] = new_path

        q = (
            spark.readStream.schema(changes.schema)
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(src)
            .writeStream.foreachBatch(apply_batch)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        final = (
            spark.read.parquet(state["path"])
            .groupBy(F.col("seg").alias("c_mktsegment"))
            .agg(
                F.count("*").alias("n_live"),
                F.round(F.sum("bal"), 2).cast("double").alias("balance"),
            )
        )
        final = final.localCheckpoint(eager=True)  # durable past the tmpdir cleanup (cache is evictable)
        return final


# --------------------------------------------------------------------- #
# HyperLogLog distinct audit (md5-replayable registers; the float
# estimate is deterministic because Σ 2^-M terms span ≤ 25 mantissa
# bits — see operators.sketch.hll_distinct_estimate)
# --------------------------------------------------------------------- #


@register(
    "hll_distinct_audit",
    oracle="""
    WITH toks AS (
        SELECT lang,
               unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS t
        FROM documents
    ),
    h AS (
        SELECT lang, t,
               CAST(concat('0x', substr(md5(t), 1, 6)) AS BIGINT) AS hv
        FROM toks
    ),
    br AS (
        SELECT lang, hv % 64 AS b, (hv - hv % 64) // 64 AS rest FROM h
    ),
    rk AS (
        SELECT lang, b,
               18 - list_max(list_transform(range(0, 18),
                   k -> CASE WHEN rest >= (CAST(1 AS BIGINT) << CAST(k AS INTEGER))
                             THEN k ELSE -1 END)) AS r
        FROM br
    ),
    regs AS (SELECT lang, b, max(r) AS m FROM rk GROUP BY lang, b),
    pg AS (
        SELECT lang, sum(1.0 / (CAST(1 AS BIGINT) << CAST(m AS INTEGER))) AS s,
               CAST(count(*) AS BIGINT) AS nb
        FROM regs GROUP BY lang
    ),
    est AS (
        SELECT lang,
               CAST(floor(0.709 * 64 * 64 / (s + (64 - nb)) * 1000000)
                    AS BIGINT) AS hll_micro_estimate
        FROM pg
    ),
    ex AS (
        SELECT lang, CAST(count(DISTINCT t) AS BIGINT) AS exact_distinct
        FROM toks GROUP BY lang
    )
    SELECT ex.lang, ex.exact_distinct, est.hll_micro_estimate
    FROM ex JOIN est USING (lang)
    ORDER BY ex.lang
    """,
)
def hll_distinct_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language HLL distinct-token estimate vs the exact DISTINCT —
    the audit before trusting HLL where exact counting is unaffordable.
    Registers build in one key shuffle bounded at |langs|·64 rows per
    task (map-side MAX partials); per-slice registers merge by
    cell-wise MAX. The md5 hash family and the bounded-mantissa sum
    argument make even the float estimate hash-exact. See
    operators.sketch.hll_distinct_estimate."""
    from ..operators import sketch
    from ..functions.text import tokenize

    toks = load_docs(spark, sf_dir).select(
        "lang", F.explode(tokenize("text")).alias("t")
    )
    return sketch.hll_distinct_estimate(toks, "lang", "t")


# --------------------------------------------------------------------- #
# RAG context assembly: retrieval (the reference's core, O19) feeding
# chunking + token budgeting (the LLM-pipeline side) in ONE plan
# --------------------------------------------------------------------- #

RAG_K = 5
RAG_CHUNK = 16
RAG_BUDGET = 64


@register(
    "rag_context_assembly",
    oracle=f"""
    WITH q AS (
        SELECT embedding::DOUBLE[] AS qv FROM embeddings
        WHERE vec_id = {KNN_QUERY_ID}
    ),
    topk AS (
        SELECT vec_id, rank FROM (
            SELECT e.vec_id,
                   row_number() OVER (
                       ORDER BY list_cosine_similarity(
                           e.embedding::DOUBLE[], q.qv) DESC, e.vec_id
                   ) AS rank
            FROM embeddings e, q
        ) t WHERE rank <= {RAG_K}
    ),
    d AS (
        SELECT t.rank, doc.doc_id,
               list_filter(string_split(doc.text, ' '), x -> x <> '') AS ws
        FROM topk t JOIN documents doc ON doc.doc_id = t.vec_id
    ),
    c AS (
        SELECT rank, doc_id, ws, len(ws) AS n,
               CASE WHEN len(ws) <= {RAG_CHUNK} THEN 1
                    ELSE 1 + (len(ws) - 1) // {RAG_CHUNK} END AS nc
        FROM d
    ),
    ch AS (
        SELECT rank, doc_id, chunk_id,
               CAST(least({RAG_CHUNK}, n - chunk_id * {RAG_CHUNK}) AS BIGINT)
                   AS n_chunk_tokens,
               md5(array_to_string(
                   list_slice(ws, chunk_id * {RAG_CHUNK} + 1,
                              least(n, chunk_id * {RAG_CHUNK} + {RAG_CHUNK})),
                   ' ')) AS chunk_md5
        FROM (SELECT rank, doc_id, ws, n, nc, unnest(range(nc)) AS chunk_id
              FROM c)
    ),
    sel AS (
        SELECT rank, doc_id, chunk_id, n_chunk_tokens, chunk_md5,
               CAST(sum(n_chunk_tokens) OVER (
                   ORDER BY rank, chunk_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cum_tokens
        FROM ch
    )
    SELECT CAST(rank AS INTEGER) AS rank, doc_id,
           CAST(chunk_id AS INTEGER) AS chunk_id,
           n_chunk_tokens, cum_tokens, chunk_md5
    FROM sel WHERE cum_tokens <= {RAG_BUDGET}
    """,
)
def rag_context_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end RAG context construction: exact top-5 retrieval
    (the reference's similarity_search, NMR:388) → join the document
    texts → non-overlapping 16-token chunks → greedy prefix
    under a 64-token context budget, in relevance order. The
    corpus-facing stage is the zero-shuffle top-k scan; everything
    after operates on k retrieved rows (broadcast joins, a window over
    ≤ k·chunks rows — bounded by k, never by the corpus), so the
    assembly adds nothing to the retrieval cost class."""
    from ..operators import packing

    emb = load(spark, sf_dir, "embeddings")
    qvec = (
        emb.filter(F.col("vec_id") == KNN_QUERY_ID)
        .select("embedding")
        .collect()[0][0]
    )
    idx = VectorIndex(emb, key="vec_id", vector_col="embedding",
                      dim=len(qvec))
    topk = idx.search(qvec, k=RAG_K).select(
        "vec_id", "score"
    )
    ranked = topk.select(
        F.col("vec_id").alias("doc_id"),
        F.row_number()
        .over(Window.orderBy(F.desc("score"), "vec_id"))
        .alias("rank"),  # window over k rows — bounded by k, not corpus
    )
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    hits = docs.join(F.broadcast(ranked), "doc_id")
    chunks = packing.chunk_tokens(
        hits, "doc_id", "text", window=RAG_CHUNK, stride=RAG_CHUNK
    )
    joined = chunks.join(F.broadcast(ranked), "doc_id").select(
        "rank", "doc_id", "chunk_id",
        F.col("n_chunk_tokens").cast("long").alias("n_chunk_tokens"),
        F.md5("chunk_text").alias("chunk_md5"),
    )
    cum = F.sum("n_chunk_tokens").over(
        Window.orderBy("rank", "chunk_id").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )  # ≤ k·chunks rows — the retrieval set, never the corpus
    )
    return (
        joined.withColumn("cum_tokens", cum)
        .filter(F.col("cum_tokens") <= RAG_BUDGET)
        .select(
            "rank", "doc_id", "chunk_id", "n_chunk_tokens",
            "cum_tokens", "chunk_md5",
        )
    )


# --------------------------------------------------------------------- #
# Video frame sampling (the third multimodal column family: E9's video
# sibling of image_pipeline / audio_chunks)
# --------------------------------------------------------------------- #

VIDEO_REPEAT = 400  # payload = text × 400 → multi-frame fake videos


@register(
    "video_frame_samples",
    oracle=f"""
    WITH sel AS (SELECT doc_id, text FROM documents WHERE doc_id < 20),
    f AS (
        SELECT 'vid_' || lpad(CAST(doc_id AS VARCHAR), 4, '0') || '.mp4'
                   AS filename,
               repeat(text, {VIDEO_REPEAT}) AS payload
        FROM sel
    ),
    n AS (
        SELECT filename, payload,
               least(16, greatest(1,
                     octet_length(encode(payload)) // 4096)) AS nf
        FROM f
    )
    SELECT filename, CAST(i AS BIGINT) AS frame_idx,
           CAST(i * 1000 AS BIGINT) AS ts_ms,
           md5(payload || CAST(i AS VARCHAR)) AS frame_md5
    FROM (SELECT filename, payload, nf, unnest(range(nf)) AS i FROM n)
    """,
)
def video_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E9, video column: binary ingest of (synthetic, text-derived)
    video payloads → ``sample_frames`` flat-map (one row per sampled
    frame via mapInPandas — partition-local, no shuffle; the stub
    decoder derives frame count from byte length and frame bytes from
    md5(payload ‖ index), both replayed exactly by the oracle; a real
    ffmpeg decoder slots into the same schema/batch contract). Output:
    (filename, frame_idx, ts_ms, frame_md5)."""
    import os
    import tempfile

    from ..multimodal.images import sample_frames
    from ..sources import ingest_binary_dir

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    payloads = [
        (r["doc_id"], (r["text"] * VIDEO_REPEAT).encode("utf-8"))
        for r in docs.collect()
    ]
    with tempfile.TemporaryDirectory() as tmp:
        for i, payload in payloads:
            with open(os.path.join(tmp, f"vid_{i:04d}.mp4"), "wb") as f:
                f.write(payload)
        vids = ingest_binary_dir(spark, tmp, glob="*.mp4")
        frames = sample_frames(vids, every_ms=1000, max_frames=16)
        res = frames.select(
            F.element_at(F.split("path", "/"), -1).alias("filename"),
            F.col("frame_idx").cast("long").alias("frame_idx"),
            F.col("ts_ms").cast("long").alias("ts_ms"),
            F.lower(F.hex("frame")).alias("frame_md5"),
        )
        res = res.localCheckpoint(eager=True)  # durable past the tmpdir cleanup (cache is evictable)
        return res


# --------------------------------------------------------------------- #
# E88 — BPE tokenizer training loop (round 5): the full merge loop over
# the corpus, not just the single-pair statistic of
# bpe_merge_candidates. The oracle unrolls every merge round in SQL —
# the same unrolling discipline as the graph-beam walk — using the
# identical \x01-framed string representation and left-to-right
# non-overlapping replace() semantics (verified equal to a reference
# list-walk BPE in pytest).
# --------------------------------------------------------------------- #

BPE_TRAIN_MERGES = 6


def _bpe_round_ctes(i: int) -> str:
    """One unrolled BPE merge round: weighted pair counts over the
    framed vocab w{i}, 1-row argmax b{i} (count desc, lexicographic),
    re-segmented vocab w{i+1} via one replace. The re-segmentation is a
    LEFT JOIN ON TRUE, not a cross join: when a round has no mergeable
    pair left (b{i} empty — a corpus whose tokens fully merge before
    the requested round count), a cross join would wipe the whole
    vocabulary and every later round with it; the left join carries the
    vocab through unchanged (COALESCE keeps enc when there is no merge),
    exactly mirroring the Spark loop's early break."""
    return f"""
    p{i} AS (
        SELECT p.a AS a, p.b AS b, sum(f) AS c FROM (
            SELECT unnest(list_transform(range(1, len(s)),
                          j -> {{'a': s[j], 'b': s[j+1]}})) AS p, f
            FROM (SELECT string_split(substr(enc, 2, length(enc) - 2),
                         chr(2) || chr(1)) AS s, f FROM w{i})
        ) GROUP BY 1, 2
    ),
    b{i} AS (SELECT a, b, c FROM p{i} ORDER BY c DESC, a, b LIMIT 1),
    w{i + 1} AS (
        SELECT CASE WHEN b{i}.a IS NULL THEN enc
                    ELSE replace(enc, chr(1)||b{i}.a||chr(2)||chr(1)||b{i}.b||chr(2),
                                 chr(1)||b{i}.a||b{i}.b||chr(2)) END AS enc,
               f
        FROM w{i} LEFT JOIN b{i} ON TRUE
    )"""


@register(
    "bpe_train_merges",
    oracle="""
    WITH wc AS (
        SELECT t, count(*) AS f FROM (
            SELECT unnest(list_filter(string_split(text, ' '),
                                      x -> x <> '' AND strpos(x, chr(1)) = 0
                                           AND strpos(x, chr(2)) = 0)) AS t
            FROM documents
        ) GROUP BY t
    ),
    w0 AS (
        SELECT regexp_replace(t, '(.)', chr(1) || '\\1' || chr(2), 'g')
                   AS enc, f
        FROM wc
    ),"""
    + ",".join(_bpe_round_ctes(i) for i in range(BPE_TRAIN_MERGES))
    + " "
    + " UNION ALL ".join(
        f"SELECT {i + 1} AS merge_rank, a AS lhs, b AS rhs, "
        f"a||b AS merged, CAST(c AS BIGINT) AS pair_count FROM b{i}"
        for i in range(BPE_TRAIN_MERGES)
    ),
)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E88: BPE tokenizer training — the first {6} learned merges with
    their corpus pair counts. Corpus-sized work happens exactly once
    (the token-key shuffle that builds the word-frequency table); each
    merge round is a vocab-sized pair aggregate + a 1-row argmax + one
    codegen'd string replace (operators/textstats.py::bpe_train).
    Deterministic (integer counts, lexicographic tie-breaks), so the
    whole loop replays round-for-round in unrolled SQL."""
    from ..operators.textstats import bpe_train

    docs = load_docs(spark, sf_dir)
    return bpe_train(docs, "text", merges=BPE_TRAIN_MERGES).select(
        "merge_rank", "lhs", "rhs", "merged", "pair_count"
    )


BPE_COVERAGE_TOP = 20


@register(
    "bpe_vocab_coverage",
    oracle="""
    WITH wc AS (
        SELECT t, count(*) AS f FROM (
            SELECT unnest(list_filter(string_split(text, ' '),
                                      x -> x <> '' AND strpos(x, chr(1)) = 0
                                           AND strpos(x, chr(2)) = 0)) AS t
            FROM documents
        ) GROUP BY t
    ),
    w0 AS (
        SELECT regexp_replace(t, '(.)', chr(1) || '\\1' || chr(2), 'g')
                   AS enc, f
        FROM wc
    ),"""
    + ",".join(_bpe_round_ctes(i) for i in range(BPE_TRAIN_MERGES))
    + f"""
    SELECT sym AS symbol, CAST(sum(f) AS BIGINT) AS n_occ FROM (
        SELECT unnest(string_split(substr(enc, 2, length(enc) - 2),
                      chr(2) || chr(1))) AS sym, f
        FROM w{BPE_TRAIN_MERGES}
    )
    GROUP BY sym
    ORDER BY n_occ DESC, sym
    LIMIT {BPE_COVERAGE_TOP}
    """,
)
def bpe_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E88 inference side: segment the corpus with the {6} merges
    bpe_train just learned (operators/textstats.py::bpe_segment — the
    whole segmentation is len(merges) chained codegen'd replaces over
    the vocab-sized word table) and report the top-{20} symbols by
    corpus occurrence — the vocabulary-coverage statistic a tokenizer
    rollout monitors. The oracle re-derives the merges AND the
    segmentation from the same unrolled CTEs, so train and encode are
    pinned against each other: a drift in either flips the hash."""
    from ..operators.textstats import bpe_segment, bpe_train, bpe_word_counts

    docs = load_docs(spark, sf_dir)
    # ONE corpus→vocab collapse shared by train and segment
    # (checkpointed so neither stage re-runs the token-key shuffle)
    wc = bpe_word_counts(docs, "text").localCheckpoint(eager=True)
    merges = [
        (r["lhs"], r["rhs"])
        for r in bpe_train(
            docs, "text", merges=BPE_TRAIN_MERGES, word_counts=wc
        )
        .orderBy("merge_rank")
        .collect()
    ]
    seg = bpe_segment(docs, "text", merges, word_counts=wc)
    return (
        seg.select(F.explode("symbols").alias("symbol"), "corpus_count")
        .groupBy("symbol")
        .agg(F.sum("corpus_count").alias("n_occ"))
        .orderBy(F.desc("n_occ"), "symbol")
        .limit(BPE_COVERAGE_TOP)
    )


QSKETCH_QS = [0.25, 0.5, 0.75, 0.9]
QSKETCH_ACC = 100


@register(
    "quantile_sketch_audit",
    oracle=f"""
    SELECT l.l_returnflag, q.q_micro, CAST(1 AS BIGINT) AS within
    FROM (SELECT DISTINCT l_returnflag FROM lineitem) l
    CROSS JOIN (
        SELECT unnest([{", ".join(str(int(round(q * 1_000_000))) for q in QSKETCH_QS)}]) AS q_micro
    ) q
    ORDER BY l.l_returnflag, q.q_micro
    """,
)
def quantile_sketch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E89: mergeable quantile sketch (percentile_approx / Greenwald-
    Khanna) with its rank-error contract pinned — the quantile analog
    of the CMS/HLL audit rows. The sketch is the 100 TB quantile path
    (single-pass mergeable partial aggregates; the exact alternative is
    winsorized_stats' range-exchange order statistics); the audit ranks
    each returned value with one extra conditional-count scan and
    checks |true_rank/n - q| <= 1/accuracy in integer micro-units. The
    oracle is the expected-if-healthy answer (every group x quantile
    within bound — the brp_lsh_recall pattern): a sketch regression or
    misused accuracy knob flips the hash."""
    from ..operators.quantiles import quantile_sketch_audit as qsa

    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_extendedprice").cast("double").alias("p")
    )
    return qsa(
        li, "l_returnflag", "p", QSKETCH_QS, accuracy=QSKETCH_ACC
    ).orderBy("l_returnflag", "q_micro")


# Coreset / selection operators (round 7: E93-E95)
# --------------------------------------------------------------------- #

KCENTER_K = 6


def _kcenter_sql(k: int) -> str:
    """Greedy farthest-point sampling unrolled as one CTE per selection
    round (the pagerank_trade_graph unrolling discipline): c1 is the
    min-id seed; c{r} picks the corpus row minimizing greatest(cos to
    every prior center) with (sim asc, id asc) tie-breaks — exactly the
    argmax-distance step operators.coreset.greedy_kcenter runs as a
    Spark scan per round."""
    ctes = [
        "v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS vec"
        " FROM embeddings)",
        "c1 AS (SELECT id, vec FROM v ORDER BY id LIMIT 1)",
    ]
    prev = ["c1"]
    for r in range(2, k + 1):
        sims = ", ".join(
            f"list_cosine_similarity(v.vec, {p}.vec)" for p in prev
        )
        simexpr = sims if len(prev) == 1 else f"greatest({sims})"
        notin = ", ".join(f"{p}.id" for p in prev)
        ctes.append(
            f"c{r} AS (SELECT v.id, v.vec, {simexpr} AS sim "
            f"FROM v, {', '.join(prev)} WHERE v.id NOT IN ({notin}) "
            f"ORDER BY sim ASC, v.id LIMIT 1)"
        )
        prev.append(f"c{r}")
    selects = [
        "SELECT CAST(1 AS BIGINT) AS sel_rank, c1.id AS vec_id,"
        " CAST(0 AS BIGINT) AS dist_micro FROM c1"
    ]
    for r in range(2, k + 1):
        selects.append(
            f"SELECT CAST({r} AS BIGINT), c{r}.id,"
            f" CAST(floor((1.0 - c{r}.sim) * 1000000) AS BIGINT)"
            f" FROM c{r}"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL ".join(selects)


@register("kcenter_coreset", oracle=_kcenter_sql(KCENTER_K))
def kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E93: greedy k-center coreset selection (farthest-point sampling,
    the 2-approximation of Gonzalez 1985 — the selection step of
    coverage-driven data pruning): iteratively add the corpus vector
    farthest in cosine distance from everything selected so far. Spark
    shape: k map-only scans, each a codegen'd greatest() over the
    current centers' literal vectors + TakeOrderedAndProject(1) — the
    corpus never shuffles and only k rows ever reach the driver (the
    IVF driver-state contract), so at 100 TB the cost is k parallel
    scans. Fully deterministic (min-id seed, (sim, id) tie-breaks) —
    the whole selection replays as unrolled SQL CTEs."""
    from ..operators import coreset

    emb = load_embeddings(spark, sf_dir)
    rows = coreset.greedy_kcenter(emb, "vec_id", "embedding", k=KCENTER_K)
    return spark.createDataFrame(
        [(r["rank"], r["id"], r["dist_micro"]) for r in rows],
        "sel_rank long, vec_id long, dist_micro long",
    )


DOMSEL_LABEL = 3
DOMSEL_NPROTO = 8
DOMSEL_N = 20


@register(
    "domain_relevance_select",
    oracle=f"""
    WITH protos AS (
        SELECT pv, row_number() OVER (ORDER BY vec_id) AS rn
        FROM (SELECT vec_id, embedding::DOUBLE[] AS pv FROM embeddings
              WHERE label = {DOMSEL_LABEL} ORDER BY vec_id
              LIMIT {DOMSEL_NPROTO})
    ),
    scored AS (
        SELECT e.vec_id,
               ({" + ".join(
                   f"list_cosine_similarity(e.embedding::DOUBLE[], "
                   f"(SELECT pv FROM protos WHERE rn = {i + 1}))"
                   for i in range(DOMSEL_NPROTO)
               )}) / {DOMSEL_NPROTO}.0 AS s
        FROM embeddings e
    )
    SELECT vec_id, CAST(floor(s * 1000000) AS BIGINT) AS rel_micro
    FROM scored ORDER BY s DESC, vec_id LIMIT {DOMSEL_N}
    """,
)
def domain_relevance_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E94: representation-based data selection (the embedding-space
    counterpart of DSIR — RDS in Xie et al. 2023 §5): score every
    corpus vector by mean cosine to a small deterministic prototype
    panel of the target domain (label {3}'s smallest-id vectors) and
    keep the top-{20}. One map-only scan (prototypes ride as literals)
    + TakeOrderedAndProject — no shuffle, corpus-size-independent
    driver state. The mean is a LEFT-ASSOCIATED ``+`` chain in
    prototype order (the maxsim_rerank convention) so the float sum
    replays bitwise in SQL."""
    from ..operators import coreset

    emb = load_embeddings(spark, sf_dir)
    protos = [
        [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("label") == DOMSEL_LABEL)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .limit(DOMSEL_NPROTO)
        .collect()
    ]
    return coreset.domain_relevance_select(
        emb, protos, "vec_id", "embedding", DOMSEL_N
    )


LEAK_SPLIT_CUT = "1a"  # md5(rep) < '1a' -> eval (~10.2% of components)


@register(
    "leakage_safe_split",
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
    ),
    lbl AS (SELECT u AS id, least(u, min(v)) AS rep
            FROM (SELECT DISTINCT u, v FROM reach) GROUP BY u),
    assigned AS (
        SELECT d.doc_id AS id, coalesce(lbl.rep, d.doc_id) AS rep,
               CASE WHEN md5(CAST(coalesce(lbl.rep, d.doc_id) AS VARCHAR))
                         < '{LEAK_SPLIT_CUT}'
                    THEN 'eval' ELSE 'train' END AS split
        FROM documents d LEFT JOIN lbl ON lbl.id = d.doc_id
    ),
    straddle AS (
        SELECT count(*) AS n FROM (
            SELECT rep FROM assigned
            GROUP BY rep HAVING count(DISTINCT split) > 1)
    )
    SELECT a.split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT a.rep) AS BIGINT) AS n_components,
           CAST((SELECT n FROM straddle) AS BIGINT) AS n_straddle
    FROM assigned a GROUP BY a.split
    """,
)
def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E95: contamination-safe train/eval split — the assignment step
    every dedup pipeline must END with: a per-DOCUMENT random split
    leaks near-duplicates across the boundary (the eval twin of a train
    doc inflates the score), so the split key is the near-dup
    COMPONENT representative: md5(rep) < '{LEAK_SPLIT_CUT}' sends the
    whole cluster to eval together. Spark: the shared PPJoin-tier
    trigram-Jaccard pair join → size-gated connected components →
    map-only md5 split + one groupBy; the straddle audit (components
    with members in both splits — 0 by construction since split is a
    function of rep) is computed, not asserted, so the oracle replays
    the guarantee itself. Deterministic end to end (md5, min-id reps):
    stable across engines, partitionings, reruns — the property a
    100 TB split needs (no RNG state, no shuffle order dependence)."""
    docs = load_docs(spark, sf_dir)
    pairs = _keep_best_pairs(docs).localCheckpoint(eager=True)
    labels = dedup.resolve_components(
        docs.select(F.col("doc_id").alias("id")), pairs
    )
    assigned = labels.select(
        "id",
        F.col("rep_id").alias("rep"),
        F.when(
            F.md5(F.col("rep_id").cast("string")) < LEAK_SPLIT_CUT, "eval"
        )
        .otherwise("train")
        .alias("split"),
    ).localCheckpoint(eager=True)
    n_straddle = (
        assigned.groupBy("rep")
        .agg(F.countDistinct("split").alias("__k"))
        .filter(F.col("__k") > 1)
        .count()
    )
    return (
        assigned.groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("rep").alias("n_components"),
        )
        .withColumn("n_straddle", F.lit(n_straddle).cast("long"))
    )


PHRASE_QUERY = "table hash value"  # 3-term phrase present at every sf
PHRASE_LIMIT = 20


@register(
    "phrase_search_positional",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, list_filter(string_split(text,' '), t -> t <> '') AS ws
        FROM documents
    ),
    p AS (
        SELECT doc_id, ws[i] AS term, i AS pos
        FROM w, unnest(range(1, len(ws) + 1)) AS t(i)
    ),
    m AS (
        SELECT p0.doc_id
        FROM p p0
        JOIN p p1 ON p1.doc_id = p0.doc_id AND p1.pos = p0.pos + 1
        JOIN p p2 ON p2.doc_id = p0.doc_id AND p2.pos = p0.pos + 2
        WHERE p0.term = 'table' AND p1.term = 'hash' AND p2.term = 'value'
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_occurrences
    FROM m GROUP BY doc_id
    ORDER BY n_occurrences DESC, doc_id LIMIT {PHRASE_LIMIT}
    """,
)
def phrase_search_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E96: exact phrase search over positional inverted-index postings
    — the query class a BM25 bag-of-words (keyword_search_bm25) cannot
    answer, completing the retrieval family's keyword tier. A k-term
    phrase occurs at start s iff term i has a posting at s+i, so the
    match is a chain of k−1 EQUI-joins on (doc_id, pos − i), each side
    pre-filtered to its own term — at 100 TB the postings table is
    materialized partitioned by term and each side is a pruned
    partition read; the joins carry only the phrase terms' postings,
    never the corpus. Integer-exact end to end (positions and counts —
    no float seam), deterministic (count desc, doc_id asc)."""
    from ..operators.hybrid import phrase_search

    docs = load_docs(spark, sf_dir)
    return phrase_search(
        docs, "doc_id", "text", PHRASE_QUERY, limit=PHRASE_LIMIT
    )


CONTAIN_THRESHOLD = 0.8


@register(
    "containment_near_dup",
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
    p AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               len(list_intersect(a.sh, b.sh)) AS shared,
               len(a.sh) AS sz_a, len(b.sh) AS sz_b
        FROM s a JOIN s b ON a.doc_id < b.doc_id
        WHERE len(list_intersect(a.sh, b.sh)) > 0
    )
    SELECT id_a, id_b,
           CAST(shared * 1000000 // sz_a AS BIGINT) AS cont_ab_micro,
           CAST(shared * 1000000 // sz_b AS BIGINT) AS cont_ba_micro
    FROM p
    WHERE shared * 1000000 // sz_a >= {int(CONTAIN_THRESHOLD * 1_000_000)}
       OR shared * 1000000 // sz_b >= {int(CONTAIN_THRESHOLD * 1_000_000)}
    """,
)
def containment_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E97: asymmetric containment pairs — C(A→B) = |A∩B| / |A|,
    Broder's resemblance/containment split: the subset-duplication
    detector symmetric Jaccard misses (a short doc quoted whole inside
    a long one scores near-zero Jaccard but containment 1.0 — the
    RefinedWeb-style sub-document dedup case). Spark: the shared
    inverted-index shape (shingle-hash equi-join, never all-pairs;
    containment admits no symmetric length-ratio prune, so at corpus
    scale pass max_shingle_df to cap hot shingles — lossy only for
    pairs sharing nothing rarer, documented in the operator). Counts
    and sizes are integers; both direction scores are integer-micro
    floor divisions — no float seam anywhere. Oracle: exact all-pairs
    list_intersect replay (the oracle tier's quadratic license)."""
    docs = load_docs(spark, sf_dir)
    return dedup.containment_pairs(
        docs, "doc_id", "text", n=3, threshold=CONTAIN_THRESHOLD
    )
