"""Hybrid (keyword + vector) retrieval with Reciprocal Rank Fusion —
the reference's latent ``query_type="hybrid"`` surface
(``Nomic MultiModal Retrieval.py``:386–387, commented out but declared;
SURVEY.md §2 O20/E7/E8), implemented natively.

Keyword side: TF-IDF scoring from explode+aggregate (one shuffle on the
term key; document frequencies are a tiny broadcastable dim table).
Fusion: RRF — score(d) = Σ_rankings 1/(k0 + rank_d) — a full-outer join of
two small ranked lists, trivially cheap after each side's top-N."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokenize

RRF_K = 60  # standard constant from the original RRF paper (Cormack et al.)


def term_overlap_scores(
    docs: DataFrame, id_col: str, text_col: str, query_terms: list[str]
) -> DataFrame:
    """Simple keyword relevance: number of distinct query terms present.

    SQL-restatable (the oracle uses the same formula), deterministic.
    Returns (id, kw_score) for docs matching ≥1 term."""
    toks = F.array_distinct(tokenize(text_col))
    hits = F.size(
        F.filter(toks, lambda t: t.isin(*query_terms))
    )
    return (
        docs.select(F.col(id_col), hits.alias("kw_score"))
        .filter(F.col("kw_score") > 0)
    )


def tfidf_scores(
    docs: DataFrame, id_col: str, text_col: str, query_terms: list[str]
) -> DataFrame:
    """TF-IDF keyword relevance for the query terms.

    tf(t,d) = term count in doc; idf(t) = ln((N+1)/(df+1)) + 1 (smooth).
    Document frequencies for the handful of query terms form a tiny
    broadcast side; the per-doc term counts come from one explode+groupBy.
    """
    n_docs = docs.count()
    terms = docs.select(
        F.col(id_col).alias("id"), F.explode(tokenize(text_col)).alias("term")
    ).filter(F.col("term").isin(*query_terms))
    tf = terms.groupBy("id", "term").agg(F.count("*").alias("tf"))
    df_ = terms.groupBy("term").agg(F.countDistinct("id").alias("df"))
    idf = df_.select(
        "term",
        (F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1)) + 1.0).alias("idf"),
    )
    return (
        tf.join(F.broadcast(idf), "term")
        .groupBy("id")
        .agg(F.sum(F.col("tf") * F.col("idf")).alias("kw_score"))
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    id_col: str = "id",
    k0: int = RRF_K,
) -> DataFrame:
    """Fuse two (id, rank) lists: rrf = Σ 1/(k0+rank), missing side = 0.

    Returns (id, rrf_score) — caller re-ranks/limits."""
    a = ranked_a.select(F.col(id_col).alias("id"), F.col("rank").alias("__ra"))
    b = ranked_b.select(F.col(id_col).alias("id"), F.col("rank").alias("__rb"))
    fused = a.join(b, "id", "full_outer").select(
        "id",
        (
            F.coalesce(1.0 / (F.lit(k0) + F.col("__ra")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(k0) + F.col("__rb")), F.lit(0.0))
        ).alias("rrf_score"),
    )
    return fused


def rank_by(df: DataFrame, id_col: str, score_col: str, ascending: bool = False) -> DataFrame:
    """(id, rank): 1-based rank with deterministic id tie-break.

    Uses an unpartitioned window — intended for already-reduced ranked
    lists (top-N candidates), not raw corpora."""
    order = [
        F.asc(score_col) if ascending else F.desc(score_col),
        F.asc(id_col),
    ]
    w = Window.orderBy(*order)
    return df.select(
        F.col(id_col).alias("id"), F.row_number().over(w).alias("rank")
    )


def bm25_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 relevance of every doc against ``query_terms``.

    score(d) = Σ_t ln(1 + (N − df_t + 0.5)/(df_t + 0.5))
                 · tf_td·(k1+1) / (tf_td + k1·(1 − b + b·dl_d/avgdl))

    Shape for scale: per-doc term frequencies are codegen'd array
    expressions (no explode — the query has a handful of terms, so they
    are static columns); the corpus statistics (N, avgdl, df per term)
    reduce to ONE tiny row that is broadcast back. Two passes over the
    corpus total, zero wide shuffles.

    Returns (id, score) for all docs (score 0 when no term matches).
    """
    toks = tokenize(text_col)
    base = docs.select(F.col(id_col).alias("id"), toks.alias("__toks"))
    base = base.withColumn("__dl", F.size("__toks"))
    def matches(t: str):
        return lambda w: w == F.lit(t)

    for i, term in enumerate(query_terms):
        base = base.withColumn(
            f"__tf_{i}", F.size(F.filter("__toks", matches(term)))
        )
    base = base.drop("__toks")
    stats = base.agg(
        F.count("*").alias("__N"),
        F.avg("__dl").alias("__avgdl"),
        *[
            F.sum((F.col(f"__tf_{i}") > 0).cast("long")).alias(f"__df_{i}")
            for i in range(len(query_terms))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    score = F.lit(0.0)
    for i in range(len(query_terms)):
        tf = F.col(f"__tf_{i}").cast("double")
        df_t = F.col(f"__df_{i}").cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("__N") - df_t + F.lit(0.5)) / (df_t + F.lit(0.5))
        )
        norm = tf + F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.col("__avgdl")
        )
        score = score + idf * tf * F.lit(k1 + 1.0) / norm
    return scored.select("id", score.alias("score"))


def hybrid_search(
    docs: DataFrame,
    index,
    query_terms: list[str],
    query_vector,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    scorer=None,
    candidates: int | None = None,
    k0: int = RRF_K,
):
    """One-call hybrid retrieval — the API shape of the reference's
    ``similarity_search(query_text=…, query_vector=…, query_type="hybrid")``
    (NMR:386–387), composed from the pieces above: keyword scores over
    ``docs`` (default TF-IDF), exact vector ranking from ``index``
    (a ``VectorIndex``), RRF fusion, top-k.

    ``candidates`` bounds BOTH ranked pools (default 20·k — RRF only
    moves items near the top, so a bounded pool changes nothing for the
    final k in practice while keeping each rank window tiny at corpus
    scale). The keyword side is reduced with ``orderBy().limit(pool)``
    (a distributed TakeOrderedAndProject) before its rank window, so no
    unpartitioned window ever sees corpus-sized input. Returns
    (id, rrf_score) ranked desc."""
    scorer = scorer or tfidf_scores
    pool = candidates if candidates is not None else max(20 * k, 100)
    # scorers emit the doc id either under id_col or as literal "id";
    # rename before rank_by so its window tie-break isn't a lateral
    # reference to its own select alias
    kw = scorer(docs, id_col, text_col, list(query_terms))
    kw = kw.withColumnRenamed(
        id_col if id_col in kw.columns else "id", "__kw_id"
    )
    kw_score_col = "kw_score" if "kw_score" in kw.columns else "score"
    kw_pool = kw.orderBy(F.desc(kw_score_col), F.asc("__kw_id")).limit(pool)
    kw_ranked = rank_by(kw_pool, "__kw_id", kw_score_col)
    vec_scored = index.search(list(query_vector), k=pool)
    vec_ranked = rank_by(vec_scored, index.key, "score")
    fused = rrf_fuse(kw_ranked, vec_ranked, k0=k0)
    return fused.orderBy(F.desc("rrf_score"), F.asc("id")).limit(k)


def rerank_token_overlap(
    pool: DataFrame,
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int,
) -> DataFrame:
    """Second-stage rerank of a bounded first-stage candidate pool — the
    engine seam where a production system runs a cross-encoder (the
    deterministic stand-in feature here is distinct-query-term overlap,
    an integer, so the stage is oracle-exact and stays JVM-side).

    ``pool`` is (id, score) from any first stage (BM25, vector, RRF),
    ALREADY bounded to |queries|·pool_size rows. The rerank joins the
    pool back to the corpus to fetch text — pool broadcast, so the
    corpus side is a pruned hash-join probe, never a shuffle — then
    orders by (overlap desc, first-stage score desc, id) and keeps
    ``k``. Rerank cost is |pool|, independent of corpus size: the
    property that makes two-stage retrieval the scale architecture.
    """
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    terms = F.array(*[F.lit(t) for t in query_terms])
    joined = docs.select(
        F.col(id_col).alias("id"), toks.alias("__toks")
    ).join(F.broadcast(pool), "id")
    return (
        joined.withColumn(
            "overlap",
            F.size(
                F.array_intersect(F.array_distinct("__toks"), terms)
            ).cast("long"),
        )
        .orderBy(F.desc("overlap"), F.desc("score"), F.asc("id"))
        .limit(k)
        .select("id", "overlap", "score")
    )


def maxsim_score(
    q_tokens: Column | str, d_tokens: Column | str
) -> Column:
    """ColBERT-style late-interaction relevance (Khattab & Zaharia,
    SIGIR'20): ``Σ_{q ∈ q_tokens} max_{d ∈ d_tokens} q·d`` over two
    ``array<array<float|double>>`` columns — every query token finds its
    best-matching document token, and the per-token maxima sum.

    Pure nested Catalyst HOFs (aggregate over transform over
    zip_with) — whole-stage codegen, no Python, float64 arithmetic with
    a sequential left-to-right outer fold, so scores replay exactly in
    SQL (left-associated ``+`` chain of ``greatest(...)`` terms).
    Per-pair cost |q_tokens|·|d_tokens|·dim.
    """
    from ..functions.vector import _as_double

    q_tokens = F.col(q_tokens) if isinstance(q_tokens, str) else q_tokens
    d_tokens = F.col(d_tokens) if isinstance(d_tokens, str) else d_tokens
    dts = F.transform(d_tokens, _as_double)

    def tok_dot(qt, dt):
        return F.aggregate(
            F.zip_with(qt, dt, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    return F.aggregate(
        F.transform(q_tokens, _as_double),
        F.lit(0.0),
        lambda acc, qt: acc
        + F.array_max(F.transform(dts, lambda dt: tok_dot(qt, dt))),
    )


def maxsim_rerank(
    candidates: DataFrame,
    query_key: str,
    doc_key: str,
    q_tokens_col: str,
    d_tokens_col: str,
    k: int,
    score_col: str = "maxsim",
) -> DataFrame:
    """Late-interaction second stage: MaxSim-score a bounded
    ``(query, doc)`` candidate pool and keep each query's top-``k`` by
    (maxsim desc, doc id asc).

    The pool comes from any cheap first stage (single-vector kNN, BM25,
    RRF) — the two-stage architecture ColBERT deploys: rerank cost is
    |pool|·|q_tokens|·|d_tokens|·dim, independent of corpus size, and
    the window partitions by query over pool-bounded rows only, never
    the corpus. Returns ``(query_key, doc_key, score_col)``.
    """
    w = Window.partitionBy(query_key).orderBy(
        F.desc(score_col), F.asc(doc_key)
    )
    return (
        candidates.withColumn(
            score_col, maxsim_score(q_tokens_col, d_tokens_col)
        )
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(query_key, doc_key, score_col)
    )


# --------------------------------------------------------------------- #
# E96 — positional postings + exact phrase search
# --------------------------------------------------------------------- #

def positional_postings(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """``(id, term, pos)`` positional inverted-index postings — the
    storage layout behind exact phrase / proximity search (the query
    class BM25 bags-of-words cannot answer). Tokens are the
    empty-filtered whitespace split, positions 1-based over the
    FILTERED list (the engine's shared tokenization contract, identical
    to the oracle's ``list_filter`` + ordinality).

    At 100 TB the postings table is materialized once and written
    partitioned/bucketed by ``term``: a phrase query then reads only
    its terms' partitions (partition-pruned scans) and joins them on
    (id, adjusted position) — never the corpus. Here the postings are
    derived in-plan: one scan + posexplode, no shuffle until a consumer
    joins."""
    toks = F.filter(
        F.split(F.col(text_col), " "), lambda t: t != F.lit("")
    )
    return docs.select(
        F.col(id_col),
        F.posexplode(toks).alias("__p0", "term"),
    ).select(
        id_col, "term", (F.col("__p0") + F.lit(1)).alias("pos")
    )


def phrase_search(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    phrase: str,
    limit: int = 20,
) -> DataFrame:
    """Exact phrase match over positional postings: the phrase
    ``t0 t1 ... tk`` occurs at start position s iff term i has a
    posting at s + i for every i — so the match is a chain of
    EQUI-joins on ``(id, pos - i)``, one per phrase term after the
    first, each side pre-filtered to its own term (at scale: a pruned
    partition read per term). Returns ``(id, n_occurrences)`` for the
    top-``limit`` docs by occurrence count (count desc, id asc) —
    integer-exact end to end, no float seam anywhere."""
    terms = [t for t in phrase.split(" ") if t]
    if not terms:
        raise ValueError("empty phrase")
    p = positional_postings(docs, id_col, text_col)
    base = p.filter(F.col("term") == terms[0]).select(id_col, "pos")
    for i, t in enumerate(terms[1:], start=1):
        nxt = p.filter(F.col("term") == t).select(
            F.col(id_col),
            (F.col("pos") - F.lit(i)).alias("pos"),
        )
        base = base.join(nxt, [id_col, "pos"])
    return (
        base.groupBy(id_col)
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc(id_col))
        .limit(limit)
    )
