"""Hybrid (keyword + vector) retrieval with Reciprocal Rank Fusion —
the reference's latent ``query_type="hybrid"`` surface
(``Nomic MultiModal Retrieval.py``:386–387, commented out but declared;
SURVEY.md §2 O20/E7/E8), implemented natively.

Keyword side: TF-IDF scoring from explode+aggregate (one shuffle on the
term key; document frequencies are a tiny broadcastable dim table).
Fusion: RRF — score(d) = Σ_rankings 1/(k0 + rank_d) — a full-outer join of
two small ranked lists, trivially cheap after each side's top-N."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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
