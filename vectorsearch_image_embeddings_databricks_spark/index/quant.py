"""Scalar (SQ8) and binary (sign-bit) vector quantization — the two
cheap compression tiers below product quantization in FAISS-class
engines (SQ8: 4x smaller than float32 with near-exact recall; binary:
32x smaller, Hamming distance, the rerank-candidate tier of modern
"binary quantization" vector stores). Complements index/pq.py: PQ is
codebook-based, these are codebook-free per-dimension transforms.

Spark-first shapes:
- **Training (SQ8) is one aggregation to d rows**: per-dimension
  min/max via posexplode + groupBy(dim) — a dim-key shuffle whose
  output is d rows regardless of corpus size, collected as the
  quantizer's driver state (the same bounded-driver-state contract as
  the IVF/PQ trainers: scales with d, never with rows).
- **Encoding is one codegen'd zip_with** against the broadcast-literal
  min/delta arrays — map-only, zero shuffle.
- **Scoring is INTEGER arithmetic**: the symmetric SQ8 dot product
  Σ qcode_i·code_i and the Hamming distance ``bit_count(a XOR b)`` are
  order-free integer folds, so results are exactly reproducible across
  engines (the float-sum ordering problem cannot arise) and top-k is a
  plain TakeOrderedAndProject over a scan — no shuffle, no join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def sq8_train(df: DataFrame, vec_col: str, dim: int) -> tuple[list, list]:
    """Per-dimension (min, max) over the corpus: one posexplode +
    groupBy(dim) → d rows → driver. Returns (mins, maxes) lists."""
    mm = (
        df.select(F.posexplode(F.col(vec_col)).alias("i", "x"))
        .groupBy("i")
        .agg(
            F.min(F.col("x").cast("double")).alias("mn"),
            F.max(F.col("x").cast("double")).alias("mx"),
        )
        .collect()
    )
    mins = [0.0] * dim
    maxes = [0.0] * dim
    for r in mm:
        mins[r["i"]] = r["mn"]
        maxes[r["i"]] = r["mx"]
    return mins, maxes


def sq8_encode_expr(vec_col, mins: list, maxes: list) -> F.Column:
    """codes_i = clamp(floor((x_i − min_i)·255 / (max_i − min_i)), 0, 255)
    as one codegen'd double-zip — map-only. Division/multiplication of
    IEEE doubles is correctly rounded, so the floor is engine-exact.
    Constant dimensions (max == min) encode as 0."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    mn = F.array(*[F.lit(float(v)) for v in mins])
    mx = F.array(*[F.lit(float(v)) for v in maxes])
    shifted = F.zip_with(c, mn, lambda x, m: x.cast("double") - m)
    spread = F.zip_with(mx, mn, lambda a, b: a - b)
    return F.zip_with(
        shifted,
        spread,
        lambda s, d: F.when(
            d > 0,
            F.least(
                F.lit(255).cast("long"),
                F.greatest(
                    F.lit(0).cast("long"),
                    F.floor(s * F.lit(255.0) / d),
                ),
            ),
        ).otherwise(F.lit(0).cast("long")),
    )


def int_dot(a, b) -> F.Column:
    """Σ a_i·b_i over two integer code arrays — an order-free integer
    fold (no float-sum ordering hazard)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def sq8_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list,
    mins: list,
    maxes: list,
    k: int = 5,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Asymmetric SQ8 top-k (the FAISS ADC shape): the corpus is stored
    as codes; the query stays full-precision and is folded into
    per-dimension micro-int weights w_i = floor(q_i·Δ_i·1e6). Since
    decode(code_i) = min_i + code_i·Δ_i/255, the true inner product is
    q·x ≈ Σ q_i·min_i (corpus-constant → rank-irrelevant) +
    (1/255e6)·Σ w_i·code_i, so ranking by the INTEGER sum Σ w_i·code_i
    is rank-faithful up to quantization error — and order-free exact
    across engines (ties → smallest id). Scan → map-only encode+score →
    TakeOrderedAndProject; zero shuffle, zero joins.

    A symmetric code·code dot product would NOT be rank-faithful: the
    min-offset enters both sides and the cross terms no longer cancel
    per-corpus-row (measured recall@5 collapses to 1/5 on the fixture).
    """
    import math

    w = [
        math.floor(float(q) * (mx - mn) * 1_000_000.0)
        for q, mn, mx in zip(query_vec, mins, maxes)
    ]
    wlit = F.array(*[F.lit(int(v)).cast("long") for v in w])
    codes = sq8_encode_expr(vec_col, mins, maxes)
    score = int_dot(codes, wlit)
    return (
        df.select(
            F.col(id_col),
            *[F.col(c) for c in (extra_cols or [])],
            score.alias("score_int"),
        )
        .orderBy(F.desc("score_int"), id_col)
        .limit(k)
    )


WORD_BITS = 32  # bits packed per word — stays clear of the int64 sign
# bit, which DuckDB's checked left-shift refuses to produce, so the
# packed words are engine-portable


def sign_words_expr(vec_col, dim: int) -> F.Column:
    """Pack a d-dim vector's sign bits into ceil(d/32) int64 words:
    word j's bit i is set iff x_{32j+i} > 0 — each word an order-free
    integer fold (binary quantization; 32x compression of float32)."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    n_words = (dim + WORD_BITS - 1) // WORD_BITS

    def word(j: int) -> F.Column:
        # bit positions are Python constants → the whole word is one
        # codegen'd sum of 32 conditional literals
        acc = F.lit(0).cast("long")
        for i in range(WORD_BITS):
            pos = j * WORD_BITS + i + 1
            if pos > dim:
                break
            acc = acc + F.when(
                F.element_at(c, pos) > 0, F.lit(1 << i).cast("long")
            ).otherwise(F.lit(0).cast("long"))
        return acc

    return F.array(*[word(j) for j in range(n_words)])


def hamming_words(a, b) -> F.Column:
    """Hamming distance between two packed sign-bit word arrays:
    Σ_j bit_count(a_j XOR b_j) — order-free integer fold."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y)).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def binary_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list,
    k: int = 5,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Binary-quantized top-k: rank by ascending Hamming distance
    between packed sign-bit words (ties → smallest id). Same
    zero-shuffle scan shape as sq8_topk; the per-row state is
    ceil(d/32)·8 bytes."""
    dim = len(query_vec)
    n_words = (dim + WORD_BITS - 1) // WORD_BITS
    # query packing is pure integer arithmetic on literals — done in
    # Python (identical semantics: bit i set iff x_i > 0), not as a
    # one-row Spark job
    qwords = [
        sum(
            1 << i
            for i in range(WORD_BITS)
            if j * WORD_BITS + i < dim and query_vec[j * WORD_BITS + i] > 0
        )
        for j in range(n_words)
    ]
    qb = F.array(*[F.lit(int(w)).cast("long") for w in qwords])
    dist = hamming_words(sign_words_expr(vec_col, dim), qb)
    return (
        df.select(
            F.col(id_col),
            *[F.col(c) for c in (extra_cols or [])],
            dist.cast("long").alias("hamming"),
        )
        .orderBy(F.asc("hamming"), id_col)
        .limit(k)
    )
