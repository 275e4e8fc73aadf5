"""Count-min sketch (Cormode & Muthukrishnan 2005) — mergeable
heavy-hitter counting in d·w integers, the streaming/distributed answer
to "top tokens without shuffling the full token vocabulary".

Spark-first shape: the sketch build is ONE groupBy onto (depth, cell)
keys — map-side partial aggregation collapses every task's contribution
to at most d·w rows before the exchange, so the shuffle is sketch-sized
(d·w rows) regardless of corpus size, and sketches of different slices
merge by cell-wise addition (the same partial-agg algebra). Estimation
joins a probe set's cells against the d·w-row sketch (broadcast).

Hashing is md5-derived (the repo's cross-engine idiom: first 6 hex
digits → int), so a DuckDB oracle replays the sketch bit-for-bit; all
counts are integers — value-exact verification of an approximate
structure (the approximation error is deterministic given the hash
family, so even the OVERestimates hash-match).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cell(token: Column, j: Column | int, width: int) -> Column:
    """Row j's cell for a token: md5-derived, engine-portable."""
    jc = F.lit(j) if isinstance(j, int) else j
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(token, F.lit("#"), jc.cast("string"))), 1, 6
            ),
            16,
            10,
        ).cast("long")
        % width
    )


def cms_build(
    tokens: DataFrame,
    token_col: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Build the sketch from a token-occurrence stream: each occurrence
    increments one cell per depth row. Returns (j, cell, cnt) — d·w
    rows. The groupBy's map-side combine bounds every task's shuffle
    output at d·w rows; cell-wise SUM is the merge operator, so
    per-slice sketches union for free."""
    t = F.col(token_col)
    rows = tokens.select(
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j"),
        t.alias("__t"),
    )
    return (
        rows.select("j", _cell(F.col("__t"), F.col("j"), width).alias("cell"))
        .groupBy("j", "cell")
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    token_col: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Point-estimate each probe token: min over its d cells (the CMS
    guarantee: estimate ≥ true count, with bounded overestimation).
    The probe set explodes to |probes|·d rows and joins the BROADCAST
    d·w-row sketch — corpus never touched."""
    t = F.col(token_col)
    pj = probes.select(
        t.alias("__t"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j"),
    ).select("__t", "j", _cell(F.col("__t"), F.col("j"), width).alias("cell"))
    return (
        pj.join(F.broadcast(sketch), ["j", "cell"], "left")
        .groupBy("__t")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_estimate"))
        .withColumnRenamed("__t", token_col)
    )


def cms_build_from_counts(
    counts: DataFrame,
    token_col: str,
    cnt_col: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Build the identical sketch from a pre-aggregated (token, count)
    table — CMS is a linear sketch, so summing counts into cells equals
    replaying occurrences. Use this when a token-count table already
    exists (one corpus pass shared with exact consumers): the cell
    groupBy then reads vocabulary-sized input instead of the corpus."""
    t = F.col(token_col)
    rows = counts.select(
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j"),
        t.alias("__t"),
        F.col(cnt_col).alias("__c"),
    )
    return (
        rows.select(
            "j", _cell(F.col("__t"), F.col("j"), width).alias("cell"), "__c"
        )
        .groupBy("j", "cell")
        .agg(F.sum("__c").alias("cnt"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    text_col: str,
    top: int = 10,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Heavy-hitter report: the exact top-``top`` tokens (ground truth
    at fixture scale) side-by-side with their CMS estimates — the audit
    a pipeline runs before trusting the sketch at a width where exact
    counting is no longer affordable. Output
    (token, exact_count, cms_estimate), estimate ≥ exact always.

    Plan: ONE corpus pass to the vocabulary-sized token-count table
    (materialized once); the sketch derives from those counts (CMS is
    linear), the exact top-k is a TakeOrderedAndProject over the same
    table."""
    from ..functions.text import tokenize

    wc = (
        df.select(F.explode(tokenize(text_col)).alias("t"))
        .groupBy("t")
        .agg(F.count("*").alias("exact_count"))
        .localCheckpoint(eager=True)
    )
    sketch = cms_build_from_counts(
        wc, "t", "exact_count", depth=depth, width=width
    )
    exact = wc.orderBy(F.desc("exact_count"), "t").limit(top)
    est = cms_estimate(sketch, exact.select("t"), "t", depth, width)
    return (
        exact.join(est, "t")
        .select(
            F.col("t").alias("token"), "exact_count", "cms_estimate"
        )
        .orderBy(F.desc("exact_count"), "token")
    )


# ---------------------------------------------------------------------- #
# HyperLogLog (Flajolet et al. 2007) — distinct counting in m registers
# ---------------------------------------------------------------------- #

HLL_M = 64          # registers (2^6); σ ≈ 1.04/√m ≈ 13% — audit-grade
HLL_REST_BITS = 18  # 24 md5 bits − 6 bucket bits
HLL_ALPHA_M = 0.709  # the standard α for m = 64


def _hll_parts(token: Column) -> tuple[Column, Column]:
    """(bucket, rank) for a token: 24 md5-derived bits → 6-bit bucket +
    the rank (leading-zero count + 1) of the remaining 18 bits. rank is
    computed by an exact integer floor-log2 (a greatest() over 2^k
    comparisons — no float log), so registers are engine-identical."""
    h = F.conv(F.substring(F.md5(token), 1, 6), 16, 10).cast("long")
    bucket = h % HLL_M
    # (h − bucket)/64 is an exact double op (h < 2^24) → exact long
    rest = ((h - bucket) / F.lit(HLL_M)).cast("long")
    flog2 = F.greatest(
        *[
            F.when(rest >= F.lit(1 << k), F.lit(k)).otherwise(F.lit(-1))
            for k in range(HLL_REST_BITS)
        ]
    )
    rank = F.lit(HLL_REST_BITS) - flog2  # rest==0 → flog2=-1 → rank=19
    return bucket, rank


def hll_distinct_estimate(
    df: DataFrame,
    group_col: str,
    token_col: str,
) -> DataFrame:
    """Per-group HLL distinct estimate next to the exact distinct count
    (the audit a pipeline runs before trusting HLL where exact DISTINCT
    is unaffordable). Registers are per-(group, bucket) integer MAXes —
    duplicates cannot move a max, which is WHY HLL counts distincts —
    so the register build is one key shuffle whose map-side partials are
    bounded at |groups|·m rows per task; per-slice registers merge by
    cell-wise MAX (the same partial-agg algebra as the CMS sum).

    Value-exactness of a float estimate: every indicator term
    2^−M ∈ [2^−19, 1] is an exact double, and any partial sum of ≤ m
    such terms spans ≤ 25 bits of mantissa — every addition order yields
    the identical double, so the harmonic-mean estimate is deterministic
    and the micro-floored value hash-matches across engines."""
    t = F.col(token_col)
    bucket, rank = _hll_parts(t)
    regs = (
        df.select(F.col(group_col).alias("__g"), bucket.alias("__b"),
                  rank.alias("__r"))
        .groupBy("__g", "__b")
        .agg(F.max("__r").alias("__m"))
    )
    ind = F.lit(1.0) / F.expr("shiftleft(1L, __m)").cast("double")
    per_group = regs.groupBy("__g").agg(
        F.sum(ind).alias("__s"),
        F.count("*").alias("__nb"),
    )
    raw = F.lit(HLL_ALPHA_M * HLL_M * HLL_M) / (
        F.col("__s") + (F.lit(HLL_M) - F.col("__nb"))  # empty buckets: 2^0
    )
    est = per_group.select(
        "__g", F.floor(raw * F.lit(1_000_000)).alias("hll_micro_estimate")
    )
    exact = df.groupBy(F.col(group_col).alias("__g")).agg(
        F.count_distinct(t).alias("exact_distinct")
    )
    return (
        exact.join(est, "__g")
        .withColumnRenamed("__g", group_col)
        .orderBy(group_col)
    )
