# Auto-split from the former single-file registry (round 4): one
# contiguous, order-preserving slice; every @register call still
# runs in the original order via registry/__init__.py.
from __future__ import annotations  # noqa: F401
from ._core import (  # noqa: F401
    DataFrame,
    F,
    SparkSession,
    dec,
    dedup,
    lang_id,
    load_docs,
    load_events,
    register,
    textstats,
    token_count,
)
from .knn_vector_dedup import (  # noqa: F401
    _lang_score_sql,
)

# Character-entropy curation filter (deterministic ordered float fold)
# --------------------------------------------------------------------- #


@register(
    "char_entropy_docs",
    oracle="""
    WITH ch AS (
        SELECT doc_id, substr(text, CAST(i AS INTEGER), 1) AS c
        FROM documents, unnest(range(1, length(text) + 1)) AS u(i)
        WHERE length(text) > 0
    ),
    cnts AS (
        SELECT doc_id, c, CAST(count(*) AS BIGINT) AS cnt
        FROM ch GROUP BY doc_id, c
    ),
    pd AS (
        SELECT doc_id,
               list(cnt ORDER BY c) AS lst,
               CAST(sum(cnt) AS BIGINT) AS n_chars_total,
               CAST(count(*) AS INTEGER) AS n_distinct_chars
        FROM cnts GROUP BY doc_id
    )
    SELECT doc_id, n_chars_total, n_distinct_chars,
           CAST(floor((ln(n_chars_total)
                 - list_reduce(list_transform(lst,
                       x -> CAST(x AS DOUBLE) * ln(CAST(x AS DOUBLE))),
                       (a, b) -> a + b) / n_chars_total)
                 * 1000000) AS BIGINT) AS entropy_micro
    FROM pd
    """,
)
def char_entropy_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc Shannon character entropy (gibberish/boilerplate
    curation signal). A float sum of irrational ln terms is made
    hash-exact by folding in SORTED-character order on BOTH engines
    (sequential HOF fold — never an unordered SUM whose result depends
    on partial-agg order). See operators.textstats.char_entropy."""
    return textstats.char_entropy(load_docs(spark, sf_dir), "doc_id", "text")


# --------------------------------------------------------------------- #
# Exact-substring dedup with span removal (Lee et al. 2021)
# --------------------------------------------------------------------- #

ESD_K = 8  # minimum duplicated run length, tokens


@register(
    "exact_substring_dedup",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS ws
        FROM documents
    ),
    g AS (
        SELECT doc_id, i AS pos,
               array_to_string(list_slice(ws, i + 1, i + {ESD_K}), ' ') AS gram
        FROM (SELECT doc_id, ws, len(ws) AS n FROM w),
             unnest(range(0, greatest(n - {ESD_K} + 1, 0))) AS u(i)
    ),
    dup AS (
        SELECT gram FROM g GROUP BY gram
        HAVING count(DISTINCT doc_id) >= 2
    ),
    cp AS (
        SELECT DISTINCT g.doc_id, g.pos + j AS p
        FROM g JOIN dup USING (gram), unnest(range(0, {ESD_K})) AS v(j)
    ),
    cov AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_covered
        FROM cp GROUP BY doc_id
    ),
    toks AS (
        SELECT doc_id, i - 1 AS p, ws[CAST(i AS INTEGER)] AS tok
        FROM w, unnest(range(1, len(ws) + 1)) AS u(i)
    ),
    keep AS (
        SELECT t.doc_id, string_agg(t.tok, ' ' ORDER BY t.p) AS txt
        FROM toks t LEFT JOIN cp ON cp.doc_id = t.doc_id AND cp.p = t.p
        WHERE cp.p IS NULL
        GROUP BY t.doc_id
    )
    SELECT w.doc_id,
           CAST(len(w.ws) AS BIGINT) AS n_tokens,
           coalesce(cov.n_covered, 0) AS n_covered,
           md5(coalesce(keep.txt, '')) AS clean_md5
    FROM w LEFT JOIN cov USING (doc_id) LEFT JOIN keep USING (doc_id)
    """,
)
def exact_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup with span removal: every ≥8-token
    run appearing verbatim in more than one document is cut from all of
    them (Lee et al. 2021 — the overlapping-span complement of
    segment_dedup's fixed lines). Gram postings materialized once;
    dup-gram set via one gram-key groupBy joined back SHUFFLE_HASH;
    coverage explodes k rows per DUPLICATED gram only; reassembly is a
    row-local positional filter. See
    operators.dedup.exact_substring_dedup."""
    return dedup.exact_substring_dedup(
        load_docs(spark, sf_dir), "doc_id", "text", k=ESD_K
    )


# --------------------------------------------------------------------- #
# Per-group OLS trend (regression analytics over exact integer
# sufficient statistics)
# --------------------------------------------------------------------- #


@register(
    "per_lang_ols_trend",
    oracle="""
    WITH d AS (
        SELECT lang,
               CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
                    AS BIGINT) AS x,
               CAST(n_chars AS BIGINT) AS y
        FROM documents
    ),
    s AS (
        SELECT lang, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(y * y) AS BIGINT) AS syy
        FROM d GROUP BY lang
    )
    SELECT lang, n,
           CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
                      / CAST(n * sxx - sx * sx AS DOUBLE) * 1000000)
                AS BIGINT) AS slope_micro,
           CAST(floor((CAST(sy AS DOUBLE)
                       - CAST(n * sxy - sx * sy AS DOUBLE)
                         / CAST(n * sxx - sx * sx AS DOUBLE)
                         * CAST(sx AS DOUBLE))
                      / CAST(n AS DOUBLE) * 1000000)
                AS BIGINT) AS intercept_micro,
           -- the squared numerator overflows int64 at 10x scale; its
           -- factor is exact in a double (< 2^53), so square THERE
           CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
                      * CAST(n * sxy - sx * sy AS DOUBLE)
                      / (CAST(n * sxx - sx * sx AS DOUBLE)
                         * CAST(n * syy - sy * sy AS DOUBLE)) * 1000000)
                AS BIGINT) AS r2_micro
    FROM s
    """,
)
def per_lang_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language least-squares trend of char count on token count
    (slope/intercept/R², micro-floored) — grouped regression as pure
    aggregates: the sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²)
    are EXACT integer sums (one partial-agg key shuffle to |langs|
    rows), and the closed-form OLS arithmetic runs on those identical
    integers, so the doubles are engine-identical and the micro-floors
    hash-match. No per-group model-fit UDF, no second pass. At corpus
    scale where n·Σxy² would overflow int64, widen the statistics to
    DECIMAL(38,0) — the formulas are unchanged."""
    from ..functions.text import token_count

    d = load_docs(spark, sf_dir).select(
        "lang",
        token_count("text").cast("long").alias("x"),
        F.col("n_chars").cast("long").alias("y"),
    )
    s = d.groupBy("lang").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    slope = num / den
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    # square in DOUBLE: the factor (~1e10 at sf0.1) is exact below
    # 2^53, while the int64 square overflows under ANSI
    r2num = num * num
    r2den = den * (
        F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    ).cast("double")
    micro = F.lit(1_000_000)
    return s.select(
        "lang",
        "n",
        F.floor(slope * micro).alias("slope_micro"),
        F.floor(intercept * micro).alias("intercept_micro"),
        F.floor(r2num / r2den * micro).alias("r2_micro"),
    )


# --------------------------------------------------------------------- #
# EMA smoothing (α = 1/2) via the deterministic ordered-fold technique
# --------------------------------------------------------------------- #


@register(
    "ema_user_value",
    oracle="""
    WITH e AS (
        SELECT user_id,
               CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
               epoch_us(ts) AS t, event_id
        FROM events
    ),
    pu AS (
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_events,
               list(cents ORDER BY t, event_id) AS lst
        FROM e GROUP BY user_id
    )
    SELECT user_id, n_events,
           -- elements cast to DOUBLE first: list_reduce coerces the
           -- accumulator to the ELEMENT type, so a BIGINT list would
           -- truncate every halving step
           CAST(floor(list_reduce(
                    list_transform(lst, x -> CAST(x AS DOUBLE)),
                    (a, b) -> (a + b) / 2.0) * 1000000)
                AS BIGINT) AS ema_micro
    FROM pu
    """,
)
def ema_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponential moving average (α = 1/2) of the event value
    stream — the time-series smoothing primitive. An EMA is a
    sequential recurrence, so the float result depends on evaluation
    order; it is made hash-exact the same way as char_entropy: BOTH
    engines fold the cent values in the totalized (ts, event_id) order
    (Spark `aggregate` HOF seeded with the first element ≡ DuckDB
    `list_reduce`), so every IEEE addition happens in the same sequence.
    One user-key groupBy; the fold is bounded by the user's own
    history."""
    ev = load_events(spark, sf_dir).select(
        "user_id",
        (dec("value", 2) * 100).cast("long").alias("cents"),
        "ts",
        "event_id",
    )
    lst_sorted = F.transform(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "cents"))
        ),
        lambda x: x["cents"],
    )
    pu = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"), lst_sorted.alias("__lst")
    )
    ema = F.aggregate(
        F.slice(F.col("__lst"), 2, F.greatest(F.size("__lst") - 1, F.lit(0))),
        F.element_at(F.col("__lst"), 1).cast("double"),
        lambda acc, x: (acc + x.cast("double")) / F.lit(2.0),
    )
    return pu.select(
        "user_id",
        "n_events",
        F.floor(ema * F.lit(1_000_000)).alias("ema_micro"),
    )


# --------------------------------------------------------------------- #
# Linear multi-touch attribution (integer credit split per conversion)
# --------------------------------------------------------------------- #

ATTR_WINDOW_US = 3600 * 1_000_000  # 1 hour lookback, µs


@register(
    "linear_touch_attribution",
    oracle=f"""
    WITH p AS (
        SELECT event_id AS pid, user_id, epoch_us(ts) AS tp
        FROM events WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT user_id, epoch_us(ts) AS tc,
               (epoch_us(ts) // 3600000000) % 24 AS hour
        FROM events WHERE event_type = 'click'
    ),
    touch AS (
        SELECT p.pid, c.hour FROM p JOIN c
          ON c.user_id = p.user_id
         AND c.tc < p.tp AND c.tc >= p.tp - {ATTR_WINDOW_US}
    ),
    k AS (SELECT pid, CAST(count(*) AS BIGINT) AS kt FROM touch GROUP BY pid)
    SELECT t.hour,
           CAST(count(*) AS BIGINT) AS n_touches,
           CAST(sum(1000000 // k.kt) AS BIGINT) AS credit_micro
    FROM touch t JOIN k USING (pid)
    GROUP BY t.hour
    """,
)
def linear_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every click in the hour before a
    purchase shares that conversion's credit equally — credit per touch
    is the INTEGER ⌊1e6/k⌋ so the per-channel rollup is exact under any
    aggregation order (the float 1/k split would not be). Channel proxy
    = the touch's UTC hour-of-day (raw epoch arithmetic, tz-free). One
    user-keyed range join (the as-of family shape), one conversion-key
    count, one ≤24-row rollup."""
    ev = load_events(spark, sf_dir)
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("pu"),
        F.col("ts").alias("tp"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"),
        F.col("ts").alias("tc"),
        (F.expr("ts div 3600000000000") % 24).alias("hour"),
    )
    w_ns = ATTR_WINDOW_US * 1000
    touch = p.join(
        c,
        (F.col("cu") == F.col("pu"))
        & (F.col("tc") < F.col("tp"))
        & (F.col("tc") >= F.col("tp") - F.lit(w_ns)),
    ).select("pid", "hour")
    k = touch.groupBy("pid").agg(F.count("*").alias("kt"))
    return (
        touch.join(k, "pid")
        .groupBy("hour")
        .agg(
            F.count("*").alias("n_touches"),
            F.sum(F.expr("1000000 div kt")).alias("credit_micro"),
        )
    )


# --------------------------------------------------------------------- #
# Classifier evaluation: per-class precision/recall of the lang-ID
# heuristic against gold labels (the eval harness of every model-based
# curation filter)
# --------------------------------------------------------------------- #


@register(
    "lang_id_eval_metrics",
    oracle=f"""
    WITH s AS (
        SELECT doc_id, lang AS true_lang,
               {_lang_score_sql('de')} AS s_de,
               {_lang_score_sql('en')} AS s_en,
               {_lang_score_sql('es')} AS s_es,
               {_lang_score_sql('fr')} AS s_fr,
               regexp_matches(text, '[\\x{{4e00}}-\\x{{9fff}}]') AS cjk
        FROM documents
    ),
    pred AS (
        SELECT true_lang,
               CASE WHEN cjk THEN 'zh'
                    WHEN greatest(s_de, s_en, s_es, s_fr) < 0.05 THEN 'und'
                    WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
                    WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
                    WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
                    ELSE 'fr' END AS pred_lang
        FROM s
    ),
    cls AS (SELECT DISTINCT true_lang AS c FROM pred),
    m AS (
        SELECT c,
               (SELECT count(*) FROM pred
                WHERE true_lang = c AND pred_lang = c) AS tp,
               (SELECT count(*) FROM pred
                WHERE pred_lang = c AND true_lang <> c) AS fp,
               (SELECT count(*) FROM pred
                WHERE true_lang = c AND pred_lang <> c) AS fn
        FROM cls
    )
    SELECT c AS lang, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn,
           CASE WHEN tp + fp = 0 THEN CAST(-1 AS BIGINT)
                ELSE CAST(tp * 1000000 // (tp + fp) AS BIGINT)
           END AS precision_micro,
           CASE WHEN tp + fn = 0 THEN CAST(-1 AS BIGINT)
                ELSE CAST(tp * 1000000 // (tp + fn) AS BIGINT)
           END AS recall_micro
    FROM m
    """,
)
def lang_id_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision/recall of the stopword-marker language-ID
    against the gold `lang` labels — the evaluation harness every
    model-based curation filter needs before it gates data. Confusion
    counts come from ONE groupBy over (true, pred) pairs (|classes|²
    rows), precision/recall are integer-micro floor divisions (exact;
    −1 marks the undefined 0/0 case). The corpus is scanned once."""
    docs = load_docs(spark, sf_dir)
    pairs = docs.select(
        F.col("lang").alias("true_lang"),
        lang_id("text").alias("pred_lang"),
    )
    conf = pairs.groupBy("true_lang", "pred_lang").agg(
        F.count("*").alias("n")
    ).localCheckpoint(eager=True)  # |classes|² rows, read by 3 rollups
    tp = (
        conf.filter(F.col("true_lang") == F.col("pred_lang"))
        .select(F.col("true_lang").alias("lang"), F.col("n").alias("tp"))
    )
    fp = (
        conf.filter(F.col("true_lang") != F.col("pred_lang"))
        .groupBy(F.col("pred_lang").alias("lang"))
        .agg(F.sum("n").alias("fp"))
    )
    fn = (
        conf.filter(F.col("true_lang") != F.col("pred_lang"))
        .groupBy(F.col("true_lang").alias("lang"))
        .agg(F.sum("n").alias("fn"))
    )
    classes = conf.select(F.col("true_lang").alias("lang")).distinct()
    j = (
        classes.join(tp, "lang", "left")
        .join(fp, "lang", "left")
        .join(fn, "lang", "left")
        .select(
            "lang",
            F.coalesce("tp", F.lit(0)).alias("tp"),
            F.coalesce("fp", F.lit(0)).alias("fp"),
            F.coalesce("fn", F.lit(0)).alias("fn"),
        )
    )
    prec = F.when(
        (F.col("tp") + F.col("fp")) == 0, F.lit(-1).cast("long")
    ).otherwise(
        F.expr("tp * 1000000 div (tp + fp)")
    )
    rec = F.when(
        (F.col("tp") + F.col("fn")) == 0, F.lit(-1).cast("long")
    ).otherwise(
        F.expr("tp * 1000000 div (tp + fn)")
    )
    return j.select(
        "lang", "tp", "fp", "fn",
        prec.alias("precision_micro"),
        rec.alias("recall_micro"),
    )


# --------------------------------------------------------------------- #
