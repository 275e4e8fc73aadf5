# Auto-split from the former single-file registry (round 4): one
# contiguous, order-preserving slice; every @register call still
# runs in the original order via registry/__init__.py.
from __future__ import annotations  # noqa: F401
from ._core import (  # noqa: F401
    DataFrame,
    F,
    SparkSession,
    Window,
    day_of,
    dec,
    load,
    load_docs,
    load_embeddings,
    load_events,
    register,
    ts_us,
    year_of,
)
from .knn_vector_dedup import (  # noqa: F401
    KNN_K,
)
from .temporal_windows import (  # noqa: F401
    INACTIVE_CUTOFF,
)

# Cross-doc boilerplate + model-based quality scoring (corpus cleaning)
# --------------------------------------------------------------------- #

BOILER_N = 3          # boilerplate n-gram width
BOILER_MIN_DF = 5     # n-gram in >= this many docs => boilerplate
BOILER_FLAG_MICRO = 100_000  # flag docs >= 10% boilerplate


@register(
    "boilerplate_ngrams",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, source,
               list_filter(string_split(text,' '), t -> t <> '') AS ws
        FROM documents
    ),
    s AS (
        SELECT doc_id, source,
               list_distinct(list_transform(
                   range(1, greatest(len(ws) - {BOILER_N - 1}, 1) + 1),
                   i -> array_to_string(list_filter(
                       [ws[i], ws[i+1], ws[i+2]],
                       x -> x IS NOT NULL), ' ')
               )) AS sh
        FROM w
    ),
    exp AS (SELECT * FROM (SELECT doc_id, source, unnest(sh) AS g FROM s)
            WHERE g <> ''),
    dfc AS (SELECT g, count(*) AS df FROM exp GROUP BY g),
    per_doc AS (
        SELECT e.doc_id, e.source,
               count(*) AS n_grams,
               sum(CASE WHEN d.df >= {BOILER_MIN_DF} THEN 1 ELSE 0 END)
                   AS n_boiler
        FROM exp e JOIN dfc d ON e.g = d.g
        GROUP BY 1, 2
    )
    SELECT source AS grp,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN (n_boiler * 1000000) // n_grams
                              >= {BOILER_FLAG_MICRO}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
           CAST(sum(n_grams) AS BIGINT) AS total_grams,
           CAST(sum(n_boiler) AS BIGINT) AS total_boiler,
           CAST((sum(n_boiler) * 1000000) // sum(n_grams) AS BIGINT)
               AS boiler_ratio_micro
    FROM per_doc GROUP BY source
    """,
)
def boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate sweep (CCNet/RefinedWeb corpus
    cleaning): word 3-grams shared by ≥ 5 docs are
    boilerplate; per-source report of docs whose distinct-n-gram set is
    ≥ 10% boilerplate. Distinct from repetition_summary (intra-doc
    Gopher metrics) — this one finds text repeated ACROSS documents.
    Postings materialized once, vocabulary-sized df side joined
    SHUFFLE_HASH (never broadcast),
    per-doc then per-source rollups; integer micro-unit ratios. See
    operators.textstats.cross_doc_boilerplate."""
    from ..operators.textstats import cross_doc_boilerplate

    return cross_doc_boilerplate(
        load_docs(spark, sf_dir),
        "doc_id",
        "text",
        "source",
        n=BOILER_N,
        min_df=BOILER_MIN_DF,
        flag_ratio_micro=BOILER_FLAG_MICRO,
    )


@register(
    "quality_model_score",
    oracle="""
    WITH t AS (
        SELECT doc_id, lang, unnest(
            list_filter(string_split(text,' '), x -> x <> '')) AS tok
        FROM documents
    ),
    per_doc AS (
        SELECT doc_id, lang,
               sum(CAST(concat('0x', substr(md5(tok), 1, 3)) AS BIGINT)
                   - 2048) AS w_sum,
               count(*) AS n_tok
        FROM t GROUP BY 1, 2
    )
    SELECT lang AS grp,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN 1.0 / (1.0 + exp(-(CAST(w_sum AS DOUBLE)
                    / (CAST(n_tok AS DOUBLE) * 2048.0)))) >= 0.5
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(w_sum) AS BIGINT) AS sum_w,
           CAST(sum(n_tok) AS BIGINT) AS sum_tok
    FROM per_doc GROUP BY lang
    """,
)
def quality_model_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering (the fastText-classifier pass of
    GPT-3/LLaMA-style pipelines) with a deterministic md5-derived weight
    table standing in for learned weights: per-token weight from the
    first 3 hex digits of md5(token), doc logit = scaled mean weight,
    quality = sigmoid(logit), keep at quality ≥ 0.5. Per-lang summary
    carries the exact integer weight sums so the hash gate is
    float-free except the sigmoid threshold (monotonic, boundary-exact
    at 0.5). See operators.textstats.linear_quality."""
    from ..operators.textstats import linear_quality

    return linear_quality(load_docs(spark, sf_dir), "doc_id", "text", "lang")


PAGERANK_ITERS = 3
PAGERANK_TOP = 25
_PR_SCALE = 10**12
_PR_BASE = (_PR_SCALE * 3) // 20  # (scale * (den-num)) // den


def _pagerank_oracle() -> str:
    """Unrolled 3-iteration integer PageRank in DuckDB —
    same fixed-point recurrence as operators.graph.pagerank (nonnegative
    floor division is engine-identical)."""
    sql = f"""
    WITH e0 AS (
        SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    edges AS (SELECT src, dst FROM e0
              UNION ALL SELECT dst AS src, src AS dst FROM e0),
    nodes AS (SELECT c_custkey * 2 AS node FROM customer
              UNION SELECT s_suppkey * 2 + 1 AS node FROM supplier),
    deg AS (SELECT src, count(*) AS out_deg FROM edges GROUP BY src),
    r0 AS (SELECT node, CAST({_PR_SCALE} AS BIGINT) AS r FROM nodes)"""
    prev = "r0"
    for i in range(1, PAGERANK_ITERS + 1):
        sql += f""",
    c{i} AS (
        SELECT e.dst, sum(r.r // d.out_deg) AS s
        FROM edges e JOIN deg d ON e.src = d.src
        JOIN {prev} r ON r.node = e.src
        GROUP BY e.dst
    ),
    r{i} AS (
        SELECT n.node,
               CAST({_PR_BASE} + (17 * coalesce(c.s, 0)) // 20 AS BIGINT)
                   AS r
        FROM nodes n LEFT JOIN c{i} c ON c.dst = n.node
    )"""
        prev = f"r{i}"
    sql += f"""
    SELECT node,
           CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
               AS node_type,
           r AS rank_scaled
    FROM {prev}
    ORDER BY rank_scaled DESC, node
    LIMIT {PAGERANK_TOP}
    """
    return sql


@register("pagerank_trade_graph", oracle=_pagerank_oracle())
def pagerank_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the customer↔supplier trade graph
    (distinct trading pairs, both directions), 3
    iterations in exact fixed-point integer arithmetic — the source-
    weighting step of a crawl-scale pipeline, and the repo's iterative-
    algorithm showcase with a hash-exact unrolled-CTE oracle. Each
    iteration is one edge⋈rank equi-join + one dst-key groupBy; edges
    and degrees materialize once, rank lineage is checkpointed per
    iteration. Isolated customers keep the base rank (unnormalized
    variant). See operators.graph.pagerank."""
    from ..operators.graph import pagerank

    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    e0 = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = e0.union(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    nodes = cust.select((F.col("c_custkey") * 2).alias("node")).union(
        supp.select((F.col("s_suppkey") * 2 + 1).alias("node"))
    )
    # customers ∪ suppliers provably covers every edge endpoint, so the
    # 2·|E|-row endpoint-distinct is skipped (nodes_complete); the rank
    # table is |customers|+|suppliers| rows of 16 bytes — broadcast it
    # so each iteration is edge-scan → broadcast join → one dst exchange
    # instead of re-shuffling the edge table every pass
    ranks = pagerank(
        edges,
        iters=PAGERANK_ITERS,
        nodes=nodes,
        nodes_complete=True,
        broadcast_ranks=True,
    )
    return (
        ranks.select(
            "node",
            F.when(F.col("node") % 2 == 0, F.lit("customer"))
            .otherwise(F.lit("supplier"))
            .alias("node_type"),
            "rank_scaled",
        )
        .orderBy(F.desc("rank_scaled"), "node")
        .limit(PAGERANK_TOP)
    )


TRIPLET_ANCHORS = 12  # vec_id < 12 are the mined anchors


@register(
    "hard_negative_triplets",
    oracle=f"""
    WITH a AS (
        SELECT vec_id AS anchor_id, label AS anchor_label,
               embedding::DOUBLE[] AS av
        FROM embeddings WHERE vec_id < {TRIPLET_ANCHORS}
    ),
    s AS (
        SELECT a.anchor_id, a.anchor_label, e.vec_id AS cand_id,
               e.label AS cand_label,
               list_cosine_similarity(e.embedding::DOUBLE[], a.av) AS cos
        FROM embeddings e JOIN a ON e.vec_id <> a.anchor_id
    ),
    p AS (
        SELECT anchor_id, cand_id, cos,
               row_number() OVER (
                   PARTITION BY anchor_id ORDER BY cos DESC, cand_id) AS rn
        FROM s WHERE cand_label = anchor_label
    ),
    n AS (
        SELECT anchor_id, cand_id, cos,
               row_number() OVER (
                   PARTITION BY anchor_id ORDER BY cos DESC, cand_id) AS rn
        FROM s WHERE cand_label <> anchor_label
    )
    SELECT a.anchor_id, a.anchor_label,
           p.cand_id AS pos_id, round(p.cos, 6) AS pos_cos,
           n.cand_id AS neg_id, round(n.cos, 6) AS neg_cos
    FROM a
    JOIN p ON p.anchor_id = a.anchor_id AND p.rn = 1
    JOIN n ON n.anchor_id = a.anchor_id AND n.rn = 1
    ORDER BY a.anchor_id
    """,
)
def hard_negative_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative triplet mining for contrastive training: for each
    anchor (vec_id < 12), the most-cosine-similar
    same-label vector (hardest positive) and different-label vector
    (hardest negative). Broadcast anchors, one corpus scan, map-side
    struct-max per anchor — shuffle is O(anchors × tasks), no corpus
    window. See operators.knn.mine_triplets."""
    from ..operators.knn import mine_triplets

    emb = load_embeddings(spark, sf_dir)
    anchors = emb.filter(F.col("vec_id") < TRIPLET_ANCHORS)
    return mine_triplets(emb, anchors).orderBy("anchor_id")


@register(
    "part_pair_cooccurrence",
    oracle="""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    p AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
    SELECT part_a, part_b, CAST(count(*) AS BIGINT) AS n_orders
    FROM p GROUP BY 1, 2
    ORDER BY n_orders DESC, part_a, part_b
    LIMIT 20
    """,
)
def part_pair_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the top part pairs ordered together.
    Self-join keyed on l_orderkey — a shuffle on the order key with
    per-order fan-out bounded by basket size (≤7 in TPC-H-shaped data),
    NOT an all-pairs scan; parts are deduped per order first so the
    join input is minimal. TakeOrderedAndProject bounds the result."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    a = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a")
    )
    b = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b")
    )
    return (
        a.join(b, "ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_orders"))
        .orderBy(F.desc("n_orders"), "part_a", "part_b")
        .limit(20)
    )


# --------------------------------------------------------------------- #
# Edit-distance near-dup pairs (dedup family, 5th signal alongside exact/
# jaccard/minhash/simhash/cosine): banded blocking + Levenshtein verify
# --------------------------------------------------------------------- #

EDIT_DIST_MAX = 20
EDIT_PREFIX = 80


@register(
    "edit_distance_pairs",
    oracle=f"""
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           levenshtein(substr(a.text, 1, {EDIT_PREFIX}),
                       substr(b.text, 1, {EDIT_PREFIX}))::INTEGER AS edist
    FROM documents a JOIN documents b
      ON a.lang = b.lang
     AND a.n_chars // 32 = b.n_chars // 32
     AND a.doc_id < b.doc_id
    WHERE levenshtein(substr(a.text, 1, {EDIT_PREFIX}),
                      substr(b.text, 1, {EDIT_PREFIX})) <= {EDIT_DIST_MAX}
    """,
)
def edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein near-dup pairs over 80-char prefixes.

    Never a cross join: candidates are blocked on (lang, length-bucket) —
    an equi-join, so the shuffle is keyed and the quadratic term is bounded
    per block (near-identical texts necessarily land in the same or an
    adjacent length bucket; same-bucket is the demonstration slice). The
    O(p²)-per-pair Levenshtein DP runs only inside blocks, JVM-side
    (``F.levenshtein`` — no Python)."""
    docs = load_docs(spark, sf_dir).select(
        "doc_id", "lang", F.floor(F.col("n_chars") / 32).alias("lb"),
        F.substring("text", 1, EDIT_PREFIX).alias("pfx"),
    )
    a = docs.select(
        F.col("doc_id").alias("id_a"), "lang", "lb", F.col("pfx").alias("pfx_a")
    )
    b = docs.select(
        F.col("doc_id").alias("id_b"),
        F.col("lang").alias("lang_b"),
        F.col("lb").alias("lb_b"),
        F.col("pfx").alias("pfx_b"),
    )
    return (
        a.join(
            b,
            (F.col("lang") == F.col("lang_b"))
            & (F.col("lb") == F.col("lb_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .withColumn("edist", F.levenshtein("pfx_a", "pfx_b"))
        .filter(F.col("edist") <= EDIT_DIST_MAX)
        .select("id_a", "id_b", "edist")
    )


# --------------------------------------------------------------------- #
# Event funnel: view → click conversion within an hour (sequence
# analytics over the event log; range join + two-level aggregation)
# --------------------------------------------------------------------- #

FUNNEL_WINDOW_NS = 3_600_000_000_000  # 1 hour


@register(
    "funnel_view_click",
    oracle="""
    WITH v AS (
        SELECT user_id, min(ts) AS first_view
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT v.user_id, min(e.ts) AS first_click
        FROM v JOIN events e
          ON e.user_id = v.user_id AND e.event_type = 'click'
         AND e.ts > v.first_view
         AND e.ts <= v.first_view + INTERVAL 1 HOUR
        GROUP BY v.user_id
    )
    SELECT substr(CAST(v.first_view AS VARCHAR), 1, 10) AS day,
           count(*) AS n_view_users,
           count(c.user_id) AS n_converted,
           CAST(coalesce(sum((epoch_us(c.first_click) - epoch_us(v.first_view))
                        // 1000000), 0) AS BIGINT) AS total_delay_s
    FROM v LEFT JOIN c ON v.user_id = c.user_id
    GROUP BY 1
    """,
)
def funnel_view_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day funnel: users whose first 'view' is followed by a 'click'
    within one hour, plus total floor-seconds delay.

    The view→click match is a per-user range join: equi-keyed on user_id
    (hash shuffle, no broadcast of the big side needed), with the time
    band as a residual predicate — the as-of-join family shape. Delay is
    floored to whole seconds so nanos (Spark long) and micros (oracle
    TIMESTAMP) agree exactly."""
    ev = load_events(spark, sf_dir)
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts")
    )
    c = (
        v.join(
            clicks,
            (F.col("cu") == F.col("user_id"))
            & (F.col("cts") > F.col("first_view"))
            & (F.col("cts") <= F.col("first_view") + F.lit(FUNNEL_WINDOW_NS)),
        )
        .groupBy(F.col("user_id").alias("cuser"))
        .agg(F.min("cts").alias("first_click"))
    )
    delay_s = F.floor(
        (F.col("first_click") - F.col("first_view")) / F.lit(1_000_000_000)
    )
    return (
        v.join(c, v.user_id == c.cuser, "left")
        .select(day_of("first_view").alias("day"), "cuser", delay_s.alias("ds"))
        .groupBy("day")
        .agg(
            F.count("*").alias("n_view_users"),
            F.count("cuser").alias("n_converted"),
            F.coalesce(F.sum("ds"), F.lit(0)).alias("total_delay_s"),
        )
    )


# --------------------------------------------------------------------- #
# TPC-H Q19-flavored disjunctive bracket revenue: OR-of-ANDs predicate
# spanning both join sides (Catalyst pushes the part-only disjuncts
# below the join; the mixed residual stays on the join)
# --------------------------------------------------------------------- #

@register(
    "brand_bracket_revenue",
    oracle="""
    SELECT p.p_brand,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                          * CAST(1 - l.l_discount AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS revenue,
           count(*) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 10 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#15' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 30)
    GROUP BY p.p_brand
    """,
)
def brand_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted revenue under an OR-of-ANDs quantity/size bracket
    predicate (TPC-H Q19's shape). part is dimension-sized → broadcast
    hash join, no shuffle of lineitem; Catalyst extracts the part-only
    disjunction (brand ∈ {...}) as a pushed-down scan filter so the
    broadcast side is pre-pruned."""
    li = load(spark, sf_dir, "lineitem")
    pt = load(spark, sf_dir, "part")
    j = li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
    bracket = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(10, 25)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#15")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 30)
    )
    revenue = dec("l_extendedprice") * dec(F.lit(1.0) - F.col("l_discount"))
    return (
        j.filter(bracket)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(revenue), 2).cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


# --------------------------------------------------------------------- #
# Distribution-rank windows: percent_rank + cume_dist of customer spend
# within nation (the two rank-normalizing window functions not yet in
# the window coverage: row_number/rank/ntile/lag live in other queries)
# --------------------------------------------------------------------- #

@register(
    "customer_spend_rank",
    oracle="""
    WITH spend AS (
        SELECT c.c_custkey, n.n_name,
               CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                   AS total_spend
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, n.n_name
    )
    SELECT n_name, c_custkey,
           round(total_spend, 2) AS total_spend,
           CAST(floor(percent_rank() OVER
                 (PARTITION BY n_name ORDER BY total_spend, c_custkey)
                 * 1000000) AS BIGINT) AS spend_pr_micro,
           CAST(floor(cume_dist() OVER
                 (PARTITION BY n_name ORDER BY total_spend, c_custkey)
                 * 1000000) AS BIGINT) AS spend_cd_micro
    FROM spend
    """,
)
def customer_spend_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank/cume_dist of per-customer spend within each nation.

    Two shuffles total: one keyed agg (customer×nation), one window
    exchange on n_name; nation is broadcast. The window ORDER BY
    tie-breaks on c_custkey so ranks are deterministic, and spend is an
    exact decimal sum so both engines rank identical values.

    The normalized ranks are emitted as floor-truncated micro-units, not
    round(x, 6): cume_dist = k/n lands EXACTLY on a .5 rounding boundary
    whenever 10^6·k/n is a half-integer (first hit at sf0.1:
    41/640 = 0.0640625), and there Spark's HALF_UP on the shortest
    decimal string disagrees with DuckDB's C-double rounding. floor is
    applied to bitwise-identical IEEE doubles (same k, n → same division
    and multiply result in both engines), so it cannot diverge."""
    from pyspark.sql import Window

    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders")
    spend = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(o, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "n_name")
        .agg(F.sum(dec("o_totalprice")).cast("double").alias("total_spend"))
    )
    w = Window.partitionBy("n_name").orderBy("total_spend", "c_custkey")
    return spend.select(
        "n_name",
        "c_custkey",
        F.round("total_spend", 2).alias("total_spend"),
        F.floor(F.percent_rank().over(w) * F.lit(1e6))
        .cast("long")
        .alias("spend_pr_micro"),
        F.floor(F.cume_dist().over(w) * F.lit(1e6))
        .cast("long")
        .alias("spend_cd_micro"),
    )


# --------------------------------------------------------------------- #
# Relational widening: TPC-H Q7/Q8/Q10/Q15/Q16/Q22 analogs on the
# simplified fixture star schema. Decimal sums keep every revenue
# figure exact, so ratios, maxima and LIMIT boundaries agree across
# engines (same policy as pricing_summary).
# --------------------------------------------------------------------- #

Q7_NATION_A = "NATION_1"
Q7_NATION_B = "NATION_2"


@register(
    "volume_shipping",
    oracle=f"""
    WITH rev AS (
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               CAST(year(l.l_shipdate) AS INTEGER) AS ship_year,
               CAST(l.l_extendedprice AS DECIMAL(18,4))
                 * CAST(1 - l.l_discount AS DECIMAL(18,4)) AS volume
        FROM lineitem l
          JOIN supplier s ON s.s_suppkey   = l.l_suppkey
          JOIN nation  sn ON sn.n_nationkey = s.s_nationkey
          JOIN orders   o ON o.o_orderkey  = l.l_orderkey
          JOIN customer c ON c.c_custkey   = o.o_custkey
          JOIN nation  cn ON cn.n_nationkey = c.c_nationkey
        WHERE (sn.n_name = '{Q7_NATION_A}' AND cn.n_name = '{Q7_NATION_B}')
           OR (sn.n_name = '{Q7_NATION_B}' AND cn.n_name = '{Q7_NATION_A}')
    )
    SELECT supp_nation, cust_nation, ship_year,
           CAST(round(sum(volume), 2) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM rev
    GROUP BY supp_nation, cust_nation, ship_year
    """,
)
def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style bilateral shipping volume between two nations per
    ship-year. Scale shape: both fact inputs are PRE-FILTERED to the two
    nations before the big lineitem⋈orders shuffle join (the OR predicate
    splits into per-side IN-lists), so the shuffle carries only the ~8%
    of rows that can survive; all four dimensions are broadcast."""
    nations = [Q7_NATION_A, Q7_NATION_B]
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    supp_side = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name").isin(nations))
        .select(
            "l_orderkey",
            "l_shipdate",
            "l_extendedprice",
            "l_discount",
            F.col("n_name").alias("supp_nation"),
        )
    )
    cust_side = (
        o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name").isin(nations))
        .select("o_orderkey", F.col("n_name").alias("cust_nation"))
    )
    volume = dec("l_extendedprice") * dec(F.lit(1.0) - F.col("l_discount"))
    return (
        supp_side.join(
            cust_side, F.col("l_orderkey") == F.col("o_orderkey")
        )
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            year_of("l_shipdate").alias("ship_year"),
        )
        .agg(
            F.round(F.sum(volume), 2).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


Q8_REGION = "EUROPE"
Q8_NATION = "NATION_3"


@register(
    "market_share",
    oracle=f"""
    WITH base AS (
        SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
               CAST(l.l_extendedprice AS DECIMAL(18,4))
                 * CAST(1 - l.l_discount AS DECIMAL(18,4)) AS volume,
               sn.n_name AS supp_nation
        FROM lineitem l
          JOIN supplier s ON s.s_suppkey   = l.l_suppkey
          JOIN nation  sn ON sn.n_nationkey = s.s_nationkey
          JOIN orders   o ON o.o_orderkey  = l.l_orderkey
          JOIN customer c ON c.c_custkey   = o.o_custkey
          JOIN nation  cn ON cn.n_nationkey = c.c_nationkey
          JOIN region   r ON r.r_regionkey = cn.n_regionkey
        WHERE r.r_name = '{Q8_REGION}'
    )
    SELECT o_year,
           round(CAST(sum(CASE WHEN supp_nation = '{Q8_NATION}'
                               THEN volume
                               ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                 / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share,
           CAST(round(sum(volume), 2) AS DOUBLE) AS total_volume
    FROM base
    GROUP BY o_year
    """,
)
def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style market share: the focal nation's fraction of revenue
    sold into one region, per order-year. Customer-side region filter
    prunes orders BEFORE the big join; numerator/denominator are exact
    decimal sums so the ratio is bit-identical across engines."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    cust_nations = (
        c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == Q8_REGION)
        .select("c_custkey")
    )
    orders_in_region = o.join(
        F.broadcast(cust_nations), F.col("o_custkey") == F.col("c_custkey")
    ).select("o_orderkey", "o_orderdate")
    supp = (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    volume = dec("l_extendedprice") * dec(F.lit(1.0) - F.col("l_discount"))
    focal = F.when(F.col("supp_nation") == Q8_NATION, volume).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders_in_region, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(year_of("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(focal).cast("double") / F.sum(volume), 6).cast("double").alias("mkt_share"),
            F.round(F.sum(volume), 2).cast("double").alias("total_volume"),
        )
    )


Q10_START = "1996-01-01 00:00:00"
Q10_END = "1996-04-01 00:00:00"


@register(
    "returned_item_losses",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                          * CAST(1 - l.l_discount AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS revenue
    FROM customer c
      JOIN orders   o ON o.o_custkey   = c.c_custkey
      JOIN lineitem l ON l.l_orderkey  = o.o_orderkey
      JOIN nation   n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '{Q10_START}'
      AND o.o_orderdate <  TIMESTAMP '{Q10_END}'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                 * CAST(1 - l.l_discount AS DECIMAL(18,4))) DESC, c.c_custkey
    LIMIT 20
    """,
)
def returned_item_losses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style: top-20 customers by revenue on returned items in a
    quarter. Orders are date-pruned before the join (scan-level pushdown);
    the LIMIT boundary orders by the EXACT decimal sum with a custkey
    tie-break, so the selected row set is engine-independent."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.timestamp_micros(F.lit(ts_us(Q10_START))))
        & (F.col("o_orderdate") < F.timestamp_micros(F.lit(ts_us(Q10_END))))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    revenue = dec("l_extendedprice") * dec(F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(revenue).alias("__rev"))
        .orderBy(F.col("__rev").desc(), "c_custkey")
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            F.round(F.col("__rev"), 2).cast("double").alias("revenue"),
        )
    )


Q15_START = "1996-01-01 00:00:00"
Q15_END = "1996-04-01 00:00:00"


@register(
    "top_supplier_revenue",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey,
               sum(CAST(l_extendedprice AS DECIMAL(18,4))
                   * CAST(1 - l_discount AS DECIMAL(18,4))) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '{Q15_START}'
          AND l_shipdate <  TIMESTAMP '{Q15_END}'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           round(CAST(r.total_rev AS DOUBLE), 2) AS total_rev
    FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT max(total_rev) FROM rev)
    """,
)
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-style top supplier: supplier(s) achieving the maximum
    quarterly revenue (scalar-subquery max over a derived aggregate).
    The per-supplier aggregate is computed ONCE and reused for both the
    max and the final join; the max is over exact decimals, so 'ties'
    are well-defined. supplier is broadcast; the scalar max is a one-row
    cross join (Spark plans a BroadcastNestedLoopJoin)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.timestamp_micros(F.lit(ts_us(Q15_START))))
        & (F.col("l_shipdate") < F.timestamp_micros(F.lit(ts_us(Q15_END))))
    )
    s = load(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            dec("l_extendedprice") * dec(F.lit(1.0) - F.col("l_discount"))
        ).alias("total_rev")
    )
    max_rev = rev.agg(F.max("total_rev").alias("__max"))
    return (
        rev.join(F.broadcast(max_rev), F.col("total_rev") == F.col("__max"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_rev"), 2).cast("double").alias("total_rev"),
        )
    )


Q16_EXCLUDED_BRAND = "Brand#1"
Q16_SIZES = (1, 5, 9, 13)


@register(
    "parts_supplier_counts",
    oracle=f"""
    SELECT p.p_brand, p.p_type,
           count(DISTINCT l.l_suppkey) AS supplier_cnt,
           count(*) AS n_lineitems
    FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> '{Q16_EXCLUDED_BRAND}'
      AND p.p_size IN {Q16_SIZES}
    GROUP BY p.p_brand, p.p_type
    """,
)
def parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-style supplier diversity per brand/type (lineitem stands
    in for partsupp, absent from the fixture). The brand/size predicates
    prune the broadcast part dimension to ~15% before the join; DISTINCT
    is per-group (two-phase partial distinct aggregation — no global
    distinct shuffle of the fact table)."""
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != Q16_EXCLUDED_BRAND)
        & F.col("p_size").isin(list(Q16_SIZES))
    )
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type")
        .agg(
            F.countDistinct("l_suppkey").alias("supplier_cnt"),
            F.count("*").alias("n_lineitems"),
        )
    )


@register(
    "above_avg_balance_no_orders",
    oracle=f"""
    WITH thresh AS (
        SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
               / count(*) AS ab
        FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_mktsegment,
           count(*) AS n_cust,
           CAST(round(sum(CAST(c.c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS total_bal
    FROM customer c, thresh
    WHERE c.c_acctbal > thresh.ab
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderdate >= TIMESTAMP '{INACTIVE_CUTOFF}')
    GROUP BY c.c_mktsegment
    """,
)
def above_avg_balance_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style: customers with above-average positive balance and
    no recent orders (see customers_without_orders for why the anti join
    is cutoff-conditioned), rolled up by market segment. The global
    average is computed as exact-decimal-sum / count (NOT a float avg —
    float partial-agg order would make the comparison boundary
    engine-dependent), broadcast as a one-row join; the inactivity test
    is a LEFT ANTI join on the distinct recent o_custkey set."""
    c = load(spark, sf_dir, "customer")
    o = (
        load(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate") >= F.timestamp_micros(F.lit(ts_us(INACTIVE_CUTOFF)))
        )
        .select("o_custkey")
        .distinct()
    )
    thresh = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            (F.sum(dec("c_acctbal")).cast("double") / F.count("*")).alias("ab")
        )
    )
    return (
        c.join(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_cust"),
            F.round(F.sum(dec("c_acctbal")), 2).cast("double").alias(
                "total_bal"
            ),
        )
    )


# --------------------------------------------------------------------- #
# Vector widening: L2-metric kNN and int8 scalar quantization (the
# standard memory-reduction step for 100 TB-scale vector corpora).
# --------------------------------------------------------------------- #

KNN_L2_QUERY_ID = 1


@register(
    "knn_l2",
    oracle=f"""
    WITH q AS (
        SELECT embedding::DOUBLE[] AS qv FROM embeddings
        WHERE vec_id = {KNN_L2_QUERY_ID}
    )
    SELECT e.vec_id, e.label,
           round(list_distance(e.embedding::DOUBLE[], q.qv), 6) AS dist
    FROM embeddings e, q
    ORDER BY list_distance(e.embedding::DOUBLE[], q.qv), e.vec_id
    LIMIT {KNN_K}
    """,
)
def knn_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact kNN under the EUCLIDEAN metric (the §1.4 equivalence says the
    unit-vector RANKING matches cosine, but the scores differ — this query
    checks the distance math itself). Same scale shape as knn_exact:
    scan → codegen'd fold → TakeOrderedAndProject(k), no shuffle."""
    from ..functions.vector import l2_dist

    emb = load(spark, sf_dir, "embeddings")
    qvec = (
        emb.filter(F.col("vec_id") == KNN_L2_QUERY_ID)
        .select("embedding")
        .collect()[0][0]
    )
    qlit = F.array(*[F.lit(float(x)) for x in qvec])
    dist = l2_dist(
        F.transform("embedding", lambda x: x.cast("double")), qlit
    )
    return (
        emb.select(
            "vec_id", "label", dist.alias("__d")
        )
        .orderBy("__d", "vec_id")
        .limit(KNN_K)
        .select("vec_id", "label", F.round("__d", 6).alias("dist"))
    )


@register(
    "embedding_quantization",
    oracle="""
    WITH s AS (
        SELECT vec_id, embedding::DOUBLE[] AS x,
               127.0 / list_max(list_transform(embedding::DOUBLE[],
                                               v -> abs(v))) AS scale
        FROM embeddings
    )
    SELECT vec_id,
           round(127.0 / scale, 6) AS max_abs,
           round(sqrt(list_sum(list_transform(
                     x, v -> pow(v - round(v * scale) / scale, 2)))), 6)
               AS recon_err
    FROM s
    """,
)
def embedding_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector int8 scalar quantization audit: symmetric scale
    127/max|x|, reconstruction L2 error. This is the standard 4x memory
    reduction for large ANN corpora; the whole computation is codegen'd
    array-fold expressions — no UDF, no shuffle, embarrassingly parallel."""
    xs = F.transform("embedding", lambda v: v.cast("double"))
    max_abs = F.array_max(F.transform(xs, lambda v: F.abs(v)))
    scale = F.lit(127.0) / max_abs
    recon_err = F.sqrt(
        F.aggregate(
            xs,
            F.lit(0.0),
            lambda acc, v: acc
            + F.pow(v - F.round(v * scale, 0) / scale, F.lit(2.0)),
        )
    )
    emb = load(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.round(max_abs, 6).alias("max_abs"),
        F.round(recon_err, 6).alias("recon_err"),
    )


# --------------------------------------------------------------------- #
# Text/corpus widening: length histogram and per-language bigram tops.
# --------------------------------------------------------------------- #

@register(
    "doc_length_histogram",
    oracle="""
    SELECT (n_chars // 100) * 100 AS bucket_lo,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           min(n_chars) AS min_chars,
           max(n_chars) AS max_chars
    FROM documents
    GROUP BY (n_chars // 100) * 100
    """,
)
def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width document-length histogram (100-char buckets) — the
    first profiling pass of any corpus intake. Integer bucket math is
    exact; one map-side-combined aggregation, shuffle carries |buckets|
    rows."""
    docs = load(spark, sf_dir, "documents")
    bucket = (F.expr("n_chars div 100") * 100).alias("bucket_lo")
    return docs.groupBy(bucket).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


BIGRAM_TOP_K = 5


@register(
    "bigram_top",
    oracle=f"""
    WITH w AS (
        SELECT lang, string_split(text, ' ') AS words FROM documents
    ),
    b AS (
        SELECT lang,
               unnest(list_transform(range(1, len(words)),
                                     i -> words[i] || ' ' || words[i+1]))
                   AS bigram
        FROM w
    ),
    counted AS (
        SELECT lang, bigram, count(*) AS n,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY count(*) DESC, bigram) AS rn
        FROM b GROUP BY lang, bigram
    )
    SELECT lang, bigram, n FROM counted WHERE rn <= {BIGRAM_TOP_K}
    """,
)
def bigram_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{5} word bigrams per language — the n-gram counting pass of a
    language-model data pipeline. Bigrams are built with a codegen'd
    1-indexed sequence/element_at transform (identical indexing to the
    DuckDB oracle), exploded, counted with map-side partial aggregation,
    then top-k'd by a window over the tiny (lang) key space. Determinism:
    ties broken lexicographically on the bigram itself."""
    from pyspark.sql import Window

    docs = load_docs(spark, sf_dir)
    words = F.split(F.col("text"), " ")
    bigrams = F.when(
        F.size(words) >= 2,
        F.expr(
            "transform(sequence(1, size(split(text, ' ')) - 1), "
            "i -> concat(element_at(split(text, ' '), i), ' ', "
            "element_at(split(text, ' '), i + 1)))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    counted = (
        docs.select("lang", F.explode(bigrams).alias("bigram"))
        .groupBy("lang", "bigram")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), "bigram")
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= BIGRAM_TOP_K)
        .select("lang", "bigram", "n")
    )


# --------------------------------------------------------------------- #
# Events widening: weekly retention cohorts (exact integer week math on
# the raw nanosecond timestamps — no float epoch division anywhere).
# --------------------------------------------------------------------- #

NANOS_PER_WEEK = 7 * 86_400_000_000_000


@register(
    "retention_cohorts",
    oracle=f"""
    WITH wk AS (
        SELECT user_id, epoch_ns(ts) // {NANOS_PER_WEEK} AS week
        FROM events
    ),
    cohort AS (
        SELECT user_id, min(week) AS cohort_week FROM wk GROUP BY user_id
    )
    SELECT c.cohort_week,
           w.week - c.cohort_week AS week_offset,
           count(DISTINCT w.user_id) AS n_users
    FROM wk w JOIN cohort c ON c.user_id = w.user_id
    GROUP BY c.cohort_week, w.week - c.cohort_week
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users bucketed by first-seen week, counted
    in each subsequent week they return. Week keys are integer divisions
    of the raw nanos (exact on both engines — float epoch math could flip
    a boundary event). Scale shape: one agg keyed by user (cohort), one
    broadcast-back join (cohort table ≪ events), one final small agg."""
    ev = load_events(spark, sf_dir).select(
        "user_id", F.expr(f"ts div {NANOS_PER_WEEK}").alias("week")
    )
    cohort = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        ev.join(F.broadcast(cohort), "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


# --------------------------------------------------------------------- #
# Additional TPC-H analogs: Q9 / Q11 / Q13 / Q20 shapes
# (reference has no relational queries — NMR:1-533 contains zero joins;
# these exercise the engine surface SURVEY.md §2.2 commits to providing)
# --------------------------------------------------------------------- #


@register(
    "profit_by_nation_year",
    oracle="""
    SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                          * CAST(1 - l.l_discount AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS profit
    FROM lineitem l
      JOIN part p     ON p.p_partkey  = l.l_partkey AND p.p_name LIKE '%red%'
      JOIN supplier s ON s.s_suppkey  = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
    GROUP BY n.n_name, year(o.o_orderdate)
    """,
)
def profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shaped profit rollup (adapted: fixtures carry no partsupp /
    supplycost, so profit = discounted revenue). Join order matters at
    scale: the part filter ('%red%', ~5% selectivity) is applied *before*
    the join so the lineitem stream is pruned by the broadcast hash set
    early; supplier→nation is a broadcast chain; only the lineitem⋈orders
    join shuffles (both large, equi on orderkey)."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    sn = F.broadcast(
        s.join(n, s.s_nationkey == n.n_nationkey).select("s_suppkey", "n_name")
    )
    profit = F.sum(dec("l_extendedprice") * dec(F.lit(1.0) - F.col("l_discount")))
    return (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(sn, li.l_suppkey == sn.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            year_of("o_orderdate").alias("o_year"),
        )
        .agg(F.round(profit, 2).cast("double").alias("profit"))
    )


Q11_AVG_MULT = 1.5


@register(
    "important_part_values",
    oracle=f"""
    WITH val AS (
        SELECT l_partkey,
               sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS part_value
        FROM lineitem
        GROUP BY l_partkey
    )
    SELECT l_partkey,
           round(CAST(part_value AS DOUBLE), 2) AS part_value
    FROM val
    WHERE CAST(part_value AS DOUBLE)
          > {Q11_AVG_MULT} * (SELECT CAST(sum(part_value) AS DOUBLE)
                                     / count(*) FROM val)
    """,
)
def important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-shaped global-scalar-subquery filter: parts whose total
    traded value exceeds 1.5× the average part's. The per-part
    agg is computed once and reused for both the threshold (a 1-row
    global agg, broadcast cross-joined — no driver round-trip, stays one
    Spark job) and the filter, so lineitem is scanned exactly once.

    The threshold is a multiple of the AVERAGE, not (as raw Q11) a fixed
    fraction of the total: a fixed fraction is scale-dependent — at 10×
    the parts every share shrinks 10× and the result set collapses to
    empty (TPC-H itself rescales Q11's fraction by 1/SF). The average
    multiple keeps the selectivity, and therefore the verified result,
    scale-proportional. Threshold math is a sum/count ratio of exact
    decimals in double space — identical IEEE values in both engines."""
    li = load(spark, sf_dir, "lineitem")
    val = li.groupBy("l_partkey").agg(
        F.sum(dec("l_extendedprice")).alias("part_value")
    )
    thresh = val.agg(
        (
            F.lit(Q11_AVG_MULT)
            * (F.sum("part_value").cast("double") / F.count("*"))
        ).alias("thresh")
    )
    return (
        val.crossJoin(F.broadcast(thresh))
        .filter(F.col("part_value").cast("double") > F.col("thresh"))
        .select(
            "l_partkey",
            F.round(F.col("part_value"), 2).cast("double").alias("part_value"),
        )
    )


@register(
    "customer_order_distribution",
    oracle="""
    SELECT n_orders, count(*) AS n_customers
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
    )
    GROUP BY n_orders
    """,
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shaped two-level aggregation: orders-per-customer, then
    the histogram of that count (LEFT join keeps zero-order customers;
    count(o_orderkey) ignores the null-padded rows). First agg shuffles on
    c_custkey; the second groups on a tiny integer domain so its shuffle
    is negligible after partial aggregation."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count("*").alias("n_customers"))


Q20_QTY_FACTOR = 0.1


@register(
    "bolt_stock_suppliers",
    oracle=f"""
    WITH bolt_qty AS (
        SELECT l.l_suppkey, l.l_partkey,
               sum(CAST(l.l_quantity AS DECIMAL(18,4))) AS supplied_qty
        FROM lineitem l
          JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%bolt%'
        GROUP BY l.l_suppkey, l.l_partkey
    ),
    part_total AS (
        SELECT l_partkey,
               sum(CAST(l_quantity AS DECIMAL(18,4))) AS total_qty
        FROM lineitem
        GROUP BY l_partkey
    )
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM bolt_qty b
      JOIN part_total t ON t.l_partkey = b.l_partkey
      JOIN supplier s   ON s.s_suppkey = b.l_suppkey
    WHERE b.supplied_qty > t.total_qty * {Q20_QTY_FACTOR}
    """,
)
def bolt_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-shaped dominant-supplier query (adapted: availqty does not
    exist, so 'major' = supplied more than 10% of a part's total traded
    quantity; at a half-share cutoff the result is empty at EVERY fixture
    scale because quantity is spread across many suppliers per part —
    a 10% share keeps the result non-empty and scale-proportional:
    10/79/254 suppliers at sf0.001/0.01/0.1). Two aggregations over lineitem — one part-filtered by a
    broadcast semi join, one global per-part — joined on partkey, then a
    broadcast join to supplier for names and a distinct on the supplier
    key."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    s = load(spark, sf_dir, "supplier")
    bolt_qty = (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(dec("l_quantity")).alias("supplied_qty"))
    )
    part_total = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum(dec("l_quantity")).alias("total_qty")
    )
    return (
        bolt_qty.join(part_total, bolt_qty.l_partkey == part_total.t_partkey)
        .filter(F.col("supplied_qty") > F.col("total_qty") * F.lit(Q20_QTY_FACTOR))
        .join(F.broadcast(s), bolt_qty.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name")
        .distinct()
    )


# --------------------------------------------------------------------- #
# §2.2 relational breadth — TPC-H Q12-shaped conditional line counts
# --------------------------------------------------------------------- #

Q12_SHIP_FROM = "1996-01-01"
Q12_SHIP_TO = "1997-01-01"


@register(
    "linestatus_priority_counts",
    oracle=f"""
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '{Q12_SHIP_FROM} 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '{Q12_SHIP_TO} 00:00:00'
    GROUP BY l.l_linestatus
    """,
)
def linestatus_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-shaped conditional counts (adapted: no l_shipmode /
    l_receiptdate in the fixture schema, so the grouping class is
    l_linestatus and the year window is on l_shipdate). The shipdate range
    filter is pushed to the parquet scan; the orders join carries only
    (o_orderkey, o_orderpriority) so the shuffled build side stays narrow;
    the CASE aggregation is a map-side partial agg."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.timestamp_micros(F.lit(ts_us(Q12_SHIP_FROM))))
        & (F.col("l_shipdate") < F.timestamp_micros(F.lit(ts_us(Q12_SHIP_TO))))
    ).select("l_orderkey", "l_linestatus")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~urgent, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------- #
# §2.2 relational breadth — TPC-H Q21-shaped sole-late-supplier count
# --------------------------------------------------------------------- #

Q21_LATE_DAYS = 90
Q21_TOP = 100


@register(
    "waiting_suppliers",
    oracle=f"""
    WITH flagged AS (
        SELECT l.l_orderkey, l.l_suppkey,
               (l.l_shipdate > o.o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY)
                   AS is_late
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderstatus = 'F'
    )
    SELECT s.s_name, count(*) AS numwait
    FROM flagged l1 JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE l1.is_late
      AND EXISTS (SELECT 1 FROM flagged l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM flagged l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.is_late)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT {Q21_TOP}
    """,
)
def waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shaped double-correlated EXISTS / NOT EXISTS (adapted:
    lateness = shipped > 90 days after order date, since the fixture has no
    commit/receipt dates; no nation filter so the result isn't tiny).
    Suppliers who were the ONLY late supplier on a multi-supplier finished
    order, ranked by how often.

    Plan shape: one orders⋈lineitem pass computes the per-line late flag
    (narrow projection, equi-join on orderkey), then the two correlated
    predicates decorrelate into a single per-order aggregate —
    n_supp = count(distinct supp), n_late_supp = count(distinct supp where
    late) — joined back to the late lines. That turns Q21's classic
    exists/not-exists double self-join into ONE extra aggregation over the
    same shuffle key (orderkey), so the whole query is two shuffles + a
    broadcast of supplier."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    flagged = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.unix_micros(F.col("l_shipdate"))
            > F.unix_micros(F.col("o_orderdate"))
            + F.lit(Q21_LATE_DAYS * 86_400_000_000)  # fixed-day epoch math (DST, see late_order_priority)
        ).alias("is_late"),
    )
    per_order = flagged.groupBy(F.col("l_orderkey").alias("g_orderkey")).agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("is_late"), F.col("l_suppkey"))
        ).alias("n_late_supp"),
    )
    sole_late = (
        flagged.filter(F.col("is_late"))
        .select("l_orderkey", "l_suppkey")
        .join(per_order, F.col("l_orderkey") == F.col("g_orderkey"))
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    )
    return (
        sole_late.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(Q21_TOP)
    )


# --------------------------------------------------------------------- #
