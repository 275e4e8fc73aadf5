"""Iterative graph analytics on DataFrames — PageRank in exact integer
arithmetic (SURVEY.md §2 extension family; the graph-centrality step a
crawl-scale data pipeline runs to weight sources/domains before
sampling, à la Common Crawl harmonic-centrality source weighting).

Why integer arithmetic: float PageRank is non-portable (parallel float
sums are order-dependent, so Spark partial aggregation and any oracle
disagree in the last ULPs and the drift compounds per iteration).
Fixed-point ranks make every step exact and engine-identical:

    rank_0(v)    = SCALE                       (one long per node)
    contrib(e)   = rank(src) DIV out_deg(src)  (integer floor division)
    rank_t+1(v)  = BASE + (D_NUM * sum contrib) DIV D_DEN

with BASE = (SCALE * (D_DEN - D_NUM)) DIV D_DEN. All values are
nonnegative longs; Spark's ``DIV`` and DuckDB's ``//`` agree on
nonnegative operands, integer sums commute, so an unrolled-CTE SQL
oracle reproduces the Spark result bit-for-bit — an *iterative*
algorithm with a hash-exact correctness gate.

Scale shape (100 TB lens): each iteration is one equi-join of the edge
table against the (|V|-row) rank table plus one groupBy(dst) — the
canonical distributed PageRank step, shuffling edges on src then dst.
Edges and out-degrees are materialized ONCE (localCheckpoint) and
reused every iteration; ranks are checkpointed per iteration so the
plan/lineage stays O(1) in the iteration count instead of growing a
join tree Catalyst must re-optimize (and re-execute) each pass.
Dangling nodes (out_deg = 0) simply contribute nothing; isolated nodes
keep the BASE rank — the "unnormalized" PageRank variant, documented
so the oracle matches by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: Fixed-point scale: rank_0 = 10^12 per node. Max intermediate is
#: D_NUM * SCALE * |V| per dst-sum term — longs overflow only past
#: ~5·10^5 full-rank in-neighbors per node at this scale; lower SCALE
#: for graphs denser than that.
SCALE = 10**12


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping_num: int = 17,
    damping_den: int = 20,
    scale: int = SCALE,
    nodes: DataFrame | None = None,
    nodes_complete: bool = False,
    broadcast_ranks: bool = False,
) -> DataFrame:
    """Integer-exact PageRank over directed ``edges``.

    Returns ``(node, rank_scaled)`` — one row per node, ``rank_scaled``
    a long in units of 1/scale. ``nodes`` (single column ``node``)
    optionally widens the vertex set beyond edge endpoints (isolated
    nodes receive the BASE rank); ``nodes_complete=True`` asserts it
    already CONTAINS every edge endpoint, skipping the 2·|E|-row
    endpoint-distinct — at web scale the vertex table is the crawl
    frontier you already have, so recomputing it from the edge list is
    pure waste.

    ``broadcast_ranks``: the per-iteration join's shape. A checkpointed
    DataFrame loses its partitioning metadata (Scan ExistingRDD), so
    the default shuffle join re-exchanges the edge table every
    iteration — correct at any |V| but pays |E| shuffle per pass. With
    ``broadcast_ranks=True`` the (|V|·16-byte) rank table broadcasts
    instead and each iteration is edge-scan → broadcast join → ONE
    dst-key exchange — strictly better whenever ranks fit the
    broadcast budget (|V| up to ~10⁷); past that, leave it off.
    """
    if damping_den <= 0 or not (0 <= damping_num <= damping_den):
        raise ValueError("damping must satisfy 0 <= num <= den")
    if nodes_complete and nodes is None:
        raise ValueError("nodes_complete requires nodes")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if nodes_complete:
        vertex = nodes.select(F.col(nodes.columns[0]).alias("node"))
    else:
        vertex = e.select(F.col("src").alias("node")).union(
            e.select(F.col("dst").alias("node"))
        )
        if nodes is not None:
            vertex = vertex.union(
                nodes.select(F.col(nodes.columns[0]).alias("node"))
            )
    vertex = vertex.distinct().localCheckpoint(eager=True)
    out_deg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    # edges ⋈ out_deg is reused every iteration — materialize once.
    e_deg = e.join(out_deg, "src").localCheckpoint(eager=True)

    base = (scale * (damping_den - damping_num)) // damping_den
    ranks = vertex.select(
        "node", F.lit(scale).cast("long").alias("rank_scaled")
    )
    prev = None
    for _ in range(iters):
        rhs = F.broadcast(ranks) if broadcast_ranks else ranks
        contribs = (
            e_deg.join(rhs, e_deg["src"] == rhs["node"])
            .select(
                "dst",
                F.expr("rank_scaled DIV out_deg").alias("contrib"),
            )
            .groupBy("dst")
            .agg(F.sum("contrib").alias("in_sum"))
        )
        if broadcast_ranks:
            contribs = F.broadcast(contribs)
        ranks = (
            vertex.join(contribs, vertex["node"] == contribs["dst"], "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damping_num} * coalesce(in_sum, 0L)) DIV {damping_den}"
                    )
                ).cast("long").alias("rank_scaled"),
            )
            .localCheckpoint(eager=True)
        )
        # the eager checkpoint above fully materialized this round, so
        # the previous round's blocks are dead weight — free them NOW
        # (guide §5; kcenter's r9 discipline). rank_0 is never
        # checkpointed, hence the None guard.
        if prev is not None:
            prev.unpersist()
        prev = ranks
    return ranks


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Exact triangle count over an undirected graph given as distinct
    ``src < dst`` edge pairs — degree-oriented (Suri & Vassilvitskii,
    "Counting triangles and the curse of the last reducer", WWW'11).

    The naive wedge join fans every vertex out by deg², so one celebrity
    vertex serializes the job (the "last reducer"). Orienting each edge
    from its LOWER-degree endpoint to the higher (ties by id) caps every
    vertex's out-degree at O(√|E|), so the wedge join materializes
    Σ outdeg² = O(|E|^{3/2}) candidates total — the optimal exact bound
    — regardless of skew. The count is orientation-invariant, so the
    SQL oracle can use the plain id-ordered 3-way join.

    Plan: degree groupBy (one shuffle) → broadcast-or-shuffle join of
    degrees onto edges → wedge self-join on the oriented source →
    closing LEFT join against the oriented edge set → single-row
    conditional count. The wedge self-join — the one O(|E|^1.5) stage
    the orientation exists to bound — executes exactly ONCE:
    ``n_wedges`` (count of all join rows) and ``n_triangles`` (count of
    rows whose closing edge matched) are two aggregates of the SAME
    left join, not a count + a separate semi-join (the left join is
    row-preserving because the closing-edge set is distinct by
    construction). Returns (n_edges, n_wedges, n_triangles) — wedge
    count included so the orientation bound is observable.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    deg = (
        e.select(F.col("u").alias("x"))
        .union(e.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count("*").alias("d"))
    )
    du = deg.select(F.col("x").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("x").alias("v"), F.col("d").alias("dv"))
    # orient low-degree -> high-degree, ties to the smaller id
    oriented = (
        e.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("a"), F.col("v").alias("b")),
            )
            .otherwise(
                F.struct(F.col("v").alias("a"), F.col("u").alias("b"))
            )
            .alias("o")
        )
        .select("o.a", "o.b")
        .localCheckpoint(eager=True)
    )
    w1 = oriented.select(F.col("a"), F.col("b").alias("p"))
    w2 = oriented.select(F.col("a"), F.col("b").alias("q"))
    wedges = w1.join(w2, "a").filter(F.col("p") < F.col("q"))
    # a wedge (p, q) out of a closes iff {p, q} is an edge — in EITHER
    # orientation (p->q or q->p), since orientation is by degree.
    # Each undirected edge {p, q} contributes exactly one (p, q) row
    # (it is oriented exactly once), so `closing` is duplicate-free and
    # a LEFT join preserves the wedge multiset: count(*) = n_wedges,
    # count(closed) = n_triangles — ONE execution of the wedge join for
    # both statistics (previously a count + a semi-join ran it twice).
    o1 = oriented.select(F.col("a").alias("p"), F.col("b").alias("q"))
    o2 = oriented.select(F.col("b").alias("p"), F.col("a").alias("q"))
    closing = o1.union(o2).withColumn("closed", F.lit(1))
    wedge_stats = (
        wedges.join(closing, ["p", "q"], "left")
        .agg(
            F.count(F.lit(1)).alias("n_wedges"),
            F.count("closed").alias("n_triangles"),
        )
    )
    edge_stats = oriented.agg(F.count(F.lit(1)).alias("n_edges"))
    return edge_stats.crossJoin(wedge_stats).select(
        "n_edges", "n_wedges", "n_triangles"
    )
