"""Graph ANN tier: kNN-graph construction + batched beam search.

The reference's managed service is an HNSW-class graph index
(NMR:315-323, per public Databricks Vector Search docs); this repo's
other ANN tiers are quantization-family (IVF / PQ-ADC / IVFADC / SQ8 /
binary). ANN_FRONTIER.md measures what that family costs on
structure-free data: IVF recall tracks the scanned corpus fraction
almost linearly and does not reach 0.95 below ~half the corpus. Graph
indexes close exactly that gap: per-query probe cost is
``O(entries + hops · beam · degree)`` — independent of corpus size —
because search walks a precomputed neighborhood graph instead of
scanning cells.

HNSW itself is pointer-chasing and sequential per query — the wrong
shape for a DataFrame engine. What IS Spark-shaped is the flat
NSW-style variant over a kNN graph, batched across a query table:

- **Build** (`build_knn_graph`): each vector's ``degree`` nearest
  neighbors by cosine (ties to the smaller id), as an edge table
  ``(src, dst)``. Exact tier = one kNN self-join (the E2 machinery) —
  quadratic candidate work, fine at fixture scale and SQL-replayable
  (the hash-verified tier). Scale tier = ``strategy='ivf'``: candidates
  come from a shared-quantizer cell equi-join (operators.bitext's
  two-large-sides plan), bounding build cost at sum-of-cell-products —
  the standard large-corpus kNN-graph recipe (NN-descent refinement
  would slot in here; one cell pass already yields a usable graph).
- **Search** (`beam_search`): classic best-first beam expansion,
  vectorized across the whole query batch. State = the per-query
  top-``beam`` scored set; one hop = frontier joins the edge table,
  new neighbor ids join back to vectors and score against their query,
  window keeps the beam. Each hop is two shuffle-keyed joins + one
  partitioned window — every stage distributed, no per-row Python, no
  driver loop over queries. ``hops`` is the unroll depth, so the whole
  search is a finite DataFrame plan and (with deterministic seeds and
  id tie-breaks) replays in unrolled SQL — the property the registry
  oracle uses.

At 100 TB: the edge table is |V|·degree rows partitioned by ``src``;
search shuffles O(|queries|·beam·degree) rows per hop regardless of
corpus size — the graph-index promise, now measurable against the IVF
tiers in ANN_FRONTIER.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.vector import cosine_similarity

#: Cell-size guard for the ivf build: float64 elements per similarity
#: block (~128 MB). A task's largest allocation is block_rows x m where
#: block_rows = max(128, budget // m) — bounded regardless of how many
#: rows a skewed corpus or bad quantizer draw concentrates in one cell.
#: Module-level so the skew pytest can shrink it to force multi-block
#: execution on fixture-sized cells.
GRAPH_BUILD_BLOCK_BUDGET = 1 << 24

#: Side of the (left x right) block grid the EXACT tier's pair scoring
#: is decomposed into: B² cogroups, each scoring one left block against
#: one right block with a single numpy matmul. 8 gives 64 concurrent
#: tasks (≥ the bench's 32 cores) while keeping per-task inputs tiny at
#: fixture scale; per-task allocation stays bounded by
#: GRAPH_BUILD_BLOCK_BUDGET regardless of block population (row-blocked
#: matmul, same guard as the ivf build).
GRAPH_EXACT_GRID = 8


def _exact_block_topk(
    left: DataFrame, right: DataFrame, degree: int, grid: int | None = None
) -> DataFrame:
    """Per-LEFT-row top-``degree`` most-cosine-similar RIGHT rows
    (id-equal pairs excluded), as ``(src, dst, __cos)`` candidates —
    the single-product form of :func:`_exact_block_topk_multi`.

    This is the exact tier's scoring engine (r9 optimization, guide
    §4.2/§2.3): the former formulation materialized every candidate
    PAIR as a Spark row — |left|·|right| rows shuffled through two
    vector-attach joins, an array-HOF cosine per pair (three zip_with
    allocations + folds), and a corpus-wide window — measured at ~8 s
    for knn_graph_append's 3.8M pairs at sf0.1. Here the pair set never
    materializes: both sides are hash-bucketed into a ``grid``²
    block-pair cogrid (deterministic ``pmod(xxhash64(id), grid)``, each
    side replicated ``grid`` ways — 2·n·grid small rows shuffled,
    NEVER n²), each cogroup scores one left block against one right
    block with a single row-blocked numpy matmul (the ivf build's
    machinery), and only per-src block-local top-``degree`` candidates
    come back — n·grid·degree rows into the final global window.

    Every global top-``degree`` edge is its own block's top-``degree``
    within that block, so ranking the union of block winners with
    :func:`_top_degree_edges` reproduces the full-scoring result
    exactly (same (cos desc, dst asc) tie-break; the exact==rebuild
    pytest identities pin it — and the block-local cut is TIE-AWARE,
    see per_block, so the guarantee holds even with > degree equal
    cosines in one block). Blocks partition the right side, so no
    (src, dst) pair is emitted twice.

    Conventions and bounds (r10, ADVICE r9): a zero-norm vector scores
    cos 0.0 against everything (its norm is substituted by 1.0 before
    the dot — the convention every numpy scorer in this module shares);
    per-task memory is O(|left block|·dim) for the stacked frame plus
    the row-blocked score matrix bounded by GRAPH_BUILD_BLOCK_BUDGET —
    the exact tier is the fixture/oracle tier, corpus-scale builds use
    ``strategy='ivf'`` whose per-task input is cell-bounded.
    """
    return _exact_block_topk_multi([(left, right)], degree, grid)


def _exact_block_topk_multi(
    sides: list[tuple[DataFrame, DataFrame]],
    degree: int,
    grid: int | None = None,
) -> DataFrame:
    """Union of per-left-row top-``degree`` candidates over SEVERAL
    (left, right) products in ONE cogroup stage (r10, guide §2.4).
    append's exact tier scores two products — (old × new) and
    (new × all); as two separate cogroup calls each paid its own pair
    of exchanges plus a Python stage (~1 s of fixed stage latency each
    at fixture scale, tools/probe_append_r10.py) around
    sub-millisecond matmuls. Tagging every row with its product index
    ``m`` and cogrouping on (m, lb, rb) runs every product through one
    stage; groups never mix products, and per-group scoring is
    byte-identical to the single-product form.
    """
    import numpy as np
    import pandas as pd

    if grid is None:
        grid = GRAPH_EXACT_GRID
    deg = degree
    _budget = GRAPH_BUILD_BLOCK_BUDGET
    id_dt = sides[0][0].schema["id"].dataType.simpleString()
    blocks = F.array(*[F.lit(j) for j in range(grid)])
    # all cogroup key columns must be IDENTICALLY TYPED on both sides:
    # an int on one side and a bigint on the other hash-partition
    # differently (Murmur3 of int 3 != long 3), silently splitting
    # logical groups across partitions
    own = F.pmod(F.xxhash64("id"), F.lit(grid)).cast("int")
    lg = rg = None
    for m, (left, right) in enumerate(sides):
        # fresh attribute ids per side: callers routinely pass one side
        # derived from the other (delete's affected ⊂ remaining, build's
        # self-pairing), which would otherwise trip the
        # ambiguous-self-join analyzer check inside the cogroup
        l_i = left.select(
            F.col("id").alias("id"), F.col("v").alias("v")
        ).select(
            "id", "v", F.lit(m).alias("m"),
            own.alias("lb"), F.explode(blocks).alias("rb"),
        )
        r_i = right.select(
            F.col("id").alias("id"), F.col("v").alias("v")
        ).select(
            "id", "v", F.lit(m).alias("m"),
            own.alias("rb"), F.explode(blocks).alias("lb"),
        )
        lg = l_i if lg is None else lg.unionByName(l_i)
        rg = r_i if rg is None else rg.unionByName(r_i)

    def per_block(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if not len(lpdf) or not len(rpdf):
            return pd.DataFrame(
                {
                    "src": lpdf["id"].iloc[:0],
                    "dst": rpdf["id"].iloc[:0],
                    "__cos": pd.Series([], dtype="float64"),
                }
            )
        Xl = np.stack(lpdf["v"].to_numpy()).astype(np.float64)
        Xr = np.stack(rpdf["v"].to_numpy()).astype(np.float64)
        for X in (Xl, Xr):
            norms = np.linalg.norm(X, axis=1)
            norms[norms == 0] = 1.0
            X /= norms[:, None]
        ids_l = lpdf["id"].to_numpy()
        ids_r = rpdf["id"].to_numpy()
        m = len(ids_r)
        k = min(deg, m)
        block = min(len(ids_l), max(128, _budget // m))
        src_out, dst_out, cos_out = [], [], []
        for b0 in range(0, len(ids_l), block):
            b1 = min(b0 + block, len(ids_l))
            S = Xl[b0:b1] @ Xr.T
            # id-equal pairs off the candidate list (self-similarity)
            S[ids_l[b0:b1, None] == ids_r[None, :]] = -np.inf
            # tie-aware cut (ADVICE r9): argpartition alone keeps/drops
            # candidates tied at the k-th score arbitrarily — with
            # > degree equal cosines in one block (duplicate vectors)
            # the (cos desc, dst asc)-preferred dst could be dropped.
            # Widen each row's selection to every column scoring >= its
            # k-th selected score, then let the exact sort truncate.
            if k < m:
                part = np.argpartition(-S, k - 1, axis=1)[:, :k]
                thr = np.take_along_axis(S, part, axis=1).min(axis=1)
            else:
                thr = np.full(b1 - b0, -np.inf)
            for r in range(b1 - b0):
                cols = (
                    np.flatnonzero(S[r] >= thr[r])
                    if thr[r] != -np.inf
                    else np.flatnonzero(S[r] != -np.inf)
                )
                order = sorted(cols, key=lambda c: (-S[r, c], ids_r[c]))[:k]
                src_out.extend([ids_l[b0 + r]] * len(order))
                dst_out.extend(ids_r[c] for c in order)
                cos_out.extend(S[r, c] for c in order)
        return pd.DataFrame(
            {"src": src_out, "dst": dst_out, "__cos": cos_out}
        )

    return (
        lg.groupBy("m", "lb", "rb")
        .cogroup(rg.groupBy("m", "lb", "rb"))
        .applyInPandas(per_block, f"src {id_dt}, dst {id_dt}, __cos double")
    )


def _pair_topk(
    pairs: DataFrame,
    vectors: DataFrame,
    degree: int,
    grid: int | None = None,
) -> DataFrame:
    """Score an EXPLICIT candidate pair set and keep each src's
    top-``degree``, as ``(src, dst, __cos)`` — the pair-list sibling of
    :func:`_exact_block_topk` (r10, guide §4.2): the same numpy engine
    (normalize each side with zero-norm → 1.0, i.e. a zero vector
    scores cos 0.0, then a float64 dot), never a per-pair Catalyst HOF
    fold. This is what NN-descent refinement and the append/delete
    stored-edge re-scores route through, so the whole exact/refine
    family shares ONE scoring convention (ADVICE r9). ``pairs`` must be
    distinct ``(src, dst)`` rows with src != dst whose endpoints all
    appear in ``vectors`` (``(id, v)``).

    Shape: the dst vector rides a plain equi-join (|pairs| rows — the
    same volume the HOF formulation shuffled, minus the second vector);
    the src side is a hash-bucketed cogroup against the vector table
    (``pmod(xxhash64(src), grid)``, both keys int — see the key-type
    note in :func:`_exact_block_topk`). Every pair of a given src lands
    in ONE group, so the group-local top-``degree`` cut IS the global
    per-src answer — and it is tie-UNAMBIGUOUS (no block-boundary tie
    hazard): (cos desc, dst asc) totally orders a src's distinct dsts.
    Emitting only the winners keeps the downstream
    :func:`_top_degree_edges` window input at |V|·degree rows instead
    of the full candidate volume (|V|·4d² for an NN-descent round).

    Per-task memory is O(|bucket pairs|·dim) row-blocked under
    GRAPH_BUILD_BLOCK_BUDGET; ``grid`` sizes task granularity exactly
    like the exact tier's block grid.
    """
    import numpy as np
    import pandas as pd

    if grid is None:
        grid = GRAPH_EXACT_GRID
    deg = degree
    _budget = GRAPH_BUILD_BLOCK_BUDGET
    id_dt = vectors.schema["id"].dataType.simpleString()
    vecs = vectors.select(F.col("id").alias("id"), F.col("v").alias("v"))
    withd = pairs.select("src", "dst").join(
        vecs.select(F.col("id").alias("dst"), F.col("v").alias("__vd")),
        "dst",
    )
    pl = withd.select(
        "src",
        "dst",
        "__vd",
        F.pmod(F.xxhash64("src"), F.lit(grid)).cast("int").alias("gb"),
    )
    vr = vecs.select(
        "id",
        "v",
        F.pmod(F.xxhash64("id"), F.lit(grid)).cast("int").alias("gb"),
    )

    def per_bucket(ppdf: pd.DataFrame, vpdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "src": ppdf["src"].iloc[:0],
                "dst": ppdf["dst"].iloc[:0],
                "__cos": pd.Series([], dtype="float64"),
            }
        )
        if not len(ppdf) or not len(vpdf):
            return empty
        m = ppdf.merge(
            vpdf.rename(columns={"id": "src", "v": "__vs"}), on="src"
        )
        n = len(m)
        if not n:
            return empty
        dim = len(m["__vs"].iloc[0])
        block = max(128, _budget // max(dim, 1))
        vs_col = m["__vs"].to_numpy()
        vd_col = m["__vd"].to_numpy()
        cos = np.empty(n, dtype=np.float64)
        for b0 in range(0, n, block):
            b1 = min(b0 + block, n)
            Xs = np.stack(vs_col[b0:b1]).astype(np.float64)
            Xd = np.stack(vd_col[b0:b1]).astype(np.float64)
            for X in (Xs, Xd):
                norms = np.linalg.norm(X, axis=1)
                norms[norms == 0] = 1.0
                X /= norms[:, None]
            cos[b0:b1] = np.einsum("ij,ij->i", Xs, Xd)
        out = pd.DataFrame({"src": m["src"], "dst": m["dst"], "__cos": cos})
        # group-local == global per-src cut (all of a src's pairs share
        # this bucket); the key below is a total order, so head(deg) is
        # deterministic regardless of input row order
        out = out.sort_values(
            ["src", "__cos", "dst"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        return out.groupby("src", sort=False).head(deg)

    return (
        pl.groupBy("gb")
        .cogroup(vr.groupBy("gb"))
        .applyInPandas(per_bucket, f"src {id_dt}, dst {id_dt}, __cos double")
    )


def build_knn_graph(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    degree: int = 8,
    strategy: str = "exact",
    nlist: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    ivf=None,
    refine: int | str = 0,
) -> DataFrame:
    """Edge table ``(src, dst)``: for every vector its ``degree``
    most-cosine-similar OTHER vectors (ties to the smaller dst id).

    ``strategy='exact'``: one kNN self-join — |V|² scored candidates,
    the oracle-replayable tier for fixture-scale graphs.
    ``strategy='ivf'``: candidates restricted to shared-quantizer cell
    matches (nprobe query-side cells against replication-assigned
    corpus cells) — the corpus-scale build, cost bounded by cell
    products instead of |V|²; the resulting graph is approximate in
    exactly the IVF-recall sense (edges it misses are cross-cell).
    Pass ``ivf`` (an ``IVFIndex`` already covering ``df``) to reuse an
    existing quantizer + assignment instead of training a throwaway one
    — the ``KNNGraphIndex.build`` path, where the same quantizer also
    routes queries and receives appends.

    ``refine``: NN-descent rounds applied to the fresh graph — an int,
    or ``'auto'`` (r8 frontier finding): skip refine when the build
    quantizer's measured cell-coassignment recall clears
    ``AUTO_REFINE_COASSIGNMENT_BAR`` (clustered geometry — refine is a
    no-op there), run 1 round otherwise (structure-free geometry, where
    refine repairs cross-cell edge loss). Always 0 for
    ``strategy='exact'`` under ``'auto'`` (nothing to repair).
    """
    if strategy == "exact":
        # Block-matmul scoring (r9): the |V|² candidate pairs never
        # materialize as Spark rows — see _exact_block_topk. The global
        # window below ranks |V|·grid·degree block winners instead.
        pts = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        scored = _exact_block_topk(pts, pts, degree)
    elif strategy == "ivf":
        # Blocked-matmul build: assign rows to IVF cells (boundary
        # replication = nprobe so near-boundary neighborhoods overlap),
        # then compute each cell's FULL similarity matrix with one
        # numpy matmul inside applyInPandas and emit only per-row
        # top-degree candidates. Candidate PAIRS never materialize as
        # Spark rows (the equi-join formulation evaluates an array-HOF
        # cosine per candidate at ~30us/pair — measured 50+ minutes at
        # 20k vectors; the matmul does the same arithmetic at numpy
        # speed in seconds). Shuffle volume is |rows|·replication for
        # the grouping plus |rows|·replication·degree candidate edges.
        if ivf is None:
            from ..index.ann import IVFIndex

            ivf = IVFIndex(
                df, key=id_col, vector_col=vec_col,
                nlist=nlist, replication=max(2, nprobe), seed=seed,
            )
        assigned = ivf.assigned.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("v"),
            "centroid_id",
        )
        import numpy as np
        import pandas as pd

        deg = degree

        # Cell-size guard: the similarity matrix is computed in ROW
        # BLOCKS of at most ceil(budget / m) rows, so one task's largest
        # allocation is block_rows x m float64 <= ~128 MB no matter how
        # hot a cell gets (cell population is data-dependent — a skewed
        # corpus or a bad quantizer draw can concentrate rows, and an
        # unguarded m x m at m=50k would be a 20 GB single-task numpy
        # allocation). Blocking changes the allocation shape only: every
        # row still scores against the WHOLE cell, so the emitted edges
        # are bitwise-identical to the full-matmul formulation
        # (pytest-pinned on an adversarially skewed corpus).
        _BLOCK_BUDGET = GRAPH_BUILD_BLOCK_BUDGET

        def per_cell(pdf: pd.DataFrame) -> pd.DataFrame:
            m = len(pdf)
            if m < 2:
                return pd.DataFrame(
                    {"src": [], "dst": [], "cos": []}
                ).astype({"src": "int64", "dst": "int64", "cos": "float64"})
            X = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(X, axis=1)
            norms[norms == 0] = 1.0
            Xn = X / norms[:, None]
            ids = pdf["id"].to_numpy()
            k = min(deg, m - 1)
            block = min(m, max(128, _BLOCK_BUDGET // m))
            src_out, dst_out, cos_out = [], [], []
            for b0 in range(0, m, block):
                b1 = min(b0 + block, m)
                S = Xn[b0:b1] @ Xn.T  # (b1-b0) x m
                # self-similarity off the candidate list, block-relative
                S[np.arange(b1 - b0), np.arange(b0, b1)] = -np.inf
                # top-k per row: argpartition widened to ties at the
                # k-th score (ADVICE r9 — the bare argpartition cut
                # keeps/drops equal cosines arbitrarily), then the
                # exact (cos desc, id asc) sort truncates to k
                part = np.argpartition(-S, k - 1, axis=1)[:, :k]
                thr = np.take_along_axis(S, part, axis=1).min(axis=1)
                for r in range(b1 - b0):
                    cols = (
                        np.flatnonzero(S[r] >= thr[r])
                        if thr[r] != -np.inf
                        else np.flatnonzero(S[r] != -np.inf)
                    )
                    order = sorted(
                        cols, key=lambda c: (-S[r, c], ids[c])
                    )[:k]
                    src_out.extend([ids[b0 + r]] * len(order))
                    dst_out.extend(ids[c] for c in order)
                    cos_out.extend(S[r, c] for c in order)
            return pd.DataFrame(
                {"src": src_out, "dst": dst_out, "cos": cos_out}
            )

        scored = (
            assigned.groupBy("centroid_id")
            .applyInPandas(per_cell, "src long, dst long, cos double")
            # replication puts a row in several cells: keep one copy of
            # each candidate edge (same cos in every copy)
            .groupBy("src", "dst")
            .agg(F.max("cos").alias("__cos"))
        )
    else:
        raise ValueError(f"unknown strategy {strategy!r}")
    edges = _top_degree_edges(scored, degree)
    rounds = resolve_refine_rounds(
        refine, ivf if strategy == "ivf" else None
    )
    if rounds:
        edges = refine_knn_graph(
            edges,
            df.select(F.col(id_col), F.col(vec_col)),
            id_col,
            vec_col,
            degree=degree,
            rounds=rounds,
        )
    return edges


def mutual_pairs(edges: DataFrame) -> DataFrame:
    """Reciprocal edges of a kNN graph: ``(id_a, id_b)`` with
    ``id_a < id_b`` where BOTH directions exist in ``edges`` (src, dst).
    The standard reliable-pair filter (one-directional neighbors are
    hubness-prone; mutual ones rarely are — the CCMatrix candidate
    gate / NN-descent convergence measure). One self-equi-join on the
    reversed key over |V|·degree rows — the corpus is never touched."""
    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    return (
        edges.join(rev, ["src", "dst"])
        .filter(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("id_a"), F.col("dst").alias("id_b"))
    )


def _top_degree_edges(scored: DataFrame, degree: int) -> DataFrame:
    """The edge-ranking epilogue every graph tier shares: per-src
    top-``degree`` of ``(src, dst, __cos)`` with the (cos desc, dst asc)
    tie-break. ONE home for the convention — the exact/ivf builds,
    NN-descent refinement, and incremental append all rank through
    here, and the registry oracles replay exactly this ordering; a
    drift in any one tier would silently break the append==rebuild
    identity and the unrolled-SQL hashes."""
    w = Window.partitionBy("src").orderBy(F.desc("__cos"), F.asc("dst"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= degree)
        .select("src", "dst")
    )


def append_knn_graph(
    graph: DataFrame,
    old_vectors: DataFrame,
    new_vectors: DataFrame,
    id_col: str,
    vec_col: str,
    degree: int = 8,
    strategy: str = "exact",
    nlist: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    ivf=None,
) -> DataFrame:
    """Incremental kNN-graph maintenance — the graph-tier analog of the
    reference's delta-sync index refresh (NMR:278 change feed →
    NMR:315-323 TRIGGERED sync; the same contract as ``IVFIndex.append``):
    ingest a vector batch WITHOUT rebuilding the stored graph.

    Edge repair is local by construction: new nodes need their full
    top-``degree`` neighbor list, but a STORED node's list can only
    change where a NEW vector enters it — so the candidate set is
    exactly ``old edges ∪ (old × new) ∪ (new × all)``, never
    ``old × old`` again. With an exact starting graph the result is
    provably the exact graph of the full corpus (the append pytest and
    the registry oracle both pin that identity); with an approximate
    start the repair preserves its quality (a ``refine_knn_graph``
    round after appends recovers drift).

    ``strategy='exact'``: the (old × new) and (new × all) products are
    scored outright — the oracle-replayable tier, cost
    |old|·|new| + |new|·|all|. ``strategy='ivf'``: both products are
    restricted to shared-quantizer cell matches (the
    ``build_knn_graph`` scale recipe). Pass the STORED ``ivf`` index
    (the one whose quantizer built the graph) so an append assigns
    only the new batch against it — ~|new|·replication cell rows
    touched, the stored corpus never re-shuffled (the
    ``IVFIndex.append`` contract). With ``ivf=None`` a throwaway
    quantizer is trained over old+new — convenient at fixture scale,
    but it re-assigns the whole corpus per append and is NOT the
    incremental path.

    UPDATE semantics (the change-feed case): an id present in BOTH
    inputs takes the NEW vector — the old row is dropped before
    candidate generation, every candidate pair is re-scored against
    current vectors, and self-pairs are excluded; ids within
    ``new_vectors`` itself must be unique (caller contract, as for any
    keyed upsert batch). Unlike pure inserts, updates are not EXACTLY
    locally repairable: a changed vector can be evicted from a stored
    node's list, and the replacement (that node's next-best OLD
    neighbor) is outside the local candidate set — new/updated sources
    stay exact, stored sources carry a small eviction gap (measured
    ~1% of edges on the fixture; one :func:`refine_knn_graph` round
    recovers most of it — the same periodic-repair discipline every
    production graph index pairs with tombstoned updates).
    """
    news = new_vectors.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    )
    # new wins on id collision: the old row (and its stale vector)
    # must not fan out the score joins below
    olds = old_vectors.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    ).join(news.select("id"), "id", "left_anti")
    alls = olds.unionByName(news)
    if strategy == "exact":
        # r9: the (old x new) and (new x all) products are scored by
        # the block-matmul engine — only block-local top-degree
        # candidates come back, never the full products as rows.
        # r10 (ADVICE r9): the stored edges (|V|·degree, tiny) are
        # re-scored on current vectors through the SAME numpy engine
        # (_pair_topk: normalize-then-dot, zero-norm → cos 0.0) instead
        # of the Catalyst HOF cosine — one scoring convention across
        # the union. A pair scored by both branches carries the same
        # normalize-then-dot double up to BLAS accumulation order, so
        # the (src, dst) max-dedup below is value-approximate at ULP
        # scale (not provably bitwise); the append==rebuild identity is
        # replay-verified at sf0.01 and sf0.1 and pytest-pinned on the
        # fixtures, where no candidate scores tie.
        # one tagged cogroup stage for BOTH products (r10, guide §2.4)
        prod_scored = _exact_block_topk_multi(
            [(olds, news), (news, alls)], degree
        )
        stored_scored = _pair_topk(
            graph.select("src", "dst").filter(F.col("src") != F.col("dst")),
            alls,
            degree,
        )
        scored = (
            prod_scored.unionByName(stored_scored)
            .groupBy("src", "dst")
            .agg(F.max("__cos").alias("__cos"))
        )
        return _top_degree_edges(scored, degree)
    elif strategy == "ivf":
        if ivf is None:
            from ..index.ann import IVFIndex

            # fixture-scale convenience ONLY: trains and assigns over
            # the whole old+new corpus (see docstring)
            ivf = IVFIndex(
                alls, key="id", vector_col="v",
                nlist=nlist, replication=max(2, nprobe), seed=seed,
            )
            old_a = ivf.assigned.select("id", "centroid_id").join(
                news.select("id"), "id", "left_anti"
            )
            new_a = ivf.assigned.select("id", "centroid_id").join(
                news.select("id"), "id"
            )
        else:
            # the incremental path: stored assignments are reused
            # verbatim; only the new batch runs the assignment
            # expression (and probes nprobe cells so near-boundary
            # neighborhoods overlap)
            old_a = ivf.assigned.select(
                F.col(ivf.key).alias("id"), "centroid_id"
            ).join(news.select("id"), "id", "left_anti")
            new_a = ivf.assign_cells(
                news.withColumnRenamed("v", ivf.vector_col)
                if ivf.vector_col != "v"
                else news,
                ivf.vector_col,
                nprobe,
            ).select(F.col("id"), "centroid_id")
        all_a = old_a.unionByName(new_a)
        mates = (
            all_a.join(
                new_a.withColumnRenamed("id", "nid"), "centroid_id"
            )
            .filter(F.col("id") != F.col("nid"))
            .select("id", "nid")
            .distinct()
        )
        cand = (
            graph.select("src", "dst")
            .filter(F.col("src") != F.col("dst"))
            .unionByName(
                mates.select(
                    F.col("id").alias("src"), F.col("nid").alias("dst")
                )
            )
            .unionByName(
                mates.select(
                    F.col("nid").alias("src"), F.col("id").alias("dst")
                )
            )
        )
    else:
        raise ValueError(f"unknown strategy {strategy!r}")
    # r10: the cell-mate candidate re-score goes through the numpy pair
    # engine (guide §4.2) — this is the PRODUCTION append path, where
    # the per-pair HOF cosine was the last interpreted fold in the
    # maintenance family
    return _top_degree_edges(
        _pair_topk(cand.distinct(), alls, degree), degree
    )


def delete_knn_graph(
    graph: DataFrame,
    vectors: DataFrame,
    deleted: DataFrame,
    id_col: str,
    vec_col: str,
    degree: int = 8,
    strategy: str = "exact",
    nprobe: int = 4,
    ivf=None,
) -> DataFrame:
    """Graph-tier DELETE — the third change-feed operation (NMR:278),
    completing the CDC triad with inserts/updates (`append_knn_graph`):
    remove a batch of ids WITHOUT rebuilding the stored graph.

    Deletion repair is exactly local, and unlike updates the exact-tier
    identity is PROVABLE: deletions only remove competitors, so a
    stored source none of whose top-``degree`` neighbors was deleted
    has the identical top-``degree`` over the remaining corpus — only
    AFFECTED sources (those that lost an edge) need refilling. The
    candidate set is ``surviving edges ∪ (affected × remaining)``:
    re-ranked per source, it equals the exact graph of the remaining
    corpus (the registry oracle), at cost |affected|·|remaining| — and
    |affected| is bounded by the deleted batch's in-degree, not the
    corpus. ``strategy='ivf'`` restricts the refill product to
    shared-quantizer cell mates under the STORED ``ivf`` (pass the
    index whose quantizer built the graph; refill sources re-enter the
    assignment expression — they are a small batch — while the
    remaining corpus keeps its stored assignments).

    ``deleted`` is a DataFrame holding ``id_col``. Returns the repaired
    edge table ``(src, dst)`` over the remaining ids.
    """
    dele = deleted.select(F.col(id_col).alias("__del")).distinct()
    remaining = vectors.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    ).join(dele, F.col("id") == F.col("__del"), "left_anti")
    live_src = graph.join(
        dele, graph["src"] == dele["__del"], "left_anti"
    )
    surviving = live_src.join(
        dele, live_src["dst"] == dele["__del"], "left_anti"
    ).select("src", "dst")
    # sources that LOST an edge: their next-best neighbor is not stored
    affected = (
        live_src.join(dele, live_src["dst"] == dele["__del"], "left_semi")
        .select("src")
        .distinct()
    )
    if strategy == "exact":
        # r9: the (affected x remaining) refill product goes through
        # the block-matmul engine (block-local top-degree candidates,
        # not |affected|·|remaining| scored pair rows). r10 (ADVICE
        # r9): the surviving edges (≤ |V|·degree) re-score through the
        # SAME numpy engine (_pair_topk — normalize-then-dot, zero-norm
        # → cos 0.0) rather than the HOF cosine; overlaps with the
        # refill are value-approximate at ULP scale (BLAS accumulation
        # order), and the delete==rebuild identity is replay-verified
        # at sf0.01/sf0.1 and pytest-pinned on the fixtures.
        aff_pts = affected.withColumnRenamed("src", "id").join(
            remaining, "id"
        )
        refill_scored = _exact_block_topk(aff_pts, remaining, degree)
        surv_scored = _pair_topk(surviving, remaining, degree)
        scored = (
            refill_scored.unionByName(surv_scored)
            .groupBy("src", "dst")
            .agg(F.max("__cos").alias("__cos"))
        )
        return _top_degree_edges(scored, degree)
    elif strategy == "ivf":
        if ivf is None:
            raise ValueError(
                "strategy='ivf' requires the stored ivf index"
            )
        # refill sources re-assign (they are few); remaining corpus
        # keeps its stored cells (minus deleted rows)
        src_cells = ivf.assign_cells(
            affected.join(
                remaining.withColumnRenamed("id", "src"), "src"
            ).select("src", F.col("v").alias(ivf.vector_col)),
            ivf.vector_col,
            nprobe,
        ).select("src", "centroid_id")
        rem_cells = ivf.assigned.select(
            F.col(ivf.key).alias("dst"), "centroid_id"
        ).join(dele, F.col("dst") == F.col("__del"), "left_anti")
        refill = (
            src_cells.join(rem_cells, "centroid_id")
            .select("src", "dst")
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )
    else:
        raise ValueError(f"unknown strategy {strategy!r}")
    cand = surviving.unionByName(refill).distinct()
    # r10: numpy pair engine for the refill re-score (see append) —
    # no per-pair HOF fold on the production delete path either
    return _top_degree_edges(
        _pair_topk(cand, remaining, degree), degree
    )


def refine_knn_graph(
    graph: DataFrame,
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    degree: int = 8,
    rounds: int = 1,
) -> DataFrame:
    """NN-descent refinement of an approximate kNN graph (Dong et al.,
    WWW'11): a node's true neighbors are overwhelmingly neighbors of its
    current approximate neighbors, so each round scores the 2-hop
    closure and keeps the per-node top-``degree`` — recovering exactly
    the cross-cell edges an ivf-built graph misses, without another
    pass over the quantizer.

    Candidate set per round, as plain DataFrame joins (no Python in the
    loop): let ``sym = out-edges ∪ reversed edges`` (a node's general
    neighbors, Dong et al.'s B[v] ∪ R[v]); candidates are
    ``sym ∪ (sym ∘ sym)``. Because sym is symmetric, sym∘sym generates
    every pair co-incident on a shared node — co-OUT-neighbors
    (u→v, w→v) included, which an out∘out composition would miss — so
    this IS the classic full local join (minus NN-descent's sampling ρ,
    which matters only at degrees far above these). At most ``2d + 4d²``
    candidates per node, one equi-join on the shared endpoint: a round
    costs O(|V|·d²) scored pairs regardless of corpus size.

    Scoring (r10, guide §4.2): the candidate pairs route through
    :func:`_pair_topk` — the vectorized numpy pair engine the exact
    tier already uses — instead of a per-pair Catalyst HOF cosine
    (three zip_with/aggregate array folds per candidate, the last
    per-pair interpreted scorer in the graph family), and only per-src
    winners reach the global ranking window. ``localCheckpoint``
    BETWEEN rounds keeps lineage linear in ``rounds``; the final
    round's result is returned LAZY — each refine reference of the
    previous round's edge table (sym, reversed, the 2-hop self-join)
    needs a materialization barrier, but the returned table is the
    caller's to materialize exactly when it reuses it
    (``KNNGraphIndex.build``/``append`` already checkpoint it; a
    single-consumer caller folds it into its one action).
    Deterministic: (cos desc, id) tie-breaks, no sampling.

    Measured (tools/graph_sf1.py, 20k vectors): one round lifts the
    ivf-built graph's exact-edge overlap and the downstream beam recall
    at equal degree — see SCALE_SF1.md.
    """
    vecs = vectors.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    )
    edges = graph.select("src", "dst")
    prev = None
    for r in range(rounds):
        if r:
            # materialize the previous round (it is referenced several
            # times below), then free the round before it (§5) — its
            # blocks are superseded the moment this barrier completes
            edges = edges.localCheckpoint(eager=True)
            if prev is not None:
                prev.unpersist()
            prev = edges
        rev = edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )
        # symmetrize FIRST, then compose: sym∘sym covers co-in-neighbor
        # pairs (u→v, w→v) that out∘out alone never generates
        sym = edges.unionByName(rev).distinct()
        hop2 = (
            sym.alias("a")
            .join(
                sym.alias("b"),
                F.col("a.dst") == F.col("b.src"),
            )
            .select(
                F.col("a.src").alias("src"), F.col("b.dst").alias("dst")
            )
        )
        cand = (
            sym.unionByName(hop2)
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )
        edges = _top_degree_edges(_pair_topk(cand, vecs, degree), degree)
    return edges


def cell_coassignment_recall(
    ivf, sample_n: int = 32, k: int = 5
) -> float:
    """Fraction of exact top-``k`` neighbor pairs (over a deterministic
    ``sample_n``-query panel) that share at least one quantizer cell
    under ``ivf``'s replicated assignment — the quantity that BOUNDS an
    ivf-built graph's direct-candidate recall (ANN_FRONTIER.md measured
    it at 0.77 on 200k structure-free vectors vs ~1.0 on clustered
    geometry, which is the whole story of why NN-descent refine repairs
    the former and is a no-op on the latter).

    Cost is sample-bounded, corpus-linear: ONE pass over the corpus
    scoring the ``sample_n`` broadcast queries through
    ``VectorIndex.search_batch(local_topk=True)`` — partition-local
    top-k, so the exchange carries |partitions|·sample_n·k candidate
    rows, never |corpus|·sample_n — then two broadcast joins of the
    tiny pair table against the assignment table. Negligible next to
    the build matmul it gates. Deterministic: the panel is the
    ``sample_n`` smallest keys, ties by (cos desc, id asc)."""
    from .vector_index import VectorIndex

    key, vec = ivf.key, ivf.vector_col
    corpus = ivf.assigned.select(key, vec).dropDuplicates([key])
    panel = (
        corpus.orderBy(key)
        .limit(sample_n)
        .select(F.col(key).alias("__qid"), F.col(vec).alias("__qv"))
    )
    # k+1 then drop the self-hit (every query is its own top-1); the
    # residual per-query rank cut runs on the (sample_n x k+1)-row result
    nbrs = VectorIndex(corpus, key=key, vector_col=vec).search_batch(
        panel, k=k + 1, query_key="__qid", query_vector_col="__qv",
        local_topk=True,
    )
    w = Window.partitionBy("__qid").orderBy(F.desc("score"), F.asc(key))
    pairs = (
        nbrs.filter(F.col("__qid") != F.col(key))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("__qid", F.col(key).alias("__nid"))
        .localCheckpoint(eager=True)
    )
    total = pairs.count()
    if not total:
        return 1.0
    qcells = ivf.assigned.select(
        F.col(key).alias("__qid"), F.col("centroid_id").alias("__cell")
    )
    ncells = ivf.assigned.select(
        F.col(key).alias("__nid"), F.col("centroid_id").alias("__cell")
    )
    hit = (
        qcells.join(F.broadcast(pairs), "__qid")
        .join(ncells, ["__nid", "__cell"])
        .select("__qid", "__nid")
        .distinct()
        .count()
    )
    pairs.unpersist()
    return hit / total


#: 'auto' refine skips NN-descent when at least this fraction of exact
#: top-k pairs already share a quantizer cell (the build generated them
#: as direct candidates — nothing cross-cell left to repair).
AUTO_REFINE_COASSIGNMENT_BAR = 0.9


def resolve_refine_rounds(
    refine: int | str,
    ivf,
    threshold: float = AUTO_REFINE_COASSIGNMENT_BAR,
    sample_n: int = 32,
    k: int = 5,
) -> int:
    """Turn a ``refine`` spec into a concrete NN-descent round count.
    Ints pass through. ``'auto'`` (r8 clustered-frontier finding,
    ANN_FRONTIER.md: refine is bit-identical-output waste on clustered
    geometry — its 847 s at 200k bought +0.000 recall — but repairs
    low-coassignment builds): measure
    :func:`cell_coassignment_recall` under the build quantizer and skip
    refine (0 rounds) when it clears ``threshold``, else run 1 round."""
    if refine == "auto":
        if ivf is None:
            return 0  # exact tier: the graph is already exact
        r = cell_coassignment_recall(ivf, sample_n=sample_n, k=k)
        return 0 if r >= threshold else 1
    return int(refine)


def cell_representatives(ivf, per_cell: int = 1) -> DataFrame:
    """``(centroid_id, __id)``: each IVF cell's ``per_cell`` most-central
    members (max cosine to the cell centroid, id tie-break) — the static
    half of the query-adaptive entry derivation, ONE window over the
    assigned corpus producing |cells|·per_cell rows. Compute it once per
    index and persist it (``KNNGraphIndex`` does): recomputing per query
    batch re-scans the corpus for a table the size of the cell count.
    """
    from .vector_index import _query_literal

    cents = F.array(*[_query_literal(c) for c in ivf.centroids])
    member_score = cosine_similarity(
        F.col("__v"), F.element_at(cents, F.col("centroid_id") + 1)
    )
    w = Window.partitionBy("centroid_id").orderBy(
        F.desc("__cs"), F.asc("__id")
    )
    return (
        ivf.assigned.select(
            F.col(ivf.key).alias("__id"),
            F.col(ivf.vector_col).alias("__v"),
            "centroid_id",
        )
        .withColumn("__cs", member_score)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= per_cell)
        .select("centroid_id", "__id")
    )


def ivf_entry_points(
    ivf,
    queries: DataFrame,
    id_col: str,
    query_key: str = "query_id",
    query_vector_col: str = "query_vec",
    nprobe: int = 4,
    per_cell: int = 1,
    reps: DataFrame | None = None,
) -> DataFrame:
    """Query-adaptive beam entries from an IVF coarse quantizer: each
    query's ``nprobe`` most-aligned cells contribute their ``per_cell``
    most-central members — the flat-graph analog of HNSW's coarse
    routing layer, built from machinery the index already has. A fixed
    global entry list starts every walk from the same corner of the
    graph and pays hops crossing to the query's neighborhood;
    centroid-routed entries start the walk inside it (measured in
    ANN_FRONTIER.md: >= recall at fewer scored rows for equal
    beam/hops).

    Returns ``(query_key, id_col)`` — the ``entries`` argument of
    :func:`beam_search`. Everything is DataFrame ops: cell
    representatives come from :func:`cell_representatives` (pass a
    materialized ``reps`` to skip recomputing them — the serve-many
    path ``KNNGraphIndex`` persists; ``per_cell`` is ignored then), the
    query side is the same codegen'd top-nprobe cell assignment
    ``IVFIndex.assign_cells`` uses, and the join is on the cell id.
    """
    if reps is None:
        reps = cell_representatives(ivf, per_cell)
    # r9: query-side assignment through the broadcast centroid TABLE
    # (IVFIndex.assign_cells_small) — bitwise-identical ranking to the
    # expression path, but the plan carries a |cells|-row table instead
    # of an nlist·dim-literal tree Catalyst re-analyzes per serve
    # (measured 4.4 s of driver planning per search at nlist=64,
    # guide §7.3)
    qcells = ivf.assign_cells_small(
        queries.select(query_key, query_vector_col),
        query_vector_col,
        nprobe,
        query_key,
    )
    return (
        qcells.join(F.broadcast(reps), "centroid_id")
        .select(query_key, F.col("__id").alias(id_col))
        .distinct()
    )


def beam_search(
    graph: DataFrame,
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    beam: int = 12,
    hops: int = 3,
    entry_ids: list | None = None,
    query_key: str = "query_id",
    query_vector_col: str = "query_vec",
    score_col: str = "score",
    stats: list | None = None,
    entries: DataFrame | None = None,
) -> DataFrame:
    """Batched NSW beam search over a kNN graph.

    Entry points come from exactly one of two sources:

    - ``entry_ids``: a fixed id list shared by every query — the
      flat-graph analog of HNSW's single top-layer entry point, and the
      deterministic fixture the registry oracle replays;
    - ``entries``: a ``(query_key, id_col)`` DataFrame of per-query
      entry points — the query-adaptive tier (see
      :func:`ivf_entry_points`), which starts each walk inside the
      query's own neighborhood.

    Per hop: expand the current per-query beam through the edge table,
    score the new candidates, keep the per-query top-``beam`` of old ∪
    new. Returns the per-query top-``k``: ``(query_key, id_col,
    score)``, score = cosine, ordered within query by (score desc, id).

    Determinism: fixed graph + deterministic entries + (score desc, id)
    tie-breaks make the whole walk a pure function of the tables — the
    unrolled-SQL oracle replays it hop for hop.

    ``stats``: pass a list to receive the number of candidate rows
    actually SCORED per stage (entries first, then one entry per hop) —
    the probe-cost metric ANN_FRONTIER.md records. Costs one extra
    count action per hop; leave None on the hot path.
    """
    if (entries is None) == (not entry_ids):
        raise ValueError(
            "exactly one of entry_ids (non-empty id list) or entries "
            "(per-query DataFrame) is required"
        )
    q = queries.select(
        F.col(query_key).alias("__qid"),
        F.col(query_vector_col).alias("__qv"),
    )
    vecs = vectors.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v")
    )
    if entries is not None:
        seed = entries.select(
            F.col(query_key).alias("__qid"),
            F.col(id_col).alias("__id"),
        )
        # re-establish the fixed-list path's non-emptiness invariant:
        # an empty/mis-keyed entries table would otherwise walk to an
        # EMPTY result instead of surfacing the misconfiguration.
        # Checkpoint FIRST so the emptiness probe and the seeding both
        # read one materialization (isEmpty on the raw plan would
        # execute the caller's entry-derivation DAG a second time);
        # per-query gaps remain the caller's contract — checking them
        # would cost a full aggregation on the hot path.
        seed = seed.localCheckpoint(eager=True)
        if seed.isEmpty():
            raise ValueError("entries DataFrame is empty")
        # corpus side never shuffled: the (tiny by construction) seed
        # gets the query vectors attached and is broadcast into a
        # single scan of vecs (guide §3.1)
        state = vecs.join(F.broadcast(seed.join(q, "__qid")), "__id")
    else:
        entry = vecs.filter(F.col("__id").isin(list(entry_ids)))
        state = q.crossJoin(F.broadcast(entry))
    state = state.select(
        "__qid",
        "__id",
        cosine_similarity("__qv", "__v").alias("__s"),
    )
    w = Window.partitionBy("__qid").orderBy(F.desc("__s"), F.asc("__id"))

    def top_beam(df: DataFrame) -> DataFrame:
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= beam)
            .drop("__rn")
        )

    edges = graph.select(F.col("src").alias("__id"), F.col("dst"))
    if stats is not None:
        # Instrumented mode (ANN_FRONTIER.md receipts): materialize
        # each hop and count the rows actually scored, keeping the
        # dedup-before-score discipline so the probe-cost metric stays
        # comparable across rounds. Costs one action + checkpoint per
        # hop — the hot path below runs the identical walk as ONE lazy
        # plan instead.
        stats.append(state.count())  # |queries| x |entries| (pre-beam)
        state = top_beam(state).localCheckpoint(eager=True)
        for _ in range(hops):
            neigh = (
                edges.join(
                    F.broadcast(state.select("__qid", "__id")), "__id"
                )
                .select("__qid", F.col("dst").alias("__id"))
                .distinct()
                .join(
                    state.select("__qid", "__id"),
                    ["__qid", "__id"],
                    "left_anti",
                )
            )
            scored = vecs.join(
                F.broadcast(neigh.join(q, "__qid")), "__id"
            ).select(
                "__qid",
                "__id",
                cosine_similarity("__qv", "__v").alias("__s"),
            ).localCheckpoint(eager=True)
            stats.append(scored.count())
            state = top_beam(state.unionByName(scored)).localCheckpoint(
                eager=True
            )
    else:
        # Hot path (r9, guide §2.4/§5): the whole walk is ONE lazy
        # plan — no per-hop eager checkpoint (which cost a driver
        # action + block materialization per hop, ~7 sequential jobs
        # per search). The classic formulation references `state`
        # twice per hop (frontier expansion + union with the beam),
        # doubling the plan per hop; augmenting the edge table with
        # IDENTITY edges (v → v, one row per corpus vertex, built
        # lazily from the vectors side) makes one join produce
        # beam ∪ neighbors(beam) in a single reference, so the plan
        # grows LINEARLY in hops and needs no lineage truncation.
        # Beam survivors are rescored each hop — the same codegen'd
        # cosine on the same rows yields bit-identical scores, and the
        # (qid, id) max-aggregate collapses duplicates before the
        # window; both share the single explicit qid exchange
        # (qid ⊆ (qid, id) satisfies the aggregate's clustering).
        # Per-hop shuffle volume is unchanged: |queries|·beam·degree
        # candidate rows; edge table and corpus are only ever scanned,
        # never shuffled (broadcast hints on the tiny state side).
        edges_aug = edges.unionByName(
            vecs.select("__id", F.col("__id").alias("dst"))
        )
        state = top_beam(state)
        for _ in range(hops):
            cand = edges_aug.join(
                F.broadcast(state.select("__qid", "__id")), "__id"
            ).select("__qid", F.col("dst").alias("__id"))
            state = top_beam(
                vecs.join(F.broadcast(cand.join(q, "__qid")), "__id")
                .select(
                    "__qid",
                    "__id",
                    cosine_similarity("__qv", "__v").alias("__s"),
                )
                .repartition("__qid")
                .groupBy("__qid", "__id")
                .agg(F.max("__s").alias("__s"))
            )
    return (
        state.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(
            F.col("__qid").alias(query_key),
            F.col("__id").alias(id_col),
            F.col("__s").alias(score_col),
        )
    )


# --------------------------------------------------------------------- #
# Build-once / serve-many lifecycle for the graph tier
# --------------------------------------------------------------------- #

_GRAPH_META_FILE = "_knn_graph_meta.json"


class KNNGraphIndex:
    """Persisted graph-ANN index: the build-once / serve-many surface
    the reference's ``get_index`` → ``similarity_search`` flow implies
    (NMR:384-388) and the LSH/IVF tiers already have
    (``BRPLSHIndex.save/load``, ``IVFIndex.save/load``) — without it
    every beam query re-runs the (deliberately expensive) graph build.

    One object bundles the four artifacts a served graph query needs:

    - ``edges`` — the kNN graph, |V|·degree rows keyed by ``src``;
    - ``vectors`` — the scoring side ``(key, vector_col)``;
    - ``ivf`` — the coarse quantizer that routes queries to entry
      points (and receives appends); only its ``centroids`` +
      ``replication`` persist — the assignment is a lazy codegen'd
      expression over the stored vectors, so vectors are stored ONCE;
    - ``reps`` — the MATERIALIZED per-cell entry representatives
      (|cells|·per_cell rows). Recomputing them is a window over the
      whole assigned corpus; serving reads the tiny table instead
      (the load path's entry plan has no Window and no corpus-wide
      scan — pytest-pinned).

    At 100 TB: ``save`` writes ordinary partitioned parquet (edges by
    ``src`` range, vectors by key); a loaded query touches the reps
    parquet (KBs), the query batch, and the edge/vector join path of
    :func:`beam_search` — probe cost stays entries + hops·beam·degree
    per query, independent of corpus size.
    """

    def __init__(
        self,
        edges: DataFrame,
        vectors: DataFrame,
        key: str,
        vector_col: str,
        degree: int,
        ivf,
        reps: DataFrame,
        per_cell: int = 1,
        strategy: str = "exact",
    ) -> None:
        self.edges = edges
        self.vectors = vectors
        self.key = key
        self.vector_col = vector_col
        self.degree = degree
        self.ivf = ivf
        self.reps = reps
        self.per_cell = per_cell
        self.strategy = strategy

    # ------------------------------------------------------------------ #

    @classmethod
    def build(
        cls,
        df: DataFrame,
        key: str,
        vector_col: str,
        degree: int = 8,
        strategy: str = "exact",
        nlist: int = 16,
        nprobe: int = 4,
        seed: int = 42,
        per_cell: int = 1,
        refine_rounds: int | str = 0,
        centroids: list | None = None,
    ) -> "KNNGraphIndex":
        """Build edges + quantizer + entry reps in one pass. ONE
        quantizer serves everything: the ivf-tier edge build (when
        ``strategy='ivf'``), query routing, and future appends — trained
        here (or pinned with explicit ``centroids``, the registry's
        SQL-replayable convention). ``refine_rounds`` optionally applies
        NN-descent rounds to the fresh graph (the ivf-build repair
        discipline); ``'auto'`` gates them on the quantizer's measured
        cell-coassignment recall (see :func:`resolve_refine_rounds` —
        skip on clustered geometry where refine is a measured no-op)."""
        from .ann import IVFIndex

        vectors = df.select(key, vector_col)
        ivf = IVFIndex(
            vectors,
            key=key,
            vector_col=vector_col,
            nlist=nlist,
            replication=max(2, nprobe),
            seed=seed,
            centroids=centroids,
        )
        edges = build_knn_graph(
            vectors, key, vector_col, degree=degree,
            strategy=strategy, nlist=nlist, nprobe=nprobe, seed=seed,
            ivf=ivf if strategy == "ivf" else None,
        )
        refine_rounds = resolve_refine_rounds(
            refine_rounds, ivf if strategy == "ivf" else None
        )
        if refine_rounds:
            edges = refine_knn_graph(
                edges, vectors, key, vector_col,
                degree=degree, rounds=refine_rounds,
            )
        reps = cell_representatives(ivf, per_cell).localCheckpoint(
            eager=True
        )
        return cls(
            edges.localCheckpoint(eager=True),
            vectors,
            key,
            vector_col,
            degree,
            ivf,
            reps,
            per_cell=per_cell,
            strategy=strategy,
        )

    # ------------------------------------------------------------------ #

    def copy(self) -> "KNNGraphIndex":
        """Shallow twin sharing the (immutable) DataFrames but owning
        its OWN mutable slots — ``append``/``delete`` on the twin leave
        the original servable. This is what lets a change-feed
        experiment (or the registry's delete-audit row) run against a
        session-memoized build without corrupting it for later readers;
        the quantizer wrapper is copied too because ``delete`` reassigns
        ``ivf.assigned``."""
        import copy as _copy

        twin = _copy.copy(self)
        twin.ivf = _copy.copy(self.ivf)
        return twin

    def entries_for(
        self,
        queries: DataFrame,
        query_key: str = "query_id",
        query_vector_col: str = "query_vec",
        nprobe: int = 4,
    ) -> DataFrame:
        """Query-adaptive entry points from the STORED reps — no corpus
        scan, no window: the query side runs the codegen'd top-nprobe
        cell assignment, then joins the broadcast reps table."""
        return ivf_entry_points(
            self.ivf,
            queries,
            self.key,
            query_key=query_key,
            query_vector_col=query_vector_col,
            nprobe=nprobe,
            reps=self.reps,
        )

    def search(
        self,
        queries: DataFrame,
        k: int = 5,
        beam: int = 12,
        hops: int = 3,
        nprobe: int = 4,
        query_key: str = "query_id",
        query_vector_col: str = "query_vec",
        score_col: str = "score",
        entry_ids: list | None = None,
        stats: list | None = None,
    ) -> DataFrame:
        """Serve a query batch against the stored graph — the
        ``get_index(...).similarity_search(...)`` shape (NMR:384-388).
        Default entries are query-adaptive (stored reps); pass
        ``entry_ids`` for the fixed-list tier."""
        entries = None
        if entry_ids is None:
            entries = self.entries_for(
                queries, query_key, query_vector_col, nprobe
            )
        return beam_search(
            self.edges,
            self.vectors,
            queries,
            self.key,
            self.vector_col,
            k=k,
            beam=beam,
            hops=hops,
            entry_ids=entry_ids,
            query_key=query_key,
            query_vector_col=query_vector_col,
            score_col=score_col,
            stats=stats,
            entries=entries,
        )

    # ------------------------------------------------------------------ #

    def append(
        self,
        new_vectors: DataFrame,
        nprobe: int = 4,
        refine_rounds: int = 0,
    ) -> "KNNGraphIndex":
        """Ingest a vector batch in place (delta-sync semantics,
        NMR:278): edges repaired via :func:`append_knn_graph` under the
        STORED quantizer (ivf tier) or outright (exact tier), vectors
        upserted (new wins on id collision), quantizer assignment
        extended over the new batch only, and entry reps REFRESHED (an
        ingest-time window — a new vector may be more central than a
        stored rep; serving keeps reading the materialized table).
        ``refine_rounds`` > 0 runs NN-descent repair after an UPDATE
        batch (changed vectors leave stored sources a small eviction
        gap — the append+refine≥0.99-of-rebuild contract is
        pytest-pinned)."""
        news = new_vectors.select(self.key, self.vector_col)
        self.edges = append_knn_graph(
            self.edges,
            self.vectors,
            news,
            self.key,
            self.vector_col,
            degree=self.degree,
            strategy=self.strategy,
            nprobe=nprobe,
            ivf=self.ivf if self.strategy == "ivf" else None,
        ).localCheckpoint(eager=True)
        new_ids = news.select(self.key)
        # checkpoint the upsert: edges/reps are checkpointed per append,
        # and the vector table must be too — otherwise N appends stack N
        # anti-join+union layers that every search hop re-executes (and
        # a later save() to the index's own path would read-and-
        # overwrite the vectors dir it is writing)
        self.vectors = (
            self.vectors.join(new_ids, self.key, "left_anti")
            .unionByName(news)
            .localCheckpoint(eager=True)
        )
        if refine_rounds:
            self.edges = refine_knn_graph(
                self.edges, self.vectors, self.key, self.vector_col,
                degree=self.degree, rounds=refine_rounds,
            ).localCheckpoint(eager=True)
        # quantizer: drop colliding stored assignments, assign the batch.
        # IVFIndex.append itself localCheckpoints the union (r9 fix), so
        # the anti-join layer folds into that checkpoint — no second
        # materialization here.
        self.ivf.assigned = self.ivf.assigned.join(
            new_ids, self.key, "left_anti"
        )
        self.ivf.append(news)
        self.reps = cell_representatives(
            self.ivf, self.per_cell
        ).localCheckpoint(eager=True)
        return self

    def delete(
        self, deleted: DataFrame, nprobe: int | None = None
    ) -> "KNNGraphIndex":
        """Remove a batch of ids in place (the change feed's DELETE op,
        NMR:278): edges repaired via :func:`delete_knn_graph` (exact
        identity at the exact tier; cell-mate refill under the stored
        quantizer at the ivf tier), vectors and quantizer assignments
        dropped, entry reps refreshed. ``deleted`` holds ``key``.

        ``nprobe`` widens the ivf-tier refill probe; it defaults to the
        stored quantizer's replication (the build-time probe width), so
        an index built at nprobe=8 repairs deletions with equally wide
        probes — mirroring :meth:`append`'s explicit knob."""
        self.edges = delete_knn_graph(
            self.edges,
            self.vectors,
            deleted,
            self.key,
            self.vector_col,
            degree=self.degree,
            strategy=self.strategy,
            nprobe=(
                nprobe
                if nprobe is not None
                else getattr(self.ivf, "replication", 4)
            ),
            ivf=self.ivf if self.strategy == "ivf" else None,
        ).localCheckpoint(eager=True)
        del_ids = deleted.select(self.key).distinct()
        self.vectors = self.vectors.join(
            del_ids, self.key, "left_anti"
        ).localCheckpoint(eager=True)
        self.ivf.assigned = self.ivf.assigned.join(
            del_ids, self.key, "left_anti"
        ).localCheckpoint(eager=True)
        self.reps = cell_representatives(
            self.ivf, self.per_cell
        ).localCheckpoint(eager=True)
        return self

    # ------------------------------------------------------------------ #

    def save(self, path: str) -> None:
        """Persist edges + vectors + reps as parquet and the quantizer
        as metadata. Vectors are stored ONCE: the loaded quantizer
        re-derives its (lazy) assignment from the explicit centroids in
        the meta file, so there is no second copy of the corpus inside
        an IVF data dir.

        Safe for save-back-to-own-path (the load → append → save
        delta-sync cycle, NMR:278): the three tables are checkpointed
        FIRST, disconnecting their plans from the very directories the
        write is about to overwrite — Spark otherwise refuses with
        'Cannot overwrite a path that is also being read from'."""
        import json
        import os

        self.edges = self.edges.localCheckpoint(eager=True)
        self.vectors = self.vectors.localCheckpoint(eager=True)
        self.reps = self.reps.localCheckpoint(eager=True)
        os.makedirs(path, exist_ok=True)
        self.edges.write.mode("overwrite").parquet(
            os.path.join(path, "edges")
        )
        self.vectors.write.mode("overwrite").parquet(
            os.path.join(path, "vectors")
        )
        self.reps.write.mode("overwrite").parquet(
            os.path.join(path, "reps")
        )
        with open(os.path.join(path, _GRAPH_META_FILE), "w") as f:
            json.dump(
                {
                    "key": self.key,
                    "vector_col": self.vector_col,
                    "degree": self.degree,
                    "per_cell": self.per_cell,
                    "strategy": self.strategy,
                    "replication": self.ivf.replication,
                    "centroids": [
                        [float(x) for x in c] for c in self.ivf.centroids
                    ],
                },
                f,
            )

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "KNNGraphIndex":
        """Reopen a saved index: edges/vectors/reps are lazy parquet
        scans; the quantizer is rebuilt from stored centroids with a
        LAZY assignment plan over the vectors scan (only append /
        reps-refresh ever executes it — serving never does)."""
        import json
        import os

        from .ann import IVFIndex

        with open(os.path.join(path, _GRAPH_META_FILE)) as f:
            meta = json.load(f)
        vectors = spark.read.parquet(os.path.join(path, "vectors"))
        ivf = IVFIndex(
            vectors,
            key=meta["key"],
            vector_col=meta["vector_col"],
            replication=meta["replication"],
            centroids=meta["centroids"],
        )
        return cls(
            spark.read.parquet(os.path.join(path, "edges")),
            vectors,
            meta["key"],
            meta["vector_col"],
            meta["degree"],
            ivf,
            spark.read.parquet(os.path.join(path, "reps")),
            per_cell=meta["per_cell"],
            strategy=meta["strategy"],
        )
