"""Coreset / diversity selection over embedding corpora (SURVEY §2.3
E93–E94): the data-PRUNING side of a training pipeline — where dedup
removes redundancy reactively, these choose what to KEEP proactively.

- :func:`greedy_kcenter` — greedy farthest-point sampling (the 2-approx
  k-center algorithm; the selection step of coverage-driven data
  pruning à la D4/self-supervised prototypes): repeatedly add the point
  farthest (max cosine distance) from everything selected so far.
- :func:`domain_relevance_select` — representation-based data selection
  (the embedding-space counterpart of DSIR, Xie et al. 2023 §5 RDS
  baseline): score every corpus vector by its mean similarity to a
  small, deterministic prototype set of the target domain and keep the
  top-N.

Spark shape (both): the selected/prototype side stays DRIVER-sized
(k vectors / a fixed seed panel — the IVF driver-state contract), the
corpus side is only ever scanned with codegen'd HOF cosine expressions.
greedy_kcenter maintains an INCREMENTAL nearest-selected-similarity
column: each round scores the corpus against only the ONE newest center
and folds with ``greatest()`` into the persisted running max
(``localCheckpoint`` per round, the repo's multi-action discipline), so
total work is O(k·n·d) with a CONSTANT-size codegen expression per
round — not the O(k²·n·d) / linearly-growing-literal plan a naive
re-score against the whole selection would produce (the same
literal-blowup class as IVF assignment at nlist > 128, fixed in
``index/ann.py`` ``assign_via='auto'``). Nothing shuffles the corpus,
so at 100 TB the cost is k map-only scans, not a pairwise anything.

Determinism: scan order never matters (argmax/top-k take deterministic
(score, id) tie-breaks); the first center is pinned by the caller
(smallest id by convention), so the whole selection replays in SQL —
each iteration is one CTE (see the ``kcenter_coreset`` registry row).
Reference seam: the reference collects candidate sets to the driver for
its demo loop (NMR:227-228); here only the k selected centers ever
leave the executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vector import cosine_similarity


def _lit_vec(vec) -> F.Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def greedy_kcenter(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    first_id=None,
) -> list[dict]:
    """Select ``k`` centers by greedy farthest-point sampling under
    cosine distance (1 − cos). Returns driver-side rows
    ``{rank, id, dist_micro}`` in selection order, where ``dist_micro``
    is the selected point's floor-micro distance to the previously
    selected set (0 for the seed — it is chosen, not scored).

    Incremental min-distance plan: the state DataFrame carries
    ``__sim`` = the running MAX cosine to the selection so far (the
    farthest point MINIMIZES it). Each round (a) takes the (sim asc,
    id asc) top-1 — map-only + TakeOrderedAndProject(1), no shuffle,
    no corpus state on the driver — then (b) folds ONLY the newly
    selected center in with ``greatest(__sim, cos(vec, new))`` and
    ``localCheckpoint(eager=True)``s the result so the plan stays
    constant-size. ``greatest`` is a pure max (no arithmetic), so the
    running fold is bitwise-identical to re-scoring every center with
    one wide ``greatest()`` — the selection, and therefore the SQL
    oracle, is unchanged; total work drops from O(k²·n·d) to O(k·n·d).
    Micro-flooring happens only in the REPORT; the argmax compares raw
    float64 the same way the SQL oracle does.
    """
    import math

    if k < 1:
        raise ValueError("k must be >= 1")
    if first_id is None:
        seed_rows = (
            df.select(id_col, vec_col).orderBy(F.col(id_col)).limit(1)
        ).collect()
    else:
        seed_rows = (
            df.filter(F.col(id_col) == first_id)
            .select(id_col, vec_col)
            .limit(1)
            .collect()
        )
    if not seed_rows:
        raise ValueError(
            "empty corpus" if first_id is None else f"no row with id {first_id}"
        )
    seed = seed_rows[0]
    selected = [
        {"rank": 1, "id": seed[id_col], "dist_micro": 0}
    ]
    if k == 1:
        return selected
    # state: every not-yet-selected row with its running nearest-selected
    # similarity; seeded with cos(vec, seed). Checkpointed so each
    # round's lineage is one fold deep, never k folds.
    state = (
        df.select(
            F.col(id_col).alias("__id"), F.col(vec_col).alias("__vec")
        )
        .filter(F.col(id_col) != F.lit(seed[id_col]))
        .withColumn(
            "__sim",
            cosine_similarity(
                "__vec", _lit_vec([float(x) for x in seed[vec_col]])
            ),
        )
        .localCheckpoint(eager=True)
    )
    for r in range(2, k + 1):
        rows = (
            state.orderBy(F.asc("__sim"), F.asc("__id")).limit(1).collect()
        )
        if not rows:  # k exceeds the corpus: return what exists
            break
        picked = rows[0]
        selected.append(
            {
                "rank": r,
                "id": picked["__id"],
                # floor-micro of cosine DISTANCE to the selection —
                # math.floor, not int(): identical to the SQL oracle's
                # floor() even if float error nudges a distance negative
                "dist_micro": math.floor(
                    (1.0 - picked["__sim"]) * 1_000_000
                ),
            }
        )
        if r < k:
            new_vec = _lit_vec([float(x) for x in picked["__vec"]])
            prev = state
            state = (
                state.filter(F.col("__id") != F.lit(picked["__id"]))
                .withColumn(
                    "__sim",
                    F.greatest(
                        F.col("__sim"),
                        cosine_similarity("__vec", new_vec),
                    ),
                )
                .localCheckpoint(eager=True)
            )
            # release the superseded round's blocks eagerly — otherwise
            # up to k checkpointed corpus-sized copies sit in
            # MEMORY_AND_DISK until the GC-driven ContextCleaner runs
            prev.unpersist()
    return selected


def domain_relevance_select(
    corpus: DataFrame,
    prototypes: list,
    id_col: str,
    vec_col: str,
    n: int,
) -> DataFrame:
    """Top-``n`` corpus rows by mean cosine to a small prototype panel
    of the target domain (driver-sized, passed as literals — at scale
    these are a handful of hand-picked or centroid vectors, never a
    corpus). The mean is a LEFT-ASSOCIATED ``+`` chain in prototype
    order, so the float sum replays bitwise in SQL (the maxsim_rerank
    convention). Returns ``(id, rel_micro)`` ranked desc with id
    tie-breaks; ``rel_micro`` is the floor-micro mean similarity."""
    if not prototypes:
        raise ValueError("need at least one prototype vector")
    sims = [cosine_similarity(vec_col, _lit_vec(p)) for p in prototypes]
    total = sims[0]
    for s in sims[1:]:
        total = total + s
    score = total / F.lit(float(len(prototypes)))
    return (
        corpus.select(
            F.col(id_col),
            F.floor(score * F.lit(1_000_000.0)).cast("long").alias(
                "rel_micro"
            ),
            score.alias("__s"),
        )
        .orderBy(F.desc("__s"), F.asc(id_col))
        .limit(n)
        .drop("__s")
    )
