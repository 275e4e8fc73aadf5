"""Product quantization (PQ) — the vector-compression layer of
FAISS-class ANN systems (Jégou et al., "Product Quantization for
Nearest Neighbor Search", TPAMI 2011), re-expressed Spark-first.

A d-dim vector is split into ``m`` contiguous subspaces of d/m dims;
each subspace has its own ``k``-entry codebook, and a vector is stored
as m small integer codes (here m·log2(k) bits instead of d·32). The
reference's managed service hides its storage layout; a native engine
needs PQ to keep multi-billion-vector indexes in memory.

Spark-first shapes:
- **Encoding is one codegen'd expression** per row — for every
  subspace an ``array_min`` over ``struct(l2_dist(slice, code), code)``
  literals (deterministic smallest-code tie-break), exploded to
  (id, sub, code, dist_micro) rows. Map-only; zero shuffle; the
  codebooks are m·k·(d/m) literal floats.
- **Training happens on a bounded driver sample** (numpy Lloyd per
  subspace) — the same contract as ``IVFIndex``'s coarse quantizer:
  driver state is the codebook, never the corpus. The seeded variant
  (``seed_codebooks``: sub-vectors of the k smallest-id rows) is fully
  deterministic and SQL-expressible, which is what the registry oracle
  verifies end-to-end.
- The per-(sub, code) profile groupBy emits m·k rows — the shuffle is
  constant-size however large the corpus.
"""

from __future__ import annotations

import math

import numpy as np

from pyspark.sql import DataFrame, functions as F

from ..functions.vector import l2_dist


def _lit_vec(vec) -> F.Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def seed_codebooks(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    m: int,
    k: int,
    dim: int,
) -> list[list[tuple[int, list[float]]]]:
    """Deterministic codebooks: subspace j's codes are the j-th
    sub-vectors of the ``k`` smallest-id rows (a bounded k-row driver
    probe). Exactly reproducible in SQL — the oracle tier."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    rows = (
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .orderBy("id")
        .limit(k)
        .collect()
    )
    books: list[list[tuple[int, list[float]]]] = []
    for j in range(m):
        books.append(
            [
                (int(r["id"]), [float(x) for x in r["v"][j * sub : (j + 1) * sub]])
                for r in rows
            ]
        )
    return books


def train_codebooks(
    df: DataFrame,
    vec_col: str,
    m: int,
    k: int,
    dim: int,
    sample_size: int = 10_000,
    seed: int = 42,
    iterations: int = 10,
    id_col: str | None = None,
) -> list[list[tuple[int, list[float]]]]:
    """Production training tier: per-subspace L2 Lloyd on a bounded
    driver sample (same driver-state contract as ``IVFIndex`` — the
    codebook crosses the driver, the corpus never does). Codes are
    numbered 0..k-1 per subspace.

    Determinism: pass ``id_col`` to sample the ``sample_size`` smallest
    ``xxhash64(id, seed)`` rows (a TakeOrderedAndProject — stable across
    partitioning, input layout, and cluster size, like
    ``seed_codebooks``'s ordered probe). Without ``id_col`` the sample
    is ``limit(n)`` — deterministic only within one session/layout, so
    codebooks can differ across cluster configs despite the fixed RNG
    seed."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    probe = df.select(
        F.col(vec_col).alias("v"),
        *( [F.col(id_col).alias("__id")] if id_col else [] ),
    )
    if id_col:
        probe = probe.orderBy(F.xxhash64(F.col("__id"), F.lit(seed)))
    sample = np.array(
        [
            [float(x) for x in r["v"]]
            for r in probe.limit(sample_size).collect()
        ],
        dtype=np.float64,
    )
    rng = np.random.default_rng(seed)
    books: list[list[tuple[int, list[float]]]] = []
    for j in range(m):
        X = sample[:, j * sub : (j + 1) * sub]
        centers = X[rng.choice(len(X), size=min(k, len(X)), replace=False)]
        for _ in range(iterations):
            d2 = ((X[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(len(centers)):
                mask = assign == c
                if mask.any():
                    centers[c] = X[mask].mean(axis=0)
        books.append([(c, centers[c].tolist()) for c in range(len(centers))])
    return books


def encode(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: list[list[tuple[int, list[float]]]],
    dim: int,
) -> DataFrame:
    """PQ-encode every row: (id, sub, code, dist_micro) — one exploded
    row per subspace, ``code`` the argmin-L2 codebook entry (ties to
    the smallest code id), ``dist_micro`` = floor(l2·1e6) exact-integer
    residual. The argmin is an ``array_min`` over literal structs —
    map-only, whole-stage codegen, no shuffle, no Python."""
    m = len(codebooks)
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    per_sub = []
    for j, book in enumerate(codebooks):
        sl = F.slice(F.col(vec_col), j * sub + 1, sub)
        best = F.array_min(
            F.array(
                *[
                    F.struct(
                        l2_dist(sl, _lit_vec(cv)).alias("d"),
                        F.lit(int(code)).alias("code"),
                    )
                    for code, cv in book
                ]
            )
        )
        per_sub.append(
            F.struct(
                F.lit(j).cast("long").alias("sub"),
                best["code"].cast("long").alias("code"),
                F.floor(best["d"] * F.lit(1e6)).cast("long").alias(
                    "dist_micro"
                ),
            )
        )
    return df.select(
        F.col(id_col).alias("id"), F.explode(F.array(*per_sub)).alias("e")
    ).select("id", "e.sub", "e.code", "e.dist_micro")


def _best_code(vec_col: str, book, j: int, sub: int) -> F.Column:
    """argmin-L2 codebook entry for subspace ``j`` of ``vec_col`` —
    an ``array_min`` over literal (distance, code) structs; ties break
    to the smallest code id. Pure codegen'd expression."""
    sl = F.slice(F.col(vec_col), j * sub + 1, sub)
    return F.array_min(
        F.array(
            *[
                F.struct(
                    l2_dist(sl, _lit_vec(cv)).alias("d"),
                    F.lit(int(code)).alias("code"),
                )
                for code, cv in book
            ]
        )
    )["code"]


def encode_compact(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: list[list[tuple[int, list[float]]]],
    dim: int,
) -> DataFrame:
    """PQ-encode to the storage layout ADC search consumes:
    ``(id, codes array<long>)`` — m small integers per vector instead of
    d floats (m·log2(k) bits once written as parquet ints). Map-only,
    whole-stage codegen, no shuffle; at 100 TB this runs as a projection
    inside the scan stage and the code table it yields is ~d·32/(m·8)×
    smaller than the raw vectors."""
    m = len(codebooks)
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    codes = F.array(
        *[
            _best_code(vec_col, book, j, sub).cast("long")
            for j, book in enumerate(codebooks)
        ]
    )
    return df.select(F.col(id_col).alias("id"), codes.alias("codes"))


def adc_lut_micro(
    query_vec,
    codebooks: list[list[tuple[int, list[float]]]],
    dim: int,
) -> list[list[int]]:
    """Asymmetric-distance lookup tables for one query: ``lut[j][code]``
    = floor(1e6 · l2(query_sub_j, codeword)) — m·k integers, computed
    driver-side (the classic ADC preprocessing step; Jégou et al. §IV.A).
    The float fold accumulates left-to-right in doubles, matching both
    the Spark ``l2_dist`` aggregate and DuckDB ``list_distance``, so the
    micro-floored integers are engine-portable (the same convention
    ``encode``'s dist_micro uses, hash-verified by pq_encode_stats)."""
    m = len(codebooks)
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    luts: list[list[int]] = []
    for j, book in enumerate(codebooks):
        q = [float(x) for x in query_vec[j * sub : (j + 1) * sub]]
        by_code = {}
        for code, cv in book:
            acc = 0.0
            for a, b in zip(q, cv):
                acc += (a - b) * (a - b)
            by_code[int(code)] = int(math.floor(math.sqrt(acc) * 1e6))
        luts.append([by_code[c] for c in sorted(by_code)])
    return luts


def adc_search(
    encoded: DataFrame,
    query_vec,
    codebooks: list[list[tuple[int, list[float]]]],
    dim: int,
    k: int,
    id_col: str = "id",
    codes_col: str = "codes",
) -> DataFrame:
    """ADC top-k over a PQ-encoded corpus: approximate distance =
    Σ_j lut[j][codes[j]] — m integer array lookups per row, never
    touching the original d-dim vectors. Returns
    ``(id, adc_dist_micro)`` ascending, ties to the smallest id.

    Plan shape: scan of the compact code table → codegen'd
    element_at sum → TakeOrderedAndProject(k). No shuffle, no join; the
    per-row work is O(m) regardless of d — the whole point of PQ. At
    100 TB the code table is the only thing read (column-pruned), and
    each partition reduces to k rows before the driver merge."""
    luts = adc_lut_micro(query_vec, codebooks, dim)
    score: F.Column | None = None
    for j, lut in enumerate(luts):
        arr = F.array(*[F.lit(int(v)).cast("long") for v in lut])
        term = F.element_at(
            arr, (F.element_at(F.col(codes_col), j + 1) + F.lit(1)).cast("int")
        )
        score = term if score is None else score + term
    return (
        encoded.select(
            F.col(id_col).alias("id"),
            score.cast("long").alias("adc_dist_micro"),
        )
        .orderBy("adc_dist_micro", "id")
        .limit(k)
    )


def coarse_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[tuple[int, list[float]]],
    replication: int = 1,
) -> DataFrame:
    """Coarse-quantizer assignment for the IVF layer of IVFADC: each
    vector goes to its top-``replication`` cells by inner product
    (ties to the smallest cell id). One codegen'd array_sort over
    (−dot, cell) literal structs — map-only, zero shuffle, the exact
    expression shape ``IVFIndex._assign_expr`` uses for its trained
    quantizer; this explicit-centroid twin is deterministic and
    SQL-expressible (the oracle tier, like ``seed_codebooks``)."""
    from ..functions.vector import dot

    scored = [
        F.struct(
            (-dot(vec_col, _lit_vec(cv))).alias("d"),
            F.lit(int(cell)).alias("cell"),
        )
        for cell, cv in centroids
    ]
    ranked = F.slice(
        F.array_sort(F.array(*scored)),
        1,
        min(replication, len(centroids)),
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(F.transform(ranked, lambda s: s["cell"])).alias("cell"),
    )


def probe_cells(
    query_vec,
    centroids: list[tuple[int, list[float]]],
    nprobe: int,
) -> list[int]:
    """Driver-side probe selection: the ``nprobe`` cells nearest the
    query by inner product (ties to the smallest cell id) — the same
    (−dot, cell) ordering ``coarse_assign`` embeds, kept in Python
    because it is |centroids| work on one small list."""
    q = [float(x) for x in query_vec]
    scored = []
    for cell, cv in centroids:
        acc = 0.0
        for a, b in zip(q, cv):
            acc += a * b
        scored.append((-acc, int(cell)))
    scored.sort()
    return [cell for _, cell in scored[:nprobe]]


def encode_ivfadc(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[tuple[int, list[float]]],
    codebooks: list[list[tuple[int, list[float]]]],
    dim: int,
    replication: int = 1,
) -> DataFrame:
    """The IVFADC storage layout (Jégou et al. §V): ``(id, cell,
    codes[])`` — coarse cell for pruning, PQ codes for scoring,
    computed in ONE map-only projection over the vector scan (cell and
    codes are both codegen'd expressions over the same row, so the
    corpus is read once and nothing joins or shuffles). At 100 TB this
    table is written partitioned by ``cell`` so a probe is a
    partition-pruned scan."""
    from ..functions.vector import dot

    m = len(codebooks)
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    scored = [
        F.struct(
            (-dot(vec_col, _lit_vec(cv))).alias("d"),
            F.lit(int(cell)).alias("cell"),
        )
        for cell, cv in centroids
    ]
    cells = F.transform(
        F.slice(
            F.array_sort(F.array(*scored)),
            1,
            min(replication, len(centroids)),
        ),
        lambda s: s["cell"],
    )
    codes = F.array(
        *[
            _best_code(vec_col, book, j, sub).cast("long")
            for j, book in enumerate(codebooks)
        ]
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(cells).alias("cell"),
        codes.alias("codes"),
    )


def ivfadc_search(
    encoded: DataFrame,
    query_vec,
    centroids: list[tuple[int, list[float]]],
    codebooks: list[list[tuple[int, list[float]]]],
    dim: int,
    nprobe: int,
    k: int,
    deduplicate: bool = False,
) -> DataFrame:
    """IVF + ADC search — the full FAISS-IVFADC query path: select
    ``nprobe`` cells driver-side, scan ONLY those cells' code lists,
    ADC-score with the query LUT, top-k.

    Plan shape: Filter(cell IN probes) — a partition-pruning predicate
    on cell-partitioned storage, so at 100 TB the scan reads
    ~nprobe/nlist of the codes table — then the codegen'd LUT sum and
    TakeOrderedAndProject(k); with ``replication`` = 1 there is no
    shuffle at all. ``deduplicate`` adds a distinct-on-id for
    boundary-replicated (replication > 1) tables, where a vector stored
    in two probed cells would otherwise appear twice (its ADC distance
    is identical in both copies)."""
    probes = probe_cells(query_vec, centroids, nprobe)
    pruned = encoded.filter(F.col("cell").isin(probes))
    if deduplicate:
        pruned = pruned.dropDuplicates(["id"])
    return adc_search(pruned, query_vec, codebooks, dim, k)


def code_profile(encoded: DataFrame) -> DataFrame:
    """Per-(subspace, code) audit: population and summed residual in
    exact integer micro-units — m·k rows out, constant-size shuffle.
    Skewed code populations signal a stale codebook (retrain)."""
    return encoded.groupBy("sub", "code").agg(
        F.count("*").alias("n_vecs"),
        F.sum("dist_micro").alias("sum_dist_micro"),
    )
