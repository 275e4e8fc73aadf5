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
) -> list[list[tuple[int, list[float]]]]:
    """Production training tier: per-subspace L2 Lloyd on a bounded,
    deterministic driver sample (same driver-state contract as
    ``IVFIndex`` — the codebook crosses the driver, the corpus never
    does). Codes are numbered 0..k-1 per subspace."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    sample = np.array(
        [
            [float(x) for x in r["v"]]
            for r in df.select(F.col(vec_col).alias("v")).limit(sample_size).collect()
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


def code_profile(encoded: DataFrame) -> DataFrame:
    """Per-(subspace, code) audit: population and summed residual in
    exact integer micro-units — m·k rows out, constant-size shuffle.
    Skewed code populations signal a stale codebook (retrain)."""
    return encoded.groupBy("sub", "code").agg(
        F.count("*").alias("n_vecs"),
        F.sum("dist_micro").alias("sum_dist_micro"),
    )
