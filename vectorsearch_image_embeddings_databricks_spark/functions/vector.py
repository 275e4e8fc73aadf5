"""Vector math as pure Catalyst column expressions over ``array<float|double>``.

These replace the reference's torch-side vector ops — L2 normalization of
embeddings (reference ``Nomic MultiModal Retrieval.py``:209 vision /
:376 text) and the similarity scoring that its closed Vector Search service
performs remotely (NMR:388). Everything here stays JVM-side inside
whole-stage codegen: ``zip_with`` + ``aggregate`` fold, no Python UDFs, so
scoring a 100 TB corpus is a single codegen'd scan stage.

All arithmetic is performed in float64 regardless of the storage type
(parquet stores ``FLOAT[]``), matching the DuckDB oracle which casts to
``DOUBLE[]`` — see FIXTURES.md "Type-fidelity notes".
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column | str) -> Column:
    v = F.col(v) if isinstance(v, str) else v
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array columns, computed in float64.

    Sequential left-to-right fold — the same evaluation order DuckDB's
    ``list_cosine_similarity`` uses, so scores hash-match the oracle after
    rounding.
    """
    prods = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(v: Column | str) -> Column:
    """Euclidean norm of an array column."""
    return F.sqrt(dot(v, v))


def l2_normalize(v: Column | str) -> Column:
    """Scale an array column to unit L2 norm (NMR:209/:376 semantics).

    Zero vectors are returned unchanged (norm 0 would divide by zero).
    """
    v = F.col(v) if isinstance(v, str) else v
    n = l2_norm(v)
    return F.when(n == 0.0, _as_double(v)).otherwise(
        F.transform(v, lambda x: x.cast("double") / n)
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; for unit vectors this equals ``dot`` (the §1.4
    metric-equivalence invariant the reference relies on)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def l2_dist(a: Column | str, b: Column | str) -> Column:
    """Euclidean distance between two array columns."""
    diffs = F.zip_with(
        _as_double(a), _as_double(b), lambda x, y: (x - y) * (x - y)
    )
    return F.sqrt(F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x))


def dim_check(v: Column | str, dim: int) -> Column:
    """Boolean: array has exactly ``dim`` elements and no nulls inside.

    Mirrors the reference's runtime ``embedding_dimension=len(...)`` check
    (NMR:322) as a declarative predicate usable in filters/constraints.
    """
    v = F.col(v) if isinstance(v, str) else v
    return v.isNotNull() & (F.size(v) == dim) & ~F.exists(v, lambda x: x.isNull())
