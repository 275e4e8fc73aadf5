"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``vectorsearch_image_embeddings_databricks_spark.registry``;
this module is a thin adapter over that registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# The harness loads this module by file path; make the package importable
# regardless of the harness's cwd.
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from vectorsearch_image_embeddings_databricks_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: exact top-k vector search (the reference's core
    ``similarity_search`` semantics, NMR:388) on sf0.001."""
    return registry.QUERIES["knn_exact"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Ordered so each SURVEY §2 component's flagship query falls inside
    # the driver's verification window (registry.DRIVER_PRIORITY).
    return registry.ordered_queries()


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLE)
