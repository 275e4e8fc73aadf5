"""Every registered query with a SQL oracle must hash-match DuckDB at
sf0.001 (fast) — the same gate the driver applies at sf0.01."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vectorsearch_image_embeddings_databricks_spark import registry  # noqa: E402

from .conftest import SF_SMALL
from .oracle_utils import assert_parity


@pytest.mark.parametrize("name", sorted(registry.ORACLE))
def test_oracle_parity(spark, name):
    df = registry.QUERIES[name](spark, SF_SMALL)
    assert_parity(df, registry.ORACLE[name], SF_SMALL, name)


@pytest.mark.parametrize("name", sorted(set(registry.QUERIES) - set(registry.ORACLE)))
def test_rows_only_queries_run(spark, name):
    """Queries without a SQL oracle still must run and return a stable schema."""
    df = registry.QUERIES[name](spark, SF_SMALL)
    assert df.columns
    assert df.count() >= 0
