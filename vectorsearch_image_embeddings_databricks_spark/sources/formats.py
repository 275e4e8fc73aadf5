"""Row/text source formats beyond parquet (csv, json, orc) with the
engine's schema discipline enforced (SURVEY.md §1.2: explicit StructType
everywhere — schema inference is the reference's behavior and a
correctness hazard).

Parquet/binaryFile stay the defaults (sources/binary.py, registry.load);
these helpers exist for interchange with text-based pipelines. The guard
they add over raw ``spark.read``: csv/json REQUIRE an explicit schema —
``inferSchema`` triggers an extra full scan AND silently widens/narrows
types (int64-nullable, float64-vs-float32, string-vs-timestamp drift),
which breaks value-exact round-trips. ORC embeds its schema like parquet
and needs no pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_SELF_DESCRIBING = {"parquet", "orc"}
_TEXT = {"csv", "json"}


def write_table(
    df: DataFrame, path: str, fmt: str, mode: str = "overwrite", **options
) -> None:
    """Write ``df`` at ``path`` in ``fmt`` (csv defaults to headers on)."""
    if fmt == "csv":
        options.setdefault("header", "true")
    df.write.mode(mode).options(**options).format(fmt).save(path)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: StructType | None = None,
    **options,
) -> DataFrame:
    """Read ``path`` as ``fmt``. Text formats demand an explicit schema."""
    if fmt in _TEXT and schema is None:
        raise ValueError(
            f"{fmt} requires an explicit schema: inference re-scans the "
            "input and drifts types (use the writing DataFrame's .schema)"
        )
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
    return reader.options(**options).format(fmt).load(path)
