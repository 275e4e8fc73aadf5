"""Distributed embedding generation — the engine's entire UDF story
(SURVEY.md §2.4, replacing the reference's driver-side loop O11/O12/O18).

One pattern: ``Iterator[pd.Series] -> Iterator[pd.Series]`` pandas UDF.
The iterator form matters at scale: the encoder (a real model in
production) is constructed ONCE per executor task, then fed a stream of
Arrow batches — versus reloading per batch (scalar pandas UDF) or per row
(the reference's loop, NMR:236–245).

Failure semantics match NMR:211–213: an unencodable row yields NULL, the
pipeline continues, and callers drop or quarantine nulls explicitly.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import ArrayType, FloatType

from .encoders import Encoder


def make_embed_udf(encoder_factory: Callable[[], Encoder]):
    """Build the embedding pandas UDF from an encoder *factory*.

    The factory (not the encoder) is captured in the closure, so model
    construction happens lazily inside each executor — no large model
    weights travel through task serialization.
    """

    @pandas_udf(ArrayType(FloatType()))
    def embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        encoder = encoder_factory()  # once per task, reused across batches
        for batch in batches:
            yield pd.Series(encoder.encode_batch(batch), index=batch.index)

    return embed


def embed_column(
    df: DataFrame,
    input_col: str | Column,
    encoder_factory: Callable[[], Encoder],
    output_col: str = "embedding",
    drop_failed: bool = False,
) -> DataFrame:
    """``df`` + an embedding column computed distributedly.

    Replaces the reference's collect→loop→createDataFrame round-trip
    (NMR:227–268) with a single Catalyst plan: scan → ArrowEvalPython →
    (optional) null filter. No data ever lands on the driver.
    """
    from ..shipping import ensure_shipped

    ensure_shipped(df.sparkSession)
    udf = make_embed_udf(encoder_factory)
    out = df.withColumn(output_col, udf(input_col))
    if drop_failed:
        out = out.filter(F.col(output_col).isNotNull())
    return out


def assign_ids(df: DataFrame, id_col: str = "row_id", order_by: str | None = None) -> DataFrame:
    """Distributed id assignment, replacing the reference's driver-side
    ``enumerate`` counter (NMR:236–237).

    With ``order_by``: contiguous 0-based ids via a global row_number —
    deterministic but serializes one window (fine for ≤ millions of rows;
    the reference's own corpus is 500). Without: monotonically increasing
    ids — fully parallel, unique, NOT contiguous; the right default at
    100 TB scale."""
    if order_by is None:
        return df.withColumn(id_col, F.monotonically_increasing_id())
    from pyspark.sql import Window

    w = Window.orderBy(order_by)
    return df.withColumn(id_col, F.row_number().over(w) - 1)
