"""Arbitrary stateful streaming via the Spark 4 ``transformWithState``
API (StatefulProcessor + typed state variables) — the successor surface
to ``applyInPandasWithState`` used by streaming/windows.py.

Environment gate: the transformWithState Python worker speaks a
protobuf-based state-server protocol, so it needs ``google.protobuf``
at runtime. This sandbox ships PySpark without protobuf, so the
operator here is exercised by a ``pytest.importorskip``-gated
end-to-end test (the same pattern as the torch-gated real-encoder
smoke): the processor logic is plain Python + pandas and imports
cleanly everywhere; only *running* a stream needs protobuf.

Operator: per-key RUNNING TOP-K — maintain, for every key, the k
highest-value rows seen so far across micro-batches (ties broken by
smallest id). The state is a bounded k-element list per key — state
size is |keys|·k forever, independent of stream length, which is what
makes a running leaderboard viable on an unbounded feed. Each batch
emits the key's refreshed top-k tagged with the cumulative row count
``seen``; because ``seen`` is strictly increasing per key, the final
answer (rows where ``seen`` = that key's max) is INVARIANT to how the
feed was micro-batched — the property that makes the operator
oracle-checkable against a plain SQL window over the full input.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

TOPK_OUTPUT_SCHEMA = (
    "key string, seen bigint, rank bigint, id bigint, value_micro bigint"
)


class RunningTopKProcessor(StatefulProcessor):
    """Keep the k largest (value, id) rows per key across batches.

    State: ListState ``topk`` (bounded at k elements — merged, sorted,
    truncated every batch) + ValueState ``seen`` (cumulative count).
    Values are emitted as floor-micro integers so downstream
    comparisons are exact.
    """

    def __init__(self, k: int, value_col: str, id_col: str) -> None:
        self.k = k
        self.value_col = value_col
        self.id_col = id_col

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.topk = handle.getListState("topk", "v double, id bigint")
        self.seen = handle.getValueState("seen", "n bigint")

    def handleInputRows(self, key, rows, timerValues):
        cur = [(float(t[0]), int(t[1])) for t in self.topk.get()]
        n = self.seen.get()[0] if self.seen.exists() else 0
        for pdf in rows:
            n += len(pdf)
            cur.extend(
                zip(
                    pdf[self.value_col].astype(float),
                    pdf[self.id_col].astype(int),
                )
            )
        cur.sort(key=lambda t: (-t[0], t[1]))
        cur = cur[: self.k]
        self.topk.put(cur)
        self.seen.update((n,))
        yield pd.DataFrame(
            {
                "key": [key[0]] * len(cur),
                "seen": [n] * len(cur),
                "rank": range(1, len(cur) + 1),
                "id": [c[1] for c in cur],
                "value_micro": [math.floor(c[0] * 1e6) for c in cur],
            }
        )

    def close(self) -> None:
        pass


def running_topk(
    stream: DataFrame,
    key_col: str,
    value_col: str,
    id_col: str,
    k: int = 3,
) -> DataFrame:
    """Wire a keyed stream through RunningTopKProcessor. Requires the
    RocksDB state store provider (transformWithState's backing store):

        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider")

    The caller selects the final per-key answer with
    ``seen = max(seen) over (partition by key)``.
    """
    return (
        stream.selectExpr(
            f"{key_col} AS key", f"{value_col} AS v", f"{id_col} AS id"
        )
        .groupBy("key")
        .transformWithStateInPandas(
            RunningTopKProcessor(k, "v", "id"),
            TOPK_OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
    )
