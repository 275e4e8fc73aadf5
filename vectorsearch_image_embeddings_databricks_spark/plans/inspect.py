"""Plan-inspection utilities: make 'is this the plan I'd want at 100 TB?'
a checkable property instead of an eyeball step.

Used by tests to assert e.g. that single-query kNN compiles to
TakeOrderedAndProject with no exchange, and by bench.py to report shuffle
counts alongside timings.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


@dataclass
class PlanAudit:
    n_exchanges: int
    n_broadcasts: int
    has_take_ordered: bool
    wholestage_codegen: bool
    python_evals: int
    text: str


def plan_audit(df: DataFrame) -> PlanAudit:
    """Count the physical-plan features that matter for scale review."""
    text = explain_str(df, "simple")
    return PlanAudit(
        n_exchanges=text.count("Exchange hashpartitioning")
        + text.count("Exchange rangepartitioning")
        + text.count("Exchange SinglePartition"),
        n_broadcasts=text.count("BroadcastExchange"),
        has_take_ordered="TakeOrderedAndProject" in text,
        wholestage_codegen="WholeStageCodegen" in text,
        python_evals=text.count("ArrowEvalPython") + text.count("BatchEvalPython"),
        text=text,
    )
