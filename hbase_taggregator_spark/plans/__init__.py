"""Physical-plan introspection: the engine's scale guarantees, checkable.

The 100 TB design claims (filters reach the parquet scan, small dims
broadcast, aggregations are partial-before-shuffle, hot paths stay in
whole-stage codegen with no Python eval) are asserted by tests via these
helpers rather than trusted — a regression that silently de-optimizes a
plan fails CI.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """Executed (AQE-final where available) physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    """`explain("formatted")` text (scan details incl. PushedFilters)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across scans in the plan."""
    text = formatted_plan(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", text)


def scan_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every scan — verifies column pruning."""
    text = formatted_plan(df)
    return re.findall(r"ReadSchema: (\S+)", text)


def count_nodes(df: DataFrame, node: str) -> int:
    return physical_plan(df).count(node)


def has_partial_final_agg(df: DataFrame) -> bool:
    """True when aggregation is split partial (map-side) / final — the
    distributed-merge topology (reference's region partial + client merge)."""
    plan = physical_plan(df)
    return plan.count("HashAggregate") >= 2 or plan.count("SortAggregate") >= 2


def broadcast_join_count(df: DataFrame) -> int:
    return count_nodes(df, "BroadcastHashJoin") + count_nodes(df, "BroadcastNestedLoopJoin")


def python_eval_count(df: DataFrame) -> int:
    """Python UDF eval nodes in the plan — 0 for every JVM-only operator
    (only the multimodal mapInPandas path is allowed to be nonzero)."""
    plan = physical_plan(df)
    return sum(plan.count(n) for n in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"))
