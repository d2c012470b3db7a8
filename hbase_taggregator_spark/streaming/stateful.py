"""Custom stateful streaming operator via ``applyInPandasWithState`` —
the escape hatch for stream logic that windowed aggregation can't express
(SURVEY.md §2.2: the reference has no streaming at all; Spark's built-in
windows cover the bucketed verbs, and this covers everything else).

The operator here maintains **running per-key extrema and counts across
microbatches** — the streaming analog of the reference's scan-accumulate
loop (``AggregationBuilder.java:74-91``), with the accumulator map living in
Spark-managed state instead of a per-scan HashMap. State is one small tuple
per key, bounded by key cardinality; Arrow moves batches, so the Python
boundary is columnar, not per-row.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("mx", DoubleType()),
        StructField("mn", DoubleType()),
        StructField("cnt", LongType()),
        StructField("sm", DoubleType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("running_max", DoubleType()),
        StructField("running_min", DoubleType()),
        StructField("running_count", LongType()),
        StructField("running_sum", DoubleType()),
    ]
)


def _update(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Merge this microbatch's rows into the per-key accumulator and emit
    the updated running aggregate (one row per key per batch)."""
    mx, mn, cnt, sm = (
        state.get if state.exists else (float("-inf"), float("inf"), 0, 0.0)
    )
    for pdf in pdfs:
        v = pdf["value"]
        if len(v):
            mx = max(mx, float(v.max()))
            mn = min(mn, float(v.min()))
            cnt += int(v.count())
            sm += float(v.sum())
    state.update((mx, mn, cnt, sm))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "running_max": [mx],
            "running_min": [mn],
            "running_count": [cnt],
            "running_sum": [sm],
        }
    )


def running_extrema_stream(stream: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Running max/min/count/sum per key across the whole stream, updated
    every microbatch (update output mode)."""
    return (
        stream.select(key_col, "value")
        .groupBy(key_col)
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
