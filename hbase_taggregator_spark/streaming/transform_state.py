"""Arbitrary stateful streaming via ``transformWithStateInPandas`` — the
Spark 4 StatefulProcessor API (SPARK-46815 "State V2"), the successor to
``applyInPandasWithState`` used in :mod:`streaming.stateful`. Both forms
are covered on purpose: the old API is one state tuple per key; this one
composes TYPED state primitives (ValueState / MapState / ListState with
per-state TTL), which is what long-running 100 TB streaming jobs need —
e.g. a per-user profile whose members evolve independently.

The operator: a running per-user activity profile — total event count
(ValueState) and the set of distinct value buckets seen (MapState used as
a set; one entry per ``value div bucket_width`` bucket). Both are
order-independent accumulations, so the FINAL state after an
``availableNow`` drain is deterministic regardless of microbatch slicing —
which is what lets a batch SQL oracle gate a stateful streaming run.

Scale shape: state lives in the state store partitioned by the grouping
key (key cardinality bounds it, not stream length); Arrow moves batches;
emissions are one row per key per batch it appears in.

ENVIRONMENT-GATED: Spark's TransformWithState Python runner requires the
``google.protobuf`` package (its state-server protocol) and the RocksDB
state-store provider; this sandbox ships neither a working protobuf nor a
way to install one, so the capability probe in :func:`tws_available` gates
the test (same seam discipline as ``multimodal.decode_pixels`` and
``sources.hbase``). The operator itself is complete and exercised wherever
protobuf is importable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = "user_id BIGINT, n_events BIGINT, n_value_buckets BIGINT"


class UserActivityProfile(StatefulProcessor):
    """Running (count, distinct-value-bucket set) per key."""

    def __init__(self, bucket_width: float = 50.0):
        self._width = bucket_width

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._n = handle.getValueState("n_events", "n BIGINT")
        self._buckets = handle.getMapState("buckets", "b BIGINT", "seen SMALLINT")

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timer_values
    ) -> Iterator[pd.DataFrame]:
        cnt = self._n.get()[0] if self._n.exists() else 0
        for pdf in rows:
            # drop nulls BEFORE the floordiv: NaN // width is NaN and
            # .astype("int64") on NaN raises; count() already skips nulls
            v = pdf["value"].dropna()
            cnt += len(v)
            for b in (v // self._width).astype("int64").unique():
                self._buckets.updateValue((int(b),), (1,))
        self._n.update((cnt,))
        n_buckets = sum(1 for _ in self._buckets.keys())
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [cnt],
                "n_value_buckets": [n_buckets],
            }
        )

    def close(self) -> None:
        pass


def user_activity_profile_stream(
    stream: DataFrame, key_col: str = "user_id", bucket_width: float = 50.0
) -> DataFrame:
    """Running per-key activity profile, updated each microbatch."""
    return (
        stream.select(key_col, "value")
        .groupBy(key_col)
        .transformWithStateInPandas(
            statefulProcessor=UserActivityProfile(bucket_width),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


def tws_available() -> bool:
    """True when the TransformWithState Python runner can start here
    (its state-server protocol imports google.protobuf)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False
