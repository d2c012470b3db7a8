"""Shared fixtures: one session-scoped SparkSession + the reference golden
fixture (FIXTURES.md §A: 100 hourly rows × 100 qualifier cells, value = j)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import SparkSession, functions as F

from hbase_taggregator_spark.session import get_spark

#: 2014-11-10 00:00:00 UTC — the reference fixture base
#: (TestTimeseriesAggregateProtocol.java:45-46, pinned to UTC per SURVEY §7).
BASE_S = int(dt.datetime(2014, 11, 10, tzinfo=dt.timezone.utc).timestamp())

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    s = get_spark(app_name="taggregator-tests", master="local[8]",
                  shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def golden_cells(spark):
    """The reference test fixture as a relational DataFrame.

    One HBase cell = one row: 100 rows (hours) × 100 qualifiers
    (36-second offsets), value = qualifier index j
    (TestTimeseriesAggregateProtocol.java:110-128 `makeN`)."""
    return (
        spark.range(100)
        .select(
            (F.lit(BASE_S) + F.col("id") * 3600).alias("row_ts_s"),
            F.explode(F.sequence(F.lit(0), F.lit(99))).alias("j"),
        )
        .select(
            "row_ts_s",
            (F.col("j") * 36).alias("qualifier_offset_s"),
            F.col("j").cast("long").alias("value"),
            F.timestamp_seconds(F.col("row_ts_s") + F.col("j") * 36).alias("ts"),
        )
    )


def golden_cells_py() -> list[tuple[int, int]]:
    """Same fixture, pure Python: [(event_time_s, value)] — the in-test
    oracle's input (arithmetic-checkable without Spark or HBase)."""
    return [
        (BASE_S + i * 3600 + j * 36, j) for i in range(100) for j in range(100)
    ]
