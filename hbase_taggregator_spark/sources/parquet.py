"""Parquet table loaders with timestamp normalization.

Replaces the reference's table-scan source (HBase region scanner opened per
RPC — ``TimeseriesAggregateImplementation.java:156`` in /root/reference) with
``spark.read.parquet``: vectorized columnar scan, row-group min/max skipping,
and column pruning are supplied by Catalyst instead of hand-rolled scan
bounds.

Scale note (100 TB): filters placed on *raw* scan columns push down to the
parquet reader (``PushedFilters`` in the physical plan) and skip row groups.
The ``events`` table stores TIMESTAMP(NANOS) which Spark reads only as raw
int64 (``spark.sql.legacy.parquet.nanosAsLong``); a filter on the *derived*
TimestampType column cannot push down, so :func:`load_table` accepts an
optional time range and applies it to the raw int64 nanos column *before*
conversion — that predicate reaches the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from hbase_taggregator_spark.session import configure

#: All driver-provided tables (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _normalize_event_ts(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Widen a raw int64-nanos timestamp column to TimestampType (micros).

    Integer division (``div``) keeps full precision — a double round-trip
    would lose bits above 2^53 — and truncates toward zero exactly like
    other engines' nanos→micros narrowing, so oracle comparisons agree.
    """
    if ts_col in df.columns and isinstance(df.schema[ts_col].dataType, T.LongType):
        return df.withColumn(ts_col, F.timestamp_micros(F.expr(f"`{ts_col}` div 1000")))
    if ts_col in df.columns and isinstance(
        df.schema[ts_col].dataType, T.TimestampNTZType
    ):
        # Session TZ is pinned UTC (session.RUNTIME_CONFS), so NTZ→LTZ is a
        # pure re-tag: same micros value, now accepted by unix_micros et al.
        # Hit only when the host session locked inferTimestampNTZ=true.
        return df.withColumn(ts_col, F.col(ts_col).cast(T.TimestampType()))
    return df


def load_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    time_range: tuple[int, int] | None = None,
) -> DataFrame:
    """Load one test table; normalize event timestamps to TimestampType.

    ``time_range`` = (min_us, max_us) epoch-microseconds half-open; applied
    to the raw storage column when possible so it pushes down to the scan.
    """
    configure(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    if name == "events":
        if time_range is not None and isinstance(df.schema["ts"].dataType, T.LongType):
            lo_ns, hi_ns = time_range[0] * 1000, time_range[1] * 1000
            df = df.filter((F.col("ts") >= lo_ns) & (F.col("ts") < hi_ns))
        elif time_range is not None:
            # Native timestamp storage: comparing the stored column against
            # foldable timestamp literals still reaches the scan as a
            # PushedFilter (no unix_micros wrapper on the storage column).
            lo_us, hi_us = time_range
            df = df.filter(
                (F.col("ts") >= F.timestamp_micros(F.lit(lo_us)))
                & (F.col("ts") < F.timestamp_micros(F.lit(hi_us)))
            )
        df = _normalize_event_ts(df)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every table in the scale-factor directory."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}
