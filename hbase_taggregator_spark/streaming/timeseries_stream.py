"""Streaming bucketed aggregation: the engine core's semantics on an
unbounded source.

Bucketing uses `window(ts, interval, startTime=t_min mod interval)` — the
t_min-aligned tumbling buckets of SURVEY.md §2.3.1 — instead of the batch
path's integer arithmetic, because Structured Streaming's state cleanup
requires the event-time window form. Late data past the watermark is
dropped (the reference has no late-data analog; the policy is ours to
define — SURVEY.md §2.2 'streaming').

State size is bounded by (#open windows × #dims): each tumbling window
closes `watermark` after its end, so at 100 TB/day ingest the state is
independent of throughput — only of interval, watermark, and dimension
cardinality.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F

from hbase_taggregator_spark.operators.timeseries import (
    US_PER_SECOND,
    _VERB_EXPRS,
    to_epoch_us,
)
from hbase_taggregator_spark.session import configure
from hbase_taggregator_spark.sources.parquet import _normalize_event_ts


def replay_parquet_stream(
    spark: SparkSession,
    path: str,
    ts_col: str = "ts",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source replay of a parquet table as a stream (the standard way
    to regression-test streaming vs batch equivalence). Schema comes from a
    batch footer read; nanos timestamps are normalized like the batch path."""
    configure(spark)
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if path.endswith(".parquet") and os.path.isfile(path):
        # the file-stream source only accepts directories; target a single
        # file by streaming its parent with a name filter
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    df = reader.parquet(path)
    return _normalize_event_ts(df, ts_col)


def bucketed_stream_agg(
    stream: DataFrame,
    t_min: Any,
    interval_s: int,
    verbs: dict[str, str],
    ts_col: str = "ts",
    value_col: str = "value",
    dims: tuple[str, ...] = (),
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked tumbling-window aggregation with t_min-aligned buckets.

    ``verbs`` maps verb → output alias (like TimeseriesQuery.agg). Returns
    {bucket_start_us, *dims, *aliases}; in append mode a bucket emits once
    its window passes the watermark — the streaming analog of the batch
    partial/final merge.
    """
    t_min_us = to_epoch_us(t_min)
    offset_us = t_min_us % (interval_s * US_PER_SECOND)
    win = F.window(
        F.col(ts_col),
        f"{interval_s} seconds",
        startTime=f"{offset_us} microseconds",
    )
    aggs = [_VERB_EXPRS[v](value_col).alias(alias) for v, alias in verbs.items()]
    return (
        stream.withWatermark(ts_col, watermark)
        .filter(F.unix_micros(F.col(ts_col)) >= F.lit(t_min_us))
        .groupBy(win.alias("w"), *dims)
        .agg(*aggs)
        .select(
            F.unix_micros(F.col("w.start")).alias("bucket_start_us"),
            *dims,
            *[alias for _, alias in verbs.items()],
        )
    )


from contextlib import contextmanager


@contextmanager
def state_partitions(spark: SparkSession, n: int = 4):
    """Scope ``spark.sql.shuffle.partitions`` down while a streaming query
    STARTS (the stateful-operator partition count — hence the number of
    state-store instances — is frozen at query start from this conf).

    Local bounded replays don't need 32 state stores each paying
    open/commit per microbatch; 4 keeps full pipelining on a laptop-class
    gate while cutting the fixed per-batch state overhead ~8×. On a real
    cluster the caller simply doesn't enter this scope (or passes the
    cluster's real parallelism). Results are partitioning-independent —
    this is a latency knob, never a semantics knob."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def run_to_memory(
    spark: SparkSession,
    agg: DataFrame,
    query_name: str,
    timeout_s: int = 300,
    n_state_partitions: int = 4,
) -> DataFrame:
    """Execute a streaming aggregation to completion over a bounded source
    (availableNow trigger, complete mode, memory sink) and return the final
    result table — used by the batch-equivalence gate."""
    with state_partitions(spark, n_state_partitions):
        q = (
            agg.writeStream.format("memory")
            .queryName(query_name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_s)
    if q.isActive:  # pragma: no cover - guard against a hung trigger
        q.stop()
        raise TimeoutError(f"streaming query {query_name} did not finish")
    return spark.table(query_name)


def run_to_parquet(
    spark: SparkSession,
    agg: DataFrame,
    path: str,
    checkpoint: str,
    timeout_s: int = 300,
    n_state_partitions: int = 4,
) -> None:
    """Execute a complete-mode streaming aggregation with a ``foreachBatch``
    parquet sink: every microbatch idempotently overwrites ``path`` with the
    full current result. Overwrite-by-batch is the restart-safe pattern for
    object-store sinks without transactional append — replaying a batch
    after a failure rewrites the same content instead of duplicating it."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(path)

    with state_partitions(spark, n_state_partitions):
        q = (
            agg.writeStream.foreachBatch(_write)
            .outputMode("complete")
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_s)
    if q.isActive:  # pragma: no cover - guard against a hung trigger
        q.stop()
        raise TimeoutError("foreachBatch streaming query did not finish")
