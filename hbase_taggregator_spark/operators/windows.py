"""Sliding and session windows — the window families beyond the reference's
tumbling buckets (SURVEY.md §2.2 'streaming' row; here in batch form, with
the same functions usable unchanged under Structured Streaming).

- **sliding**: Spark's `window(ts, size, slide)` explodes each row into
  size/slide overlapping windows natively (whole-stage codegen) — the
  fan-out happens map-side and partial aggregation compresses it before the
  shuffle, so shuffled bytes stay bounded by (windows × partitions).
- **session**: `session_window(ts, gap)` — Spark merges per-row sessions in
  a dedicated aggregation; in batch it equals the classic gaps-and-islands
  formulation (the DuckDB oracle restates it that way).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def sliding_bucket_agg(
    df: DataFrame,
    ts_col: str,
    size_s: int,
    slide_s: int,
    aggs: list[Column],
    dims: tuple[str, ...] = (),
) -> DataFrame:
    """Overlapping-window aggregation; one row per (window × dims), with
    epoch-µs window bounds."""
    win = F.window(F.col(ts_col), f"{size_s} seconds", f"{slide_s} seconds")
    out = df.groupBy(win.alias("w"), *dims).agg(*aggs)
    return out.select(
        F.unix_micros("w.start").alias("window_start_us"),
        F.unix_micros("w.end").alias("window_end_us"),
        *[c for c in out.columns if c != "w"],
    )


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap_s: int,
    key_cols: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Session windows per key: events within ``gap_s`` seconds of the
    previous event merge into one session. Output: keys, session bounds
    (epoch µs), aggregates."""
    win = F.session_window(F.col(ts_col), f"{gap_s} seconds")
    out = df.groupBy(win.alias("w"), *key_cols).agg(*aggs)
    return out.select(
        F.unix_micros("w.start").alias("session_start_us"),
        F.unix_micros("w.end").alias("session_end_us"),
        *[c for c in out.columns if c != "w"],
    )
