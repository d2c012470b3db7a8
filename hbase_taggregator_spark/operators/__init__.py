"""Operators: the reference-parity time-series core plus the generalized
relational / dedup / similarity / text surface (SURVEY.md §2.2)."""

from hbase_taggregator_spark.operators.timeseries import (
    TimeseriesAggregator,
    TimeseriesQuery,
)

__all__ = ["TimeseriesAggregator", "TimeseriesQuery"]
