"""pyspark-taggregator — a PySpark-native time-series analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference ``juwi/HBase-TAggregator`` (an HBase region coprocessor computing
interval-bucketed max/min/sum/avg/count in a single scan), re-expressed
idiomatically on Spark DataFrames/Catalyst, and extended with the general
relational surface, Structured Streaming equivalents, and large-scale
data-pipeline operators (dedup, similarity search, text analysis).

Public surface:

- :class:`TimeseriesAggregator` — the reference-parity API
  (``max/min/sum/avg/count`` over t_min-aligned half-open buckets; two
  timestamp modes; compat flag for the reference's trailing-bucket quirk).
- :mod:`hbase_taggregator_spark.sources` — table loaders (parquet with
  nanos-timestamp normalization, HBase-shaped binary rowkey decoding).
- :mod:`hbase_taggregator_spark.operators` — relational/extension operators.
- :mod:`hbase_taggregator_spark.streaming` — Structured Streaming equivalents.
"""

from hbase_taggregator_spark.engine import Engine
from hbase_taggregator_spark.operators.timeseries import (
    TimeseriesAggregator,
    TimeseriesQuery,
)
from hbase_taggregator_spark.session import get_spark

__version__ = "0.1.0"

__all__ = [
    "Engine",
    "TimeseriesAggregator",
    "TimeseriesQuery",
    "get_spark",
    "__version__",
]
