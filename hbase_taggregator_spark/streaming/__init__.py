"""Structured Streaming equivalents of the bucketed aggregations.

The reference's README motivates streaming use ('time based data, e.g.
readings from electricity meters' — README.md:3 in /root/reference) but the
coprocessor is strictly batch/pull. This package delivers the streaming
path: same bucket semantics, expressed as watermarked window aggregations.
"""

from hbase_taggregator_spark.streaming.timeseries_stream import (
    bucketed_stream_agg,
    replay_parquet_stream,
)

__all__ = ["bucketed_stream_agg", "replay_parquet_stream"]
