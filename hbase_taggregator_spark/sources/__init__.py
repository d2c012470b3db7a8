"""Table sources.

The reference engine's only source is an HBase region scan
(`TimeseriesAggregateImplementation.java:156` in /root/reference). Here the
canonical source is columnar parquet (vectorized scan + row-group skipping +
column pruning come free from Catalyst); :mod:`.rowkey` supplies the
HBase-shaped binary-rowkey decoding for data ingested in the reference's
physical layout.
"""

from hbase_taggregator_spark.sources.parquet import TABLES, load_table, load_all
from hbase_taggregator_spark.sources.rowkey import (
    rowkey_timestamp,
    encode_rowkey,
    mask_span,
)

__all__ = [
    "TABLES",
    "load_table",
    "load_all",
    "rowkey_timestamp",
    "encode_rowkey",
    "mask_span",
]
