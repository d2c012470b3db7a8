"""HBase table source — the reference's native storage, behind the same
DataFrame abstraction.

The reference scans HBase regions via a coprocessor
(`TimeseriesAggregateImplementation.java:156` in /root/reference); the
Spark-native equivalent is the HBase-Spark connector
(`org.apache.hadoop.hbase.spark`, Apache hbase-connectors), which performs
server-side filter pushdown and per-region partitioning — one Spark
partition per region, the same parallelism the reference gets from one RPC
per region.

The connector jar is not present in this environment, so :func:`load_hbase`
raises with setup instructions (import-gated per project constraints). The
mapping contract is real and tested: :func:`hbase_catalog` produces the
connector's JSON catalog from the engine's schema model, and once loaded,
a rowkey-embedded-timestamp table flows through
``TimeseriesAggregator.table_from_rowkey`` exactly like the parquet path.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

HBASE_FORMAT = "org.apache.hadoop.hbase.spark"


def hbase_catalog(
    table: str,
    columns: dict[str, tuple[str, str, str]],
    namespace: str = "default",
) -> str:
    """Connector catalog JSON: ``columns`` maps DataFrame column →
    (column family, qualifier, type); the rowkey maps from family ``rowkey``.

    Example::

        hbase_catalog("metrics", {
            "rowkey":  ("rowkey", "key",  "binary"),
            "value":   ("d",      "v",    "bigint"),
        })
    """
    return json.dumps(
        {
            "table": {"namespace": namespace, "name": table},
            "rowkey": "key",
            "columns": {
                name: {"cf": cf, "col": col, "type": typ}
                for name, (cf, col, typ) in columns.items()
            },
        }
    )


def load_hbase(spark: SparkSession, catalog: str) -> DataFrame:
    """Read an HBase table through the connector (region-parallel scan with
    filter pushdown). Raises in environments without the connector jar."""
    try:
        reader = spark.read.format(HBASE_FORMAT).options(catalog=catalog)
        return reader.load()
    except Exception as e:  # pragma: no cover - no connector jar here
        raise NotImplementedError(
            "the HBase-Spark connector (org.apache.hadoop.hbase.spark, from "
            "Apache hbase-connectors) is not on the classpath; add the jar "
            "via spark.jars.packages and re-run. The parquet path exercises "
            "the identical engine surface."
        ) from e
