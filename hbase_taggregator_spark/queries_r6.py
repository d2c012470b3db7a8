"""Round-6 catalog queries.

The headline entry closes the last SURVEY §2.1 seam without a driver
CORRECTNESS row: the HBase connector row-shape path — cell stream →
catalog pivot (latest version wins) → typed decode → binary-rowkey mask
timestamp extraction → bucketed aggregation — exercised end-to-end as a
gate query with a DuckDB oracle restating the full algebra. This is the
reference's actual scan contract
(``TimeseriesAggregateImplementation.java:156`` drives a region scan of
cells; the fixture layout mirrors
``TestTimeseriesAggregateProtocol.java:110-128`` in /root/reference),
previously pytest-only (tests/test_round4.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from hbase_taggregator_spark.queries import (
    T0,
    T_WEEK,
    US,
    _dsum,
    _register,
    _sql_dsum,
    load_table,
)


def _q_hbase_rowshape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → HBase cell stream (12-byte rowkey = 8-byte BE event_id +
    4-byte BE epoch-seconds; cf 'd', qualifier 'v', double value as
    8-byte IEEE bits — the reference's physical layout) with TWO versions
    per cell: an older decoy at ``value + 1000`` (cell_ts=1) under the
    true value (cell_ts=2), so a pivot that picks anything but the
    newest version breaks the oracle hash. The cell stream then runs the
    full no-jar connector contract: catalog JSON → latest-version pivot →
    type decode → ``table_from_rowkey`` mask extraction → t_min-aligned
    hourly count+sum over [T0, T_WEEK).

    100 TB shape: cell synthesis and both encodes are map-side JVM
    expressions over the pruned scan; the pivot is ONE hash aggregation
    keyed on the binary rowkey (exactly what the real connector emits per
    region, here expressed relationally); the bucketed aggregation
    reuses the engine core's partial/final shape.
    """
    from hbase_taggregator_spark.functions.decoders import encode_value
    from hbase_taggregator_spark.operators.timeseries import TimeseriesAggregator
    from hbase_taggregator_spark.sources.hbase import (
        hbase_catalog,
        load_hbase_fixture,
    )
    from hbase_taggregator_spark.sources.rowkey import encode_rowkey

    events = load_table(
        spark, sf_dir, "events", time_range=(T0 * US, T_WEEK * US)
    )
    # project the (large) IEEE-bit encode expression trees into plain
    # columns BEFORE the explode: inlining them inside the Generate's
    # array literal blows the generated consume function past janino's
    # method limits and drops the stage out of whole-stage codegen
    encoded = events.select(
        F.concat(
            encode_value(F.col("event_id"), "long_be"),
            encode_rowkey(b"", F.expr("unix_micros(ts) div 1000000")),
        ).alias("rowkey"),
        encode_value(F.col("value") + F.lit(1000.0), "double_bits_be").alias(
            "__v_old"
        ),
        encode_value(F.col("value"), "double_bits_be").alias("__v_new"),
    )
    versions = F.array(
        F.struct(
            F.lit(1).cast("long").alias("cell_ts"),
            F.col("__v_old").alias("value"),
        ),
        F.struct(
            F.lit(2).cast("long").alias("cell_ts"),
            F.col("__v_new").alias("value"),
        ),
    )
    cells = encoded.select(
        "rowkey",
        F.lit("d").alias("cf"),
        F.lit("v").alias("qualifier"),
        F.explode(versions).alias("__c"),
    ).select(
        "rowkey",
        "cf",
        "qualifier",
        F.col("__c.value").alias("value"),
        F.col("__c.cell_ts").alias("cell_ts"),
    )
    catalog = hbase_catalog(
        "metrics",
        {
            "rowkey": ("rowkey", "key", "binary"),
            "value": ("d", "v", "double"),
        },
    )
    table = load_hbase_fixture(spark, catalog, cells)
    q = (
        TimeseriesAggregator(spark)
        .table_from_rowkey(table, "000000001111")
        .range(T0, T_WEEK)
        .interval(3600)
    )
    df = q.aggregate(
        F.count(F.col("value")).alias("count_value"),
        _dsum("value", "sum_value"),
    )
    return df.select(
        F.expr("bucket_start_us div 1000").alias("bucket_ms"),
        "count_value",
        "sum_value",
    )


# the oracle restates the END-TO-END semantics directly on the parquet
# source: the latest version carries the true value (the cell_ts=1 decoy
# must never surface), the double bit round-trip and mask decode are
# identity up to second flooring, and the buckets are t_min-aligned
# hourly. Any defect in the pivot, decode, or mask path diverges from
# this restatement.
_register(
    "hbase_rowshape_bucketed_agg",
    _q_hbase_rowshape,
    f"""
    WITH e AS (
      SELECT epoch_us(ts) // 1000000 AS sec, value
      FROM events
      WHERE epoch_us(ts) >= {T0 * US} AND epoch_us(ts) < {T_WEEK * US})
    SELECT CAST(({T0} + ((sec - {T0}) // 3600) * 3600) * 1000 AS BIGINT)
             AS bucket_ms,
           COUNT(value) AS count_value,
           {_sql_dsum("value")} AS sum_value
    FROM e GROUP BY 1 ORDER BY 1
    """,
)


# re-apply the gate-window ordering now that round-6 queries are
# registered (tolerant on every import path, same as queries_r3/r4/r5 —
# whichever module finishes last sees the full catalog).
from hbase_taggregator_spark.queries_ext import _apply_gate_window  # noqa: E402

_apply_gate_window(strict=False)
