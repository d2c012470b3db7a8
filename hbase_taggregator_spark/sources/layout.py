"""Data-layout operators: Z-order (Morton) clustering for multi-dimension
data skipping.

The reference's only physical-layout lever is the HBase rowkey itself
(``TimeseriesAggregationClient.java:199-214`` — scans prune on the rowkey
prefix and nothing else). A columnar lake gets the same effect per column
from parquet row-group min/max stats, but a table can only be SORTED one
way — a sort on (a, b) skips nothing for predicates on b alone. Z-ordering
interleaves the bits of several columns into one Morton key and
range-partitions + sorts on it, so row-group/file min-max ranges stay tight
on EVERY participating dimension at once (the Delta/Iceberg `OPTIMIZE
ZORDER BY` technique; public literature — Morton 1966).

Scale shape: the z-value is one codegen'd integer expression (no shuffle);
``zorder_repartition`` adds exactly one range shuffle — the same cost as
any global sort — and the payoff is multiplicative scan pruning on 100 TB
tables queried along more than one axis.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _interleave_terms(cols: list[str], n_bits: int, spark_dialect: bool):
    terms = []
    for bit in range(n_bits):
        for j, c in enumerate(cols):
            pos = bit * len(cols) + j
            if spark_dialect:
                terms.append(
                    f"shiftleft(shiftright(CAST(`{c}` AS BIGINT), {bit}) & 1, {pos})"
                )
            else:
                terms.append(f"(((CAST({c} AS BIGINT) >> {bit}) & 1) << {pos})")
    return " | ".join(terms)


def zvalue(cols: list[str], n_bits: int = 16) -> Column:
    """Morton key over non-negative integer columns: bit ``i`` of column
    ``j`` lands at interleaved position ``i·len(cols)+j``. ``n_bits`` per
    column; ``n_bits·len(cols)`` must stay < 63. Values are expected in
    ``[0, 2^n_bits)`` — pre-bucket wider domains (e.g. ``floor(value)``,
    a hash, or a quantile id). Pure expression, engine-portable (the
    DuckDB restatement is :func:`zvalue_sql`)."""
    if n_bits * len(cols) >= 63:
        raise ValueError("interleaved width must fit a signed int64")
    return F.expr(_interleave_terms(cols, n_bits, spark_dialect=True))


def zvalue_sql(cols: list[str], n_bits: int = 16) -> str:
    """The identical Morton key as portable SQL (DuckDB bit operators)."""
    return _interleave_terms(cols, n_bits, spark_dialect=False)


def zorder_repartition(
    df: DataFrame,
    cols: list[str],
    n_bits: int = 16,
    num_partitions: int = 8,
    z_col: str = "zval",
) -> DataFrame:
    """Cluster for multi-dimensional skipping: compute the Morton key,
    range-partition on it (disjoint z-ranges per output file — the
    property min/max skipping needs), and sort within partitions so
    row-group stats inside each file are tight too. Write the result with
    any sink; every participating dimension then prunes at scan time."""
    z = df.withColumn(z_col, zvalue(cols, n_bits))
    return z.repartitionByRange(num_partitions, z_col).sortWithinPartitions(z_col)
