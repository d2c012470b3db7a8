"""Dataset profiling: per-column statistics in one scan.

The intake step of any 100 TB pipeline run — before dedup or training-mix
decisions, you profile the drop: row counts, null rates, cardinalities,
value ranges. The reference has no analog (single-table, fixed schema);
every serious engine ships one (``ANALYZE``/``SUMMARIZE``-class).

Scale shape: ONE pass over the table computes every column's aggregates in
a single partial/final HashAggregate (no per-column scans); the row-wise
presentation is an unpivot of the 1-row aggregate — driver-side cost is a
handful of literals. ``count(distinct)`` over several columns expands via
Spark's Expand node (one shuffle per distinct column set) — at extreme
widths swap in approx_count_distinct; here exactness wins because the gate
oracle restates exact counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column profile: {column_name, n_rows, n_nonnull, n_distinct,
    min_repr, max_repr} with min/max cast to string (portable for int and
    string columns; avoid profiling raw doubles through this — float
    formatting is engine-specific).
    """
    if not cols:
        raise ValueError("profile_columns needs at least one column")
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            F.countDistinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    one = df.agg(*aggs)
    per_col = ", ".join(
        f"'{c}', __nn_{c}, __nd_{c}, __mn_{c}, __mx_{c}" for c in cols
    )
    return (
        one.select(
            F.col("__rows").alias("n_rows"),
            F.expr(
                f"stack({len(cols)}, {per_col}) AS "
                "(column_name, n_nonnull, n_distinct, min_repr, max_repr)"
            ),
        )
        .select(
            "column_name", "n_rows", "n_nonnull", "n_distinct",
            "min_repr", "max_repr",
        )
        .orderBy("column_name")
    )
