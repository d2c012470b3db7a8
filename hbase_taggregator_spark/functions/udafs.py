"""Arrow-batched grouped aggregation (pandas UDAF surface).

Completes the UDF/UDAF API inventory: decoders are JVM expressions,
mapInPandas covers per-row Python, applyInPandasWithState covers custom
streaming state — this module is the GROUPED_AGG corner: a pandas Series →
scalar aggregate usable directly inside ``groupBy().agg(...)``, with partial
aggregation handled by Spark's Arrow exchange.

Determinism discipline (the reason these accumulate in integers): a float
``Series.sum()`` would depend on the partition-arrival order of the group's
rows. Quantizing to integer cents first makes the sum order-free, so the
result is reproducible and the DuckDB oracle can restate it exactly — the
same rule every decimal-cast JVM aggregate in this repo follows, applied on
the Python side of the boundary.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.types import LongType


# LongType() (not the DDL string "long"): string return types are parsed
# through the active SparkContext at decoration time, which would make this
# module unimportable before a session exists
@F.pandas_udf(LongType())
def weighted_cents_sum(value: pd.Series, weight: pd.Series) -> int:
    """Σ round(value·100)·weight as exact int64 — the order-free core of a
    weighted mean; divide by Σ weight JVM-side. value is quantized to
    cents (round-half-even on the float64 product, deterministic for any
    fixed input set), weights must be integral."""
    cents = value.mul(100.0).round().astype("int64")
    return int((cents * weight.astype("int64")).sum())


# Spark disallows mixing GROUPED_AGG pandas UDFs with JVM aggregate
# functions in one agg() (INVALID_PANDAS_UDF_PLACEMENT) — companions for
# the common "and also the plain sum" case live on the pandas side too.
@F.pandas_udf(LongType())
def int_sum(x: pd.Series) -> int:
    """Exact int64 sum as a grouped-agg pandas UDF (order-free)."""
    return int(x.astype("int64").sum())
