"""As-of (nearest-predecessor) join — a time-series operator Spark lacks as
a built-in, composed from union + window so it scales as one shuffle.

For each left row, attach the latest right row of the same key with
``right.ts <= left.ts`` (direction='backward'; 'forward' symmetric). The
naive formulation (theta-join on ``r.ts <= l.ts`` + argmax) explodes to
O(|L|·|R|) pairs per key; this implementation is the scalable classic:

    union both sides tagged → one hash shuffle on key → per-partition sort
    by (ts, side) → running last_value(right cols, ignorenulls) → keep left

cost: shuffle(|L|+|R|) + sort, independent of match fan-out. Skewed keys are
handled by AQE the same as any window shuffle; a per-key salt is unnecessary
because the window is a linear scan, not a product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    tolerance_us: int | None = None,
) -> DataFrame:
    """Backward as-of join (pandas ``merge_asof`` semantics: match at equal
    timestamps allowed, latest predecessor wins).

    ``right_cols`` defaults to all non-key, non-ts columns of ``right``.
    With ``tolerance_us``, matches older than the tolerance are nulled out.
    Output: all left columns + matched right columns (suffixed) +
    ``{right_ts}{suffix}`` (the matched right timestamp).
    """
    right_cols = right_cols or [
        c for c in right.columns if c not in on and c != right_ts
    ]
    carried = [f"{c}{suffix}" for c in right_cols] + [f"{right_ts}{suffix}"]

    lhs = left.select(
        *on,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in left.columns if c not in on and c != left_ts],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}")
          for c in right_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias(f"{right_ts}{suffix}"),
    )
    rhs = right.select(
        *on,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in on and c != left_ts],
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
        F.col(right_ts).alias(f"{right_ts}{suffix}"),
    )
    # right rows sort before left rows at equal __t (0 < 1) → equal-ts match
    w = (
        W.partitionBy(*on)
        .orderBy("__t", "__is_left")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = rhs.unionByName(lhs)
    for c in carried:
        filled = filled.withColumn(c, F.last(c, ignorenulls=True).over(w))
    out = filled.filter(F.col("__is_left") == 1)
    if tolerance_us is not None:
        matched_ts = F.col(f"{right_ts}{suffix}")
        in_tol = (
            F.unix_micros(F.col("__t")) - F.unix_micros(matched_ts)
            <= F.lit(tolerance_us)
        )
        for c in carried:
            out = out.withColumn(c, F.when(in_tol, F.col(c)))
    return out.withColumnRenamed("__t", left_ts).drop("__is_left")
