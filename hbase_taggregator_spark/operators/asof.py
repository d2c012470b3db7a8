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

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    tolerance_us: int | None = None,
    direction: str = "backward",
    strict_nulls: bool = False,
) -> DataFrame:
    """As-of join (pandas ``merge_asof`` semantics: match at equal
    timestamps allowed in every direction).

    ``direction``: 'backward' (latest right with ``r.ts <= l.ts`` — the
    default), 'forward' (earliest right with ``r.ts >= l.ts``; the same
    union+window linear scan, ordered descending), or 'nearest' (closer of
    the two, ties to backward like pandas — computed as both scans over
    the one shuffled+sorted union, then a per-column CASE; still
    shuffle(|L|+|R|), never a theta product).

    ``right_cols`` defaults to all non-key, non-ts columns of ``right``.
    With ``tolerance_us``, matches farther than the tolerance are nulled
    out (absolute distance for 'nearest' — the closer side is chosen
    first, then the tolerance applies, matching pandas). Output: all left
    columns + matched right columns (suffixed) + ``{right_ts}{suffix}``
    (the matched right timestamp).

    CAVEAT: the scan carries right columns with ``last(ignorenulls)``, so
    a NULL in a carried right column is indistinguishable from "no match"
    and the PREVIOUS row's value leaks through. Encode meaningful NULLs
    (e.g. an open SCD2 ``valid_to``) as a sentinel before joining — or
    pass ``strict_nulls=True`` to FAIL on the first right row carrying a
    NULL instead of silently leaking (a per-row ``raise_error`` guard on
    the right side: distributed, no extra job, evaluation-time).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
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
    def guard(c: str) -> Column:
        if not strict_nulls:
            return F.col(c)
        return F.when(
            F.col(c).isNull(),
            F.raise_error(
                f"asof_join(strict_nulls=True): right column {c!r} is NULL "
                "— a NULL carried column would leak the previous row's "
                "value through last(ignorenulls); sentinel-encode it or "
                "drop strict_nulls"
            ),
        ).otherwise(F.col(c))

    rhs = right.select(
        *on,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in on and c != left_ts],
        *[guard(c).alias(f"{c}{suffix}") for c in right_cols],
        guard(right_ts).alias(f"{right_ts}{suffix}"),
    )
    # right rows sort before left rows at equal __t (0 < 1) → equal-ts
    # match in the backward scan; the forward scan orders __t descending
    # with the same tiebreak so equal-ts still matches
    w_back = (
        W.partitionBy(*on)
        .orderBy("__t", "__is_left")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_fwd = (
        W.partitionBy(*on)
        .orderBy(F.col("__t").desc(), "__is_left")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = rhs.unionByName(lhs)
    if direction in ("backward", "forward"):
        w = w_back if direction == "backward" else w_fwd
        for c in carried:
            filled = filled.withColumn(c, F.last(c, ignorenulls=True).over(w))
        out = filled.filter(F.col("__is_left") == 1)
        if tolerance_us is not None:
            matched_ts = F.col(f"{right_ts}{suffix}")
            dist = F.unix_micros(F.col("__t")) - F.unix_micros(matched_ts)
            if direction == "forward":
                dist = -dist
            in_tol = dist <= F.lit(tolerance_us)
            for c in carried:
                out = out.withColumn(c, F.when(in_tol, F.col(c)))
        return out.withColumnRenamed("__t", left_ts).drop("__is_left")

    # nearest: both scans over the same shuffled union (Catalyst plans the
    # two window sorts over one exchange on the key), then per-row choice
    for c in carried:
        filled = filled.withColumn(f"__b_{c}", F.last(c, ignorenulls=True).over(w_back))
    for c in carried:
        filled = filled.withColumn(f"__f_{c}", F.last(c, ignorenulls=True).over(w_fwd))
    out = filled.filter(F.col("__is_left") == 1)
    t_us = F.unix_micros(F.col("__t"))
    b_ts = F.col(f"__b_{right_ts}{suffix}")
    f_ts = F.col(f"__f_{right_ts}{suffix}")
    b_dist = t_us - F.unix_micros(b_ts)
    f_dist = F.unix_micros(f_ts) - t_us
    use_back = b_ts.isNotNull() & (f_ts.isNull() | (b_dist <= f_dist))
    for c in carried:
        picked = F.when(use_back, F.col(f"__b_{c}")).otherwise(F.col(f"__f_{c}"))
        out = out.withColumn(c, picked)
    if tolerance_us is not None:
        chosen_dist = F.when(use_back, b_dist).otherwise(f_dist)
        for c in carried:
            out = out.withColumn(
                c, F.when(chosen_dist <= F.lit(tolerance_us), F.col(c))
            )
    return (
        out.withColumnRenamed("__t", left_ts)
        .drop("__is_left", *[f"__b_{c}" for c in carried],
              *[f"__f_{c}" for c in carried])
    )
