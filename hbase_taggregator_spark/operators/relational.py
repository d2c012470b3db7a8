"""Generalized relational operators (SURVEY.md §2.2).

The reference is a single-table scan engine; every operator here is a
capability it lacks, expressed as a thin, scale-aware composition of Spark
built-ins so Catalyst keeps full optimization freedom (predicate pushdown,
join reordering, partial aggregation). Nothing in this module leaves the JVM.

Scale notes are per-function; the common themes at 100 TB:

- joins: broadcast the dimension side explicitly (`F.broadcast`) when it is
  bounded; let AQE convert to broadcast at runtime otherwise; skew-join
  handled by AQE (`spark.sql.adaptive.skewJoin`).
- top-k per group: `row_number` over a window = one shuffle by the partition
  key with in-partition sort — no global sort, no driver state.
- multi-version reads: the reference's `max_versions` scan knob
  (Client.proto:248) generalizes to rank-over-version and keeps the newest
  N per key in one shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: Column | str,
    k: int,
    descending: bool = True,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Top-k rows per group via `row_number` (deterministic with tiebreak).

    One hash shuffle on the group key; per-partition sort; no global sort.
    The rank column is dropped from the output.
    """
    order = F.col(order_col) if isinstance(order_col, str) else order_col
    keys = [order.desc() if descending else order.asc()]
    keys += [F.col(c) for c in (tiebreak or [])]
    w = W.partitionBy(*group_cols).orderBy(*keys)
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def latest_versions(
    df: DataFrame,
    key_cols: list[str],
    version_col: str,
    n: int = 1,
) -> DataFrame:
    """Newest ``n`` versions per key — the relational form of the reference's
    pass-through ``max_versions`` scan attribute (Client.proto:248 in
    /root/reference; untested there, first-class here). Ties broken by the
    version column only, matching HBase's newest-timestamp-first ordering."""
    return top_k_per_group(df, key_cols, version_col, n, descending=True)


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """EXISTS: rows of ``left`` with ≥1 match. Spark plans a left-semi hash
    join — right side reduced to distinct keys before the probe."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """NOT EXISTS: rows of ``left`` with no match (null-safe per SQL NOT IN
    caveats avoided — this is the anti-join, not NOT IN)."""
    return left.join(right, on, "left_anti")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join with key salting for skew.

    When one join key carries a disproportionate share of rows (and the
    small side is too big to broadcast), a plain hash join sends the hot
    key's entire partition to one task. Salting splits the hot key ``salt``
    ways: the left side gets a deterministic per-row salt, the right side is
    replicated ×``salt`` — task parallelism on the hot key at the cost of
    replicating the right side. AQE's skew-join handles sort-merge skew
    automatically; salting is the explicit tool when AQE can't (e.g.
    aggregation-after-join keyed on the same hot key).

    The per-row salt is a hash of the whole left row (deterministic, no
    rand()), so results are stable across retries — important for exactly
    -once sinks.

    Only ``inner`` and ``left`` are supported: the right side is replicated
    ×``salt``, so right/full outer joins would emit each unmatched right row
    once per salt value.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left' (right side is "
            f"replicated per salt), got {how!r}"
        )
    salt_col = F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(salt))
    lhs = left.withColumn("__salt", salt_col)
    rhs = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = lhs.join(rhs, [*on, "__salt"], how)
    return out.drop("__salt")


def grouping_rollup(df: DataFrame, cols: list[str], *aggs: Column) -> DataFrame:
    """ROLLUP with deterministic '(all)' labels instead of NULL group keys,
    so subtotal rows are unambiguous (and hash-stable across engines)."""
    out = df.rollup(*cols).agg(*aggs)
    for c in cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit("(all)")))
    return out


def grouping_cube(df: DataFrame, cols: list[str], *aggs: Column) -> DataFrame:
    """CUBE with deterministic '(all)' labels (see :func:`grouping_rollup`)."""
    out = df.cube(*cols).agg(*aggs)
    for c in cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit("(all)")))
    return out


def salted_count_distinct(
    df: DataFrame,
    group_cols: list[str],
    distinct_col: str,
    out_col: str = "n_distinct",
    salt: int = 16,
) -> DataFrame:
    """COUNT(DISTINCT x) per group, salted for hot groups.

    Plain count-distinct shuffles every (group, x) pair to the group's
    single reducer — a hot group becomes one straggler task. Salting by a
    hash *of the distinct column* splits each group ``salt`` ways while
    keeping the partial counts disjoint (the same x always lands in the
    same salt bucket), so stage 2 just SUMs the partials: exact, no
    overlap, and the hot group's work spreads across ``salt`` tasks.

    Two shuffles either way; the salted form bounds the largest task by
    1/``salt`` of the hottest group.
    """
    salted = df.withColumn(
        "__salt", F.pmod(F.hash(F.col(distinct_col)), F.lit(salt))
    )
    partial = salted.groupBy(*group_cols, "__salt").agg(
        F.countDistinct(distinct_col).alias("__partial")
    )
    return partial.groupBy(*group_cols).agg(
        F.sum("__partial").cast("long").alias(out_col)
    )


def range_band_join(
    fact: DataFrame,
    bands: DataFrame,
    value_col: str,
    grid: int,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Interval join (``lo <= value < hi``) rewritten as an equi-join.

    A naive inequality join is a broadcast-nested-loop — every fact row
    probes every band. Each band covers every grid bucket intersecting
    ``[lo, hi)``: explode the (small) band side into its covered buckets,
    join on ``floor(value/grid)``, and keep the exact range predicate as a
    residual. The fact side never fans out; the explode factor lives
    entirely on the dimension side.

    Bucket bounds hold for ANY (possibly fractional) ``lo``/``hi``: the top
    covered bucket is ``ceil(hi/grid) - 1`` (a fractional ``hi`` still
    reaches into its enclosing bucket; ``floor((hi-1)/grid)`` would skip it
    and silently drop matches). Degenerate bands (``hi <= lo``) match no
    value under the half-open predicate and are dropped up front —
    otherwise ``sequence()`` would emit a *descending* bucket list for
    them. Bounds are computed in DECIMAL so int64-magnitude boundaries
    don't round through double division.
    """
    bucket = F.floor(F.col(value_col) / grid).cast("long")
    # decimal(28,9) / decimal(12,0) keeps 19 fractional digits after Spark's
    # precision-loss adjustment — floor/ceil stay exact for any boundary
    # with <=9 fractional digits (double division would not, at int64 scale)
    grid_dec = F.lit(grid).cast("decimal(12,0)")
    b = bands.filter(F.col(hi_col) > F.col(lo_col)).withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col).cast("decimal(28,9)") / grid_dec).cast("long"),
                (F.ceil(F.col(hi_col).cast("decimal(28,9)") / grid_dec) - 1).cast("long"),
            )
        ),
    )
    j = fact.withColumn("__bucket", bucket).join(
        F.broadcast(b), "__bucket"
    )
    return j.filter(
        (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    ).drop("__bucket")


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    delete_col: str | None = None,
    broadcast_updates: bool = False,
) -> DataFrame:
    """Batch MERGE INTO semantics over immutable storage: updates win on
    key match, unmatched base rows survive, and (optionally) update rows
    flagged in ``delete_col`` tombstone their key instead of inserting —
    the copy-on-write upsert every parquet-lake table format implements,
    expressed as ``updates ∪ (base ⟕̸ updates)``. Complements the engine's
    multi-version reads (:func:`latest_versions` keeps N historical
    versions; ``merge_upsert`` collapses to the single current version).

    Physical shape at 100 TB: one left-anti join on the merge key — set
    ``broadcast_updates=True`` when the delta is bounded (the common CDC
    case: daily delta ≪ base) and the anti join becomes a broadcast hash
    join, so the base table never shuffles; otherwise both sides shuffle
    once on the key. Deletes cost nothing extra: the tombstone filter is
    applied to the (small) update side before the union.
    """
    upd_keys = updates.select(keys).distinct()
    if broadcast_updates:
        upd_keys = F.broadcast(upd_keys)
    survivors = base.join(upd_keys, keys, "left_anti")
    incoming = updates
    if delete_col is not None:
        incoming = updates.filter(~F.col(delete_col)).drop(delete_col)
    return survivors.unionByName(incoming)


def scd2_from_events(
    events: DataFrame,
    key_col: str = "user_id",
    attr_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Slowly-changing-dimension (type 2) history from an event log: per
    key, collapse CONSECUTIVE runs of the same attribute value into one
    validity interval [valid_from_us, valid_to_us) — the standard
    dimension-build a warehouse runs over a change feed (Kimball SCD2 via
    gaps-and-islands). The open (current) interval has valid_to_us NULL.

    Islands are found with the classic marker-cumsum: a row starts a new
    run when its attribute differs from the previous row's (or has no
    previous row); the running sum of markers labels the run. Pure integer
    /string algebra — portable to any SQL engine verbatim.

    Physical shape at 100 TB: all three windows and the final groupBy use
    the same ``key_col`` partitioning (one shuffle, in-partition sorts);
    a change feed is naturally fine-grained on key, so no skew guard is
    needed here.
    """
    us = F.unix_micros(F.col(ts_col))
    order_w = W.partitionBy(key_col).orderBy("us", tiebreak_col)
    runs_w = W.partitionBy(key_col).orderBy("us", tiebreak_col).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    next_w = W.partitionBy(key_col).orderBy("run_id")
    d = (
        events.select(
            F.col(key_col), F.col(attr_col), F.col(tiebreak_col), us.alias("us")
        )
        .withColumn(
            "chg",
            F.when(
                F.lag(attr_col).over(order_w).isNull()
                | (F.lag(attr_col).over(order_w) != F.col(attr_col)),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("run_id", F.sum("chg").over(runs_w))
        .groupBy(key_col, "run_id")
        .agg(
            F.min(attr_col).alias(attr_col),
            F.min("us").alias("valid_from_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    return (
        d.withColumn("valid_to_us", F.lead("valid_from_us").over(next_w))
        .select(
            key_col, "run_id", attr_col, "valid_from_us", "valid_to_us", "n_events"
        )
        .orderBy(key_col, "run_id")
    )


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    keys: list[str],
    grid: int,
    a_id: str = "a_id",
    b_id: str = "b_id",
    a_lo: str = "a_lo",
    a_hi: str = "a_hi",
    b_lo: str = "b_lo",
    b_hi: str = "b_hi",
) -> DataFrame:
    """Interval × interval overlap join (half-open: a_lo < b_hi AND
    b_lo < a_hi) as an equi-join — the temporal-algebra workhorse
    (validity intervals × sessions, downtime × deploys). Generalizes
    :func:`range_band_join` from point×interval to interval×interval.

    Both sides explode to the grid buckets their interval covers
    (floor(lo/grid) .. ceil(hi/grid)-1, the boundary-correct cover), the
    join runs on (keys, bucket), duplicates from multi-bucket overlaps
    collapse on (keys, a_id, b_id), and the exact overlap predicate stays
    as a residual. Intervals must be non-degenerate (hi > lo) and CLOSED
    (no NULL bounds — coalesce open SCD2 intervals to a horizon first).

    Physical shape at 100 TB: shuffle on (keys, bucket) — both explode
    factors are interval_length/grid, so pick ``grid`` near the median
    interval length; the dedup groupBy reuses the same key prefix. No
    broadcast requirement: unlike range_band_join, both sides may be huge.
    """
    if grid <= 0:
        raise ValueError(f"grid must be positive, got {grid}")

    grid_dec = F.lit(grid).cast("decimal(12,0)")

    def cover(df: DataFrame, lo: str, hi: str) -> DataFrame:
        # covered buckets = floor(lo/grid) .. ceil(hi/grid)-1. True
        # floor/ceil via exact DECIMAL division (like range_band_join):
        # integer `div` TRUNCATES, which floors only for nonnegative
        # bounds — pre-1970 epochs or signed offsets would land in the
        # wrong bucket and silently drop pairs
        return df.filter(F.col(hi) > F.col(lo)).withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.floor(
                        F.col(lo).cast("decimal(28,9)") / grid_dec
                    ).cast("long"),
                    (
                        F.ceil(F.col(hi).cast("decimal(28,9)") / grid_dec) - 1
                    ).cast("long"),
                )
            ),
        )

    ea = cover(a, a_lo, a_hi)
    eb = cover(b, b_lo, b_hi)
    joined = ea.join(eb, on=[*keys, "__bucket"]).filter(
        (F.col(a_lo) < F.col(b_hi)) & (F.col(b_lo) < F.col(a_hi))
    )
    return (
        joined.dropDuplicates([*keys, a_id, b_id])
        .select(
            *keys, a_id, b_id, a_lo, a_hi, b_lo, b_hi,
            (
                F.least(F.col(a_hi), F.col(b_hi))
                - F.greatest(F.col(a_lo), F.col(b_lo))
            ).alias("overlap_us"),
        )
        .orderBy(*keys, a_id, b_id)
    )


def table_diff(
    base: DataFrame,
    revised: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Snapshot diff — the audit primitive that pairs with MERGE INTO:
    classify every key as added / removed / changed / unchanged between
    two table versions and count each class. Row contents compare by an
    md5 fingerprint over ``compare_cols`` (null-safe: NULL marks a
    reserved token), so wide rows ship one 32-char hash through the join,
    not every column. Keys appearing multiple times in a snapshot compare
    by the sorted MULTISET of their row fingerprints — a duplicated row
    counts as a change, not as extra phantom keys.

    Physical shape at 100 TB: per-side key collapse (partial/final) then
    one full-outer shuffle join on the key — the minimum possible for a
    diff — carrying (key, fingerprint) only; counts aggregate partially
    map-side. At petabyte scale run it per-partition (date bucket) and
    union the counts: the operator composes because counts are additive.
    """

    def fp(df: DataFrame) -> Column:
        parts = []
        for c in compare_cols:
            parts.append(F.coalesce(F.col(c).cast("string"), F.lit("\x00null")))
            parts.append(F.lit("\x01"))
        return F.md5(F.concat(*parts))

    def keyed(df: DataFrame, out: str) -> DataFrame:
        return (
            df.select(*key_cols, fp(df).alias("__fp"))
            .groupBy(*key_cols)
            .agg(
                F.md5(
                    F.concat_ws(",", F.sort_array(F.collect_list("__fp")))
                ).alias(out)
            )
        )

    b = keyed(base, "__fp_b")
    r = keyed(revised, "__fp_r")
    j = b.join(r, key_cols, "full_outer")
    cls = (
        F.when(F.col("__fp_b").isNull(), F.lit("added"))
        .when(F.col("__fp_r").isNull(), F.lit("removed"))
        .when(F.col("__fp_b") != F.col("__fp_r"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.select(cls.alias("diff_class"))
        .groupBy("diff_class")
        .agg(F.count(F.lit(1)).alias("n_keys"))
        .orderBy("diff_class")
    )
