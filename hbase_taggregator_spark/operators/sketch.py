"""Sketch-based operators: Bloom runtime filter, count-min frequency sketch.

The 100 TB join problem the reference never faces (single-table scans) but
any generalized engine does: a selective dimension predicate should prune
the FACT scan before the shuffle. Engines do this with runtime Bloom
filters (Spark's own `spark.sql.optimizer.runtime.bloomFilter` — public
docs; Kimball "join pruning"); here the same technique is exposed as an
explicit, deterministic operator whose hash algebra (md5-based, like every
sketch in this repo) can be restated by a SQL oracle — so even the false
positives are reproducible cross-engine.

Scale shape: the build side aggregates to ≤ m DISTINCT bit positions (a
few KB), is collected once (a small-aggregate collect, same class as
k-means centroids), and re-enters the plan as a LITERAL bitmap — the probe
side then filters MAP-SIDE with zero shuffle and no join; only survivors
reach the real join's exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from hbase_taggregator_spark.operators.dedup import _hash60


def bloom_positions(
    key: Column, m: int = 8192, k: int = 3, seed: str = "bloom"
) -> Column:
    """The k md5-derived bit positions of a key (array<long>, each in
    [0, m)) — shared by build and probe so membership is exact algebra."""
    s = key.cast("string")
    return F.array(
        *[
            _hash60(F.concat(F.lit(f"{seed}:{i}:"), s)) % m
            for i in range(k)
        ]
    )


def bloom_filter_semi(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    m: int = 8192,
    k: int = 3,
    seed: str = "bloom",
) -> DataFrame:
    """Runtime-Bloom semi filter: keep probe rows whose key MIGHT be in the
    build key set (all k bits set; false positives possible — bounded by
    (set_bits/m)^k — false negatives impossible). The filter is exact,
    deterministic algebra, so downstream exact joins stay correct and the
    gate oracle reproduces even the false positives.

    Build: one partial/final aggregation to ≤ m distinct positions,
    collected (small) and inlined as an m/64-word int64 bitmap literal.
    Probe: pure map-side bit tests via shiftrightunsigned — zero shuffle,
    no join node in the plan.
    """
    if m % 64:
        raise ValueError(f"m must be a multiple of 64, got {m}")
    pos_rows = (
        build.select(
            F.explode(bloom_positions(F.col(build_key), m, k, seed)).alias("p")
        )
        .distinct()
        .collect()
    )
    words = [0] * (m // 64)
    for r in pos_rows:
        p = int(r["p"])
        words[p // 64] |= 1 << (p % 64)
    # int64 literals: wrap the >=2^63 bit patterns to signed
    wlit = F.array(
        *[F.lit(w - (1 << 64) if w >= (1 << 63) else w).cast("long")
          for w in words]
    )
    # PySpark's shiftrightunsigned only takes a literal shift count, so the
    # variable-shift bit test goes through named temp columns + expr
    probe_pos = bloom_positions(F.col(probe_key), m, k, seed)
    tmp = probe
    cond = None
    for i in range(k):
        tmp = tmp.withColumn(f"__bf_p{i}", probe_pos[i]).withColumn(
            f"__bf_w{i}",
            F.element_at(wlit, (F.col(f"__bf_p{i}") / 64).cast("int") + 1),
        )
        c = F.expr(
            f"(shiftrightunsigned(__bf_w{i}, CAST(__bf_p{i} % 64 AS INT)) & 1) = 1"
        )
        cond = c if cond is None else cond & c
    return tmp.filter(cond).drop(
        *[f"__bf_p{i}" for i in range(k)], *[f"__bf_w{i}" for i in range(k)]
    )


def bloom_sql_positions(key_sql: str, m: int = 8192, k: int = 3, seed: str = "bloom") -> list[str]:
    """The same k positions as portable SQL expressions (DuckDB)."""
    h = "CAST(concat('0x', substr(md5('{seed}:{i}:' || CAST({key} AS VARCHAR)), 1, 15)) AS BIGINT)"
    return [h.format(seed=seed, i=i, key=key_sql) + f" % {m}" for i in range(k)]


def count_min_sketch(
    df: DataFrame,
    key_col: str,
    m: int = 1024,
    d: int = 4,
    seed: str = "cms",
) -> DataFrame:
    """Count-min sketch table: (row, bucket, counter) with d md5 hash rows
    of m buckets — the fixed-size frequency summary for unbounded key
    domains. Build is one partial/final aggregation of d·m counters (the
    shuffle carries ≤ d·m rows per partition regardless of input size).
    Query an estimate with :func:`count_min_lookup`; estimates are exact
    integer algebra, over-count only (classic CM guarantee)."""
    s = F.col(key_col).cast("string")
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("cm_row"),
                        (_hash60(F.concat(F.lit(f"{seed}:{i}:"), s)) % m).alias(
                            "cm_bucket"
                        ),
                    )
                    for i in range(d)
                ]
            )
        ).alias("rb")
    )
    return (
        rows.select(F.col("rb.cm_row").alias("cm_row"),
                    F.col("rb.cm_bucket").alias("cm_bucket"))
        .groupBy("cm_row", "cm_bucket")
        .agg(F.count(F.lit(1)).alias("counter"))
    )


def count_min_lookup(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    m: int = 1024,
    d: int = 4,
    seed: str = "cms",
) -> DataFrame:
    """Point estimates from a count-min sketch: min over the d counters at
    the key's hash positions (missing counter = 0). The sketch side is
    ≤ d·m rows — broadcast — so lookup is map-side + one tiny join."""
    s = F.col(key_col).cast("string")
    probes = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("cm_row"),
                        (_hash60(F.concat(F.lit(f"{seed}:{i}:"), s)) % m).alias(
                            "cm_bucket"
                        ),
                    )
                    for i in range(d)
                ]
            )
        ).alias("rb"),
    ).select(
        key_col,
        F.col("rb.cm_row").alias("cm_row"),
        F.col("rb.cm_bucket").alias("cm_bucket"),
    )
    joined = probes.join(F.broadcast(sketch), ["cm_row", "cm_bucket"], "left")
    return (
        joined.groupBy(key_col)
        .agg(
            F.min(F.coalesce(F.col("counter"), F.lit(0))).alias("cm_estimate")
        )
    )


def kmv_distinct(
    df: DataFrame, key_col: str, k: int = 64, seed: str = "kmv"
) -> DataFrame:
    """K-minimum-values distinct-count estimator (Bar-Yossef et al. 2002;
    the Theta-sketch base case): keep the k smallest DISTINCT 60-bit hash
    values; estimate |D| as (k-1) / (h_k / 2^60). Unlike HLL++ this sketch
    is pure md5 + order algebra, so a SQL oracle reproduces the ESTIMATE
    bit-for-bit — an approximate operator with an exact correctness gate.

    Output: one row {k, kth_hash, estimate_distinct}. If fewer than k
    distinct keys exist the estimate IS the exact distinct count. NULL
    keys are ignored (a NULL key hashes to NULL, which Spark's ascending
    sort would otherwise place FIRST into the k minima — inflating
    n_tracked while max(h) skips it — and DuckDB sorts NULLS LAST, so the
    engines would diverge on any nullable key column).

    Physical shape at 100 TB: map-side hash → partial MIN-k per partition
    via one partial/final distinct-agg on the hash (60-bit ints, so the
    shuffle carries ≤ one long per distinct key), then a global top-k
    (TakeOrdered, no full sort). Sketches from shards union + re-top-k —
    the standard mergeable-sketch shape.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    h = _hash60(F.concat(F.lit(f"{seed}#"), F.col(key_col).cast("string")))
    mins = (
        df.select(h.alias("h"))
        .filter(F.col("h").isNotNull())
        .distinct()
        .orderBy("h")
        .limit(k)
        .agg(F.count(F.lit(1)).alias("n_tracked"), F.max("h").alias("kth_hash"))
    )
    two60 = float(2**60)
    return mins.select(
        F.lit(k).alias("k"),
        "n_tracked",
        "kth_hash",
        F.when(
            F.col("n_tracked") < k, F.col("n_tracked").cast("double")
        )
        .otherwise(
            F.lit(float(k - 1)) / (F.col("kth_hash").cast("double") / F.lit(two60))
        )
        .alias("estimate_distinct"),
    )


def kmv_set_ops(
    a: DataFrame,
    b: DataFrame,
    key_col: str,
    k: int = 256,
    seed: str = "kmv",
) -> DataFrame:
    """Set-operation estimates from two mergeable KMV sketches — the
    Theta-sketch use case (Dasgupta et al., DataSketches): estimated
    distinct union, Jaccard, and intersection WITHOUT co-shuffling the two
    inputs on the key. Both sides hash with the SAME seed so shared keys
    collide; the union sketch is the min-k of the merged hash sets;
    Jaccard is the fraction of the union's k minima present in both sides
    (each membership check is a broadcast semi-join of a ≤k-row set).

    When the union has fewer than k distinct hashes everything is exact.
    All estimate arithmetic is int64 → a fixed chain of IEEE divisions, so
    the oracle reproduces the ESTIMATES bit-for-bit.

    Physical shape at 100 TB: each input collapses map-side+one shuffle to
    its distinct-hash set (bounded by distinct keys, not rows); the top-k
    is a TakeOrdered; the semi probes broadcast k longs. Sharded sketches
    union + re-top-k like any mergeable sketch.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")

    def hashes(df: DataFrame) -> DataFrame:
        # NULL keys dropped — same rationale as kmv_distinct (NULLS FIRST
        # vs NULLS LAST ordering diverges across engines)
        return (
            df.select(
                _hash60(
                    F.concat(F.lit(f"{seed}#"), F.col(key_col).cast("string"))
                ).alias("h")
            )
            .filter(F.col("h").isNotNull())
            .distinct()
        )

    ha, hb = hashes(a), hashes(b)
    union_topk = ha.union(hb).distinct().orderBy("h").limit(k)
    # broadcast the <=k-row top-k INTO the big sides (never the reverse:
    # ha/hb are bounded by distinct keys, which is exactly what must not
    # be collected at scale)
    in_a = ha.join(F.broadcast(union_topk), "h", "left_semi")
    in_both = hb.join(F.broadcast(in_a), "h", "left_semi")
    stats = union_topk.agg(
        F.count(F.lit(1)).alias("n_tracked"), F.max("h").alias("kth_hash")
    ).crossJoin(in_both.agg(F.count(F.lit(1)).alias("n_shared")))
    two60 = float(2**60)
    est_union = F.when(
        F.col("n_tracked") < k, F.col("n_tracked").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) / (F.col("kth_hash").cast("double") / F.lit(two60))
    )
    jaccard = F.when(F.col("n_tracked") == 0, F.lit(0.0)).otherwise(
        F.col("n_shared").cast("double") / F.col("n_tracked").cast("double")
    )
    return stats.select(
        F.lit(k).alias("k"),
        "n_tracked",
        "n_shared",
        est_union.alias("est_union"),
        jaccard.alias("est_jaccard"),
        (est_union * jaccard).alias("est_intersection"),
    )


def kmv_grouped_distinct(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    k: int = 64,
    seed: str = "kmv",
) -> DataFrame:
    """Per-group KMV distinct estimates — the grouped form of
    :func:`kmv_distinct` (per-segment cardinality dashboards). HLL++ gives
    Spark a grouped approximate distinct but its estimate is opaque; the
    KMV estimate is md5 + order algebra, so every GROUP's estimate is
    oracle-reproducible.

    Physical shape at 100 TB: distinct (group, hash) pairs collapse with
    one partial/final aggregation, then a per-group window keeps the k
    minima — both shuffles on the group key prefix. State per group is k
    longs, mergeable across shards like any KMV sketch.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    from pyspark.sql import Window as W

    h = _hash60(F.concat(F.lit(f"{seed}#"), F.col(key_col).cast("string")))
    hashes = (
        df.select(*group_cols, h.alias("h"))
        .filter(F.col("h").isNotNull())  # NULL keys dropped, as kmv_distinct
        .distinct()
    )
    w = W.partitionBy(*group_cols).orderBy("h")
    topk = hashes.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k
    )
    two60 = float(2**60)
    return (
        topk.groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("n_tracked"), F.max("h").alias("kth_hash"))
        .select(
            *group_cols,
            F.lit(k).alias("k"),
            "n_tracked",
            "kth_hash",
            F.when(
                F.col("n_tracked") < k, F.col("n_tracked").cast("double")
            )
            .otherwise(
                F.lit(float(k - 1))
                / (F.col("kth_hash").cast("double") / F.lit(two60))
            )
            .alias("estimate_distinct"),
        )
        .orderBy(*group_cols)
    )
