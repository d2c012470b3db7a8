"""Round-3 late-wave catalog queries (registered AFTER the driver gate
window — evidence comes from tools/check_oracle.py + the judge's re-run).

Same conventions as :mod:`hbase_taggregator_spark.queries`: epoch-int
outputs, decimal-exact floating aggregates, deterministic tiebreaks, and
oracles that restate the identical algebra in portable SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from hbase_taggregator_spark.queries import T0, T_WEEK, US, _register, load_table

# ---------------------------------------------------------------------------
# truncated EWMA smoothing (operators/timeseries.py::ewma_truncated)
# ---------------------------------------------------------------------------

_EWMA_ALPHA, _EWMA_K, _EWMA_IVAL = 0.3, 8, 3600


def _q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hbase_taggregator_spark.operators.timeseries import ewma_truncated

    events = load_table(
        spark, sf_dir, "events", time_range=(T0 * US, T_WEEK * US)
    )
    return ewma_truncated(
        events, T0, T_WEEK, _EWMA_IVAL, alpha=_EWMA_ALPHA, k=_EWMA_K
    )


def _ewma_sql() -> str:
    # integer fixed-point restatement — see ewma_truncated's exactness note
    lo, hi = T0 * US, T_WEEK * US
    ival = _EWMA_IVAL * US
    wq = [int(round((1.0 - _EWMA_ALPHA) ** j * 1_000_000)) for j in range(_EWMA_K)]
    lags = ",\n               ".join(
        f"lag(xq, {j}) OVER w AS xq{j}" for j in range(1, _EWMA_K)
    )
    num = " + ".join(
        [f"xq * {wq[0]}"]
        + [f"COALESCE(xq{j} * {wq[j]}, 0)" for j in range(1, _EWMA_K)]
    )
    den = " + ".join(
        [f"{wq[0]}"]
        + [
            f"CASE WHEN xq{j} IS NOT NULL THEN {wq[j]} ELSE 0 END"
            for j in range(1, _EWMA_K)
        ]
    )
    return f"""
    WITH b AS (
        SELECT event_type,
               {lo} + ((epoch_us(ts) - {lo}) // {ival}) * {ival} AS bucket_start_us,
               SUM(CAST(value AS DECIMAL(28,6))) AS s,
               COUNT(*) AS n
        FROM events
        WHERE epoch_us(ts) >= {lo} AND epoch_us(ts) < {hi}
        GROUP BY 1, 2
    ), q AS (
        SELECT event_type, bucket_start_us,
               CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS x,
               CAST(s * 1000000 AS BIGINT) // n AS xq
        FROM b
    ), l AS (
        SELECT event_type, bucket_start_us, x, xq,
               {lags}
        FROM q
        WINDOW w AS (PARTITION BY event_type ORDER BY bucket_start_us)
    )
    SELECT event_type, bucket_start_us, x AS bucket_avg,
           CAST({num} AS DOUBLE) / CAST({den} AS DOUBLE) / 1000000.0 AS ewma
    FROM l
    """


_register("ts_ewma_smoothed_3600", _q_ewma, _ewma_sql())


# ---------------------------------------------------------------------------
# largest inter-arrival gaps (operators/timeseries.py::largest_gaps)
# ---------------------------------------------------------------------------


def _q_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hbase_taggregator_spark.operators.timeseries import largest_gaps

    events = load_table(
        spark, sf_dir, "events", time_range=(T0 * US, T_WEEK * US)
    )
    return largest_gaps(events, T0, T_WEEK, n=3)


_register(
    "ts_largest_gaps_per_type",
    _q_gaps,
    f"""
    WITH d AS (
        SELECT event_type, event_id, epoch_us(ts) AS us,
               lag(epoch_us(ts)) OVER (
                   PARTITION BY event_type ORDER BY epoch_us(ts), event_id
               ) AS gap_start_us
        FROM events
        WHERE epoch_us(ts) >= {T0 * US} AND epoch_us(ts) < {T_WEEK * US}
    ), g AS (
        SELECT event_type, event_id, us, gap_start_us,
               us - gap_start_us AS gap_us
        FROM d WHERE gap_start_us IS NOT NULL
    ), r AS (
        SELECT event_type, gap_us, gap_start_us, us,
               row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY gap_us DESC, gap_start_us ASC, event_id ASC
               ) AS gap_rank
        FROM g
    )
    SELECT event_type, CAST(gap_rank AS BIGINT) AS gap_rank, gap_us,
           gap_start_us, us AS gap_end_us
    FROM r WHERE gap_rank <= 3
    """,
)


# ---------------------------------------------------------------------------
# SCD2 dimension history (operators/relational.py::scd2_from_events)
# ---------------------------------------------------------------------------


def _q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hbase_taggregator_spark.operators.relational import scd2_from_events

    events = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") % 20 == 0
    )
    return scd2_from_events(events)


_register(
    "scd2_user_event_history",
    _q_scd2,
    """
    WITH e AS (
        SELECT user_id, event_type, event_id, epoch_us(ts) AS us
        FROM events WHERE user_id % 20 = 0
    ), m AS (
        SELECT *,
               CASE WHEN lag(event_type) OVER w IS NULL
                         OR lag(event_type) OVER w <> event_type
                    THEN 1 ELSE 0 END AS chg
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ), runs AS (
        SELECT *,
               CAST(SUM(chg) OVER (
                   PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS run_id
        FROM m
    ), agg AS (
        SELECT user_id, run_id, MIN(event_type) AS event_type,
               MIN(us) AS valid_from_us,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM runs GROUP BY user_id, run_id
    )
    SELECT user_id, run_id, event_type, valid_from_us,
           lead(valid_from_us) OVER (
               PARTITION BY user_id ORDER BY run_id
           ) AS valid_to_us,
           n_events
    FROM agg
    """,
)


# ---------------------------------------------------------------------------
# one-scan column profiler (operators/profile.py::profile_columns)
# ---------------------------------------------------------------------------

_PROFILE_COLS = ["doc_id", "lang", "n_chars", "source"]


def _q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hbase_taggregator_spark.operators.profile import profile_columns

    docs = load_table(spark, sf_dir, "documents")
    return profile_columns(docs, _PROFILE_COLS)


_register(
    "profile_documents_columns",
    _q_profile,
    "\nUNION ALL\n".join(
        f"""
        SELECT '{c}' AS column_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT({c}) AS BIGINT) AS n_nonnull,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
               CAST(MIN({c}) AS VARCHAR) AS min_repr,
               CAST(MAX({c}) AS VARCHAR) AS max_repr
        FROM documents
        """
        for c in _PROFILE_COLS
    ),
)


# ---------------------------------------------------------------------------
# KMV distinct sketch (operators/sketch.py::kmv_distinct) — approximate
# count whose estimate is exact md5 algebra, so the oracle gates the
# ESTIMATE itself (unlike HLL++, which is rows-only by nature)
# ---------------------------------------------------------------------------

_KMV_K = 64


def _q_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hbase_taggregator_spark.operators.sketch import kmv_distinct

    events = load_table(spark, sf_dir, "events")
    return kmv_distinct(events, "user_id", k=_KMV_K)


_register(
    "sketch_kmv_distinct_users",
    _q_kmv,
    f"""
    WITH h AS (
        SELECT DISTINCT CAST(concat('0x', substr(md5(concat('kmv#',
                   CAST(user_id AS VARCHAR))), 1, 15)) AS BIGINT) AS h
        FROM events
    ), mins AS (
        SELECT h FROM h ORDER BY h LIMIT {_KMV_K}
    ), agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_tracked, MAX(h) AS kth_hash
        FROM mins
    )
    SELECT {_KMV_K} AS k, n_tracked, kth_hash,
           CASE WHEN n_tracked < {_KMV_K} THEN CAST(n_tracked AS DOUBLE)
                ELSE {float(_KMV_K - 1)!r}
                     / (CAST(kth_hash AS DOUBLE) / {float(2**60)!r})
           END AS estimate_distinct
    FROM agg
    """,
)


# ---------------------------------------------------------------------------
# approx_percentile accuracy gate — the approximate median must land
# within 1% of the exact interquartile spread; the oracle pins the
# PASS/FAIL verdict (recall-gate pattern: the approximation is checked,
# not reproduced)
# ---------------------------------------------------------------------------


def _q_pctl_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    g = events.groupBy("event_type").agg(
        F.expr("approx_percentile(value, 0.5, 10000)").alias("_apx"),
        F.expr("percentile(value, 0.5)").alias("_ext"),
        F.expr("percentile(value, 0.75) - percentile(value, 0.25)").alias(
            "_iqr"
        ),
    )
    return g.select(
        "event_type",
        (F.abs(F.col("_apx") - F.col("_ext")) <= F.col("_iqr") * 0.01).alias(
            "median_within_tol"
        ),
    ).orderBy("event_type")


_register(
    "percentile_approx_accuracy_gate",
    _q_pctl_gate,
    """
    SELECT event_type, TRUE AS median_within_tol
    FROM events GROUP BY event_type
    """,
)
