"""Round-3 late-wave catalog queries (registered AFTER the driver gate
window — evidence comes from tools/check_oracle.py + the judge's re-run).

Same conventions as :mod:`hbase_taggregator_spark.queries`: epoch-int
outputs, decimal-exact floating aggregates, deterministic tiebreaks, and
oracles that restate the identical algebra in portable SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from hbase_taggregator_spark.util import local_df
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
    ), q0 AS (
        SELECT event_type, bucket_start_us, s, n,
               CAST(s * 1000000 AS BIGINT) AS sq
        FROM b
    ), q AS (
        SELECT event_type, bucket_start_us,
               CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS x,
               (sq - (((sq % n) + n) % n)) // n AS xq
        FROM q0
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
        FROM events WHERE user_id IS NOT NULL
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


# ---------------------------------------------------------------------------
# hashing-trick features (operators/text.py::feature_hash_counts)
# ---------------------------------------------------------------------------


def _q_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hbase_taggregator_spark.operators.text import feature_hash_counts

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 10 == 0
    )
    return feature_hash_counts(docs, dim=64)


_register(
    "text_feature_hashing_64",
    _q_feature_hash,
    r"""
    WITH t AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        FROM documents WHERE doc_id % 10 = 0
    )
    SELECT doc_id,
           CAST(concat('0x', substr(md5(concat('fh#', tok)), 1, 15)) AS BIGINT)
               % 64 AS bucket,
           CAST(COUNT(*) AS BIGINT) AS tf
    FROM t WHERE tok <> ''
    GROUP BY 1, 2
    """,
)


# ---------------------------------------------------------------------------
# edit-distance entity resolution (operators/dedup.py::fuzzy_match_candidates)
# ---------------------------------------------------------------------------


def _q_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hbase_taggregator_spark.operators.dedup import fuzzy_match_candidates

    cust = load_table(spark, sf_dir, "customer")
    return fuzzy_match_candidates(
        cust, "c_name", "c_custkey", prefix_len=16, max_dist=1
    )


_register(
    "fuzzy_customer_name_candidates",
    _q_fuzzy,
    """
    WITH b0 AS (
        SELECT c_custkey AS id, c_name AS name,
               substr(c_name, 1, 16) AS blk
        FROM customer
    ), ok AS (
        SELECT blk FROM b0 GROUP BY 1
        HAVING COUNT(*) BETWEEN 2 AND 1000
    ), b AS (
        SELECT b0.* FROM b0 JOIN ok USING (blk)
    )
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(levenshtein(a.name, b.name) AS INTEGER) AS dist
    FROM b a JOIN b b ON a.blk = b.blk AND a.id < b.id
    WHERE levenshtein(a.name, b.name) <= 1
    """,
)


# ---------------------------------------------------------------------------
# Python UDTF via SQL LATERAL (functions/udtfs.py::SplitSentences)
# ---------------------------------------------------------------------------


def _q_udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hbase_taggregator_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 25 == 0
    )
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT s.doc_id, s.sent_idx, s.sentence
        FROM _udtf_docs d,
        LATERAL split_sentences(d.doc_id, d.text) s
        """
    )


_register(
    "udtf_sentence_split",
    _q_udtf_sentences,
    r"""
    WITH p AS (
        SELECT doc_id, string_split_regex(text, '\.\s+') AS parts
        FROM documents WHERE doc_id % 25 = 0
    ), u AS (
        SELECT doc_id,
               unnest(parts) AS sentence,
               generate_subscripts(parts, 1) AS sent_idx
        FROM p
    )
    SELECT doc_id, CAST(sent_idx AS INTEGER) AS sent_idx, sentence
    FROM u WHERE trim(sentence) <> ''
    """,
)


# ---------------------------------------------------------------------------
# CSV + JSON sink/source round-trip with content checksum
# ---------------------------------------------------------------------------


def _q_csv_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-format sink gate: write the corpus to CSV and JSON, read each
    back, and aggregate per (format, lang) — count, char total, and an
    md5-derived content checksum. Any quoting/escaping corruption in
    either codec path breaks the checksum against the parquet-sourced
    oracle."""
    import tempfile

    from hbase_taggregator_spark.sources.sinks import write_csv, write_json

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars", "text"
    )
    from hbase_taggregator_spark.operators.dedup import _hash60

    def agg(df: DataFrame, fmt: str) -> DataFrame:
        ck = _hash60(F.concat(F.lit("ck#"), F.col("text"))) % 1_000_003
        return df.groupBy("lang").agg(
            F.lit(fmt).alias("fmt"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.sum(ck).alias("text_checksum"),
        )

    with tempfile.TemporaryDirectory() as d:
        write_csv(docs, f"{d}/csv")
        write_json(docs, f"{d}/json")
        # reader options must MIRROR the writer's dialect (Spark default:
        # quote '"', escape '\\') — an asymmetric escape corrupts any text
        # containing a quote even though quote-free fixtures round-trip
        back_csv = (
            spark.read.schema(docs.schema)
            .option("header", True)
            .option("multiLine", True)
            .csv(f"{d}/csv")
        )
        back_json = spark.read.schema(docs.schema).json(f"{d}/json")
        out = agg(back_csv, "csv").unionByName(agg(back_json, "json"))
        res = local_df(spark, out.collect(), out.schema)
    return res.select(
        "lang", "fmt", "n_docs", "sum_chars", "text_checksum"
    ).orderBy("lang", "fmt")


_register(
    "sink_csv_json_roundtrip",
    _q_csv_json_roundtrip,
    """
    WITH a AS (
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
               CAST(SUM(CAST(concat('0x', substr(md5(concat('ck#', text)),
                        1, 15)) AS BIGINT) % 1000003) AS BIGINT)
                   AS text_checksum
        FROM documents GROUP BY 1
    )
    SELECT lang, fmt, n_docs, sum_chars, text_checksum
    FROM a CROSS JOIN (VALUES ('csv'), ('json')) AS f(fmt)
    """,
)


# ---------------------------------------------------------------------------
# interval × interval overlap join
# (operators/relational.py::interval_overlap_join): which SCD2 attribute
# regime was active during each activity session
# ---------------------------------------------------------------------------

from hbase_taggregator_spark.queries import T_MONTH  # noqa: E402

_OVL_GRID_US = 86_400 * US  # daily grid ~ median regime length


def _q_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hbase_taggregator_spark.operators.relational import (
        interval_overlap_join,
        scd2_from_events,
    )
    from hbase_taggregator_spark.operators.windows import session_agg

    events = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") % 20 == 0
    )
    regimes = (
        scd2_from_events(events)
        .select(
            "user_id",
            F.col("run_id").alias("a_id"),
            F.col("valid_from_us").alias("a_lo"),
            F.coalesce(F.col("valid_to_us"), F.lit(T_MONTH * US)).alias(
                "a_hi"
            ),
        )
    )
    sessions = session_agg(
        events, "ts", 21_600, ["user_id"], [F.count(F.lit(1)).alias("n")]
    ).select(
        "user_id",
        F.col("session_start_us").alias("b_id"),
        F.col("session_start_us").alias("b_lo"),
        F.col("session_end_us").alias("b_hi"),
    )
    return interval_overlap_join(
        regimes, sessions, ["user_id"], _OVL_GRID_US
    )


_register(
    "interval_overlap_regimes_sessions",
    _q_interval_overlap,
    f"""
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
    ), regimes AS (
        SELECT user_id, run_id AS a_id, MIN(us) AS a_lo,
               COALESCE(
                   lead(MIN(us)) OVER (
                       PARTITION BY user_id ORDER BY run_id),
                   {T_MONTH * US}) AS a_hi
        FROM runs GROUP BY user_id, run_id
    ), sm AS (
        SELECT user_id, us,
               CASE WHEN us - lag(us) OVER sw >= {21_600 * US}
                         OR lag(us) OVER sw IS NULL THEN 1 ELSE 0 END AS new_s
        FROM e
        WINDOW sw AS (PARTITION BY user_id ORDER BY us)
    ), sg AS (
        SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM sm
    ), sessions AS (
        SELECT user_id, MIN(us) AS b_id, MIN(us) AS b_lo,
               MAX(us) + {21_600 * US} AS b_hi
        FROM sg GROUP BY user_id, sid
    )
    SELECT r.user_id, r.a_id, s.b_id, r.a_lo, r.a_hi, s.b_lo, s.b_hi,
           LEAST(r.a_hi, s.b_hi) - GREATEST(r.a_lo, s.b_lo) AS overlap_us
    FROM regimes r JOIN sessions s
      ON r.user_id = s.user_id AND r.a_lo < s.b_hi AND s.b_lo < r.a_hi
    """,
)


# ---------------------------------------------------------------------------
# analytic-function breadth: ntile / percent_rank / cume_dist (exact
# rank-ratio doubles — single divisions, engine-portable)
# ---------------------------------------------------------------------------


def _q_rank_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") >= 45)
    w = W.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").asc(), F.col("p_partkey").asc()
    )
    return (
        part.select(
            "p_brand",
            "p_partkey",
            "p_retailprice",
            F.ntile(4).over(w).alias("price_quartile"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
            F.dense_rank().over(w).alias("drank"),
        )
        .orderBy("p_brand", "p_partkey")
    )


_register(
    "window_rank_functions_showcase",
    _q_rank_showcase,
    """
    SELECT p_brand, p_partkey, p_retailprice,
           CAST(ntile(4) OVER w AS INTEGER) AS price_quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume,
           CAST(dense_rank() OVER w AS INTEGER) AS drank
    FROM part
    WHERE p_size >= 45
    WINDOW w AS (PARTITION BY p_brand
                 ORDER BY p_retailprice ASC, p_partkey ASC)
    """,
)


# ---------------------------------------------------------------------------
# benchmark decontamination (operators/dedup.py::contamination_overlap)
# ---------------------------------------------------------------------------

from hbase_taggregator_spark.oracle_fragments import _SQL_SHINGLES5  # noqa: E402


def _q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hbase_taggregator_spark.operators.dedup import contamination_overlap

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 37 == 0)
    corpus = docs.filter(F.col("doc_id") % 37 != 0)
    return contamination_overlap(corpus, bench, n_shingle=5)


_register(
    "corpus_contamination_overlap",
    _q_contamination,
    f"""
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
        FROM documents
    ), sh AS (
        SELECT doc_id, {_SQL_SHINGLES5} AS shingles FROM t
    ), bench AS (
        SELECT DISTINCT CAST(concat('0x', substr(md5(concat('ct#', s)), 1, 15))
                   AS BIGINT) AS h
        FROM (SELECT unnest(shingles) AS s FROM sh WHERE doc_id % 37 = 0)
    ), corp AS (
        SELECT doc_id, CAST(concat('0x', substr(md5(concat('ct#', s)), 1, 15))
                   AS BIGINT) AS h
        FROM (SELECT doc_id, unnest(shingles) AS s FROM sh
              WHERE doc_id % 37 <> 0)
    ), hits AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_contaminated
        FROM corp WHERE h IN (SELECT h FROM bench) GROUP BY 1
    )
    SELECT sh.doc_id,
           CAST(len(shingles) AS BIGINT) AS n_shingles,
           COALESCE(n_contaminated, 0) AS n_contaminated,
           CASE WHEN len(shingles) > 0
                THEN CAST(COALESCE(n_contaminated, 0) AS DOUBLE)
                     / CAST(len(shingles) AS DOUBLE)
                ELSE 0.0 END AS contamination_ratio
    FROM sh LEFT JOIN hits ON sh.doc_id = hits.doc_id
    WHERE sh.doc_id % 37 <> 0
    """,
)


# ---------------------------------------------------------------------------
# rare-token quality ratio (operators/text.py::rare_token_ratio)
# ---------------------------------------------------------------------------


def _q_rare_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hbase_taggregator_spark.operators.text import rare_token_ratio

    docs = load_table(spark, sf_dir, "documents")
    return rare_token_ratio(docs, max_df=2)


_register(
    "text_rare_token_ratio",
    _q_rare_tokens,
    r"""
    WITH tk AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        FROM documents
    ), tk2 AS (
        SELECT * FROM tk WHERE tok <> ''
    ), dfq AS (
        SELECT tok, COUNT(DISTINCT doc_id) AS dfc FROM tk2 GROUP BY 1
    ), totals AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens
        FROM tk2 GROUP BY 1
    ), hits AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_rare
        FROM tk2 WHERE tok IN (SELECT tok FROM dfq WHERE dfc <= 2)
        GROUP BY 1
    )
    SELECT t.doc_id, n_tokens, COALESCE(n_rare, 0) AS n_rare,
           CAST(COALESCE(n_rare, 0) AS DOUBLE) / CAST(n_tokens AS DOUBLE)
               AS rare_ratio
    FROM totals t LEFT JOIN hits ON t.doc_id = hits.doc_id
    """,
)


# ---------------------------------------------------------------------------
# weekly cohort retention — the classic product-analytics matrix
# (cohort week × week offset → distinct active users); exact integer
# bucket algebra on the same t_min-aligned grid as the ts operators
# ---------------------------------------------------------------------------

_WEEK_US = 7 * 86_400 * US


def _q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    wk = F.expr(f"(unix_micros(ts) - {T0 * US}) div {_WEEK_US}")
    activity = events.select("user_id", wk.alias("week")).distinct()
    cohorts = activity.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        activity.join(cohorts, "user_id")
        .groupBy(
            "cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset")
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


_register(
    "cohort_weekly_retention",
    _q_cohort_retention,
    f"""
    WITH a AS (
        SELECT DISTINCT user_id,
               (epoch_us(ts) - {T0 * US}) // {_WEEK_US} AS week
        FROM events
    ), c AS (
        SELECT user_id, MIN(week) AS cohort_week FROM a GROUP BY 1
    )
    SELECT cohort_week, week - cohort_week AS week_offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM a JOIN c ON a.user_id = c.user_id
    GROUP BY 1, 2
    """,
)


# ---------------------------------------------------------------------------
# three-step ordered funnel (view → click → purchase, each within 24h,
# earliest-next-step semantics so the chain is deterministic and
# restatable) — extends the 2-step banded-semi-join funnel
# ---------------------------------------------------------------------------

_FUNNEL_BAND_US = 86_400 * US


def _q_funnel3(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.unix_micros("ts").alias("vt"), "event_id"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.unix_micros("ts").alias("ct")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.unix_micros("ts").alias("pt")
    )
    # earliest click within the band after each view
    stage2 = (
        views.join(
            clicks,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("ct") > F.col("vt"))
            & (F.col("ct") <= F.col("vt") + _FUNNEL_BAND_US),
        )
        .groupBy("user_id", "vt", "event_id")
        .agg(F.min("ct").alias("first_ct"))
    )
    stage3 = stage2.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("pt") > F.col("first_ct"))
        & (F.col("pt") <= F.col("first_ct") + _FUNNEL_BAND_US),
        "left_semi",
    )
    return (
        views.agg(F.count(F.lit(1)).alias("n_views"))
        .crossJoin(stage2.agg(F.count(F.lit(1)).alias("n_viewed_then_clicked")))
        .crossJoin(stage3.agg(F.count(F.lit(1)).alias("n_full_funnel")))
    )


_register(
    "funnel_three_step_ordered",
    _q_funnel3,
    f"""
    WITH v AS (
        SELECT user_id, epoch_us(ts) AS vt, event_id FROM events
        WHERE event_type = 'view'
    ), c AS (
        SELECT user_id AS c_user, epoch_us(ts) AS ct FROM events
        WHERE event_type = 'click'
    ), p AS (
        SELECT user_id AS p_user, epoch_us(ts) AS pt FROM events
        WHERE event_type = 'purchase'
    ), s2 AS (
        SELECT v.user_id, v.vt, v.event_id, MIN(c.ct) AS first_ct
        FROM v JOIN c ON v.user_id = c.c_user
              AND c.ct > v.vt AND c.ct <= v.vt + {_FUNNEL_BAND_US}
        GROUP BY 1, 2, 3
    ), s3 AS (
        SELECT * FROM s2 WHERE EXISTS (
            SELECT 1 FROM p WHERE p.p_user = s2.user_id
              AND p.pt > s2.first_ct AND p.pt <= s2.first_ct + {_FUNNEL_BAND_US})
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_views,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM s2) AS n_viewed_then_clicked,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM s3) AS n_full_funnel
    """,
)


# ---------------------------------------------------------------------------
# KMV set-operation estimates (operators/sketch.py::kmv_set_ops) —
# distinct union / Jaccard / intersection of click-users vs
# purchase-users, estimates bit-reproduced by the oracle
# ---------------------------------------------------------------------------

_KMVS_K = 256


def _q_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hbase_taggregator_spark.operators.sketch import kmv_set_ops

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    return kmv_set_ops(clicks, purchases, "user_id", k=_KMVS_K)


_register(
    "sketch_kmv_set_ops_users",
    _q_kmv_setops,
    f"""
    WITH ha AS (
        SELECT DISTINCT CAST(concat('0x', substr(md5(concat('kmv#',
                   CAST(user_id AS VARCHAR))), 1, 15)) AS BIGINT) AS h
        FROM events WHERE event_type = 'click' AND user_id IS NOT NULL
    ), hb AS (
        SELECT DISTINCT CAST(concat('0x', substr(md5(concat('kmv#',
                   CAST(user_id AS VARCHAR))), 1, 15)) AS BIGINT) AS h
        FROM events WHERE event_type = 'purchase' AND user_id IS NOT NULL
    ), u AS (
        SELECT DISTINCT h FROM (SELECT h FROM ha UNION ALL SELECT h FROM hb)
        ORDER BY h LIMIT {_KMVS_K}
    ), s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_tracked, MAX(h) AS kth_hash
        FROM u
    ), sh AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_shared FROM u
        WHERE h IN (SELECT h FROM ha) AND h IN (SELECT h FROM hb)
    )
    SELECT {_KMVS_K} AS k, n_tracked, n_shared,
           CASE WHEN n_tracked < {_KMVS_K} THEN CAST(n_tracked AS DOUBLE)
                ELSE {float(_KMVS_K - 1)!r}
                     / (CAST(kth_hash AS DOUBLE) / {float(2**60)!r})
           END AS est_union,
           CASE WHEN n_tracked = 0 THEN 0.0
                ELSE CAST(n_shared AS DOUBLE) / CAST(n_tracked AS DOUBLE)
           END AS est_jaccard,
           (CASE WHEN n_tracked < {_KMVS_K} THEN CAST(n_tracked AS DOUBLE)
                 ELSE {float(_KMVS_K - 1)!r}
                      / (CAST(kth_hash AS DOUBLE) / {float(2**60)!r})
            END) * (CASE WHEN n_tracked = 0 THEN 0.0
                         ELSE CAST(n_shared AS DOUBLE)
                              / CAST(n_tracked AS DOUBLE) END)
               AS est_intersection
    FROM s CROSS JOIN sh
    """,
)


# ---------------------------------------------------------------------------
# MAD robust outliers (operators/timeseries.py::mad_outliers) — discrete
# order-statistic medians, no interpolation formula to disagree on
# ---------------------------------------------------------------------------


def _q_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hbase_taggregator_spark.operators.timeseries import mad_outliers

    return mad_outliers(load_table(spark, sf_dir, "events"))


_register(
    "ts_mad_outliers_per_type",
    _q_mad,
    """
    WITH base AS (
        SELECT event_type, value AS v, event_id AS tb FROM events
    ), c AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM base GROUP BY 1
    ), med AS (
        SELECT event_type, v AS med FROM (
            SELECT event_type, v,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY v, tb) AS rn
            FROM base) r JOIN c USING (event_type)
        WHERE rn = (n + 1) // 2
    ), dev AS (
        SELECT base.event_type, v, tb, med, abs(v - med) AS d
        FROM base JOIN med ON base.event_type = med.event_type
    ), mad AS (
        SELECT event_type, d AS mad FROM (
            SELECT event_type, d,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY d, tb) AS rn
            FROM dev) r JOIN c USING (event_type)
        WHERE rn = (n + 1) // 2
    )
    SELECT dev.event_type, med, mad,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(SUM(CASE WHEN d > mad * 1.4826 * 3.0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM dev JOIN mad ON dev.event_type = mad.event_type
    GROUP BY 1, 2, 3
    """,
)


# ---------------------------------------------------------------------------
# seasonal-naive baseline error: |hourly mean - mean 24h earlier| per
# series — the forecast-evaluation primitive (is yesterday a good
# predictor?). Micro-quantized means (exact int64, as in the EWMA) so
# the mean absolute error is engine-exact.
# ---------------------------------------------------------------------------


def _q_seasonal_err(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(
        spark, sf_dir, "events", time_range=(T0 * US, T_WEEK * US)
    )
    lo, ival, day = T0 * US, 3600 * US, 86_400 * US
    b = (
        events.withColumn(
            "bucket_start_us",
            F.expr(f"{lo} + ((unix_micros(ts) - {lo}) div {ival}) * {ival}"),
        )
        .groupBy("event_type", "bucket_start_us")
        .agg(
            F.expr(
                "CAST(SUM(CAST(value AS DECIMAL(28,6))) * 1000000 AS BIGINT)"
            ).alias("_sq"),
            F.count(F.lit(1)).alias("_n"),
        )
        # explicit floor (as ewma_truncated): engine-exact on negatives too
        .select(
            "event_type",
            "bucket_start_us",
            F.expr("(_sq - (((_sq % _n) + _n) % _n)) div _n").alias("xq"),
        )
    )
    prev = b.select(
        "event_type",
        (F.col("bucket_start_us") + day).alias("bucket_start_us"),
        F.col("xq").alias("xq_prev"),
    )
    return (
        b.join(prev, ["event_type", "bucket_start_us"])
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            (
                F.sum(F.abs(F.col("xq") - F.col("xq_prev"))).cast("double")
                / (F.count(F.lit(1)).cast("double") * F.lit(1_000_000.0))
            ).alias("seasonal_mae"),
        )
        .orderBy("event_type")
    )


_register(
    "ts_seasonal_baseline_error",
    _q_seasonal_err,
    f"""
    WITH b0 AS (
        SELECT event_type,
               {T0 * US} + ((epoch_us(ts) - {T0 * US}) // {3600 * US})
                   * {3600 * US} AS bucket_start_us,
               CAST(SUM(CAST(value AS DECIMAL(28,6))) * 1000000 AS BIGINT)
                   AS sq,
               COUNT(*) AS n
        FROM events
        WHERE epoch_us(ts) >= {T0 * US} AND epoch_us(ts) < {T_WEEK * US}
        GROUP BY 1, 2
    ), b AS (
        SELECT event_type, bucket_start_us,
               (sq - (((sq % n) + n) % n)) // n AS xq
        FROM b0
    )
    SELECT a.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(CAST(SUM(abs(a.xq - p.xq)) AS BIGINT) AS DOUBLE)
               / (CAST(COUNT(*) AS DOUBLE) * 1000000.0) AS seasonal_mae
    FROM b a JOIN b p
      ON a.event_type = p.event_type
     AND p.bucket_start_us + {86_400 * US} = a.bucket_start_us
    GROUP BY 1
    """,
)


# ---------------------------------------------------------------------------
# grouped KMV distinct (operators/sketch.py::kmv_grouped_distinct) —
# per-event-type distinct-user estimates, each gated bit-for-bit
# ---------------------------------------------------------------------------


def _q_kmv_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hbase_taggregator_spark.operators.sketch import kmv_grouped_distinct

    ev = load_table(spark, sf_dir, "events")
    return kmv_grouped_distinct(ev, ["event_type"], "user_id", k=64)


_register(
    "sketch_kmv_grouped_distinct",
    _q_kmv_grouped,
    f"""
    WITH h AS (
        SELECT DISTINCT event_type,
               CAST(concat('0x', substr(md5(concat('kmv#',
                   CAST(user_id AS VARCHAR))), 1, 15)) AS BIGINT) AS h
        FROM events WHERE user_id IS NOT NULL
    ), r AS (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM h
    ), t AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_tracked,
               MAX(h) AS kth_hash
        FROM r WHERE rn <= 64 GROUP BY 1
    )
    SELECT event_type, 64 AS k, n_tracked, kth_hash,
           CASE WHEN n_tracked < 64 THEN CAST(n_tracked AS DOUBLE)
                ELSE {63.0!r} / (CAST(kth_hash AS DOUBLE) / {float(2**60)!r})
           END AS estimate_distinct
    FROM t
    """,
)


# ---------------------------------------------------------------------------
# snapshot diff (operators/relational.py::table_diff) — audit the MERGE
# from the merge_upsert gate: added = new keys, removed = tombstones,
# changed = balance updates
# ---------------------------------------------------------------------------


def _q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hbase_taggregator_spark.operators.relational import (
        merge_upsert,
        table_diff,
    )

    cust = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    upd = (
        cust.filter((k % 7 == 0) | (k % 13 == 0))
        .withColumn("c_acctbal", F.col("c_acctbal") + 1000)
        .withColumn("__del", k % 13 == 0)
    )
    new = (
        cust.filter(k % 97 == 0)
        .withColumn("c_custkey", k + 1000000)
        .withColumn("__del", F.lit(False))
    )
    merged = merge_upsert(
        cust, upd.unionByName(new), ["c_custkey"],
        delete_col="__del", broadcast_updates=True,
    )
    return table_diff(
        cust, merged, ["c_custkey"], ["c_name", "c_acctbal", "c_mktsegment"]
    )


_register(
    "table_diff_after_merge",
    _q_table_diff,
    """
    WITH merged AS (
        SELECT c_custkey, c_name, c_acctbal + 1000 AS c_acctbal, c_mktsegment
        FROM customer WHERE c_custkey % 7 = 0 AND c_custkey % 13 <> 0
        UNION ALL
        SELECT c_custkey + 1000000 AS c_custkey, c_name, c_acctbal,
               c_mktsegment
        FROM customer WHERE c_custkey % 97 = 0
        UNION ALL
        SELECT c_custkey, c_name, c_acctbal, c_mktsegment
        FROM customer
        WHERE c_custkey % 7 <> 0 AND c_custkey % 13 <> 0
    )
    SELECT diff_class, CAST(COUNT(*) AS BIGINT) AS n_keys FROM (
        SELECT CASE WHEN b.c_custkey IS NULL THEN 'added'
                    WHEN m.c_custkey IS NULL THEN 'removed'
                    WHEN b.c_acctbal <> m.c_acctbal OR b.c_name <> m.c_name
                         OR b.c_mktsegment <> m.c_mktsegment THEN 'changed'
                    ELSE 'unchanged' END AS diff_class
        FROM customer b FULL OUTER JOIN merged m
          ON b.c_custkey = m.c_custkey
    ) GROUP BY 1
    """,
)


# ---------------------------------------------------------------------------
# end-to-end entity resolution: prefix-blocked Levenshtein candidates →
# connected components → stable entity ids (min-id label). Composes
# fuzzy_match_candidates with duplicate_components; the oracle rebuilds
# the same candidates and closes them with a recursive CTE.
# ---------------------------------------------------------------------------


def _q_fuzzy_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hbase_taggregator_spark.operators.dedup import (
        duplicate_components,
        fuzzy_match_candidates,
    )

    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % 4 == 0
    )
    pairs = fuzzy_match_candidates(
        cust, "c_name", "c_custkey", prefix_len=16, max_dist=1
    )
    return duplicate_components(pairs).orderBy("node_id")


_register(
    "fuzzy_entity_resolution",
    _q_fuzzy_entities,
    """
    WITH RECURSIVE b0 AS (
        SELECT c_custkey AS id, c_name AS name,
               substr(c_name, 1, 16) AS blk
        FROM customer WHERE c_custkey % 4 = 0
    ), okb AS (
        SELECT blk FROM b0 GROUP BY 1
        HAVING COUNT(*) BETWEEN 2 AND 1000
    ), b AS (
        SELECT b0.* FROM b0 JOIN okb USING (blk)
    ), pairs AS (
        SELECT a.id AS id_a, b.id AS id_b
        FROM b a JOIN b b ON a.blk = b.blk AND a.id < b.id
        WHERE levenshtein(a.name, b.name) <= 1
    ), edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION SELECT id_b, id_a FROM pairs
    ), nodes AS (
        SELECT DISTINCT src AS id FROM edges
    ), reach(id, lbl) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT r.id, e.dst FROM reach r JOIN edges e ON e.src = r.lbl
    ), comp AS (
        SELECT id, MIN(lbl) AS component_id FROM reach GROUP BY id
    ), csize AS (
        SELECT component_id, CAST(COUNT(*) AS BIGINT) AS component_size
        FROM comp GROUP BY 1
    )
    SELECT id AS node_id, component_id, component_size
    FROM comp JOIN csize USING (component_id)
    """,
)


# ---------------------------------------------------------------------------
# month-over-month growth per segment — the BI staple (calendar grain +
# lag ratio). Decimal-exact monthly sums; the growth ratio is one double
# division of two exactly-computed values.
# ---------------------------------------------------------------------------


def _q_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    month = F.date_trunc("month", F.col("o_orderdate"))
    m = (
        orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.unix_micros(month).alias("month_us"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(28,6)")).alias("_rev")
        )
    )
    w = W.partitionBy("segment").orderBy("month_us")
    return (
        m.select(
            "segment",
            "month_us",
            F.col("_rev").cast("double").alias("revenue"),
            (
                F.col("_rev").cast("double")
                / F.lag(F.col("_rev").cast("double")).over(w)
            ).alias("mom_ratio"),
        )
        .orderBy("segment", "month_us")
    )


_register(
    "bi_mom_growth_per_segment",
    _q_mom_growth,
    """
    WITH m AS (
        SELECT c_mktsegment AS segment,
               epoch_us(date_trunc('month', o_orderdate)) AS month_us,
               SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS rev
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2
    )
    SELECT segment, month_us,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(rev AS DOUBLE) / lag(CAST(rev AS DOUBLE)) OVER (
               PARTITION BY segment ORDER BY month_us) AS mom_ratio
    FROM m
    """,
)


# ---------------------------------------------------------------------------
# Pareto concentration: how many customers cover 80% of revenue —
# cumulative-share window over exact decimal totals; the 0.8 compare
# happens on exact decimal fractions scaled to integers (no FP boundary)
# ---------------------------------------------------------------------------


def _q_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(28,6)")).alias("_rev")
    )
    w = W.orderBy(F.col("_rev").desc(), F.col("o_custkey").asc())
    total = per_cust.agg(F.sum("_rev").alias("_tot"))
    ranked = per_cust.withColumn(
        "cum", F.sum("_rev").over(w.rowsBetween(W.unboundedPreceding, 0))
    ).crossJoin(F.broadcast(total))
    # exact compare: cum/tot >= 0.8  <=>  5*cum >= 4*tot in decimals
    flagged = ranked.withColumn(
        "covered", F.col("cum") * 5 >= F.col("_tot") * 4
    )
    # customers strictly before the coverage point + the first covering
    # one. NOTE: the cumulative share is a global sorted prefix sum — a
    # single range-partitioned sort over per-customer TOTALS (cardinality
    # = customers, not orders), which is the irreducible cost of any
    # exact Pareto statement.
    n_before = flagged.filter(~F.col("covered")).count()
    n_custs = per_cust.count()
    return (
        total.select(
            F.lit(n_before + 1).alias("n_customers_for_80pct"),
            F.lit(n_custs).alias("n_customers_total"),
            (
                F.lit(float(n_before + 1)) / F.lit(float(n_custs))
            ).alias("pareto_share"),
            F.col("_tot").cast("double").alias("total_revenue"),
        )
    )


_register(
    "bi_pareto_customers_80pct",
    _q_pareto,
    """
    WITH pc AS (
        SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS rev
        FROM orders GROUP BY 1
    ), t AS (
        SELECT SUM(rev) AS tot FROM pc
    ), r AS (
        SELECT o_custkey, rev,
               SUM(rev) OVER (ORDER BY rev DESC, o_custkey ASC
                              ROWS UNBOUNDED PRECEDING) AS cum
        FROM pc
    )
    SELECT CAST((SELECT COUNT(*) FROM r, t WHERE cum * 5 < tot * 4) + 1
               AS BIGINT) AS n_customers_for_80pct,
           CAST((SELECT COUNT(*) FROM pc) AS BIGINT) AS n_customers_total,
           CAST(CAST((SELECT COUNT(*) FROM r, t WHERE cum * 5 < tot * 4) + 1
                    AS DOUBLE)
                / CAST((SELECT COUNT(*) FROM pc) AS DOUBLE) AS DOUBLE)
               AS pareto_share,
           CAST((SELECT tot FROM t) AS DOUBLE) AS total_revenue
    """,
)


# ---------------------------------------------------------------------------
# point-in-time feature lookup — the feature-store correctness primitive:
# each observation joins the feature row that was VALID at its timestamp
# (as-of backward on valid_from + residual valid_to check), never a
# future leak. Composes asof_join with the SCD2 history.
# ---------------------------------------------------------------------------


def _q_pit_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hbase_taggregator_spark.operators.asof import asof_join
    from hbase_taggregator_spark.operators.relational import scd2_from_events

    events = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") % 20 == 0
    )
    # open regimes sentinel-code their end: asof's column carry skips
    # NULLs, which would leak the PREVIOUS regime's valid_to into the
    # residual check (see asof_join's caveat)
    open_end = 1 << 62
    regimes = scd2_from_events(events).select(
        "user_id",
        F.col("event_type").alias("regime_type"),
        "valid_from_us",
        F.coalesce("valid_to_us", F.lit(open_end)).alias("valid_to_us"),
    )
    obs = events.filter(F.col("event_id") % 5 == 0).select(
        "user_id", "event_id", F.unix_micros("ts").alias("obs_us")
    )
    j = asof_join(
        obs,
        regimes.select("user_id", "regime_type", "valid_from_us", "valid_to_us"),
        ["user_id"],
        "obs_us",
        "valid_from_us",
        right_cols=["regime_type", "valid_to_us"],
        direction="backward",
    )
    # residual validity check: as-of gives the latest regime STARTED at or
    # before the observation; it must also not have ENDED (open regimes
    # have NULL valid_to)
    return (
        j.filter(
            F.col("valid_from_us_right").isNotNull()
            & (F.col("obs_us") < F.col("valid_to_us_right"))
        )
        .select(
            "user_id",
            "event_id",
            "obs_us",
            F.col("regime_type_right").alias("regime_type"),
            F.col("valid_from_us_right").alias("regime_from_us"),
        )
        .orderBy("user_id", "event_id")
    )


_register(
    "pit_feature_lookup_regimes",
    _q_pit_lookup,
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
        SELECT user_id, run_id, MIN(event_type) AS regime_type,
               MIN(us) AS valid_from_us
        FROM runs GROUP BY user_id, run_id
    ), regimes AS (
        SELECT user_id, run_id, regime_type, valid_from_us,
               lead(valid_from_us) OVER (
                   PARTITION BY user_id ORDER BY run_id) AS valid_to_us
        FROM agg
    ), obs AS (
        SELECT user_id, event_id, epoch_us(ts) AS obs_us FROM events
        WHERE user_id % 20 = 0 AND event_id % 5 = 0
    )
    SELECT o.user_id, o.event_id, o.obs_us,
           r.regime_type, r.valid_from_us AS regime_from_us
    FROM obs o JOIN regimes r
      ON o.user_id = r.user_id
     AND r.valid_from_us <= o.obs_us
     AND (r.valid_to_us IS NULL OR o.obs_us < r.valid_to_us)
    """,
)


# ---------------------------------------------------------------------------
# null-safe equality join (<=> / IS NOT DISTINCT FROM) — NULL keys match
# NULL keys, the semantics plain equi-joins silently drop
# ---------------------------------------------------------------------------


def _q_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    # nullable derived key: props.k bucketed, with one bucket mapped to
    # NULL so the null-safe semantics are exercised alongside real groups
    k = F.get_json_object("props", "$.k").cast("long")
    keyed = events.select(
        "event_id",
        F.when((k % 10) == 0, F.lit(None).cast("long"))
        .otherwise(k % 10)
        .alias("device"),
    )
    counts = keyed.groupBy("device").agg(F.count(F.lit(1)).alias("n_events"))
    firsts = keyed.groupBy("device").agg(F.min("event_id").alias("first_event"))
    return (
        counts.join(firsts, counts["device"].eqNullSafe(firsts["device"]))
        .select(counts["device"], "n_events", "first_event")
        .orderBy(F.col("device").asc_nulls_first())
    )


_register(
    "nullsafe_join_device_counts",
    _q_nullsafe,
    """
    WITH k AS (
        SELECT event_id,
               CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT)
                         % 10 = 0 THEN NULL
                    ELSE CAST(json_extract_string(props, '$.k') AS BIGINT)
                         % 10 END AS device
        FROM events
    ), c AS (
        SELECT device, CAST(COUNT(*) AS BIGINT) AS n_events
        FROM k GROUP BY device
    ), f AS (
        SELECT device, MIN(event_id) AS first_event FROM k GROUP BY device
    )
    SELECT c.device, n_events, first_event
    FROM c JOIN f ON c.device IS NOT DISTINCT FROM f.device
    """,
)


# ---------------------------------------------------------------------------
# multiset set ops (INTERSECT ALL / EXCEPT ALL) — duplicate-preserving
# bag semantics, distinct from the existing distinct-set query
# ---------------------------------------------------------------------------


def _q_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    views = ev.filter(F.col("event_type") == "view").select("user_id")
    inter = clicks.intersectAll(views).groupBy().agg(
        F.count(F.lit(1)).alias("n_intersect_all")
    )
    exc = clicks.exceptAll(views).groupBy().agg(
        F.count(F.lit(1)).alias("n_except_all")
    )
    return inter.crossJoin(exc)


_register(
    "setops_multiset_all_users",
    _q_multiset_ops,
    """
    WITH c AS (SELECT user_id FROM events WHERE event_type = 'click'),
         v AS (SELECT user_id FROM events WHERE event_type = 'view'),
         i AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_intersect_all FROM
                   (SELECT user_id FROM c INTERSECT ALL SELECT user_id FROM v)),
         e AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_except_all FROM
                   (SELECT user_id FROM c EXCEPT ALL SELECT user_id FROM v))
    SELECT n_intersect_all, n_except_all FROM i CROSS JOIN e
    """,
)


# re-apply the gate-window ordering now that every round-3 query is
# registered — tolerant, because on the direct
# `import hbase_taggregator_spark.queries_r3` path the round-4 module may
# not have registered yet; queries_r4's own end-of-module STRICT apply is
# the final authority once the whole catalog is in
from hbase_taggregator_spark.queries_ext import _apply_gate_window  # noqa: E402

_apply_gate_window(strict=False)
