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
    # internal aliases are index-based and column names enter only as
    # typed literals/Column refs — a name with spaces, quotes, or dots
    # must not be spliced into SQL text
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for i, c in enumerate(cols):
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{i}"),
            F.countDistinct(F.col(c)).alias(f"__nd_{i}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{i}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{i}"),
        ]
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"__nn_{i}").alias("n_nonnull"),
                F.col(f"__nd_{i}").alias("n_distinct"),
                F.col(f"__mn_{i}").alias("min_repr"),
                F.col(f"__mx_{i}").alias("max_repr"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return (
        one.select(F.col("__rows").alias("n_rows"), F.inline(rows))
        .select(
            "column_name", "n_rows", "n_nonnull", "n_distinct",
            "min_repr", "max_repr",
        )
        .orderBy("column_name")
    )


def parse_json_quarantine(
    df: DataFrame,
    json_col: str,
    schema: str,
    parsed_col: str = "parsed",
    flag_col: str = "quarantined",
) -> DataFrame:
    """Permissive semi-structured ingest with a quarantine lane — the
    malformed-record pattern every at-scale loader needs (Spark's own
    PERMISSIVE/_corrupt_record reader, expressed over an in-flight
    column). Rows whose JSON fails to parse against ``schema`` keep their
    raw payload and are flagged, never dropped silently; well-formed rows
    get the typed struct. Downstream splits on the flag: the good lane
    proceeds, the quarantine lane lands in an errors sink for replay.

    Map-side only (two JVM expressions); no shuffle, no Python. A
    quarantined row is one whose payload is non-null but not well-formed
    JSON — NULL payloads are absent data, not corruption, and stay
    unflagged. Well-formedness is probed with ``get_json_object($)``
    (null iff the document doesn't parse) because ``from_json``'s
    PERMISSIVE mode yields an all-null STRUCT for malformed input, which
    is indistinguishable from a valid document missing every field.

    "Well-formed" here means Spark-Jackson-LENIENT, not strict RFC 8259:
    Jackson stops at the first complete value, so trailing garbage after
    a valid document (``{"k":5}garbage``, ``{"k":5}}``) parses clean,
    while inputs a lenient reader rejects but some strict-recovery
    parsers accept (trailing commas, leading zeros) quarantine. DuckDB's
    ``json_valid`` draws the line differently on exactly those edges, so
    the oracle equivalence for this operator holds for truncation-style
    corruption (the fixture's) — the divergent inputs are pinned OUT of
    contract by ``tests/test_round5.py``
    (``test_json_quarantine_jackson_lenient_edges``).
    """
    parsed = F.from_json(F.col(json_col), schema)
    malformed = (
        F.col(json_col).isNotNull()
        & F.get_json_object(F.col(json_col), "$").isNull()
    )
    return df.withColumn(parsed_col, parsed).withColumn(flag_col, malformed)


def skew_report(
    df: DataFrame,
    key_cols: list[str],
    k: int = 10,
) -> DataFrame:
    """Hot-key skew report — the diagnostic every 100 TB shuffle decision
    starts from: before keying a join/aggregate on ``key_cols``, measure
    how concentrated the key distribution is. A top key holding 10% of a
    100 TB table means one 10 TB shuffle partition — the straggler the
    salted-join / AQE-skew machinery in this package exists for; this
    operator is how you find out BEFORE the job hangs.

    One partial/final count aggregate over the table, then a DISTRIBUTED
    top-k by count (``orderBy(...).limit(k)`` → TakeOrderedAndProject:
    per-partition heaps merged on the driver, never a single-partition
    global sort — with near-unique keys, exactly the population this
    diagnostic targets, the per-key count frame is table-sized and a bare
    rank window over it would make the diagnostic its own straggler); the
    rank window then runs over the ≤ k surviving rows only, with the
    total riding along as a broadcast 1-row frame. Output per top-k key:
    (rank, key, n_rows, share, ratio_to_avg) — ``ratio_to_avg`` is the
    skew factor (1.0 = perfectly uniform). Decision rule (wired to
    ``relational.salted_join`` in tests/test_round6.py): salt the join /
    aggregation on this key set when the top key's ``ratio_to_avg``
    exceeds ~10× — below that AQE's skew-join splitting absorbs the
    imbalance without paying salting's right-side replication. Shares
    are exact rationals cast to double, deterministic ties by key string.

    Composite-key encoding is injective: components are joined with
    ``|`` after escaping (``\\`` → ``\\\\``, ``|`` → ``\\|``) and NULL
    encodes as the unescaped sentinel ``\\N`` (unforgeable — an escaped
    component can never be the 2-char string ``\\N``), so ('a', NULL)
    never collides with ('a',) and values containing the separator never
    merge across columns.
    """
    from pyspark.sql.window import Window

    def enc(c: str):
        s = F.col(c).cast("string")
        esc = F.replace(
            F.replace(s, F.lit("\\"), F.lit("\\\\")), F.lit("|"), F.lit("\\|")
        )
        return F.when(s.isNull(), F.lit("\\N")).otherwise(esc)

    key = F.concat_ws("|", *[enc(c) for c in key_cols])
    counts = df.select(key.alias("key")).groupBy("key").agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    totals = counts.agg(
        F.sum("n_rows").alias("__total"),
        F.count(F.lit(1)).alias("__nkeys"),
    )
    top = counts.orderBy(F.desc("n_rows"), F.asc("key")).limit(k)
    w = Window.orderBy(F.desc("n_rows"), F.asc("key"))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .crossJoin(F.broadcast(totals))
        .select(
            "rank",
            "key",
            "n_rows",
            (F.col("n_rows").cast("double") / F.col("__total").cast("double"))
            .alias("share"),
            (
                F.col("n_rows").cast("double")
                / (
                    F.col("__total").cast("double")
                    / F.col("__nkeys").cast("double")
                )
            ).alias("ratio_to_avg"),
        )
        .orderBy("rank")
    )
