"""Sinks (partitioned parquet round-trip, small-file control) and the
relational helpers not covered by the oracle gate."""

from __future__ import annotations

import glob
import os
import tempfile

from pyspark.sql import functions as F

from hbase_taggregator_spark.operators.relational import grouping_cube, latest_versions
from hbase_taggregator_spark.operators.timeseries import TimeseriesAggregator, fill_gaps
from hbase_taggregator_spark.sources.parquet import load_table
from hbase_taggregator_spark.sources.sinks import write_partitioned

SF = "/root/testdata/sf0.001"


def test_partitioned_write_roundtrip_and_file_control(spark):
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity"
    )
    with tempfile.TemporaryDirectory() as d:
        out = os.path.join(d, "li")
        write_partitioned(li, out, ["l_returnflag"], files_per_partition=1)
        # directory layout prunes by partition column
        dirs = sorted(os.path.basename(p) for p in glob.glob(f"{out}/l_returnflag=*"))
        assert dirs == ["l_returnflag=A", "l_returnflag=N", "l_returnflag=R"]
        # small-file control: exactly one data file per partition dir
        for p in glob.glob(f"{out}/l_returnflag=*"):
            assert len(glob.glob(f"{p}/*.parquet")) == 1
        back = spark.read.parquet(out)
        assert back.count() == li.count()
        # partition pruning reaches the scan
        pruned = back.filter(F.col("l_returnflag") == "A")
        assert pruned.count() == li.filter(F.col("l_returnflag") == "A").count()


def test_fill_gaps_semantics(spark):
    events = load_table(spark, SF, "events")
    t0, hi, ival = 1_704_067_200, 1_704_067_200 + 6 * 3600, 1800
    q = TimeseriesAggregator(spark).table(events).range(t0, hi).interval(ival)
    sparse = q.count("c")
    filled = fill_gaps(sparse, t0 * 10**6, hi * 10**6, ival * 10**6, fill={"c": 0})
    rows = filled.collect()
    assert len(rows) == 12  # every bucket present
    assert sparse.count() <= 12
    assert sum(r["c"] for r in rows) == sum(
        r["c"] for r in sparse.collect()
    )  # zero-fill adds no counts
    starts = [r["bucket_start_us"] for r in rows]
    assert starts == sorted(starts) and starts[0] == t0 * 10**6


def test_latest_versions_ties_and_n(spark):
    df = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 30, "c"), (2, 5, "d")],
        "k long, v long, payload string",
    )
    top2 = latest_versions(df, ["k"], "v", n=2).orderBy("k", F.desc("v")).collect()
    assert [(r["k"], r["payload"]) for r in top2] == [(1, "c"), (1, "b"), (2, "d")]


def test_cube_includes_all_grouping_sets(spark):
    orders = load_table(spark, SF, "orders")
    out = grouping_cube(
        orders, ["o_orderstatus"], F.count(F.lit(1)).alias("n")
    ).collect()
    labels = {r["o_orderstatus"] for r in out}
    assert "(all)" in labels and len(labels) >= 3
    total = next(r["n"] for r in out if r["o_orderstatus"] == "(all)")
    assert total == orders.count()


def test_table_diff_classifies_all_four(spark):
    from hbase_taggregator_spark.operators.relational import table_diff

    base = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", None), (3, "c", 3.0)],
        "k long, s string, v double",
    )
    rev = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (4, "d", 4.0)],
        "k long, s string, v double",
    )
    got = {r.diff_class: r.n_keys for r in table_diff(base, rev, ["k"], ["s", "v"]).collect()}
    # 1 unchanged, 2 changed (NULL -> 2.0: null-safe compare), 3 removed, 4 added
    assert got == {"added": 1, "removed": 1, "changed": 1, "unchanged": 1}


def test_csv_roundtrip_survives_quotes_and_newlines(spark):
    """The CSV sink/source dialect must round-trip hostile text (quotes,
    embedded newlines, commas) — the round-3 gate fixture has none, so
    this is the test that actually exercises escaping."""
    import tempfile

    from hbase_taggregator_spark.sources.sinks import write_csv

    rows = [
        (1, 'he said "hi" there'),
        (2, "line one\nline two"),
        (3, "comma, semi; quote\" mix"),
        (4, 'ends with quote"'),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    with tempfile.TemporaryDirectory() as d:
        write_csv(df, f"{d}/csv")
        back = (
            spark.read.schema(df.schema)
            .option("header", True)
            .option("multiLine", True)
            .csv(f"{d}/csv")
        )
        got = sorted((r.id, r.text) for r in back.collect())
    assert got == sorted(rows)


def test_table_diff_duplicate_keys_count_once(spark):
    from hbase_taggregator_spark.operators.relational import table_diff

    base = spark.createDataFrame(
        [(1, "x"), (1, "x"), (2, "y")], "k long, v string"
    )
    rev = spark.createDataFrame(
        [(1, "x"), (2, "y"), (2, "y")], "k long, v string"
    )
    got = {r.diff_class: r.n_keys for r in table_diff(base, rev, ["k"], ["v"]).collect()}
    # key 1: duplicate collapsed in rev -> multiset differs -> changed;
    # key 2: gained a duplicate -> changed; no phantom keys
    assert got == {"changed": 2}
