"""Rowkey-mode parity: binary rowkey encode → decode round-trip and the
key-embedded-timestamp aggregation path (AggregationBuilder.java:84-120)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import BASE_S, golden_cells_py
from reference_sim import aggregate as ref_aggregate
from hbase_taggregator_spark import TimeseriesAggregator
from hbase_taggregator_spark.sources.rowkey import (
    encode_rowkey,
    rowkey_seconds,
    rowkey_timestamp,
)

#: the reference fixture's mask: 7 prefix bytes ("testRow") + 4 ts bytes
MASK = "00000001111"
PREFIX = b"testRow"
H = 3600


@pytest.fixture(scope="module")
def hbase_shaped(spark, golden_cells):
    """Golden fixture in the reference's physical layout: binary rowkey with
    embedded epoch seconds + qualifier second-offset column."""
    return golden_cells.select(
        encode_rowkey(PREFIX, F.col("row_ts_s").cast("long")).alias("rowkey"),
        "qualifier_offset_s",
        "value",
    )


def test_roundtrip(spark, hbase_shaped):
    got = hbase_shaped.select(
        rowkey_seconds("rowkey", MASK).alias("s"), "qualifier_offset_s"
    ).distinct()
    mn, mx = got.agg(F.min("s"), F.max("s")).first()
    assert mn == BASE_S and mx == BASE_S + 99 * H


def test_mask_mismatch_gives_zero(spark):
    """Key length ≠ mask length → timestamp 0 (AggregationBuilder.java:104-108)."""
    df = spark.createDataFrame([(b"short",)], "rowkey binary")
    assert df.select(rowkey_seconds("rowkey", MASK).alias("s")).first()["s"] == 0


def test_negative_seconds_signed_decode(spark):
    """Bytes.toInt is signed — int32 round-trip must preserve sign."""
    df = spark.createDataFrame([(-5,), (2**31 - 1,)], "s long")
    out = df.select(
        rowkey_seconds(encode_rowkey(b"pfx4567", F.col("s")), "00000001111").alias("d"),
        "s",
    ).collect()
    assert all(r["d"] == r["s"] for r in out)


def test_short_mask_span_decodes_high_order(spark):
    """A '1'-span shorter than 4 bytes lands in the HIGH-order positions of
    the int32 (Bytes.toInt on a 4-byte buffer filled from the top —
    AggregationBuilder.java:109-115), including the sign bit."""
    df = spark.createDataFrame(
        [(b"\x01\x02",), (b"\x80\x00",)], "rowkey binary"
    )
    got = sorted(
        r["s"] for r in df.select(rowkey_seconds("rowkey", "11").alias("s")).collect()
    )
    assert got == [-(2**31), 0x01020000]


def test_long_mask_span_raises(spark):
    """Spans > 4 bytes would throw in the reference (Bytes.toInt) — the
    engine rejects the layout at build time."""
    with pytest.raises(ValueError, match="span"):
        rowkey_seconds(F.col("rowkey"), "111110000")


def test_rowkey_mode_aggregation_matches_reference(spark, hbase_shaped):
    """Full key-mode pipeline: decode mask + qualifier offset → bucketed max,
    vs the reference simulator (testMaxWithValidRange shape)."""
    t_min, t_max = BASE_S, BASE_S + 2 * H
    q = (
        TimeseriesAggregator(spark)
        .table_from_rowkey(
            hbase_shaped, MASK, qualifier_col="qualifier_offset_s"
        )
        .range(t_min, t_max)
        .interval(900)
        .mode("taggregator")
    )
    got = q.to_map(q.max())
    exp = ref_aggregate(golden_cells_py(), "max", t_min, t_max, 900, "key")
    assert got == exp
