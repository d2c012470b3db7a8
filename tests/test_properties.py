"""Property-based tests (hypothesis): for arbitrary (interval, range)
parameters the engine must agree with the pure-Python reference simulator,
and per-bucket aggregate invariants must hold (SURVEY.md §5 strategy #3).

Spark jobs are slow, so the strategy space is kept small and example counts
low — breadth comes from randomizing bucket geometry (the error-prone part),
not data volume.
"""

from __future__ import annotations

import pytest

try:
    from hypothesis import given, settings, strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from conftest import BASE_S, golden_cells_py
from reference_sim import aggregate as ref_aggregate
from hbase_taggregator_spark import TimeseriesAggregator

H = 3600
CELLS = golden_cells_py()


@settings(max_examples=8, deadline=None)
@given(
    interval=st.sampled_from([36, 97, 900, 1800, 3600, 5400, 7200]),
    start_off=st.integers(min_value=-3, max_value=6),
    span_h=st.integers(min_value=1, max_value=30),
    verb=st.sampled_from(["max", "sum", "count"]),
    mode=st.sampled_from(["strict", "taggregator"]),
)
def test_engine_matches_simulator_for_arbitrary_geometry(
    spark, golden_cells, interval, start_off, span_h, verb, mode
):
    t_min = BASE_S + start_off * 1777  # deliberately unaligned starts
    t_max = t_min + span_h * H
    ref_mode = "key" if mode == "taggregator" else "scanner"
    expected = ref_aggregate(CELLS, verb, t_min, t_max, interval, ref_mode)

    q = (
        TimeseriesAggregator(spark)
        .table(golden_cells)
        .range(t_min, t_max)
        .interval(interval)
        .mode(mode)
    )
    got = q.to_map(getattr(q, verb)())
    assert got == expected


@settings(max_examples=3, deadline=None)
@given(
    data=st.lists(
        st.floats(allow_nan=False, width=64) | st.floats(width=64),
        min_size=16, max_size=64,
    )
)
def test_ieee_double_codec_is_bit_exact(spark, data):
    """The pure-expression IEEE-754 reinterpret (Bytes.toDouble analog)
    round-trips ARBITRARY doubles bit-exactly — incl. subnormals, ±0, ±inf,
    NaN (canonicalized like Double.doubleToLongBits) — verified against
    struct.pack on the driver."""
    import math
    import struct

    from pyspark.sql import functions as F

    from hbase_taggregator_spark.functions.decoders import (
        _bits_to_double,
        _double_to_bits,
    )

    df = spark.createDataFrame([(v,) for v in data], "v double")
    out = df.select(
        "v",
        _double_to_bits(F.col("v")).alias("b"),
        _bits_to_double(_double_to_bits(F.col("v"))).alias("rt"),
    ).collect()
    for r in out:
        expect = struct.unpack(">q", struct.pack(">d", r["v"]))[0]
        if math.isnan(r["v"]):
            expect = 0x7FF8000000000000
        if expect >= 1 << 63:
            expect -= 1 << 64
        assert r["b"] == expect, (r["v"], hex(r["b"]), hex(expect))
        if math.isnan(r["v"]):
            assert math.isnan(r["rt"])
        else:
            assert struct.pack(">d", r["rt"]) == struct.pack(">d", r["v"])


@settings(max_examples=4, deadline=None)
@given(
    interval=st.sampled_from([900, 2700, 7200]),
    span_h=st.integers(min_value=2, max_value=12),
)
def test_per_bucket_invariants(spark, golden_cells, interval, span_h):
    """min ≤ avg ≤ max and sum = avg·count, per bucket."""
    q = (
        TimeseriesAggregator(spark)
        .table(golden_cells)
        .range(BASE_S, BASE_S + span_h * H)
        .interval(interval)
    )
    rows = q.agg(min="mn", max="mx", avg="av", sum="sm", count="ct").collect()
    assert rows
    for r in rows:
        assert r["mn"] <= r["av"] <= r["mx"]
        assert r["sm"] == pytest.approx(r["av"] * r["ct"])
        assert r["ct"] > 0  # empty buckets must be absent
