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


@settings(max_examples=5, deadline=None)
@given(
    intervals=st.lists(
        st.tuples(st.integers(0, 40), st.integers(1, 25)),  # (lo, length)
        min_size=1, max_size=8,
    ),
    grid=st.sampled_from([1, 3, 7, 10]),
)
def test_interval_overlap_matches_bruteforce(spark, intervals, grid):
    """The grid-bucketed overlap join must equal the O(n²) definition for
    arbitrary interval sets and grid sizes (the ceiling arithmetic is the
    error-prone part — a prior draft dropped top-partial-bucket pairs)."""
    from hbase_taggregator_spark.operators.relational import interval_overlap_join

    a_rows = [(1, i, lo, lo + ln) for i, (lo, ln) in enumerate(intervals)]
    b_rows = [(1, 100 + i, lo + 2, lo + 2 + ln) for i, (lo, ln) in enumerate(intervals)]
    a = spark.createDataFrame(a_rows, "k long, a_id long, a_lo long, a_hi long")
    b = spark.createDataFrame(b_rows, "k long, b_id long, b_lo long, b_hi long")
    got = sorted(
        (r.a_id, r.b_id)
        for r in interval_overlap_join(a, b, ["k"], grid).collect()
    )
    want = sorted(
        (ai, bi)
        for (_, ai, alo, ahi) in a_rows
        for (_, bi, blo, bhi) in b_rows
        if alo < bhi and blo < ahi
    )
    assert got == want


@settings(max_examples=5, deadline=None)
@given(
    seq=st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=20),
)
def test_scd2_runs_match_bruteforce(spark, seq):
    """SCD2 run collapse must equal the obvious linear fold for any
    attribute sequence."""
    from hbase_taggregator_spark.operators.relational import scd2_from_events

    base = 1_700_000_000_000_000
    rows = [(i, None, 1, s, 1.0) for i, s in enumerate(seq)]
    import datetime as dt

    df = spark.createDataFrame(
        [
            (i, dt.datetime.utcfromtimestamp((base + i * 1_000_000) / 1e6), 1, s, v)
            for i, _, _, s, v in rows
            for v in [1.0]
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    got = [
        (r.event_type, r.n_events)
        for r in scd2_from_events(df).orderBy("run_id").collect()
    ]
    want = []
    for s in seq:
        if want and want[-1][0] == s:
            want[-1] = (s, want[-1][1] + 1)
        else:
            want.append((s, 1))
    assert got == want
