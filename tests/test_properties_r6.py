"""Property tests for the round-6-touched operators: Spark algebra vs
independent pure-Python reimplementations under randomized inputs
(same economics as test_properties.py — few examples, randomized over
the error-prone dimensions: separator/escape collisions, cap/residual
boundaries, graph shapes, series lengths around n_out)."""

from __future__ import annotations

import math

import pytest

try:
    from hypothesis import given, settings, strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from pyspark.sql import functions as F

# --- skew_report: injective encoding ---------------------------------------

key_part = st.one_of(
    st.none(),
    st.text(alphabet="ab|\\", min_size=0, max_size=4),
)


def _enc_py(parts: tuple[str | None, ...]) -> str:
    out = []
    for p in parts:
        if p is None:
            out.append("\\N")
        else:
            out.append(p.replace("\\", "\\\\").replace("|", "\\|"))
    return "|".join(out)


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(key_part, key_part), min_size=1, max_size=8))
def test_skew_key_encoding_is_injective_and_matches_python(spark, rows):
    """Two distinct key TUPLES must never encode to the same string, and
    the Spark encoding must byte-match the pure-Python restatement —
    adversarial alphabet of separators and escapes only."""
    from hbase_taggregator_spark.operators.profile import skew_report

    df = spark.createDataFrame(rows, "k1 string, k2 string")
    got = skew_report(df, ["k1", "k2"], k=100).collect()
    from collections import Counter

    want_counts = Counter(_enc_py(t) for t in rows)
    assert {r["key"]: r["n_rows"] for r in got} == dict(want_counts)
    # injectivity on this example set: distinct tuples -> distinct keys
    assert len(want_counts) == len(set(rows))


# --- source_mixing: budget discipline --------------------------------------


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=5),
    st.integers(min_value=1, max_value=120),
)
def test_source_mixing_budget_properties(spark, sizes, budget):
    """For any source-size vector and budget: targets never exceed caps,
    never exceed floor+1 of the fair share, and when no cap binds the
    budget is met EXACTLY (largest-remainder discipline); with caps the
    undershoot never exceeds the capped mass."""
    from hbase_taggregator_spark.operators.text import source_mixing

    rows = [(f"s{i:02d}",) for i, n in enumerate(sizes) for _ in range(n)]
    df = spark.createDataFrame(rows, "source string")
    out = {r["source"]: r for r in source_mixing(df, budget=budget).collect()}
    assert len(out) == len(sizes)

    weights = [math.sqrt(float(n)) for n in sizes]
    tw = sum(weights)  # decimal-pinned in-engine; close enough for bounds
    total_t = 0
    any_capped = False
    for i, n in enumerate(sizes):
        r = out[f"s{i:02d}"]
        share = budget * (weights[i] / tw)
        assert r["target_n"] <= n
        assert r["target_n"] <= math.floor(share) + 1
        total_t += r["target_n"]
        if math.floor(share) >= n:
            any_capped = True
    assert total_t <= budget
    if not any_capped:
        assert total_t == min(budget, sum(sizes))


# --- pagerank: conservation + dangling-mass invariants ---------------------


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),
            st.integers(min_value=0, max_value=5),
        ),
        min_size=1,
        max_size=10,
    )
)
def test_pagerank_matches_python_power_method(spark, edges):
    """Spark ranks equal a pure-Python power method on the same distinct
    edge set to 1e-9 (the decimal-pinned sum makes Spark deterministic;
    Python floats agree to rounding noise)."""
    from hbase_taggregator_spark.operators.graph import pagerank

    e = sorted(set(edges))
    df = spark.createDataFrame(e, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, n_iter=3).collect()}

    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    n = len(nodes)
    outdeg = {}
    for s, _ in e:
        outdeg[s] = outdeg.get(s, 0) + 1
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(3):
        incoming = {v: 0.0 for v in nodes}
        for s, d in e:
            incoming[d] += rank[s] / outdeg[s]
        rank = {v: 0.15 / n + 0.85 * incoming[v] for v in nodes}
    assert set(got) == set(nodes)
    for v in nodes:
        assert got[v] == pytest.approx(rank[v], abs=1e-9)


# --- lttb: reference-implementation properties -----------------------------


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),
            st.floats(
                min_value=-1000, max_value=1000, allow_nan=False, width=32
            ),
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda p: p[0],
    ),
    st.integers(min_value=3, max_value=20),
)
def test_lttb_spark_equals_reference_on_random_series(spark, pts, n_out):
    """Random single-series inputs: the Spark grouped-map pick equals the
    pinned pure-Python reference exactly (both operate on identical
    integer-cent math)."""
    from reference_sim import lttb_reference

    from hbase_taggregator_spark.operators.timeseries import lttb_downsample

    rows = [
        ("s", i, ts * 1_000_000, round(v, 2))
        for i, (ts, v) in enumerate(pts)
    ]
    df = spark.createDataFrame(
        rows, "event_type string, event_id long, us long, value double"
    ).select(
        "event_type",
        "event_id",
        F.timestamp_micros(F.col("us")).alias("ts"),
        "value",
    )
    got = sorted(
        (r["ts_us"], r["value"], r["event_id"])
        for r in lttb_downsample(df, n_out=n_out).collect()
    )
    want = sorted(
        lttb_reference(
            [(us, v, i) for (_, i, us, v) in rows], n_out
        )
    )
    assert got == want


# --- hbase fixture pivot: latest version wins under random version sets ----


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),   # rowkey index
            st.integers(min_value=1, max_value=50),  # cell_ts (version)
            st.integers(min_value=-100, max_value=100),  # value
        ),
        min_size=1,
        max_size=12,
    )
)
def test_hbase_fixture_pivot_latest_version_wins_random(spark, cells):
    """Random multi-version cell sets: the pivot must reproduce the
    newest-version-wins read per rowkey (ties on cell_ts break by the
    larger value bytes — the operator's documented max(struct) rule)."""
    from hbase_taggregator_spark.sources.hbase import (
        hbase_catalog,
        load_hbase_fixture,
    )

    rows = [
        (bytes([k]), "d", "v", (1000 + v).to_bytes(8, "big"), ts)
        for k, ts, v in cells
    ]
    df = spark.createDataFrame(
        rows, "rowkey binary, cf string, qualifier string, value binary, cell_ts long"
    )
    catalog = hbase_catalog(
        "t", {"rowkey": ("rowkey", "key", "binary"), "value": ("d", "v", "bigint")}
    )
    got = {
        bytes(r["rowkey"])[0]: r["value"]
        for r in load_hbase_fixture(spark, catalog, df).collect()
    }
    want = {}
    for k, ts, v in cells:
        cur = want.get(k)
        # max(struct(cell_ts, value-bytes)): ties by value bytes = by
        # shifted integer since all values share sign/offset encoding
        if cur is None or (ts, v) > cur:
            want[k] = (ts, v)
    assert got == {k: 1000 + v for k, (ts, v) in want.items()}
