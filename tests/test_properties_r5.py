"""Property tests for the round-5-touched operators: the Spark algebra
must agree with independent pure-Python reimplementations (not with the
DuckDB oracle, which shares the SQL restatement's blind spots), under
randomized inputs.

Same economics as test_properties.py: Spark jobs dominate, so example
counts are small and breadth comes from randomizing the error-prone
dimensions (token collisions, near-threshold cosines, graph shapes).
"""

from __future__ import annotations

import hashlib
import math
import re

import pytest

try:
    from hypothesis import given, settings, strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from pyspark.sql import functions as F

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=6,
)


def _tokens(text: str) -> list[str]:
    t = text.strip().lower()
    return re.split(r"\s+", t) if t else [""]


def _shingles(text: str, n: int) -> list[str]:
    toks = _tokens(text)
    if len(toks) < n:
        return []
    seen, out = set(), []
    for i in range(len(toks) - n + 1):
        s = " ".join(toks[i : i + n])
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


def _minhash_py(text: str, n_shingle: int = 3, k: int = 16) -> list[int] | None:
    shs = _shingles(text, n_shingle)
    if not shs:
        return None
    sig = [None] * k
    for s in shs:
        m = hashlib.md5(f"mh#{s}".encode()).hexdigest()
        lo = int(m[0:15], 16)
        hi = int(m[15:30], 16) // 4
        for i in range(k):
            h = (lo + i * hi) % (1 << 60)
            if sig[i] is None or h < sig[i]:
                sig[i] = h
    return sig


@settings(max_examples=6, deadline=None)
@given(texts=docs_strategy)
def test_minhash_signatures_match_python(spark, texts):
    """The single-digest Kirsch-Mitzenmacher derivation, reimplemented
    from the docstring in plain Python, must reproduce Spark's signature
    table exactly — including the shingle-less-document drop."""
    from hbase_taggregator_spark.operators.dedup import minhash_signatures

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: [r[f"m{i}"] for i in range(16)]
        for r in minhash_signatures(df).collect()
    }
    want = {
        i: sig
        for i, t in enumerate(texts)
        if (sig := _minhash_py(t)) is not None
    }
    assert got == want


def _simhash_py(text: str) -> int | None:
    shs = _shingles(text, 2)
    if not shs:
        return None
    v0, v1 = [0] * 32, [0] * 32
    for s in shs:
        m = hashlib.md5(f"sh#{s}".encode()).hexdigest()
        h0, h1 = int(m[0:8], 16), int(m[8:16], 16)
        for b in range(32):
            v0[b] += 1 if (h0 >> b) & 1 else -1
            v1[b] += 1 if (h1 >> b) & 1 else -1
    sig = 0
    for b in range(32):
        if v0[b] > 0:
            sig |= 1 << b
        if b < 31 and v1[b] > 0:
            sig |= 1 << (32 + b)
    return sig


@settings(max_examples=6, deadline=None)
@given(texts=docs_strategy)
def test_simhash_signatures_match_python(spark, texts):
    from hbase_taggregator_spark.operators.dedup import simhash_table

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {r["doc_id"]: r["simhash"] for r in simhash_table(df).collect()}
    want = {
        i: sig
        for i, t in enumerate(texts)
        if (sig := _simhash_py(t)) is not None
    }
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    vecs=st.lists(
        st.lists(
            st.floats(
                min_value=-1.0, max_value=1.0, allow_nan=False, width=32
            ),
            min_size=4,
            max_size=4,
        ),
        min_size=2,
        max_size=5,
    ),
    threshold=st.sampled_from([0.0, 0.3, 0.7, 1.0]),
)
def test_cos_ge_equals_exact_filter(spark, vecs, threshold):
    """cos_ge (double prune + exact fallback) must select EXACTLY the
    rows the pure exact-decimal filter selects — including threshold 1.0,
    where identical vectors sit exactly ON the boundary and only the
    exact branch may decide."""
    from hbase_taggregator_spark.operators.similarity import (
        cos_ge,
        dot,
        with_norm,
    )

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    # plant an exact-tie pair: vector 100 is 0.5 * vector 0 (same
    # direction => cosine exactly 1.0 in both algebras)
    rows.append((100, [x * 0.5 for x in rows[0][1]]))
    df = with_norm(
        spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    ).filter(F.col("nrm") > 0)
    a = df.select(
        F.col("vec_id").alias("ia"),
        F.col("embedding").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = df.select(
        F.col("vec_id").alias("ib"),
        F.col("embedding").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    pairs = a.join(b, F.col("ia") < F.col("ib"))
    fast = {
        (r["ia"], r["ib"])
        for r in pairs.filter(
            cos_ge(F.col("va"), F.col("vb"), F.col("na"), F.col("nb"), threshold)
        ).collect()
    }
    exact = {
        (r["ia"], r["ib"])
        for r in pairs.filter(
            dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
            >= F.lit(threshold)
        ).collect()
    }
    assert fast == exact


@settings(max_examples=6, deadline=None)
@given(texts=docs_strategy)
def test_dedup_doc_segments_matches_python(spark, texts):
    from hbase_taggregator_spark.operators.text import dedup_doc_segments

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_segments"], r["n_removed"])
        for r in dedup_doc_segments(df, delimiter=" ").collect()
    }
    for i, t in enumerate(texts):
        segs = t.split(" ")
        seen, kept = set(), []
        for s in segs:
            if s not in seen:
                seen.add(s)
                kept.append(s)
        assert got[i] == (" ".join(kept), len(segs), len(segs) - len(kept))


@settings(max_examples=5, deadline=None)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=6),
            st.integers(min_value=1, max_value=6),
        ),
        min_size=1,
        max_size=10,
    ),
    n_iter=st.integers(min_value=1, max_value=3),
)
def test_pagerank_matches_python_power_iteration(spark, edges, n_iter):
    from hbase_taggregator_spark.operators.graph import pagerank

    df = spark.createDataFrame(list(set(edges)), "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, n_iter=n_iter).collect()}

    e = sorted(set(edges))
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    n = len(nodes)
    outdeg = {}
    for s, _ in e:
        outdeg[s] = outdeg.get(s, 0) + 1
    rank = {v: 1.0 / n for v in nodes}
    d = 0.85
    for _ in range(n_iter):
        incoming = {v: 0.0 for v in nodes}
        for s, t in e:
            incoming[t] += rank[s] / outdeg[s]
        rank = {v: (1.0 - d) / n + d * incoming[v] for v in nodes}
    assert set(got) == set(rank)
    for v in nodes:
        assert math.isclose(got[v], rank[v], rel_tol=0, abs_tol=1e-9), (
            v,
            got[v],
            rank[v],
        )
