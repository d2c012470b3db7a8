"""Round-14 regression tests (r13 ADVICE guards on the standing-index
append contract):

- ``_ivf_sidecar_or_none`` maps ONLY the path-not-found condition to
  'representation absent'; a sidecar that EXISTS but fails to read
  (empty dir from a crashed write, wrong columns) re-raises — a plain
  append against a binary/PQ index whose sidecar is corrupt must NOT
  pass validation and write rows lacking word/code columns.
- an append with binary/pq=True against a path holding NO index at all
  raises the dedicated 'no standing index' error, not the misleading
  representation-mismatch message; a plain append to a fresh path keeps
  working as a first build (parquet append semantics).

Plus the round's residual-IVFADC pins (VERDICT r13 #2): the residual
flag routes a different encode with the same output contract; the
cell-mean reference follows the decimal contract; the persisted
pq_residual=True layout serves row-identical to in-memory (with and
without rerank) and appends encode against the STORED means/books;
and the clustered-fixture regime demonstration — residual codes must
substantially outrank raw codes where the coarse quantizer explains
the variance (tools/bench_pq_residual_clustered_r14.py at test size).
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def _cents(emb, n=16):
    return emb.orderBy("vec_id").limit(n).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cvec")
    )


def test_corrupt_sidecar_fails_append_validation(spark, tmp_path):
    """An empty _thresholds dir (the residue of a crashed sidecar
    write) must fail the append validation loudly — the old blanket
    AnalysisException->None mapping read it as 'representation absent',
    so a plain append PASSED and wrote rows whose words read back NULL
    and silently vanished from Hamming candidates."""
    from hbase_taggregator_spark.operators import similarity as S
    from pyspark.errors import AnalysisException

    emb = _emb(spark)
    a = emb.filter(F.col("vec_id") < 300)
    b = emb.filter(F.col("vec_id") >= 300)
    path = str(tmp_path / "ivf")
    S.write_ivf_index(a, _cents(emb), path, binary=True)
    # simulate the crashed sidecar write: directory present, no files
    shutil.rmtree(f"{path}/_thresholds")
    os.makedirs(f"{path}/_thresholds")
    with pytest.raises(AnalysisException):
        S.write_ivf_index(b, _cents(emb), path, mode="append")
    with pytest.raises(AnalysisException):
        S.write_ivf_index(b, _cents(emb), path, binary=True, mode="append")
    # a sidecar with the WRONG columns is corruption too, not absence
    spark.range(3).write.mode("overwrite").parquet(f"{path}/_thresholds")
    with pytest.raises(AnalysisException):
        S.write_ivf_index(b, _cents(emb), path, mode="append")


def test_bootstrap_append_raises_dedicated_error(spark, tmp_path):
    """binary/pq append against a path with no index at all must say
    'no standing index', not 'does not match the standing index
    (sidecar absent)' — the bootstrap misuse is a missing build, not a
    codebook conflict."""
    from hbase_taggregator_spark.operators import similarity as S

    emb = _emb(spark)
    b = emb.filter(F.col("vec_id") < 100)
    path = str(tmp_path / "nothing_here")
    with pytest.raises(ValueError, match="no standing index"):
        S.write_ivf_index(b, _cents(emb), path, binary=True, mode="append")
    with pytest.raises(ValueError, match="no standing index"):
        S.write_ivf_index(b, _cents(emb), path, pq=True, mode="append")
    assert not os.path.exists(path)  # rejected appends write nothing
    # a PLAIN append to a fresh path keeps its parquet first-build
    # semantics (no sidecar contract to violate)
    S.write_ivf_index(b, _cents(emb), path, mode="append")
    assert S.read_ivf_index(spark, path).count() == b.count()


# --- residual IVFADC (r13 VERDICT #2) ----------------------------------------


def test_ivf_pq_residual_routes_and_schemas(spark):
    """residual=True must actually change the fine codes (cell-mean
    residual encode, per-(query, cell) LUTs) while keeping the output
    contract: (query_id, vec_id, adc_dist) ascending top-k, (query_id,
    vec_id, d2) under rerank_k. Row-level correctness is hash-pinned by
    the similarity_ivf_pq_residual_recall_at_5 oracle gate."""
    from hbase_taggregator_spark.operators import similarity as S

    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 5)
    raw = S.ivf_pq_topk(emb, q, k=5, refine_iters=1)
    res = S.ivf_pq_topk(emb, q, k=5, refine_iters=1, residual=True)
    assert raw.columns == res.columns == ["query_id", "vec_id", "adc_dist"]
    rows_raw = sorted((r["query_id"], r["vec_id"]) for r in raw.collect())
    rows_res = sorted((r["query_id"], r["vec_id"]) for r in res.collect())
    assert len(rows_raw) == len(rows_res) == 25
    assert rows_raw != rows_res  # the flag routes a different encode
    rr = S.ivf_pq_topk(emb, q, k=5, refine_iters=1, residual=True,
                       rerank_k=10)
    assert rr.columns == ["query_id", "vec_id", "d2"]
    assert rr.count() == 25
    # the residual reference is the decimal-contract cell mean
    cents = _cents(emb)
    assigned = S.ivf_assign(emb, cents, n_probe=1)
    means = S._cell_mean_centroids(assigned, "embedding")
    got = {r["cent_id"]: r["cvec"] for r in means.collect()}
    one = assigned.filter(F.col("cent_id") == list(got)[0])
    member_rows = one.select("embedding").collect()
    import decimal
    comp0 = sum(
        decimal.Decimal(repr(float(r["embedding"][0]))).quantize(
            decimal.Decimal("1e-12"), rounding=decimal.ROUND_HALF_UP
        )
        for r in member_rows
    )
    want0 = float(comp0) / len(member_rows)
    assert abs(got[list(got)[0]][0] - want0) < 1e-9


def test_residual_index_roundtrip_pins_in_memory(spark, tmp_path):
    """The persisted pq_residual=True layout must serve row-identical
    results to the in-memory residual stack (same corpus/centroids:
    same assignment, same cell means, same residual books through the
    parquet round-trip), with and without the +R rerank; appended rows
    must encode against the STORED means + books (never re-trained on
    the batch); representation-set mismatches raise."""
    from hbase_taggregator_spark.operators import similarity as S

    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 10)
    path = str(tmp_path / "rix")
    S.write_ivf_index(emb, _cents(emb), path, pq=True, pq_residual=True,
                      pq_refine_iters=1)
    idx = S.read_ivf_index(spark, path)
    books = S.read_ivf_codebooks(spark, path)
    means = S.read_ivf_cell_means(spark, path)

    def _r(df):
        return sorted(tuple(r) for r in df.collect())

    served = S.ivf_pq_topk_indexed(idx, q, _cents(emb), books, k=5,
                                   n_probe=4, residual_means=means)
    mem = S.ivf_pq_topk(emb, q, k=5, n_probe=4, refine_iters=1,
                        residual=True)
    assert _r(served) == _r(mem)
    sr = S.ivf_pq_topk_indexed(idx, q, _cents(emb), books, k=5, n_probe=4,
                               residual_means=means, rerank_k=20)
    mr = S.ivf_pq_topk(emb, q, k=5, n_probe=4, refine_iters=1,
                       residual=True, rerank_k=20)
    assert _r(sr) == _r(mr)

    # append: batch codes must be the stored-frame encode, byte-equal
    # to encoding the batch residuals against the STORED means + books
    batch = emb.filter(F.col("vec_id") >= 450)
    S.write_ivf_index(batch, _cents(emb), path, pq=True, pq_residual=True,
                      mode="append")
    idx2 = S.read_ivf_index(spark, path).filter(F.col("vec_id") >= 450)
    assigned = S.ivf_assign(batch, _cents(emb), n_probe=1)
    want = S.pq_encode(
        S._ivf_residuals(assigned, means, "embedding").select(
            "vec_id", F.col("__rvec").alias("embedding")
        ),
        books, 4,
    )
    cols = ["vec_id"] + [f"code_{s}" for s in range(4)]
    # the batch re-appends ids the build already holds: both copies
    # must carry IDENTICAL codes (same stored frame), so compare sets
    got_rows = _rows_of(idx2, *cols)
    assert len(got_rows) == 100  # 50 originals + 50 appended
    assert sorted(set(got_rows)) == _rows_of(want, *cols)
    # sidecars untouched by the append
    assert S.read_ivf_codebooks(spark, path) == books
    assert _rows_of(S.read_ivf_cell_means(spark, path), "cent_id") == \
        _rows_of(means, "cent_id")

    # representation mismatches raise before any write
    n0 = S.read_ivf_index(spark, path).count()
    with pytest.raises(ValueError, match="does not match the standing"):
        S.write_ivf_index(batch, _cents(emb), path, pq=True, mode="append")
    with pytest.raises(ValueError, match="pq_residual=True requires"):
        S.write_ivf_index(batch, _cents(emb), path, pq_residual=True,
                          mode="append")
    assert S.read_ivf_index(spark, path).count() == n0


def _rows_of(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_residual_beats_raw_on_clustered_fixture(spark):
    """The regime demonstration behind residual coding (the flat
    testdata corpus can't show it — its cells explain only ~6-9% of
    variance): on a deterministic 16-cluster fixture (centers
    sin((c+1)(i+1)), members + 0.05·sin-noise — the
    tools/bench_pq_residual_clustered_r14.py construction at reduced
    size) the coarse quantizer explains ~99% of energy, raw codes
    waste their resolution re-describing the shared center, and
    residual codes must SUBSTANTIALLY outrank them. Fully
    deterministic (no RNG anywhere in fixture or pipeline), so the
    pinned margin is stable."""
    from hbase_taggregator_spark.operators import similarity as S

    n, dim, nlist = 800, 64, 16
    c = (F.col("id") % nlist + 1).cast("double")
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (
            F.sin(c * (i + 1))
            + 0.05 * F.sin((F.col("id") + 1) * (i + 1) * 7.13)
        ).cast("double"),
    )
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"), vec.alias("embedding")
    )
    q = emb.filter(F.col("vec_id") < 10)
    exact = {(r["query_id"], r["vec_id"])
             for r in S.l2_topk(emb, q, k=5).collect()}

    def rec(df):
        got = {(r["query_id"], r["vec_id"])
               for r in df.select("query_id", "vec_id").collect()}
        return len(got & exact) / len(exact)

    kw = dict(k=5, m=4, n_codes=16, n_centroids=16, n_probe=4,
              refine_iters=1)
    raw = rec(S.ivf_pq_topk(emb, q, **kw))
    res = rec(S.ivf_pq_topk(emb, q, residual=True, **kw))
    # measured 0.08 / 0.56 on this box; F.sin is java.lang.Math.sin,
    # whose last ulp may differ across JVMs/architectures and flip a
    # near-tie at the rank-5 boundary, so pin the SEPARATION (what the
    # test exists for) plus loose bands, not exact point values
    assert raw <= 0.3 and res >= 0.4
    assert res > raw + 0.2  # the regime separation itself


def test_residual_append_to_unpopulated_cell_raises(spark, tmp_path):
    """(r14 review) A batch row assigned to a cell the build never
    populated has no stored mean: the residual join used to silently
    DROP it from the written frame (the rows-vanish failure class the
    before-write validation exists to block). It must raise, and the
    standing index must be untouched."""
    from hbase_taggregator_spark.operators import similarity as S

    emb = _emb(spark)
    # centroids include vec_id 0 and 1; the build corpus is chosen so
    # every row assigns to SOME cell but at least one cell that the
    # append batch hits is empty in the build: use 2 centroids and a
    # build set of copies of centroid 0's region only
    cents = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cvec")
    )
    assigned = S.ivf_assign(emb, cents, n_probe=1)
    cell0 = assigned.filter(F.col("cent_id") == 0).select(
        "vec_id", "embedding"
    )
    cell1 = assigned.filter(F.col("cent_id") == 1).select(
        "vec_id", "embedding"
    )
    assert cell0.count() > 16 and cell1.count() > 0
    path = str(tmp_path / "orphan")
    S.write_ivf_index(cell0, cents, path, pq=True, pq_residual=True,
                      pq_refine_iters=0)
    n0 = S.read_ivf_index(spark, path).count()
    batch = cell1.limit(1)
    with pytest.raises(ValueError, match="no stored _cell_means entry"):
        S.write_ivf_index(batch, cents, path, pq=True, pq_residual=True,
                          mode="append")
    assert S.read_ivf_index(spark, path).count() == n0  # untouched
