"""Round-12 regression tests (VERDICT r11 "Next round" + r11 ADVICE):

- r11 ADVICE guards: ``binary_hamming_radius_pairs`` raises on an
  unknown threshold string (no silent zero-codebook fallthrough);
  ``binary_hamming_topk(index="banded")`` raises the contract error on
  band widths that don't divide the packed word (no ZeroDivisionError /
  unresolvable-column crash); ``read_ivf_index`` returns ``cent_id`` at
  the written BIGINT type, not parquet's re-inferred INT.
- the ``binary=True`` persisted IVF index stores the packed words and
  the thresholds sidecar (hidden from the main read), and
  ``ivf_binary_topk_indexed`` is row-identical to the in-memory
  composed stack — with the first pass DYNAMIC-PARTITION-PRUNED and
  COLUMN-PRUNED (no float payload in its ReadSchema), and the re-rank
  scan pruned to the same probed cells via the (cent_id, id) join.
"""

from __future__ import annotations

import os
import re

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _cents(emb, n=16):
    return emb.orderBy("vec_id").limit(n).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cvec")
    )


# --- r11 ADVICE guards -------------------------------------------------------


def test_radius_pairs_rejects_unknown_threshold(spark):
    """A typo like threshold='means' must raise, not silently quantize
    against the zero codebook (binary_hamming_topk already raised;
    radius_pairs and dedup_survivors now share the guard)."""
    from hbase_taggregator_spark.operators import similarity as S

    emb = _emb(spark)
    with pytest.raises(ValueError, match="unknown binary threshold"):
        S.binary_hamming_radius_pairs(emb, radius=3, threshold="means")
    with pytest.raises(ValueError, match="unknown binary threshold"):
        S.binary_dedup_survivors(emb, radius=3, threshold="MEAN")
    # explicit thresholds bypass the mode string entirely — still valid
    thr = [0.0] * 64
    assert (
        S.binary_hamming_radius_pairs(
            emb, radius=3, threshold="whatever", thresholds=thr
        ).columns
        == ["id_a", "id_b", "hamming"]
    )


def test_banded_topk_rejects_invalid_band_widths(spark):
    """index='banded' validates band_bits against the same candidate
    set as _resolve_band_bits: 64 (> word) would divide by zero in
    _explode_bands, 24 (non-divisor of 32) would map bands past the
    last packed word — both must raise the contract error instead."""
    from hbase_taggregator_spark.operators import similarity as S

    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 2)
    for bad in (64, 24):
        with pytest.raises(ValueError, match="must divide"):
            S.binary_hamming_topk(emb, q, index="banded", band_bits=bad)
    # 8 divides both 64 and 32: valid even though 8 bands guarantee
    # only radius 7 — the verified fallback keeps the result exact
    scan = S.binary_hamming_topk(emb, q, k=3, index="scan")
    banded = S.binary_hamming_topk(emb, q, k=3, index="banded", band_bits=8)
    cols = scan.columns
    assert _rows(banded, *cols) == _rows(scan, *cols)


def test_read_ivf_index_schema_matches_written(spark, tmp_path):
    """Partition-column type inference would hand back cent_id as INT;
    the reader re-casts to the written BIGINT so the round-trip schema
    is identical to what write_ivf_index wrote (r11 ADVICE)."""
    from hbase_taggregator_spark.operators import similarity as S

    emb = _emb(spark)
    path = str(tmp_path / "ivf")
    S.write_ivf_index(emb, _cents(emb), path)
    idx = S.read_ivf_index(spark, path)
    assert dict(idx.dtypes)["cent_id"] == "bigint"
    # ...and the cast does not defeat dynamic partition pruning
    q = emb.filter(F.col("vec_id") < 3)
    plan = (
        S.ivf_topk_indexed(idx, q, _cents(emb), k=3, n_probe=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "dynamicpruning" in plan


# --- binary=True persisted IVF index + indexed composed stack ----------------


def test_binary_index_layout_and_sidecar(spark, tmp_path):
    """binary=True stores the packed words next to each row and the
    thresholds under _thresholds — hidden from the main read (the
    underscore convention) but exact on read-back."""
    from hbase_taggregator_spark.operators import similarity as S

    emb = _emb(spark)
    path = str(tmp_path / "ivf")
    S.write_ivf_index(emb, _cents(emb), path, binary=True)
    idx = S.read_ivf_index(spark, path)
    assert set(idx.columns) == {
        "vec_id", "embedding", "nrm", "w0", "w1", "cent_id"
    }
    assert idx.count() == emb.count()
    thr = S.read_ivf_thresholds(spark, path)
    assert thr == S.dimension_means(emb) and len(thr) == 64
    # the stored words are exactly binary_quantize at those thresholds
    want = _rows(S.binary_quantize(emb, thresholds=thr), "vec_id", "w0", "w1")
    got = _rows(idx, "vec_id", "w0", "w1")
    assert got == want


def test_ivf_binary_indexed_equals_in_memory_and_prunes(spark, tmp_path):
    """The persisted composed stack must be row-identical to the
    in-memory ivf_binary_topk over the same corpus/centroids/codebook;
    the first pass must be dynamic-partition-pruned AND column-pruned
    (no float payload in its ReadSchema); the re-rank joins back on
    (cent_id, id) so its scan prunes to the same probed cells."""
    import re

    from hbase_taggregator_spark.operators import similarity as S

    emb = _emb(spark)
    cents = _cents(emb)
    q = emb.filter(F.col("vec_id") < 5)
    path = str(tmp_path / "ivf")
    S.write_ivf_index(emb, cents, path, binary=True)
    idx = S.read_ivf_index(spark, path)
    thr = S.read_ivf_thresholds(spark, path)
    got = _rows(
        S.ivf_binary_topk_indexed(idx, q, cents, thr, k=5, rerank_k=20,
                                  n_probe=4),
        "query_id", "vec_id", "cosine",
    )
    want = _rows(
        S.ivf_binary_topk(emb, q, k=5, rerank_k=20, centroids=cents,
                          n_probe=4, threshold="mean"),
        "query_id", "vec_id", "cosine",
    )
    assert got == want and len(got) == 25
    plan = (
        S.ivf_binary_topk_indexed(idx, q, cents, thr, k=5, rerank_k=20,
                                  n_probe=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "dynamicpruning" in plan and "Python" not in plan
    # the words-only first-pass projection reached the scan
    schemas = re.findall(r"ReadSchema: (\S+)", plan)
    assert any(
        "w0" in s and "embedding" not in s for s in schemas
    ), schemas


def test_ivf_binary_indexed_requires_binary_layout(spark, tmp_path):
    from hbase_taggregator_spark.operators import similarity as S

    emb = _emb(spark)
    path = str(tmp_path / "ivf")
    S.write_ivf_index(emb, _cents(emb), path)  # no binary columns
    idx = S.read_ivf_index(spark, path)
    q = emb.filter(F.col("vec_id") < 2)
    with pytest.raises(ValueError, match="binary=True"):
        S.ivf_binary_topk_indexed(idx, q, _cents(emb), [0.0] * 64)


# --- standing binary band index + incremental admission ----------------------


def test_binary_admission_equals_full_recompute(spark, tmp_path):
    """Admitting a batch against the standing band index must equal
    re-running binary_dedup_survivors on corpus ∪ batch (same
    thresholds) restricted to batch ids — the non-iterative drop rule
    makes the two constructions provably equal; this pins the
    implementation to it. Checked at two splits."""
    from hbase_taggregator_spark.operators import similarity as S

    emb = _emb(spark)
    for split in (400, 250):
        corpus = emb.filter(F.col("vec_id") < split)
        batch = emb.filter(F.col("vec_id") >= split)
        path = str(tmp_path / f"bands{split}")
        S.write_binary_band_index(corpus, path, band_bits=4)
        idx, thr, bb, dim = S.read_binary_band_index(spark, path)
        assert (bb, dim, len(thr)) == (4, 64, 64)
        got = _rows(
            S.binary_incremental_admitted(
                idx, batch, thr, radius=15, dim=dim, band_bits=bb
            ),
            "vec_id",
        )
        want = [
            r
            for r in _rows(
                S.binary_dedup_survivors(
                    emb, radius=15, band_bits=4, thresholds=thr
                ),
                "vec_id",
            )
            if r[0] >= split
        ]
        assert got == want and 0 < len(got) <= batch.count(), split


def test_binary_admission_prunes_and_validates(spark, tmp_path):
    """The admission join must dynamic-partition-prune the standing
    band scan (batch bands broadcast against the (band_idx, band_val)
    partition columns), and a width that cannot guarantee the radius
    must raise rather than under-admit."""
    from hbase_taggregator_spark.operators import similarity as S

    emb = _emb(spark)
    corpus = emb.filter(F.col("vec_id") < 400)
    batch = emb.filter(F.col("vec_id") >= 400)
    path = str(tmp_path / "bands")
    S.write_binary_band_index(corpus, path, band_bits=4)
    idx, thr, bb, dim = S.read_binary_band_index(spark, path)
    plan = (
        S.binary_incremental_admitted(idx, batch, thr, radius=15,
                                      band_bits=bb)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "dynamicpruning" in plan and "Python" not in plan
    # 16-bit bands (4 bands) cannot guarantee radius 15
    with pytest.raises(ValueError, match="pigeonhole"):
        S.binary_incremental_admitted(idx, batch, thr, radius=15,
                                      band_bits=16)
    with pytest.raises(ValueError, match="unknown binary threshold"):
        S.write_binary_band_index(corpus, path, threshold="means")


def test_binary_band_index_append_grows_in_place(spark, tmp_path):
    """Growing the standing index with an admitted batch (append at the
    STORED thresholds) must equal a one-shot build over the union —
    new band rows land inside the existing bucket directories."""
    from hbase_taggregator_spark.operators import similarity as S

    emb = _emb(spark)
    corpus = emb.filter(F.col("vec_id") < 400)
    batch = emb.filter(F.col("vec_id") >= 400)
    full_path = str(tmp_path / "full")
    incr_path = str(tmp_path / "incr")
    thr = S.dimension_means(corpus)
    S.write_binary_band_index(emb, full_path, band_bits=4, thresholds=thr)
    S.write_binary_band_index(corpus, incr_path, band_bits=4, thresholds=thr)
    S.write_binary_band_index(
        batch, incr_path, band_bits=4, thresholds=thr, mode="append"
    )
    f, thr_f, _, _ = S.read_binary_band_index(spark, full_path)
    i, thr_i, _, _ = S.read_binary_band_index(spark, incr_path)
    assert thr_f == thr_i == thr
    cols = ["vec_id", "w0", "w1", "band_idx", "band_val"]
    assert _rows(i, *cols) == _rows(f, *cols)


# --- Lloyd-refined PQ codebooks ----------------------------------------------


def test_pq_refine_structure_and_empty_cluster_carryover(spark):
    """Refined books keep the (subspace, code) key set and sub-vector
    width; a codeword whose cluster empties keeps its init value (the
    k-means empty-cluster convention). The duplicate-init frame forces
    code 1's cluster empty: both init vectors are identical, so every
    row assigns to code 0 (tie → smaller code id)."""
    from hbase_taggregator_spark.operators import similarity as S

    rows = [
        (0, [1.0] * 64),
        (1, [1.0] * 64),     # duplicate of 0 → code 1 gets no members
        (2, [5.0] * 64),
        (3, [9.0] * 64),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    init = S.pq_codebooks(df, m=4, k=2)
    refined = S.pq_refine_codebooks(df, init, m=4)
    assert [(s, c) for s, c, _ in refined] == [(s, c) for s, c, _ in init]
    assert all(len(v) == 16 for _, _, v in refined)
    by_key = {(s, c): v for s, c, v in refined}
    init_by_key = {(s, c): v for s, c, v in init}
    for s in range(4):
        # code 1 empty → carried over verbatim from init
        assert by_key[(s, 1)] == init_by_key[(s, 1)]
        # code 0 hosts all four rows → mean of (1, 1, 5, 9) = 4.0
        assert by_key[(s, 0)] == [4.0] * 16


def test_pq_adc_refine_iters_zero_is_the_sampling_init_path(spark):
    """refine_iters=0 must be byte-identical to the pre-r12 behavior
    (the sampling-init books drive encode and LUT directly)."""
    from hbase_taggregator_spark.operators import similarity as S

    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 3)
    a = _rows(
        S.pq_adc_topk(emb, q, k=5, m=4, n_codes=16),
        "query_id", "vec_id", "adc_dist",
    )
    b = _rows(
        S.pq_adc_topk(emb, q, k=5, m=4, n_codes=16, refine_iters=0),
        "query_id", "vec_id", "adc_dist",
    )
    assert a == b and len(a) == 15
    # refined books change the ranking on the real fixture (the
    # refinement is not a no-op) while keeping the output shape
    c = _rows(
        S.pq_adc_topk(emb, q, k=5, m=4, n_codes=16, refine_iters=1),
        "query_id", "vec_id", "adc_dist",
    )
    assert len(c) == 15 and c != a


# --- composed IVF + PQ (IVFADC) ----------------------------------------------


def test_ivf_pq_degenerates_to_pq_adc_when_probing_everything(spark):
    """n_probe == n_centroids probes every cell, so the cell
    restriction admits ALL (query, id) pairs and the composed stack
    must rank exactly like plain pq_adc_topk over the same books —
    the ivf_binary→binary degeneracy pin applied to the PQ axis."""
    from hbase_taggregator_spark.operators import similarity as S

    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 4)
    got = _rows(
        S.ivf_pq_topk(emb, q, k=5, m=4, n_codes=16, n_centroids=8,
                      n_probe=8),
        "query_id", "vec_id", "adc_dist",
    )
    want = _rows(
        S.pq_adc_topk(emb, q, k=5, m=4, n_codes=16),
        "query_id", "vec_id", "adc_dist",
    )
    assert got == want and len(got) == 20


def test_ivf_pq_plan_is_broadcast_and_jvm_only(spark):
    """Probes and LUT both broadcast into the code stream; no Python
    eval nodes; the assignment→encode chain is one projection (no
    id-rejoin shuffle of corpus-sized sides: the only SortMergeJoin-
    eligible join keys would be the broadcast ones)."""
    from hbase_taggregator_spark.operators import similarity as S

    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 3)
    df = S.ivf_pq_topk(emb, q, k=5, refine_iters=1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_index_writers_cluster_one_file_per_bucket(spark, tmp_path):
    """Both standing-index writers repartition by their partition
    columns before the partitioned write, so each bucket directory
    holds ONE data file instead of tasks × buckets small files — the
    file-listing floor the r12 census measured (2048-bucket band build:
    250 s unclustered vs ~39 s clustered; every probe re-pays the
    listing otherwise)."""
    import glob

    from hbase_taggregator_spark.operators import similarity as S

    emb = _emb(spark).repartition(8)
    band_path = str(tmp_path / "bands")
    S.write_binary_band_index(emb, band_path, band_bits=4)
    for d in glob.glob(f"{band_path}/band_idx=*/band_val=*"):
        files = [f for f in glob.glob(f"{d}/*.parquet")]
        assert len(files) == 1, d
    ivf_path = str(tmp_path / "ivf")
    S.write_ivf_index(emb, _cents(emb), ivf_path, binary=True)
    for d in glob.glob(f"{ivf_path}/cent_id=*"):
        files = [f for f in glob.glob(f"{d}/*.parquet")]
        assert len(files) == 1, d


def test_ivf_pq_indexed_equals_in_memory_and_prunes(spark, tmp_path):
    """The pq=True persisted index serves the IVFADC stack
    row-identically to the in-memory ivf_pq_topk over the same
    corpus/centroids/codebooks (the codebooks sidecar round-trips
    exactly); the ADC first pass is dynamic-partition-pruned and
    column-pruned to (id, cent_id, codes)."""
    import re

    from hbase_taggregator_spark.operators import similarity as S

    emb = _emb(spark)
    cents = _cents(emb)
    q = emb.filter(F.col("vec_id") < 5)
    path = str(tmp_path / "ivfpq")
    S.write_ivf_index(emb, cents, path, pq=True, pq_refine_iters=1)
    idx = S.read_ivf_index(spark, path)
    assert {"code_0", "code_1", "code_2", "code_3"} <= set(idx.columns)
    books = S.read_ivf_codebooks(spark, path)
    want_books = S.pq_refine_codebooks(
        emb, S.pq_codebooks(emb, m=4, k=16), m=4, iters=1
    )
    assert books == want_books
    got = _rows(
        S.ivf_pq_topk_indexed(idx, q, cents, books, k=5, n_probe=4),
        "query_id", "vec_id", "adc_dist",
    )
    want = _rows(
        S.ivf_pq_topk(emb, q, k=5, n_centroids=16, n_probe=4,
                      centroids=cents, refine_iters=1),
        "query_id", "vec_id", "adc_dist",
    )
    assert got == want and len(got) == 25
    plan = (
        S.ivf_pq_topk_indexed(idx, q, cents, books, k=5, n_probe=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "dynamicpruning" in plan and "Python" not in plan
    schemas = re.findall(r"ReadSchema: (\S+)", plan)
    assert any(
        "code_0" in s and "embedding" not in s for s in schemas
    ), schemas


def test_ivf_pq_indexed_requires_pq_layout(spark, tmp_path):
    from hbase_taggregator_spark.operators import similarity as S

    emb = _emb(spark)
    path = str(tmp_path / "plain")
    S.write_ivf_index(emb, _cents(emb), path)
    idx = S.read_ivf_index(spark, path)
    q = emb.filter(F.col("vec_id") < 2)
    with pytest.raises(ValueError, match="pq=True"):
        S.ivf_pq_topk_indexed(idx, q, _cents(emb), [])


# --- r12 review guards: append codebook contract + layout validation --------


def test_append_reads_stored_codebooks_and_rejects_divergent(spark, tmp_path):
    """Growing a binary/pq index with thresholds/codebooks omitted must
    quantize the batch against the STORED sidecars (never re-train on
    the batch — that silently mixes codebooks); explicit divergent
    values raise; sidecars are only written by builds."""
    from hbase_taggregator_spark.operators import similarity as S

    emb = _emb(spark)
    a = emb.filter(F.col("vec_id") < 300)
    b = emb.filter(F.col("vec_id") >= 300)
    path = str(tmp_path / "ivf")
    S.write_ivf_index(a, _cents(emb), path, binary=True, pq=True,
                      pq_refine_iters=0)
    thr0 = S.read_ivf_thresholds(spark, path)
    books0 = S.read_ivf_codebooks(spark, path)
    # append WITHOUT passing thresholds/codebooks: stored ones apply
    S.write_ivf_index(b, _cents(emb), path, binary=True, pq=True,
                      pq_refine_iters=0, mode="append")
    assert S.read_ivf_thresholds(spark, path) == thr0
    assert S.read_ivf_codebooks(spark, path) == books0
    idx = S.read_ivf_index(spark, path)
    # the appended rows carry codes in the ORIGINAL codebook: quantize
    # the full corpus at thr0 and compare words row-for-row
    want = _rows(S.binary_quantize(emb, thresholds=thr0),
                 "vec_id", "w0", "w1")
    assert _rows(idx, "vec_id", "w0", "w1") == want
    # explicit divergent values raise BEFORE anything is written: the
    # index must be byte-for-byte untouched after each rejection (r12
    # ADVICE — validation used to run after the append had persisted)
    n0 = idx.count()
    with pytest.raises(ValueError, match="differ from the stored"):
        S.write_ivf_index(b, _cents(emb), path, binary=True, pq=True,
                          thresholds=[0.0] * 64, mode="append")
    with pytest.raises(ValueError, match="differ from the stored"):
        S.write_ivf_index(b, _cents(emb), path, binary=True, pq=True,
                          codebooks=[(s, c, [0.0] * 16)
                                     for s in range(4) for c in range(16)],
                          mode="append")
    # representation-set mismatches raise too (r12 ADVICE): an append
    # lacking the standing layout's codes would read back NULL words
    # and silently vanish from Hamming/ADC candidates
    with pytest.raises(ValueError, match="does not match the standing"):
        S.write_ivf_index(b, _cents(emb), path, mode="append")
    with pytest.raises(ValueError, match="does not match the standing"):
        S.write_ivf_index(b, _cents(emb), path, binary=True, mode="append")
    after = S.read_ivf_index(spark, path)
    assert after.count() == n0
    assert _rows(after, "vec_id", "w0", "w1") == want
    assert S.read_ivf_thresholds(spark, path) == thr0
    assert S.read_ivf_codebooks(spark, path) == books0


def test_band_index_append_contract_and_admission_layout_guard(
    spark, tmp_path
):
    """write_binary_band_index append: stored thresholds apply
    automatically, layout mismatches raise; and
    binary_incremental_admitted rejects a band width that doesn't
    match the standing index's layout (metadata-stamped by
    read_binary_band_index) — a misaligned width would silently admit
    near-duplicates."""
    from hbase_taggregator_spark.operators import similarity as S

    emb = _emb(spark)
    corpus = emb.filter(F.col("vec_id") < 400)
    batch = emb.filter(F.col("vec_id") >= 400)
    path = str(tmp_path / "bands")
    S.write_binary_band_index(corpus, path, band_bits=4)
    idx, thr, bb, dim = S.read_binary_band_index(spark, path)
    # append without thresholds: stored codebook applies (equal to the
    # explicit-stored-thresholds append pinned in the earlier test)
    S.write_binary_band_index(batch, path, band_bits=4, mode="append")
    idx2, thr2, _, _ = S.read_binary_band_index(spark, path)
    assert thr2 == thr and idx2.count() == idx.count() + batch.count() * 16
    with pytest.raises(ValueError, match="layout"):
        S.write_binary_band_index(batch, path, band_bits=8, mode="append")
    with pytest.raises(ValueError, match="does not match the standing"):
        S.binary_incremental_admitted(idx, batch, thr, radius=15,
                                      band_bits=2)
