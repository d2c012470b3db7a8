"""Round-15 regression tests.

VERDICT r14 #1 (plan-audit blind spot): gates that materialize their
result before a run-scoped index/sink directory vanishes register a
LIVE serving-plan factory in ``PLAN_FRAMES``; the catalog-wide plan
audit builds their artifacts at a run-scoped path and records the real
serving plan instead of the LocalTableScan the registered callable
returns. Pins here: the registry covers every materializing gate, each
factory is row-identical to its registered query, and each serving
frame is a REAL distributed plan (exchanges present, zero Python-eval
nodes — the properties the audit exists to witness).

VERDICT r14 #3 (total residual appends): ``write_ivf_index(mode=
'append', pq_residual=True, residual_orphans='admit')`` mints the
orphan cells' residual reference points from the batch itself — the
means land in the ``_cell_means`` sidecar BEFORE any row write, the
orphan rows encode against them, and later appends to those cells see
them as populated. The default policy stays ``'raise'`` (beside
``test_residual_append_to_unpopulated_cell_raises`` in
tests/test_round14.py).
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from hbase_taggregator_spark import plans as P
from hbase_taggregator_spark.queries import PLAN_FRAMES, QUERIES

SF = "/root/testdata/sf0.001"

#: every gate whose registered callable materializes its result before
#: a run-scoped directory vanishes — the audit blind-spot set
_EXPECTED_PLAN_FRAMES = {
    "similarity_ivf_indexed_recall_at_5",
    "similarity_ivf_binary_indexed_recall_at_5",
    "similarity_ivf_pq_indexed_recall_at_5",
    "similarity_ivf_pq_residual_indexed_recall_at_5",
    "embedding_binary_incremental_admitted",
    "sink_partitioned_roundtrip",
}


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_plan_frames_registry_covers_materializing_gates():
    assert set(PLAN_FRAMES) == _EXPECTED_PLAN_FRAMES
    assert set(PLAN_FRAMES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(_EXPECTED_PLAN_FRAMES))
def test_plan_frame_rows_pin_registered_gate(spark, name):
    """The live serving frame must be row-identical to the registered
    (materializing) gate — the factory IS the gate's plan, minus the
    collect; any divergence would let the audit describe a different
    computation than the one the oracle hashes."""
    with tempfile.TemporaryDirectory() as d:
        live = PLAN_FRAMES[name](spark, SF, d)
        live_rows = _rows(live)
    assert live_rows == _rows(QUERIES[name](spark, SF))


@pytest.mark.parametrize("name", sorted(_EXPECTED_PLAN_FRAMES))
def test_plan_frame_is_a_real_distributed_plan(spark, name):
    """The properties the audit exists to witness: the serving frame is
    a live distributed plan (exchanges present — a LocalTableScan has
    none) with zero Python-eval nodes on the serving path."""
    with tempfile.TemporaryDirectory() as d:
        live = PLAN_FRAMES[name](spark, SF, d)
        assert P.count_nodes(live, "Exchange") > 0
        assert P.python_eval_count(live) == 0


# --- total residual appends (VERDICT r14 #3) ---------------------------------


def _orphan_fixture(spark, tmp_path):
    """The r14 orphan setup: 2 cells, the build holds only cell 0's
    members, so every cell-1 batch row is an orphan."""
    from hbase_taggregator_spark.operators import similarity as S

    emb = _emb(spark)
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
    assert cell0.count() > 16 and cell1.count() >= 2
    path = str(tmp_path / "orphan_admit")
    S.write_ivf_index(cell0, cents, path, pq=True, pq_residual=True,
                      pq_refine_iters=0)
    return S, emb, cents, cell0, cell1, path


def test_residual_orphan_admit_makes_append_total(spark, tmp_path):
    S, emb, cents, cell0, cell1, path = _orphan_fixture(spark, tmp_path)
    books = S.read_ivf_codebooks(spark, path)
    n0 = S.read_ivf_index(spark, path).count()
    batch = cell1.orderBy("vec_id").limit(2)

    S.write_ivf_index(batch, cents, path, pq=True, pq_residual=True,
                      mode="append", residual_orphans="admit")

    # every batch row landed (the drop-silently failure class is gone)
    idx = S.read_ivf_index(spark, path)
    assert idx.count() == n0 + 2
    # the minted reference point is the batch's own decimal-contract
    # Lloyd mean of the orphan cell, now standing in the sidecar
    means = S.read_ivf_cell_means(spark, path)
    got = {r["cent_id"]: r["cvec"] for r in means.collect()}
    assert set(got) == {0, 1}
    want = {
        r["cent_id"]: r["cvec"]
        for r in S._cell_mean_centroids(
            S.ivf_assign(batch, cents, n_probe=1), "embedding"
        ).collect()
    }
    assert got[1] == pytest.approx(want[1], abs=0.0)
    # the appended codes encode the batch residuals against the MINTED
    # mean through the STORED books — the standing-frame contract
    # extended to first-arrival cells
    enc_want = _rows(
        S.pq_encode(
            S._ivf_residuals(
                S.ivf_assign(batch, cents, n_probe=1), means, "embedding"
            ).select("vec_id", F.col("__rvec").alias("embedding")),
            books, 4,
        )
    )
    cols = ["vec_id"] + [f"code_{s}" for s in range(4)]
    batch_ids = [r["vec_id"] for r in batch.collect()]
    enc_got = _rows(
        idx.filter(F.col("vec_id").isin(batch_ids)).select(*cols)
    )
    assert enc_got == enc_want
    # codebooks untouched — admit mints MEANS, never codebooks
    assert S.read_ivf_codebooks(spark, path) == books

    # the cell is now populated: a later plain-policy append to it
    # succeeds and encodes against the SAME minted mean
    more = cell1.orderBy(F.desc("vec_id")).limit(1)
    S.write_ivf_index(more, cents, path, pq=True, pq_residual=True,
                      mode="append")
    assert S.read_ivf_index(spark, path).count() == n0 + 3
    assert _rows(S.read_ivf_cell_means(spark, path).select("cent_id")) == \
        _rows(means.select("cent_id"))


def test_residual_orphans_policy_validated(spark, tmp_path):
    S, emb, cents, cell0, cell1, path = _orphan_fixture(spark, tmp_path)
    batch = cell1.limit(1)
    with pytest.raises(ValueError, match="unknown residual_orphans"):
        S.write_ivf_index(batch, cents, path, pq=True, pq_residual=True,
                          mode="append", residual_orphans="sidecar")
    # default stays 'raise' — and the message now names the opt-in
    with pytest.raises(ValueError, match="residual_orphans='admit'"):
        S.write_ivf_index(batch, cents, path, pq=True, pq_residual=True,
                          mode="append")
    assert S.read_ivf_index(spark, path).count() == cell0.count()
