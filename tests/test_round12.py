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
