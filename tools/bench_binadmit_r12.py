"""Round-12 census: incremental binary-code admission against the
standing band index — join input ∝ BATCH size, not corpus size
(VERDICT r11 "Next round" #6's "Done" evidence).

Setup: the standing corpus is the first 16k sf1 vectors (by id RANK —
the sf1 ids are sparse), band-indexed once at 8-BIT bands (8 bands ×
256 values = 2048 bucket directories; pigeonhole guarantee radius 7).
Batches of growing size are admitted from the next ids. 8-bit bands —
not the gate's 4-bit — because the census question is PRUNING: the
4-bit domain saturates at 256 buckets before the smallest batch, where
the 2048-bucket domain lets the batch's band footprint grow visibly
with batch size. Recorded per batch size:

- ``batch_band_rows``        — the batch's exploded band rows (the
                               broadcast side): |batch| × 8 exactly;
- ``probed_buckets``         — distinct (band_idx, band_val) buckets
                               the batch hashes into (≤ 2048);
- ``index_rows_in_probed``   — standing rows inside probed buckets:
                               the corpus-side rows the pruned scan
                               feeds the join (the "join input");
- ``admission_wall_s``       — admit via the standing index
                               (min-of-2);
- ``full_recompute_wall_s``  — binary_dedup_survivors on corpus ∪
                               batch restricted to the batch
                               (min-of-2) — what admission replaces;
- ``equal``                  — admission == full recompute (checked).

Two quantities stay ∝ batch: the BROADCAST side (batch_band_rows,
exactly 8×|batch|) and the pruned corpus-side read
(index_rows_in_probed — the batch's bucket footprint grows with batch
size and every unprobed bucket directory is never read, DPP
plan-asserted in tests). On top of pruning, the saving that scales is
RE-COMPUTATION: full recompute re-quantizes and re-self-joins the
corpus every batch; admission never touches corpus compute at all.
``admitted`` is fixture-determined: every sf1 batch vector is a
jittered COPY of a corpus base vector, so a radius-7 admission
correctly rejects nearly all of them — rejection ≡ recompute is the
``equal`` flag.

Writes tools/bench_binadmit_r12.json.
Usage: python tools/bench_binadmit_r12.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF1 = f"{REPO}/.benchdata/sf1"
OUT = f"{REPO}/tools/bench_binadmit_r12.json"
CORPUS_N = 16_000
RADIUS, BAND_BITS = 7, 8
BATCHES = [250, 1000, 4000]


def _min2(fn):
    walls = []
    for _ in range(2):
        t0 = time.time()
        fn()
        walls.append(round(time.time() - t0, 2))
    return min(walls), walls


def main() -> None:
    from pyspark.sql import functions as F

    from hbase_taggregator_spark.operators import similarity as S
    from hbase_taggregator_spark.session import get_spark

    spark = get_spark(app_name="bench-binadmit-r12")
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{SF1}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    # the sf1 ids are sparse (copy fan-out offsets) — split by RANK so
    # the corpus really is the first CORPUS_N ids and every batch id
    # exceeds every corpus id (the admission id contract). Driver-side
    # sorted id list is 20k longs — census-tool-only convenience.
    ids = sorted(r["vec_id"] for r in emb.select("vec_id").collect())
    corpus_max = ids[CORPUS_N - 1]
    corpus = emb.filter(F.col("vec_id") <= corpus_max)

    result = {
        "corpus_vectors": corpus.count(),
        "radius": RADIUS,
        "band_bits": BAND_BITS,
        "batches": {},
    }

    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/bands"
        t0 = time.time()
        S.write_binary_band_index(corpus, path, band_bits=BAND_BITS)
        result["build_wall_s"] = round(time.time() - t0, 2)
        idx, thr, bb, dim = S.read_binary_band_index(spark, path)
        result["index_band_rows_total"] = idx.count()

        for bn in BATCHES:
            batch = emb.filter(
                (F.col("vec_id") > corpus_max)
                & (F.col("vec_id") <= ids[CORPUS_N + bn - 1])
            )
            union = corpus.unionByName(batch)

            def admit():
                S.binary_incremental_admitted(
                    idx, batch, thr, radius=RADIUS, dim=dim, band_bits=bb
                ).write.format("noop").mode("overwrite").save()

            def recompute():
                S.binary_dedup_survivors(
                    union, radius=RADIUS, band_bits=BAND_BITS,
                    thresholds=thr,
                ).filter(F.col("vec_id") > corpus_max).write.format(
                    "noop"
                ).mode("overwrite").save()

            got = sorted(
                r["vec_id"]
                for r in S.binary_incremental_admitted(
                    idx, batch, thr, radius=RADIUS, dim=dim, band_bits=bb
                ).collect()
            )
            want = sorted(
                r["vec_id"]
                for r in S.binary_dedup_survivors(
                    union, radius=RADIUS, band_bits=BAND_BITS,
                    thresholds=thr,
                )
                .filter(F.col("vec_id") > corpus_max)
                .collect()
            )

            # the batch's band footprint and the corpus-side join input
            nb = S.binary_quantize(batch, thresholds=thr)
            probe = S._explode_bands(nb, dim // bb, bb, "w").select(
                F.col("__bidx").alias("band_idx"),
                F.col("__bval").alias("band_val"),
            )
            batch_band_rows = probe.count()
            buckets = probe.distinct()
            probed_buckets = buckets.count()
            rows_in_probed = idx.join(
                F.broadcast(buckets), ["band_idx", "band_val"]
            ).count()

            admit()
            recompute()
            w_adm, raw_adm = _min2(admit)
            w_rec, raw_rec = _min2(recompute)

            result["batches"][str(bn)] = {
                "batch_rows": bn,
                "equal": got == want,
                "admitted": len(got),
                "batch_band_rows": batch_band_rows,
                "probed_buckets": probed_buckets,
                "index_rows_in_probed": rows_in_probed,
                "index_rows_fraction": round(
                    rows_in_probed / max(result["index_band_rows_total"], 1),
                    4,
                ),
                "admission_wall_s": w_adm,
                "full_recompute_wall_s": w_rec,
                "walls_raw": {"admission": raw_adm, "recompute": raw_rec},
            }

    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
