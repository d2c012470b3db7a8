"""Round-13 census: a PRUNING-VISIBLE admission point (VERDICT r12
"Next round" #6).

The r12 census (tools/bench_binadmit_r12.json) proved admission cost
∝ batch, but its smallest batch (250 vectors × 8 bands) already
hashed into 66% of the 2048-bucket domain — partition pruning barely
engaged, so the ∝-batch claim was structural, not measured. This
census drives the SAME standing layout (16k-vector sf1 corpus,
8-bit bands → 8 × 256 = 2048 bucket directories) with TRICKLE batches
— the actual incremental-admission regime — so the batch footprint is
a small fraction of the domain and pruning is visible in both
dimensions the claim needs:

- ``probed_bucket_fraction``  — distinct batch band buckets / 2048;
- ``probed_bytes`` / ``probed_bytes_fraction`` — on-disk parquet
  bytes under the PROBED bucket directories vs the whole index: the
  bytes a partition-pruned scan is eligible to read (every unprobed
  directory is never listed — DPP is plan-asserted in
  tests/test_round12.py).

Both must grow ∝ batch and sit ≪ 1 at trickle sizes. ``equal`` pins
admission ≡ full recompute at every point (the standing gate's
contract).

Writes tools/bench_binadmit_r13.json.
Usage: python tools/bench_binadmit_r13.py
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
OUT = f"{REPO}/tools/bench_binadmit_r13.json"
CORPUS_N = 16_000
RADIUS, BAND_BITS = 7, 8
BATCHES = [5, 25, 100, 1000]


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for fn in files:
            total += os.path.getsize(os.path.join(root, fn))
    return total


def main() -> None:
    from pyspark.sql import functions as F

    from hbase_taggregator_spark.operators import similarity as S
    from hbase_taggregator_spark.session import get_spark

    spark = get_spark(app_name="bench-binadmit-r13")
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{SF1}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    ids = sorted(r["vec_id"] for r in emb.select("vec_id").collect())
    corpus_max = ids[CORPUS_N - 1]
    corpus = emb.filter(F.col("vec_id") <= corpus_max)

    result = {
        "corpus_vectors": corpus.count(),
        "radius": RADIUS,
        "band_bits": BAND_BITS,
        "bucket_domain": 8 * 256,
        "batches": {},
    }

    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/bands"
        S.write_binary_band_index(corpus, path, band_bits=BAND_BITS)
        idx, thr, bb, dim = S.read_binary_band_index(spark, path)
        total_rows = idx.count()
        total_bytes = _dir_bytes(path)
        result["index_band_rows_total"] = total_rows
        result["index_bytes_total"] = total_bytes

        for bn in BATCHES:
            batch = emb.filter(
                (F.col("vec_id") > corpus_max)
                & (F.col("vec_id") <= ids[CORPUS_N + bn - 1])
            )
            union = corpus.unionByName(batch)

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

            nb = S.binary_quantize(batch, thresholds=thr)
            probe = S._explode_bands(nb, dim // bb, bb, "w").select(
                F.col("__bidx").alias("band_idx"),
                F.col("__bval").alias("band_val"),
            )
            buckets = [(r["band_idx"], r["band_val"])
                       for r in probe.distinct().collect()]
            rows_in_probed = idx.join(
                F.broadcast(
                    spark.createDataFrame(
                        buckets, "band_idx int, band_val int"
                    )
                ),
                ["band_idx", "band_val"],
            ).count()
            probed_bytes = sum(
                _dir_bytes(f"{path}/band_idx={bi}/band_val={bv}")
                for (bi, bv) in buckets
            )

            def admit():
                S.binary_incremental_admitted(
                    idx, batch, thr, radius=RADIUS, dim=dim, band_bits=bb
                ).write.format("noop").mode("overwrite").save()

            admit()
            walls = []
            for _ in range(2):
                t0 = time.time()
                admit()
                walls.append(round(time.time() - t0, 2))

            result["batches"][str(bn)] = {
                "equal": got == want,
                "admitted": len(got),
                "batch_band_rows": bn * (dim // bb),
                "probed_buckets": len(buckets),
                "probed_bucket_fraction": round(len(buckets) / 2048, 4),
                "index_rows_in_probed": rows_in_probed,
                "index_rows_fraction": round(
                    rows_in_probed / max(total_rows, 1), 4
                ),
                "probed_bytes": probed_bytes,
                "probed_bytes_fraction": round(
                    probed_bytes / max(total_bytes, 1), 4
                ),
                "admission_wall_s": min(walls),
                "walls_raw": walls,
            }
            print(bn, result["batches"][str(bn)], flush=True)

    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
