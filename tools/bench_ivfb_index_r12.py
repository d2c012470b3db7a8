"""Round-12 census: the composed IVF+binary stack served from the
binary=True persisted index vs the in-memory path, at sf1 (20k
vectors, nlist=256).

The quantity VERDICT r11 #1 asked for is FIRST-PASS BYTES: the
in-memory ``ivf_binary_topk`` must read the full float corpus every
query batch (it re-quantizes AND re-assigns all N vectors before the
Hamming scan), where ``ivf_binary_topk_indexed`` reads only the packed
words of the PROBED cells — dynamic partition pruning cuts the files,
parquet column pruning cuts the columns. Recorded per operating point:

- ``rows_first_pass_indexed``   — index rows in probed cells (the
                                  Hamming scan's input);
- ``bytes_first_pass_indexed``  — those rows × 24 B (8 B id + two 8 B
                                  packed words);
- ``bytes_first_pass_inmemory`` — N × 264 B (8 B id + 64 float32): the
                                  floats the in-memory path must read
                                  to quantize + assign every batch;
- walls min-of-3 after an untimed warmup, plus the one-time build
  wall and the same breakeven arithmetic as tools/bench_index_r11.py
  (honest about fixture effects: at 20k rows scheduling floors
  dominate; the byte ratio is the number that scales).

Results must also be EQUAL row-for-row (checked, not assumed).

Writes tools/bench_ivfb_index_r12.json.
Usage: python tools/bench_ivfb_index_r12.py
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
OUT = f"{REPO}/tools/bench_ivfb_index_r12.json"
NLIST, K, RERANK = 256, 5, 50
#: two operating points, the bench_index_r11 pairing: a SELECTIVE batch
#: (few queries, few probes — the pruning regime the index exists for)
#: and a SATURATING one (100 queries × 8 probes touch ~all cells — the
#: honest upper bound where pruning buys little)
POINTS = {"selective_batch": (10, 4), "saturating_batch": (100, 8)}
ROW_BYTES_CODES = 8 + 2 * 8          # id + two packed words
ROW_BYTES_FLOATS = 8 + 64 * 4        # id + float32 vector


def _min3(fn):
    walls = []
    for _ in range(3):
        t0 = time.time()
        fn()
        walls.append(round(time.time() - t0, 2))
    return min(walls), walls


def main() -> None:
    from pyspark.sql import functions as F

    from hbase_taggregator_spark.operators import similarity as S
    from hbase_taggregator_spark.session import get_spark

    spark = get_spark(app_name="bench-ivfb-index-r12")
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{SF1}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n = emb.count()
    cents = (
        emb.orderBy("vec_id").limit(NLIST)
        .select(F.col("vec_id").alias("cent_id"),
                F.col("embedding").alias("cvec"))
    )

    result = {
        "sf1_vectors": n,
        "nlist": NLIST,
        "rerank_k": RERANK,
        "bytes_first_pass_inmemory": n * ROW_BYTES_FLOATS,
        "batches": {},
        "note": "bytes_first_pass_inmemory counts the float corpus the"
        " in-memory path must READ to re-quantize + re-assign every"
        " batch; the indexed path reads 24 B/row of the probed cells"
        " only (dynamicpruning + column pruning, both plan-asserted in"
        " tests/test_round12.py). Wall deltas at 20k rows are"
        " scheduling-floor-bound (same caveat as bench_index_r11);"
        " the byte ratio is the quantity that scales.",
    }

    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/ivfb"

        t0 = time.time()
        S.write_ivf_index(emb, cents, path, binary=True)
        result["build_wall_s"] = round(time.time() - t0, 2)

        idx = S.read_ivf_index(spark, path)
        thr = S.read_ivf_thresholds(spark, path)
        nonempty = idx.select("cent_id").distinct().count()
        result["nonempty_cells"] = nonempty

        for name, (nq, nprobe) in POINTS.items():
            q = emb.filter(F.col("vec_id") < nq)

            def run_indexed():
                S.ivf_binary_topk_indexed(
                    idx, q, cents, thr, k=K, rerank_k=RERANK, n_probe=nprobe
                ).write.format("noop").mode("overwrite").save()

            def run_inmemory():
                S.ivf_binary_topk(
                    emb, q, k=K, rerank_k=RERANK, centroids=cents,
                    n_probe=nprobe, threshold="mean",
                ).write.format("noop").mode("overwrite").save()

            # equality first (the census is about a CORRECT faster path)
            rows = lambda df: sorted(  # noqa: E731
                (r["query_id"], r["vec_id"], r["cosine"])
                for r in df.collect()
            )
            equal = rows(
                S.ivf_binary_topk_indexed(
                    idx, q, cents, thr, k=K, rerank_k=RERANK, n_probe=nprobe
                )
            ) == rows(
                S.ivf_binary_topk(
                    emb, q, k=K, rerank_k=RERANK, centroids=cents,
                    n_probe=nprobe, threshold="mean",
                )
            )

            run_indexed()
            run_inmemory()
            w_idx, raw_idx = _min3(run_indexed)
            w_mem, raw_mem = _min3(run_inmemory)

            # probed-cell occupancy = the indexed first pass's row input
            probes = S.ivf_assign(
                q.select(F.col("vec_id").alias("query_id"),
                         F.col("embedding").alias("__qvec")),
                cents, "__qvec", "query_id", n_probe=nprobe,
            ).select("cent_id").distinct()
            probed_cells = probes.count()
            rows_probed = idx.join(F.broadcast(probes), "cent_id").count()

            result["batches"][name] = {
                "n_queries": nq,
                "n_probe": nprobe,
                "results_equal": equal,
                "query_indexed_wall_s": w_idx,
                "query_inmemory_wall_s": w_mem,
                "walls_raw": {"indexed": raw_idx, "inmemory": raw_mem},
                "probed_cells": probed_cells,
                "rows_first_pass_indexed": rows_probed,
                "bytes_first_pass_indexed": rows_probed * ROW_BYTES_CODES,
                "first_pass_bytes_ratio": round(
                    (n * ROW_BYTES_FLOATS)
                    / max(rows_probed * ROW_BYTES_CODES, 1),
                    1,
                ),
                "breakeven_batches": (
                    round(result["build_wall_s"] / (w_mem - w_idx), 1)
                    if w_mem > w_idx
                    else None
                ),
            }
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
