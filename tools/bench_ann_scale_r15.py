"""ANN serving censused one scale notch up (VERDICT r14 "Next round"
#7): every prior recall/byte census ran at <= 2,000 vectors; this sweep
adds a 10x corpus point (20,000 vectors) with nlist scaled ~sqrt(N) so
the 100-TB design arguments — partition-pruned probing at a roughly
constant probe FRACTION, fixed-budget rerank, build-amortized
assignment/means/encoding — are backed by two internally-comparable
scale points instead of one.

Fixture: the deterministic clustered construction (the r14 regime
fixture — pure Spark expressions, no RNG) with the cluster count grown
with the corpus (cells ~ sqrt(N): 45 at 2k, 141 at 20k — the operating
regime IVF exists for: the coarse quantizer aligned with real cluster
structure). n_probe keeps the probe fraction ~6-7% at both points.

Measured per point, all on the PERSISTED pq_residual=True layout
(write_ivf_index -> ivf_pq_topk_indexed with stored means/books):

- build_wall_s: full index build (assign + cell means + residual
  codebook train + encode + partitioned write + sidecars)
- serve_wall_s: 10-query batch, FIXED rerank_k=100, k=5 — min of two
  runs (the first serve on a fresh JVM absorbs whole-stage-codegen
  compilation for the entire plan family; the min is the standing
  bench discipline)
- recall_at_5 vs exact L2 over the raw corpus
- probe fraction: PER-QUERY mean of rows / file bytes under that
  query's probed cent_id directories over the whole index (the
  partition-pruning dividend — each query's serving path reads only
  its own n_probe cells; the 10-query batch union touches more
  directories but every (query, cell) pair still scans only its
  pruned slice)

Note the 141-cell point also exercises ivf_assign's declared strategy
switch (>= 128 centroids -> the Arrow/numpy ranking) at build time —
the documented sf1+ boundary, here measured rather than asserted.

Writes tools/bench_ann_scale_r15.json.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from hbase_taggregator_spark.operators import similarity as S  # noqa: E402
from hbase_taggregator_spark.session import get_spark  # noqa: E402

DIM, K, RERANK_K = 64, 5, 100
FLOOR_M, FLOOR_CODES = 16, 256

#: (corpus size, cells/nlist, n_probe) — probe fraction ~6-7% at both
POINTS = [(2_000, 45, 3), (20_000, 141, 9)]


def clustered_corpus(spark, n, nlist, dim=DIM, noise=0.05):
    """The r14 deterministic clustered fixture, cluster count scaled."""
    c = (F.col("id") % nlist + 1).cast("double")
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (
            F.sin(c * (i + 1))
            + noise * F.sin((F.col("id") + 1) * (i + 1) * 7.13)
        ).cast("double"),
    )
    return spark.range(n).select(
        F.col("id").alias("vec_id"), vec.alias("embedding")
    )


def _dir_bytes(path):
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> int:
    spark = get_spark(
        app_name="ann-scale", master="local[16]", shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {
        "dials": {"m": FLOOR_M, "n_codes": FLOOR_CODES, "k": K,
                  "rerank_k": RERANK_K, "refine_iters": 1, "dim": DIM},
        "points": {},
    }
    for n, nlist, n_probe in POINTS:
        emb = clustered_corpus(spark, n, nlist)
        queries = emb.filter(F.col("vec_id") < 10)
        cents = emb.orderBy("vec_id").limit(nlist).select(
            F.col("vec_id").alias("cent_id"),
            F.col("embedding").alias("cvec"),
        )
        exact = {
            (r["query_id"], r["vec_id"])
            for r in S.l2_topk(emb, queries, k=K).collect()
        }
        with tempfile.TemporaryDirectory() as d:
            path = f"{d}/ivfpqr"
            t0 = time.time()
            S.write_ivf_index(
                emb, cents, path, pq=True, pq_residual=True,
                pq_m=FLOOR_M, pq_codes=FLOOR_CODES, pq_refine_iters=1,
            )
            build_s = time.time() - t0

            idx = S.read_ivf_index(spark, path)
            books = S.read_ivf_codebooks(spark, path)
            means = S.read_ivf_cell_means(spark, path)
            serve_s, got = None, None
            for _run in range(2):  # min-of-2: run 1 pays codegen
                t0 = time.time()
                served = S.ivf_pq_topk_indexed(
                    idx, queries, cents, books, k=K, m=FLOOR_M,
                    n_probe=n_probe, residual_means=means,
                    rerank_k=RERANK_K,
                )
                got = {
                    (r["query_id"], r["vec_id"])
                    for r in served.select(
                        "query_id", "vec_id"
                    ).collect()
                }
                w = time.time() - t0
                serve_s = w if serve_s is None else min(serve_s, w)
            recall = len(got & exact) / len(exact)

            # per-query probed cells = n_probe nearest centroids (the
            # same probe join the serving plan partition-prunes with)
            per_q = {}
            for r in S.ivf_assign(
                queries, cents, n_probe=n_probe
            ).select("vec_id", "cent_id").collect():
                per_q.setdefault(int(r["vec_id"]), set()).add(
                    int(r["cent_id"])
                )
            cell_rows = {
                int(r["cent_id"]): int(r["n"])
                for r in idx.groupBy("cent_id").count()
                .withColumnRenamed("count", "n").collect()
            }
            cell_bytes = {
                c: _dir_bytes(os.path.join(path, f"cent_id={c}"))
                for c in cell_rows
            }
            total_bytes = sum(cell_bytes.values())
            q_row_fracs = [
                sum(cell_rows.get(c, 0) for c in cells) / n
                for cells in per_q.values()
            ]
            q_byte_fracs = [
                sum(cell_bytes.get(c, 0) for c in cells) / total_bytes
                for cells in per_q.values()
            ]
            batch_cells = set().union(*per_q.values())

            out["points"][f"n={n}"] = {
                "nlist": nlist, "n_probe": n_probe,
                "build_wall_s": round(build_s, 1),
                "serve_wall_s": round(serve_s, 1),
                "recall_at_5": round(recall, 3),
                "per_query_row_fraction": round(
                    sum(q_row_fracs) / len(q_row_fracs), 4
                ),
                "per_query_byte_fraction": round(
                    sum(q_byte_fracs) / len(q_byte_fracs), 4
                ),
                "batch_union_cells": len(batch_cells),
                "batch_union_row_fraction": round(
                    sum(cell_rows.get(c, 0) for c in batch_cells) / n,
                    4,
                ),
                "index_bytes": total_bytes,
            }
            print(f"n={n}", out["points"][f"n={n}"], flush=True)

    path = os.path.join(REPO, "tools", "bench_ann_scale_r15.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
