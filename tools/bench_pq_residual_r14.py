"""Residual-vs-raw IVFADC census at the floor-gate operating point
(r13 VERDICT #2/#3): does residual encoding (pq_encode over x − c(x),
per-probed-cell query LUTs — the actual Jégou et al. IVFADC
construction) lift the measured code-resolution-bound recall at sf0.1,
and does a FIXED rerank budget clear the 0.8 floor so the standing
gate can stop institutionalizing the corpus-proportional
(O(corpus)-per-query) 4% shortlist?

Also censuses WHY residual gains whatever it gains here: the coarse
quantizer's explained-variance ratio mean(‖x−c(x)‖²)/mean(‖x−x̄‖²) —
on a corpus where cells explain little variance (near-uniform synthetic
embeddings), residual spread ≈ raw spread and the encoding change
cannot add contrast; on clustered production data the ratio drops and
residual coding is the standard win. The census records the ratio so
the committed gate dials are priced for THIS corpus, not asserted from
the paper.

Writes tools/bench_pq_residual_r14.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from hbase_taggregator_spark.operators import similarity as S  # noqa: E402
from hbase_taggregator_spark.session import get_spark  # noqa: E402

FLOOR_M, FLOOR_CODES, NLIST, NPROBE = 16, 256, 16, 4
K = 5


def main() -> int:
    spark = get_spark(
        app_name="pq-residual-census", master="local[16]",
        shuffle_partitions=16,
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {"dials": {"m": FLOOR_M, "n_codes": FLOOR_CODES, "nlist": NLIST,
                     "n_probe": NPROBE, "refine_iters": 1, "k": K},
           "sections": {}}

    for sf in ("0.01", "0.1"):
        emb = spark.read.parquet(
            f"/root/testdata/sf{sf}/embeddings.parquet"
        ).select("vec_id", "embedding")
        n = emb.count()
        q = emb.filter(F.col("vec_id") < 10)
        exact = {
            (r["query_id"], r["vec_id"])
            for r in S.l2_topk(emb, q, k=K).collect()
        }

        def recall(df):
            got = {
                (r["query_id"], r["vec_id"])
                for r in df.select("query_id", "vec_id").collect()
            }
            return round(len(got & exact) / len(exact), 3)

        # coarse-quantizer explained variance: residual energy over
        # centered energy (1.0 = cells explain nothing; residual
        # coding can only add contrast where this is < 1). Censused
        # against BOTH reference choices — the cosine SEED vectors
        # (wrong: unit-norm seeds on near-orthogonal data ADD energy)
        # and the Lloyd cell MEANS (≤ 1 by construction; what
        # residual=True uses).
        cents = emb.orderBy("vec_id").limit(NLIST).select(
            F.col("vec_id").alias("cent_id"),
            F.col("embedding").alias("cvec"),
        )
        assigned = S.ivf_assign(emb, cents, n_probe=1)
        sq = lambda c: F.aggregate(  # noqa: E731
            F.zip_with(c, c, lambda a, b: a.cast("double") * b.cast("double")),
            F.lit(0.0), lambda acc, x: acc + x,
        )

        def avg_energy(frame, col):
            return frame.select(F.avg(sq(F.col(col))).alias("e")).collect()[
                0
            ]["e"]

        seed_energy = avg_energy(
            S._ivf_residuals(assigned, cents, "embedding"), "__rvec"
        )
        mean_cents = S._cell_mean_centroids(assigned, "embedding")
        mean_energy = avg_energy(
            S._ivf_residuals(assigned, mean_cents, "embedding"), "__rvec"
        )
        mean_vec = S.dimension_means(emb)
        centered = emb.withColumn(
            "__c",
            F.zip_with(
                "embedding",
                F.array(*[F.lit(v) for v in mean_vec]),
                lambda a, b: a.cast("double") - b,
            ),
        )
        tot_energy = avg_energy(centered, "__c")

        sec = {
            "corpus_rows": n,
            "legacy_4pct_rerank_k": max(20, n // 25),
            "seed_residual_energy_ratio": round(seed_energy / tot_energy, 4),
            "mean_residual_energy_ratio": round(mean_energy / tot_energy, 4),
            "points": {},
        }
        for residual in (False, True):
            for rerank_k in (None, 20, 100):
                t0 = time.time()
                df = S.ivf_pq_topk(
                    emb, q, k=K, m=FLOOR_M, n_codes=FLOOR_CODES,
                    n_centroids=NLIST, n_probe=NPROBE, refine_iters=1,
                    rerank_k=rerank_k, residual=residual,
                )
                r = recall(df)
                name = (
                    f"{'residual' if residual else 'raw'}:"
                    f"rerank={rerank_k or 0}"
                )
                sec["points"][name] = {
                    "recall_at_5": r, "wall_s": round(time.time() - t0, 1)
                }
                print(f"sf{sf} {name}: recall@5={r}", flush=True)
        # legacy corpus-proportional point for the side-by-side
        t0 = time.time()
        df = S.ivf_pq_topk(
            emb, q, k=K, m=FLOOR_M, n_codes=FLOOR_CODES, n_centroids=NLIST,
            n_probe=NPROBE, refine_iters=1, rerank_k=max(20, n // 25),
        )
        sec["points"]["raw:rerank=corpus/25(legacy)"] = {
            "recall_at_5": recall(df), "wall_s": round(time.time() - t0, 1)
        }
        print(f"sf{sf} legacy: {sec['points']['raw:rerank=corpus/25(legacy)']}",
              flush=True)
        out["sections"][f"sf{sf}"] = sec

    path = os.path.join(REPO, "tools", "bench_pq_residual_r14.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
