"""Residual IVFADC on a CLUSTERED fixture — the regime census the
flat-corpus sweep (tools/bench_pq_residual_r14.json) cannot provide.

The testdata embeddings are near-uniform: their cells explain only
~6–9% of variance (mean-residual energy ratio 0.91–0.94), so residual
coding has almost no contrast to harvest there (0.44 → 0.50 recall@5
at the floor dials) — an honest property of THAT corpus, not of the
operator. This census builds a deterministic 16-cluster corpus
(centers sin((c+1)(i+1)), members center + 0.05·sin-noise keyed by
vec_id — pure Spark expressions, no RNG) where a coarse quantizer
genuinely explains most of the variance, and measures what the
operator is FOR: with cells explaining ~95% of energy, raw 128-bit
codes waste nearly all their resolution re-describing the cluster
center every vector in the cell shares, while residual codes spend it
on the within-cluster offsets that actually rank neighbors.

Writes tools/bench_pq_residual_clustered_r14.json; the deterministic
fixture + the residual>raw separation is also pinned as a regression
test (tests/test_round14.py::test_residual_beats_raw_on_clustered_fixture).
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

DIM, NLIST, N = 64, 16, 2000
FLOOR_M, FLOOR_CODES, NPROBE, K = 16, 256, 4, 5


def clustered_corpus(spark, n=N, dim=DIM, nlist=NLIST, noise=0.05):
    """Deterministic clustered embeddings: cluster c's center has
    components sin((c+1)(i+1)); member vec_id sits at center + noise ·
    sin((vec_id+1)(i+1)·7.13). No RNG — same rows every run/engine."""
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


def main() -> int:
    spark = get_spark(
        app_name="pq-residual-clustered", master="local[16]",
        shuffle_partitions=16,
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = clustered_corpus(spark)
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

    # energy census, both residual references (same method as the flat
    # sweep, so the two artifacts read side by side)
    cents = emb.orderBy("vec_id").limit(NLIST).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cvec")
    )
    assigned = S.ivf_assign(emb, cents, n_probe=1)
    sq = lambda col: F.aggregate(  # noqa: E731
        F.zip_with(col, col, lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    )

    def avg_energy(frame, col):
        return frame.select(F.avg(sq(F.col(col))).alias("e")).collect()[0]["e"]

    seed_e = avg_energy(S._ivf_residuals(assigned, cents, "embedding"),
                        "__rvec")
    means = S._cell_mean_centroids(assigned, "embedding")
    mean_e = avg_energy(S._ivf_residuals(assigned, means, "embedding"),
                        "__rvec")
    gm = S.dimension_means(emb, dim=DIM)
    centered = emb.withColumn(
        "__c",
        F.zip_with("embedding", F.array(*[F.lit(v) for v in gm]),
                   lambda a, b: a.cast("double") - b),
    )
    tot_e = avg_energy(centered, "__c")

    out = {
        "fixture": {"n": N, "dim": DIM, "clusters": NLIST, "noise": 0.05},
        "dials": {"m": FLOOR_M, "n_codes": FLOOR_CODES, "nlist": NLIST,
                  "n_probe": NPROBE, "refine_iters": 1, "k": K},
        "seed_residual_energy_ratio": round(seed_e / tot_e, 4),
        "mean_residual_energy_ratio": round(mean_e / tot_e, 4),
        "points": {},
    }
    for residual in (False, True):
        for rerank_k in (None, 20):
            t0 = time.time()
            df = S.ivf_pq_topk(
                emb, q, k=K, m=FLOOR_M, n_codes=FLOOR_CODES,
                n_centroids=NLIST, n_probe=NPROBE, refine_iters=1,
                rerank_k=rerank_k, residual=residual,
            )
            name = (f"{'residual' if residual else 'raw'}:"
                    f"rerank={rerank_k or 0}")
            out["points"][name] = {
                "recall_at_5": recall(df),
                "wall_s": round(time.time() - t0, 1),
            }
            print(name, out["points"][name], flush=True)

    path = os.path.join(REPO, "tools",
                        "bench_pq_residual_clustered_r14.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
