"""Round-10 evidence for the two-level family (VERDICT r9 "Next round"
#1, #3, #6):

1. **Probe-sweep wall fix** — the r9 sweep ran single-pass in one
   session, so its FIRST point (n_super_probe=1) paid JIT/shuffle-service
   warmup and the committed wall column read "probing less costs 2×
   more" (52.52 s vs 27.54 s at probe=2) against a monotone
   candidate-pair census. Re-run the low-probe points min-of-3 after an
   untimed warmup so the artifact's wall column is monotone-explainable.
2. **Salted top-k buffer census** — at nlist=10^4 / n_super=100 /
   n_super_probe=4 / n_probe=5: the legacy single-aggregate partial
   buffer bound is the max per-vector candidate count; the salted
   stage-1 bound is the max per-(vector, salt) count and stage 2's is
   exactly topk_salt·n_probe. Record all three next to min-of-3 walls
   for topk_salt=1 vs the default 16 — the "peak buffer no longer
   tracks n_super_probe·nlist/n_super" evidence.
3. **Lloyd per-iteration walls** — the r9 spy covered n_iter=2 in one
   call (73 s total). Chain FOUR single-iteration
   kmeans_refine(strategy="twolevel") calls with release_input=True
   (the r10 cache-release pattern) and record each iteration's wall:
   the persist/unpersist ladder claims flat per-iteration cost — two+
   warm points prove it.

Fixtures: .benchdata/sf1 (20k vectors), sf10 centroid init (200k,
sparse vec_ids — first-N by rank). Writes tools/bench_twolevel_r10.json.

Usage: python tools/bench_twolevel_r10.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF1 = f"{REPO}/.benchdata/sf1"
SF10 = f"{REPO}/.benchdata/sf10"
NLIST = 10_000
N_SUPER = 100
OUT = f"{REPO}/tools/bench_twolevel_r10.json"


def main() -> None:
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")

    from pyspark.sql import functions as F

    from hbase_taggregator_spark.operators import similarity as S
    from hbase_taggregator_spark.session import get_spark
    from hbase_taggregator_spark.util import ensure_parallelism

    spark = get_spark(app_name="bench-twolevel-r10")
    spark.sparkContext.setLogLevel("ERROR")

    emb10 = spark.read.parquet(f"{SF10}/embeddings.parquet")
    emb1 = spark.read.parquet(f"{SF1}/embeddings.parquet")
    cents = emb10.orderBy("vec_id").limit(NLIST).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cvec")
    )

    # untimed warmup: Python worker pool + shuffle service + codegen
    S.ivf_assign(
        emb1.limit(256), cents.limit(200), strategy="arrow"
    ).agg(F.sum("cent_id")).collect()
    S.ivf_assign_two_level(
        ensure_parallelism(emb1.limit(2000)), cents,
        n_super=N_SUPER, n_super_probe=1,
    ).count()

    result: dict = {"nlist": NLIST, "n_super": N_SUPER, "dim": 64}

    # --- 1. low-probe wall re-run, min-of-3 (r9 artifact's inverted
    #        first point; candidate census unchanged from r9) ----------
    rerun = []
    for probe in (1, 2):
        walls = []
        for _ in range(3):
            t0 = time.time()
            S.ivf_assign_two_level(
                ensure_parallelism(emb1), cents,
                n_super=N_SUPER, n_super_probe=probe,
            ).select("vec_id", "cent_id").count()
            walls.append(round(time.time() - t0, 2))
        rerun.append(
            {"n_super_probe": probe, "walls_s": walls,
             "wall_min3_s": min(walls)}
        )
        print(json.dumps(rerun[-1]), flush=True)
    result["probe_wall_rerun_min3"] = rerun

    # --- 2. salted top-k buffer census + walls at n_probe=5 -----------
    N_PROBE, SALT = 5, 16
    cand = S.ivf_assign_two_level(
        ensure_parallelism(emb1), cents,
        n_super=N_SUPER, n_super_probe=4, return_candidates=True,
    )
    per_vec = cand.groupBy("vec_id").count()
    legacy_max = per_vec.agg(F.max("count")).collect()[0][0]
    per_salt_max = (
        cand.withColumn("__salt", F.pmod(F.hash("cent_id"), F.lit(SALT)))
        .groupBy("vec_id", "__salt").count()
        .agg(F.max("count")).collect()[0][0]
    )

    def topk_wall(salt: int) -> list[float]:
        walls = []
        for _ in range(3):
            t0 = time.time()
            S.ivf_assign_two_level(
                ensure_parallelism(emb1), cents,
                n_super=N_SUPER, n_super_probe=4,
                n_probe=N_PROBE, topk_salt=salt,
            ).count()
            walls.append(round(time.time() - t0, 2))
        return walls

    unsalted = topk_wall(1)
    salted = topk_wall(SALT)
    result["topk_buffer_census"] = {
        "n_super_probe": 4,
        "n_probe": N_PROBE,
        "topk_salt": SALT,
        # what the legacy single aggregate's partial buffer must hold
        "legacy_max_candidates_per_vector": legacy_max,
        # what the salted stage-1 partial buffer holds at most
        "salted_stage1_max_per_group": per_salt_max,
        # stage 2's exact bound: one n_probe-array per salt group
        "salted_stage2_bound": SALT * N_PROBE,
        "wall_unsalted_s": unsalted,
        "wall_unsalted_min3_s": min(unsalted),
        "wall_salted_s": salted,
        "wall_salted_min3_s": min(salted),
    }
    print(json.dumps(result["topk_buffer_census"]), flush=True)

    # --- 3. Lloyd per-iteration walls (chained release_input calls) ---
    iters = []
    current = cents
    for i in range(4):
        t0 = time.time()
        refreshed = S.kmeans_refine(
            emb1, current, n_iter=1, strategy="twolevel",
            release_input=(i > 0),
        )
        n = refreshed.count()
        iters.append(
            {"iteration": i + 1, "wall_s": round(time.time() - t0, 2),
             "surviving_centroids": n}
        )
        print(json.dumps(iters[-1]), flush=True)
        current = refreshed
    current.unpersist()
    result["lloyd_per_iteration"] = {
        "strategy": "twolevel",
        "chained_release_input": True,
        "iterations": iters,
        # flat-cost claim: warm iterations (2+) within a small band
        "warm_wall_spread_s": round(
            max(x["wall_s"] for x in iters[1:])
            - min(x["wall_s"] for x in iters[1:]), 2
        ),
    }

    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
