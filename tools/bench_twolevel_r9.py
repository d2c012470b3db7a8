"""Round-9 evidence for the two-level family (VERDICT r8 "Next round"
#1, #2, #6):

1. **Funnel-fix re-run** — the sf1 two-level assignment point at
   nlist=10^4 after the key-only rank window (r8's form funneled the
   full centroid payload through the window's single-partition sort;
   r8 measured 12.46 s / 6.34M candidates at n_super_probe=4).
2. **Recall-vs-probe curve** — n_super_probe ∈ {1, 2, 4, 8, 16} at
   nlist=10^4 / n_super=100 over the sf1 corpus (20k vectors):
   agreement with flat (exact) assignment, wall, and the candidate-pair
   census (the cost model's bound quantity). This is the tuning table
   the ivf_assign_two_level docstring points at.
3. **Lloyd-under-twolevel spy** — kmeans_refine(strategy="twolevel",
   n_iter=2) at nlist=10^4 with SparkContext.broadcast AND
   DataFrame.collect instrumented: nothing centroid-scale may cross the
   driver between iterations (only n_super-row super sets and scalar
   counts), evidencing the "no driver round-trip" claim at the scale it
   is made for.

Fixtures: .benchdata/sf1 (20k vectors, tools/make_sf1.py), sf10 for the
centroid init (200k, tools/bench_scale_r6.py; sparse vec_ids — first-N
by rank, not id). Writes tools/bench_twolevel_r9.json.

Usage: python tools/bench_twolevel_r9.py
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
OUT = f"{REPO}/tools/bench_twolevel_r9.json"


def main() -> None:
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")

    import pyspark
    from pyspark.sql import functions as F

    from hbase_taggregator_spark.operators import similarity as S
    from hbase_taggregator_spark.session import get_spark
    from hbase_taggregator_spark.util import ensure_parallelism

    spark = get_spark(app_name="bench-twolevel-r9")
    spark.sparkContext.setLogLevel("ERROR")

    emb10 = spark.read.parquet(f"{SF10}/embeddings.parquet")
    emb1 = spark.read.parquet(f"{SF1}/embeddings.parquet")
    cents = emb10.orderBy("vec_id").limit(NLIST).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cvec")
    )

    # untimed warmup: spin up the Python worker pool
    S.ivf_assign(
        emb1.limit(256), cents.limit(200), strategy="arrow"
    ).agg(F.sum("cent_id")).collect()

    result: dict = {"nlist": NLIST, "n_super": N_SUPER, "dim": 64}

    # flat (exact) reference assignment for the agreement column
    flat = {
        r["vec_id"]: r["cent_id"]
        for r in S.ivf_assign(ensure_parallelism(emb1), cents, n_probe=1)
        .select("vec_id", "cent_id")
        .collect()
    }
    result["flat_rows"] = len(flat)

    # --- recall-vs-probe sweep (incl. the probe=4 funnel-fix re-run) ---
    sweep = []
    for probe in (1, 2, 4, 8, 16):
        t0 = time.time()
        got = {
            r["vec_id"]: r["cent_id"]
            for r in S.ivf_assign_two_level(
                ensure_parallelism(emb1), cents,
                n_super=N_SUPER, n_super_probe=probe,
            )
            .select("vec_id", "cent_id")
            .collect()
        }
        wall = round(time.time() - t0, 2)
        cand = S.ivf_assign_two_level(
            ensure_parallelism(emb1), cents,
            n_super=N_SUPER, n_super_probe=probe,
            return_candidates=True,
        ).count()
        agree = sum(
            1 for k, v in got.items() if flat.get(k) == v
        ) / max(len(flat), 1)
        sweep.append(
            {
                "n_super_probe": probe,
                "wall_s": wall,
                "candidate_pairs": cand,
                "assigned_rows": len(got),
                "agreement_with_flat": round(agree, 4),
            }
        )
        print(json.dumps(sweep[-1]), flush=True)
    result["probe_sweep_sf1"] = sweep

    # --- Lloyd under twolevel: spy both driver channels -----------------
    # NOTE: patch the CLASSIC DataFrame class — pyspark.sql.DataFrame is
    # the abstract parent and the concrete subclass overrides collect,
    # so patching the parent records nothing (observed: empty profile)
    from pyspark.sql.classic.dataframe import DataFrame as _CDF

    bc_shapes: list = []
    collect_profiles: list = []
    orig_broadcast = pyspark.SparkContext.broadcast
    orig_collect = _CDF.collect

    def spy_bc(self, value):
        try:
            import numpy as np

            if isinstance(value, tuple) and value and isinstance(
                value[0], np.ndarray
            ):
                bc_shapes.append(list(value[0].shape))
        except Exception:
            pass
        return orig_broadcast(self, value)

    def spy_collect(self):
        rows = orig_collect(self)
        has_vec = any(
            "array" in dt for _, dt in self.dtypes
        )
        collect_profiles.append({"rows": len(rows), "vector_payload": has_vec})
        return rows

    pyspark.SparkContext.broadcast = spy_bc
    _CDF.collect = spy_collect
    try:
        t0 = time.time()
        refined = S.kmeans_refine(
            emb1, cents, n_iter=2, strategy="twolevel"
        )
        n_refined = refined.count()
        lloyd_wall = round(time.time() - t0, 2)
    finally:
        pyspark.SparkContext.broadcast = orig_broadcast
        _CDF.collect = orig_collect

    vec_collects = [p for p in collect_profiles if p["vector_payload"]]
    result["lloyd_twolevel"] = {
        "n_iter": 2,
        "wall_s": lloyd_wall,
        "surviving_centroids": n_refined,
        "numpy_broadcasts": bc_shapes,  # [] = no centroid matrix shipped
        "vector_collects": vec_collects,
        # the ONLY allowed vector-carrying driver materializations are
        # the n_super-row super sets (one per ivf_assign against supers)
        "max_vector_collect_rows": max(
            (p["rows"] for p in vec_collects), default=0
        ),
        "centroid_scale_crossed_driver": any(
            p["rows"] >= NLIST for p in vec_collects
        )
        or any(s and s[0] >= NLIST for s in bc_shapes),
    }
    print(json.dumps(result["lloyd_twolevel"]), flush=True)

    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
