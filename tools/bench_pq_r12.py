"""Round-12 census: Lloyd-refined vs sampling-init PQ codebooks on the
sf1 HARD fixture (the non-saturating operating point r11 established —
20k vectors: 2000 base × 10 copies with jitter 0.12 on a hash-selected
half of the dimensions, regenerated deterministically if absent).

Measures recall@5 of ``pq_adc_topk`` against exact Euclidean top-5 at
``refine_iters`` 0 / 1 / 2 (m=4 subspaces, 16 codewords each — the
gate sizing) over 50 queries, plus the per-call wall (min-of-2; the
refinement adds one distributed assign→mean pass per iteration).
The claim under test is VERDICT r11 "What's wrong" #2: sampling-init
codebooks under-deliver the quality the operator advertises — the
refined books should buy recall at unchanged serving cost (encoding
and ADC shape are identical; only the literal codeword values change).

Writes tools/bench_pq_r12.json.
Usage: python tools/bench_pq_r12.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HARD = f"{REPO}/.benchdata/sf1_hard"
OUT = f"{REPO}/tools/bench_pq_r12.json"
M, N_CODES, K, NQ = 4, 16, 5, 50


def _ensure_hard_fixture(spark):
    """Regenerate the r11 hard fixture if absent — EXACTLY the
    construction in tools/bench_binary_r11.py (deterministic)."""
    from pyspark.sql import functions as F

    if os.path.isdir(f"{HARD}/embeddings.parquet"):
        return
    base = spark.read.parquet(
        "/root/testdata/sf0.1/embeddings.parquet"
    ).select("vec_id", "embedding")
    copies = spark.range(10).select(F.col("id").cast("int").alias("__c"))
    corrupt = F.transform(
        F.col("embedding"),
        lambda x, i: (
            x.cast("double")
            + F.when(F.pmod(F.hash(i), F.lit(2)) == 0,
                     F.col("__c").cast("double") * 0.12
                     * (F.pmod(F.hash(F.col("vec_id"), i), F.lit(7)) - 3)
                     .cast("double")
                     ).otherwise(F.lit(0.0))
        ).cast("float"),
    )
    hard = (
        base.crossJoin(F.broadcast(copies))
        .withColumn("embedding", corrupt)
        .withColumn(
            "vec_id",
            F.col("vec_id") + F.col("__c").cast("long") * 1_000_000,
        )
        .drop("__c")
        .repartition(32)
    )
    os.makedirs(HARD, exist_ok=True)
    hard.write.mode("overwrite").parquet(f"{HARD}/embeddings.parquet")


def main() -> None:
    from pyspark.sql import functions as F

    from hbase_taggregator_spark.operators import similarity as S
    from hbase_taggregator_spark.session import get_spark

    spark = get_spark(app_name="bench-pq-r12")
    spark.sparkContext.setLogLevel("ERROR")

    _ensure_hard_fixture(spark)
    hard = spark.read.parquet(f"{HARD}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n = hard.count()
    q = hard.filter(F.col("vec_id") < NQ)

    exact = S.l2_topk(hard, q, k=K).select("query_id", "vec_id")
    exact.persist()
    n_exact = exact.count()

    result = {
        "fixture": "sf1_hard (r11 construction): 2000 base x 10 copies,"
        " jitter 0.12 on the hash-selected half of dims",
        "vectors": n,
        "n_queries": NQ,
        "m": M,
        "n_codes": N_CODES,
        "k": K,
        "points": {},
    }

    for iters in (0, 1, 2):
        def run():
            S.pq_adc_topk(
                hard, q, k=K, m=M, n_codes=N_CODES, refine_iters=iters
            ).write.format("noop").mode("overwrite").save()

        pq = S.pq_adc_topk(
            hard, q, k=K, m=M, n_codes=N_CODES, refine_iters=iters
        ).select("query_id", "vec_id")
        hits = exact.join(pq, ["query_id", "vec_id"], "left_semi").count()
        run()
        walls = []
        for _ in range(2):
            t0 = time.time()
            run()
            walls.append(round(time.time() - t0, 2))
        result["points"][f"refine_iters={iters}"] = {
            "recall_at_5": round(hits / n_exact, 4),
            "wall_s": min(walls),
            "walls_raw": walls,
        }

    r0 = result["points"]["refine_iters=0"]["recall_at_5"]
    r1 = result["points"]["refine_iters=1"]["recall_at_5"]
    result["refined_minus_init_recall"] = round(r1 - r0, 4)
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
