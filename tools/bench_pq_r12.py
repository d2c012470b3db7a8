"""Round-12 census: Lloyd-refined vs sampling-init PQ codebooks, on
TWO fixtures whose disagreement is the finding.

Measures recall@5 of ``pq_adc_topk`` against exact Euclidean top-5 at
``refine_iters`` 0 / 1 / 2 (m=4 subspaces, 16 codewords each — the
gate sizing) over 50 queries, plus the per-call wall (min-of-2; each
refinement iteration adds one distributed assign→mean pass). The claim
under test is VERDICT r11 "What's wrong" #2: sampling-init codebooks
under-deliver — Lloyd refinement should buy recall at unchanged
serving cost (encode/ADC shape identical; only codeword values move).

Fixtures:
- ``sf01_regular`` — the 2000-vector sf0.1 table (generic corpus):
  refinement HELPS, measured 0.064 → 0.108 → 0.124 over iters 0/1/2 —
  the MSE-minimizing update improves ADC distance fidelity, the
  textbook effect.
- ``sf1_hard`` — the r11 non-saturating fixture (20k vectors: 2000
  base × 10 copies, jitter 0.12 on half the dims): refinement HURTS
  recall-vs-exact-L2 (0.04 → ~0), and the mechanism matters more than
  the number: Lloyd pulls codewords to cluster means, so a base
  vector's ten near-copies (and their neighbors) collapse to ONE code
  per subspace — ADC then TIES across the whole copy block and top-5
  membership inside a tie is id-tiebreak-arbitrary, where the
  sampling-init books (actual corpus vectors) accidentally separate
  some copies. PQ at m=4/k=16 cannot discriminate within
  near-duplicate blocks with EITHER codebook (init recall 0.04 ≈
  within-tie chance); on dup-heavy corpora that is the binary/Hamming
  family's regime (its hard-fixture recall@5 is 0.618 at rerank 250),
  not PQ's.

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
    result = {
        "m": M,
        "n_codes": N_CODES,
        "k": K,
        "n_queries": NQ,
        "fixtures": {},
        "note": "refinement helps on the generic corpus and collapses"
        " to ADC ties on the near-duplicate fixture — see the module"
        " docstring for the mechanism; dup-heavy corpora are the"
        " binary/Hamming family's regime, not PQ's.",
    }

    for fname, frame in (
        (
            "sf01_regular",
            spark.read.parquet(
                "/root/testdata/sf0.1/embeddings.parquet"
            ).select("vec_id", "embedding"),
        ),
        (
            "sf1_hard",
            spark.read.parquet(f"{HARD}/embeddings.parquet").select(
                "vec_id", "embedding"
            ),
        ),
    ):
        q = frame.filter(F.col("vec_id") < NQ)
        exact = S.l2_topk(frame, q, k=K).select("query_id", "vec_id")
        exact.persist()
        n_exact = exact.count()
        points = {}
        for iters in (0, 1, 2):
            def run():
                S.pq_adc_topk(
                    frame, q, k=K, m=M, n_codes=N_CODES, refine_iters=iters
                ).write.format("noop").mode("overwrite").save()

            pq = S.pq_adc_topk(
                frame, q, k=K, m=M, n_codes=N_CODES, refine_iters=iters
            ).select("query_id", "vec_id")
            hits = exact.join(pq, ["query_id", "vec_id"], "left_semi").count()
            run()
            walls = []
            for _ in range(2):
                t0 = time.time()
                run()
                walls.append(round(time.time() - t0, 2))
            points[f"refine_iters={iters}"] = {
                "recall_at_5": round(hits / n_exact, 4),
                "wall_s": min(walls),
                "walls_raw": walls,
            }
        exact.unpersist()
        result["fixtures"][fname] = {
            "vectors": frame.count(),
            "points": points,
            "refined_minus_init_recall": round(
                points["refine_iters=1"]["recall_at_5"]
                - points["refine_iters=0"]["recall_at_5"],
                4,
            ),
        }
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
