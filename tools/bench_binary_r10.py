"""Scale/quality evidence for the r10 binary-quantization retrieval
family (the same census discipline as the two-level probe sweep in
tools/bench_twolevel_r9.json): at sf1 (20k vectors, 64-dim), sweep the
Hamming shortlist size and record recall@5 against brute-force cosine
next to min-of-2 walls and the bound quantities — the first-pass
payload (2 packed words + id per corpus vector ≈ 24 B vs 512 B of
floats: the 32×-cut claim, stated as bytes) and the re-rank candidate
count (nq · rerank_k). The table is the engineering dial: shortlist
size buys recall linearly into re-rank work while the first pass cost
is flat (it always scans all N words).

Writes tools/bench_binary_r10.json.
Usage: python tools/bench_binary_r10.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF1 = f"{REPO}/.benchdata/sf1"
OUT = f"{REPO}/tools/bench_binary_r10.json"
N_QUERIES = 100
K = 5


def main() -> None:
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")

    from pyspark.sql import functions as F

    from hbase_taggregator_spark.operators import similarity as S
    from hbase_taggregator_spark.session import get_spark

    spark = get_spark(app_name="bench-binary-r10")
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{SF1}/embeddings.parquet")
    n = emb.count()
    queries = emb.orderBy("vec_id").limit(N_QUERIES)

    # untimed warmup
    S.binary_hamming_topk(
        emb.limit(2000), queries.limit(5), k=K, rerank_k=20
    ).count()

    # brute-force ground truth (and its wall — the number the shortlist
    # path must beat while holding recall)
    exact_walls = []
    for _ in range(2):
        t0 = time.time()
        S.cosine_topk(emb, queries, k=K).count()
        exact_walls.append(round(time.time() - t0, 2))
    exact = {}
    for r in S.cosine_topk(emb, queries, k=K).collect():
        exact.setdefault(r["query_id"], set()).add(r["vec_id"])

    result: dict = {
        "corpus_rows": n,
        "n_queries": N_QUERIES,
        "k": K,
        "dim": 64,
        "first_pass_bytes_per_vector": 24,   # id + 2 packed words
        "float_bytes_per_vector": 64 * 8,
        "exact_walls_s": exact_walls,
        "exact_wall_min2_s": min(exact_walls),
    }

    sweep = []
    for rerank_k in (10, 25, 50, 100, 200):
        walls = []
        for _ in range(2):
            t0 = time.time()
            S.binary_hamming_topk(
                emb, queries, k=K, rerank_k=rerank_k, threshold="mean"
            ).count()
            walls.append(round(time.time() - t0, 2))
        got = {}
        for r in S.binary_hamming_topk(
            emb, queries, k=K, rerank_k=rerank_k, threshold="mean"
        ).collect():
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        recall = sum(
            len(got.get(q, set()) & hits) / K for q, hits in exact.items()
        ) / max(len(exact), 1)
        sweep.append(
            {
                "rerank_k": rerank_k,
                "rerank_candidates": N_QUERIES * rerank_k,
                "walls_s": walls,
                "wall_min2_s": min(walls),
                "recall_at_5": round(recall, 4),
            }
        )
        print(json.dumps(sweep[-1]), flush=True)
    result["rerank_sweep_sf1"] = sweep

    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
