"""Price the IVFADC operating point (VERDICT r12 "Next round" #1).

The r12 gate dials (m=4 × 16 codewords at dim=64 → 16 bits/vector)
read absolute recall@5 of only 0.108 on sf0.1 — a toy point. This
sweep measures mean recall@5 of the composed `ivf_pq_topk` stack
(flat 16-cell IVF, 4 probes, Lloyd refine_iters=1 — the gate's
composition) across (m, n_codes) dials at sf0.01 and sf0.1, so the
committed floor-gate point is PRICED by a census, not asserted.

Bits/vector = m·log2(n_codes); LUT work per query = m·n_codes
subspace distances. The sweep spans 16→128 bits.

Output: tools/bench_pq_r13.json
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from hbase_taggregator_spark import get_spark  # noqa: E402
from hbase_taggregator_spark.operators import similarity as S  # noqa: E402
from hbase_taggregator_spark.sources import load_table  # noqa: E402

K = 5
POINTS = [(4, 16), (4, 64), (8, 16), (8, 64), (8, 256), (16, 64), (16, 256)]


def recall(spark, sf_dir: str, m: int, n_codes: int) -> tuple[float, float]:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    t0 = time.monotonic()
    pq = S.ivf_pq_topk(
        emb, queries, k=K, m=m, n_codes=n_codes, n_centroids=16,
        n_probe=4, refine_iters=1,
    ).select("query_id", "vec_id")
    exact = S.l2_topk(emb, queries, k=K).select("query_id", "vec_id")
    n_hits = exact.join(pq, ["query_id", "vec_id"], "left_semi").count()
    wall = time.monotonic() - t0
    return n_hits / (10 * K), wall


def main() -> None:
    spark = get_spark(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"k": K, "n_queries": 10, "refine_iters": 1,
                 "nlist": 16, "n_probe": 4, "points": {}}
    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        label = sf.rsplit("/", 1)[-1]
        out["points"][label] = {}
        for m, n_codes in POINTS:
            r, wall = recall(spark, sf, m, n_codes)
            bits = m * (n_codes - 1).bit_length()
            out["points"][label][f"m={m},codes={n_codes}"] = {
                "bits_per_vector": bits,
                "recall_at_5": round(r, 4),
                "wall_s": round(wall, 2),
            }
            print(label, m, n_codes, "->", r, f"{wall:.1f}s", flush=True)
    with open("tools/bench_pq_r13.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
