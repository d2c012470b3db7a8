"""Round-13 census: inline vs broadcast PQ-encode strategy crossover —
the evidence behind ``PQ_INLINE_MAX_LITERALS = 1024``.

Two ceilings push ``auto`` to the broadcast form early. Plan SIZE is
the obvious one (262k literals at production dials). The one this
census measures is plan COST: the inline m×k struct-sort expression
falls out of whole-stage codegen well before the size ceiling and
evaluates interpreted per row, so its wall grows with BOTH codebook
floats and corpus rows, while the broadcast join + partial-agg argmin
stays codegen'd. Grid: (m, n_codes) × {inline, broadcast} × two corpus
sizes (the 500-row sf0.01 fixture; 40k rows = 2× the sf1 corpus),
noop-sinked, warm JVM (min-of-2 at 40k).

Writes tools/bench_pq_strategy_r13.json.
Usage: python tools/bench_pq_strategy_r13.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = f"{REPO}/tools/bench_pq_strategy_r13.json"
POINTS = [(4, 16), (4, 32), (4, 64), (8, 16), (8, 32), (8, 64)]


def main() -> None:
    from pyspark.sql import functions as F

    from hbase_taggregator_spark.operators import similarity as S
    from hbase_taggregator_spark.session import get_spark

    spark = get_spark(app_name="bench-pq-strategy-r13")
    spark.sparkContext.setLogLevel("ERROR")

    small = spark.read.parquet(
        "/root/testdata/sf0.01/embeddings.parquet"
    ).select("vec_id", "embedding")
    sf1 = spark.read.parquet(
        f"{REPO}/.benchdata/sf1/embeddings.parquet"
    ).select("vec_id", "embedding")
    big = sf1.unionByName(
        sf1.select(
            (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
        )
    )
    big.cache()
    nbig = big.count()

    out: dict = {
        "threshold_committed": S.PQ_INLINE_MAX_LITERALS,
        "corpora": {"small_rows": small.count(), "big_rows": nbig},
        "points": {},
    }
    for label, corpus, runs in (("small", small, 1), ("big", big, 2)):
        for m, k in POINTS:
            books = S.pq_codebooks(corpus, m, k)
            floats = sum(len(v) for _, _, v in books)
            row: dict = {"codebook_floats": floats}
            for strat in ("inline", "broadcast"):
                walls = []
                for _ in range(runs):
                    t0 = time.monotonic()
                    S.pq_encode(
                        corpus, books, m, pq_strategy=strat
                    ).write.format("noop").mode("overwrite").save()
                    walls.append(round(time.monotonic() - t0, 1))
                row[strat + "_wall_s"] = min(walls)
            out["points"][f"{label}:m={m},codes={k}"] = row
            print(label, m, k, row, flush=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
