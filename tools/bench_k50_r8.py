"""Round-8 census-paired timing for repeated-substring dedup at the
PAPER setting k=50 (VERDICT r7 "Next round" #6; Lee et al.
arXiv:2107.06499 use 50-token windows).

The fixture documents average ~54 tokens, so 50-token windows cannot
repeat within them; synthesize long documents by concatenating the
texts grouped by ``doc_id % G`` (spreads the near-duplicate cliques
across groups, so shared 50-token runs land in DIFFERENT long
documents), keeping tokens-per-long-document constant across the
decade (G scales with corpus size). Correctness at k=50 is pinned
separately against the pure-Python reference
(tests/test_round8.py::test_repeated_substrings_paper_k50_matches_reference).

For each scale point record: wall for the dedup, total tokens, and the
BOUND QUANTITY census — duplicated k-gram occurrences (the r6
discipline: fixture cliques densify grams super-linearly, so a wall
ratio without its census reads as a regression when it is the fixture).

Writes tools/bench_k50_r8.json.

Usage: python tools/bench_k50_r8.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

K = 50
POINTS = [
    ("sf0.1", "/root/testdata/sf0.1", 50),
    ("sf1", f"{REPO}/.benchdata/sf1", 500),
]
OUT = f"{REPO}/tools/bench_k50_r8.json"


def main() -> None:
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")

    from pyspark.sql import functions as F

    from hbase_taggregator_spark.operators.text import (
        dedup_repeated_substrings, tokens,
    )
    from hbase_taggregator_spark.session import get_spark
    from hbase_taggregator_spark.util import ensure_parallelism

    spark = get_spark(app_name="bench-k50-r8")
    spark.sparkContext.setLogLevel("ERROR")

    def long_docs(sf_dir: str, g: int):
        """Deterministic synthetic concatenation: group ``doc_id % g``,
        texts joined in doc_id order."""
        return (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select((F.col("doc_id") % g).alias("grp"), "doc_id", "text")
            .groupBy("grp")
            .agg(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("doc_id", "text"))
                        ),
                        lambda s: s["text"],
                    ),
                    " ",
                ).alias("text")
            )
            .select(F.col("grp").alias("doc_id"), "text")
        )

    # warmup: worker pool + parquet footer caches
    dedup_repeated_substrings(
        long_docs(POINTS[0][1], POINTS[0][2]).limit(4), k=K
    ).count()

    result = {"k": K, "points": {}}
    for name, sf_dir, g in POINTS:
        spark.catalog.clearCache()
        docs = ensure_parallelism(long_docs(sf_dir, g))
        walls = []
        removed = tok_total = rows = 0
        for _ in range(2):  # best-of-2 (short queries; per-run noise)
            t0 = time.time()
            agg = dedup_repeated_substrings(docs, k=K).agg(
                F.count(F.lit(1)).alias("rows"),
                F.sum("n_tokens").alias("toks"),
                F.sum("n_removed").alias("removed"),
            ).collect()[0]
            walls.append(time.time() - t0)
            rows, tok_total, removed = (
                int(agg["rows"]), int(agg["toks"]), int(agg["removed"]),
            )
        # census: duplicated k-gram OCCURRENCES (the bound quantity)
        tk = docs.select(tokens(F.col("text")).alias("tk")).filter(
            F.size("tk") >= K
        )
        occ = tk.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("tk") - F.lit(K - 1)),
                    lambda p: F.md5(
                        F.array_join(F.slice(F.col("tk"), p, F.lit(K)), " ")
                    ),
                )
            ).alias("fp")
        )
        census = occ.groupBy("fp").agg(F.count(F.lit(1)).alias("c")).filter(
            F.col("c") >= 2
        ).agg(
            F.coalesce(F.sum("c"), F.lit(0)).alias("occ"),
            F.count(F.lit(1)).alias("grams"),
        ).collect()[0]
        result["points"][name] = {
            "long_docs": rows,
            "groups": g,
            "total_tokens": tok_total,
            "tokens_removed": removed,
            "dup_gram_occurrences": int(census["occ"]),
            "distinct_dup_grams": int(census["grams"]),
            "wall_s": round(min(walls), 2),
            "runs": len(walls),
        }
        print(name, json.dumps(result["points"][name]))

    p0 = result["points"]["sf0.1"]
    p1 = result["points"]["sf1"]
    result["decade_wall_ratio"] = round(p1["wall_s"] / p0["wall_s"], 2)
    result["decade_dup_occurrence_ratio"] = round(
        p1["dup_gram_occurrences"] / max(1, p0["dup_gram_occurrences"]), 2
    )
    result["decade_token_ratio"] = round(
        p1["total_tokens"] / p0["total_tokens"], 2
    )
    print(
        f"decade: wall x{result['decade_wall_ratio']}, "
        f"dup occurrences x{result['decade_dup_occurrence_ratio']}, "
        f"tokens x{result['decade_token_ratio']}"
    )
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
