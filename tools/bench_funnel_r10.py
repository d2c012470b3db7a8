"""Round-10 census-pairing for the dedup funnel (VERDICT r9 "Next
round" #5): `dedup_funnel_survivors` is the largest sf1 bench cost
(9.88 s committed r9) and carried wall numbers but no bound-quantity
census at scale. Run the funnel at sf1 (20k docs) AND sf10 (200k docs)
recording the per-stage bound quantities next to wall — the same
discipline tools/bench_twolevel_r9.json applied to two-level
assignment — so the wall ratio can be read against the quantities that
actually bound the cost:

- ``sig_rows``     — documents with ≥1 shingle (signature stage input
                     to banding; the explode/shuffle-bound stage).
- ``band_rows``    — sig_rows × bands (the self-join's input rows).
- ``kept_band_rows`` — band rows surviving the bucket guard
                     (2 ≤ bucket ≤ max_bucket); what actually meets in
                     the banded self-join.
- ``candidate_pairs`` — distinct (id_a, id_b) out of the LSH join: the
                     verify stage's input and the funnel's bound
                     quantity (verify cost = pairs × array-intersect).
- ``verified_dup_ids`` — distinct dropped ids after exact Jaccard.
- ``survivors``    — funnel output rows.

Parameters are EXACTLY the `dedup_funnel_survivors` gate's
(threshold=0.4, k=16, bands=4, max_bucket=1000) with
``hash_fn='xxhash64'`` — the production fast path the sf1 bench
section times (same banding quality, engine-native hash; the md5
oracle contract is unchanged and separately gated). Walls are min-of-2
after an untimed warmup; the sf1 fixture is ~800× denser in near-dups
than uniform synthetic text (bench.py NOTE), so candidate counts are
the honest cross-scale axis, not doc counts.

Writes tools/bench_funnel_r10.json.
Usage: python tools/bench_funnel_r10.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = f"{REPO}/tools/bench_funnel_r10.json"
PARAMS = dict(threshold=0.4, k=16, bands=4, max_bucket=1000,
              hash_fn="xxhash64")


def main() -> None:
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")

    from pyspark.sql import functions as F

    from hbase_taggregator_spark.operators.dedup import (
        _band_rows,
        dedup_funnel,
        minhash_lsh_candidates,
        minhash_signatures,
        word_shingles,
    )
    from hbase_taggregator_spark.session import get_spark

    spark = get_spark(app_name="bench-funnel-r10")
    spark.sparkContext.setLogLevel("ERROR")

    result: dict = {"params": {k: v for k, v in PARAMS.items()}}

    for sf in ("sf1", "sf10"):
        docs = spark.read.parquet(f"{REPO}/.benchdata/{sf}/documents.parquet")
        n_docs = docs.count()

        # untimed warmup (worker pool, codegen, shuffle service)
        dedup_funnel(docs.limit(500), **PARAMS).count()

        # wall: the full funnel end-to-end, min-of-2
        walls = []
        for _ in range(2):
            t0 = time.time()
            survivors = dedup_funnel(docs, **PARAMS).count()
            walls.append(round(time.time() - t0, 2))

        # per-stage bound quantities (recomputed outside the timed pass —
        # census jobs must not pollute the wall)
        sig = minhash_signatures(
            docs, k=PARAMS["k"], hash_fn=PARAMS["hash_fn"]
        )
        sig_rows = sig.count()
        bands_df = _band_rows(sig, "doc_id", PARAMS["k"], PARAMS["bands"])
        band_rows = bands_df.count()
        bucket_n = bands_df.groupBy("band_idx", "band_key").agg(
            F.count(F.lit(1)).alias("__bn")
        )
        kept = bucket_n.filter(
            (F.col("__bn") >= 2) & (F.col("__bn") <= PARAMS["max_bucket"])
        )
        kept_band_rows = (
            bands_df.join(kept.select("band_idx", "band_key"),
                          ["band_idx", "band_key"]).count()
        )
        cand = minhash_lsh_candidates(docs, **{
            k: v for k, v in PARAMS.items() if k != "threshold"
        })
        candidate_pairs = cand.count()
        # verified duplicate ids: the funnel's drop set (same algebra as
        # dedup_funnel's verify stage)
        arrays = docs.select(
            "doc_id", word_shingles(F.col("text"), 3).alias("shs")
        )
        inter = (
            cand.select("id_a", "id_b")
            .join(arrays.select(F.col("doc_id").alias("id_a"),
                                F.col("shs").alias("shs_a")), "id_a")
            .join(arrays.select(F.col("doc_id").alias("id_b"),
                                F.col("shs").alias("shs_b")), "id_b")
            .select(
                F.size(F.array_intersect("shs_a", "shs_b")).alias("nc"),
                F.size("shs_a").alias("na"),
                F.size("shs_b").alias("nb"),
                "id_b",
            )
        )
        verified = (
            inter.filter(
                (F.col("nc") > 0)
                & (F.col("nc").cast("double")
                   / (F.col("na") + F.col("nb") - F.col("nc"))
                   >= PARAMS["threshold"])
            ).select("id_b").distinct().count()
        )

        result[sf] = {
            "docs": n_docs,
            "sig_rows": sig_rows,
            "band_rows": band_rows,
            "kept_band_rows": kept_band_rows,
            "candidate_pairs": candidate_pairs,
            "verified_dup_ids": verified,
            "survivors": survivors,
            "walls_s": walls,
            "wall_min2_s": min(walls),
        }
        print(json.dumps({sf: result[sf]}), flush=True)

    s1, s10 = result["sf1"], result["sf10"]
    result["ratios_sf10_over_sf1"] = {
        "docs": round(s10["docs"] / s1["docs"], 2),
        "candidate_pairs": round(
            s10["candidate_pairs"] / max(s1["candidate_pairs"], 1), 2
        ),
        "wall": round(s10["wall_min2_s"] / s1["wall_min2_s"], 2),
    }
    print(json.dumps(result["ratios_sf10_over_sf1"]), flush=True)

    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
