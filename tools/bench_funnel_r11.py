"""Round-11 funnel census: the skew guard's engagement, quantified
(VERDICT r10 "What's wrong" #3 / "Next round" #3).

The r10 census (tools/bench_funnel_r10.json) showed candidate pairs
growing ×104.5 for docs ×10 — duplicate-density-driven quadratic growth
inside band buckets — and the funnel carries a ``max_bucket=1000`` skew
guard, but the artifact didn't record the observed bucket-size
distribution, so a reader couldn't tell how far the fixture sits from
the cap or whether it ever engages. This script emits, at sf1 AND sf10,
next to the candidate counts:

- ``n_buckets`` / ``n_pair_buckets`` — total (band_idx, band_key)
  buckets and those with ≥ 2 members (the ones that produce pairs);
- ``bucket_max`` / ``bucket_p99`` / ``bucket_p999`` — the observed
  size distribution over pair-producing buckets;
- ``n_buckets_capped`` — buckets with > max_bucket members (DROPPED
  whole by the guard before the self-join);
- ``band_rows_dropped_singleton`` / ``band_rows_dropped_capped`` —
  band rows pruned as unpairable vs pruned by the cap;
- ``pairs_suppressed_by_cap`` — Σ C(n,2) over capped buckets: the
  quadratic work the guard refused (0 when the cap never engages);
- ``headroom_x`` — max_bucket / bucket_max (how far the fixture sits
  below the guard when it doesn't engage).

Parameters are EXACTLY the r10 census's (the gate's, with
hash_fn='xxhash64'). Walls are NOT re-timed — the wall/candidate decade
ratios live in tools/bench_funnel_r10.json; this artifact adds the
distribution axis the guard decision needs.

Writes tools/bench_funnel_r11.json.
Usage: python tools/bench_funnel_r11.py
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = f"{REPO}/tools/bench_funnel_r11.json"
PARAMS = dict(threshold=0.4, k=16, bands=4, max_bucket=1000,
              hash_fn="xxhash64")


def main() -> None:
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")

    from pyspark.sql import functions as F

    from hbase_taggregator_spark.operators.dedup import (
        _band_rows,
        minhash_lsh_candidates,
        minhash_signatures,
    )
    from hbase_taggregator_spark.session import get_spark

    spark = get_spark(app_name="bench-funnel-r11")
    spark.sparkContext.setLogLevel("ERROR")

    result: dict = {
        "params": dict(PARAMS),
        "walls_note": "walls + per-stage decade ratios are in "
        "tools/bench_funnel_r10.json (unchanged code); this artifact "
        "adds the band-bucket size distribution and cap engagement",
    }

    for sf in ("sf1", "sf10"):
        docs = spark.read.parquet(f"{REPO}/.benchdata/{sf}/documents.parquet")
        n_docs = docs.count()

        sig = minhash_signatures(
            docs, k=PARAMS["k"], hash_fn=PARAMS["hash_fn"]
        )
        bands_df = _band_rows(sig, "doc_id", PARAMS["k"], PARAMS["bands"])
        bucket_n = bands_df.groupBy("band_idx", "band_key").agg(
            F.count(F.lit(1)).alias("bn")
        )
        mb = PARAMS["max_bucket"]
        stats = bucket_n.agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum(F.when(F.col("bn") >= 2, 1).otherwise(0)).alias(
                "n_pair_buckets"
            ),
            F.max("bn").alias("bucket_max"),
            F.expr("percentile(bn, 0.99)  FILTER (WHERE bn >= 2)").alias(
                "bucket_p99"
            ),
            F.expr("percentile(bn, 0.999) FILTER (WHERE bn >= 2)").alias(
                "bucket_p999"
            ),
            F.sum(F.when(F.col("bn") > mb, 1).otherwise(0)).alias(
                "n_buckets_capped"
            ),
            F.sum(F.when(F.col("bn") == 1, F.col("bn")).otherwise(0)).alias(
                "band_rows_dropped_singleton"
            ),
            F.sum(F.when(F.col("bn") > mb, F.col("bn")).otherwise(0)).alias(
                "band_rows_dropped_capped"
            ),
            F.sum(
                F.when(
                    F.col("bn") > mb,
                    F.col("bn") * (F.col("bn") - 1) / 2,
                ).otherwise(0)
            ).alias("pairs_suppressed_by_cap"),
        ).collect()[0]

        candidate_pairs = minhash_lsh_candidates(docs, **{
            k: v for k, v in PARAMS.items() if k != "threshold"
        }).count()

        row = {
            "docs": n_docs,
            "candidate_pairs": candidate_pairs,
            "n_buckets": int(stats["n_buckets"]),
            "n_pair_buckets": int(stats["n_pair_buckets"]),
            "bucket_max": int(stats["bucket_max"]),
            "bucket_p99_pair_buckets": float(stats["bucket_p99"]),
            "bucket_p999_pair_buckets": float(stats["bucket_p999"]),
            "n_buckets_capped": int(stats["n_buckets_capped"]),
            "band_rows_dropped_singleton": int(
                stats["band_rows_dropped_singleton"]
            ),
            "band_rows_dropped_capped": int(
                stats["band_rows_dropped_capped"]
            ),
            "pairs_suppressed_by_cap": int(
                stats["pairs_suppressed_by_cap"]
            ),
            "headroom_x": round(mb / int(stats["bucket_max"]), 2),
        }
        result[sf] = row
        print(json.dumps({sf: row}), flush=True)

    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
