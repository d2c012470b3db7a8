"""Quiet-state isolated A/B for the three r8 in-suite >1.3x flags that
were settled only by the blanket ambient-drift verdict (VERDICT r8
"What's wrong" #3): q8_market_share (suite 0.947 s r7 -> 1.399 s r8),
dedup_jaccard_df_capped (2.216 -> 3.235), streaming_stream_join_pairs
(2.176 -> 3.150). All three are UNCHANGED CODE since r3, so no
alternating-code arm is needed — the question is purely whether the
isolated quiet-state number sits at the r7 level (drift confirmed) or
the r8 level (real regression). min-of-3 each, noop sink, after a
worker-pool warmup; run SEQUENTIALLY with nothing else on the box.

Writes tools/ab_drift_r9.log. Usage: python tools/ab_drift_r9.py
"""

from __future__ import annotations

import json
import os
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

from hbase_taggregator_spark.queries import QUERIES  # noqa: E402
from hbase_taggregator_spark.session import get_spark  # noqa: E402

FLAGGED = {
    # name -> (r7 suite seconds, r8 suite seconds)
    "q8_market_share": (0.947, 1.399),
    "dedup_jaccard_df_capped": (2.216, 3.235),
    "streaming_stream_join_pairs": (2.176, 3.150),
}


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="ab-drift-r9", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JVM + Python worker pool (the bench.py protocol)
    QUERIES["ts_max_900"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    QUERIES["multimodal_frame_sample"](spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()

    out = {}
    for name, (r7, r8) in FLAGGED.items():
        runs = []
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.time() - t0, 3))
        best = min(runs)
        out[name] = {
            "isolated_runs": runs,
            "isolated_min": best,
            "suite_r7": r7,
            "suite_r8": r8,
            "verdict": (
                "drift (isolated at/below the r7 level)"
                if best <= r7 * 1.15
                else "REGRESSION? isolated above r7 by "
                f"{best / r7:.2f}x — investigate"
            ),
        }
        print(name, json.dumps(out[name]), flush=True)

    with open(f"{repo}/tools/ab_drift_r9.log", "w") as f:
        f.write(
            "== r9 quiet-state isolated A/B for the three r8 drift-flagged "
            "queries (unchanged code since r3) ==\n"
        )
        f.write(json.dumps(out, indent=1) + "\n")
    print("wrote tools/ab_drift_r9.log")
    spark.stop()


if __name__ == "__main__":
    main()
