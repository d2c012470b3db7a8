"""Round-12 drift adjudication (the codified A/B discipline): the r12
full-suite bench read the 154-query r11-common set at 1.13× with 12
queries over the 1.3× triage line — broad, mostly-sub-second inflation
across unrelated plan families, the ambient-drift signature this box
shows every round (r8: a whole-suite 142.2 s vs 136.4 s on identical
code). Every flagged query whose EXECUTED code path is unchanged is
settled by an isolated quiet-state min-of-4 (untimed warmup first): a
number at/below its r11 in-suite level means the flag was suite/ambient
state, not the operator.

Code-change notes per flag: multimodal_decode_pixels,
dedup_incremental_admitted, q22, argmax, cosine_topk,
streaming_static_join_segments, funnel, ann_recall, lsh_neardup_pairs,
text_repetition_features are byte-identical to r11.
similarity_binary_banded_dup_top1 gained input-validation guards that
raise BEFORE plan construction (no executed-path change);
embedding_standardize_checksums is byte-identical (its module changed
elsewhere). So the isolated min-of-N settle rule applies to all.

Writes tools/ab_drift_r12.log. Usage: python tools/ab_drift_r12.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from hbase_taggregator_spark.queries import QUERIES  # noqa: E402
from hbase_taggregator_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"
FLAGS = [
    "multimodal_decode_pixels",
    "dedup_incremental_admitted",
    "q22_idle_customer_balance",
    "argmax_event_per_type",
    "similarity_cosine_topk",
    "similarity_binary_banded_dup_top1",
    "streaming_static_join_segments",
    "embedding_standardize_checksums",
    "funnel_click_to_purchase_1h",
    "similarity_ann_recall_at_5",
    "similarity_lsh_neardup_pairs",
    "text_repetition_features",
]


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark(app_name="ab-drift-r12", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    r11 = json.load(open(f"{REPO}/tools/bench_local_r11.json"))["queries"]
    r12 = json.load(open(f"{REPO}/tools/bench_local_r12.json"))["queries"]

    # warm the JVM + Python worker pool exactly like bench.py
    QUERIES["ts_max_900"](spark, SF).write.format("noop").mode("overwrite").save()
    QUERIES["multimodal_frame_sample"](spark, SF).write.format("noop").mode(
        "overwrite").save()

    lines = [
        "# isolated quiet-state min-of-4 per flagged query @ sf0.1",
        "# query | r11_insuite | r12_insuite | isolated_min4 | verdict",
    ]
    for name in FLAGS:
        walls = []
        QUERIES[name](spark, SF).write.format("noop").mode("overwrite").save()
        for _ in range(4):
            t0 = time.time()
            QUERIES[name](spark, SF).write.format("noop").mode(
                "overwrite").save()
            walls.append(round(time.time() - t0, 3))
        iso = min(walls)
        verdict = (
            "settled (<= r11 level)" if iso <= r11[name] * 1.05
            else ("within 1.3x" if iso <= r11[name] * 1.3 else "REAL?")
        )
        lines.append(
            f"{name} | {r11[name]} | {r12[name]} | {iso} {walls} | {verdict}"
        )
        print(lines[-1])
    with open(f"{REPO}/tools/ab_drift_r12.log", "w") as f:
        f.write("\n".join(lines) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
