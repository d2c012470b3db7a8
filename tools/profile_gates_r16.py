"""Round-15 optimization profiling: split each heavy gate's wall into
DataFrame-CONSTRUCTION time (driver-side collects: centroid
materialization, codebook training, Lloyd refinement, index build/read
round-trips) vs EXECUTION time (the noop-sink run of the returned plan),
and count the Spark jobs each phase schedules.

The bench times `t0 -> QUERIES[name](spark, sf_dir) -> noop write`, so
BOTH phases are inside every committed number; knowing the split says
whether to attack driver round-trips or the executed plan.

Usage: python tools/profile_gates_r16.py [sf_dir] [query ...]
Writes tools/profile_gates_r16.json.
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

DEFAULT_TARGETS = [
    "similarity_ivf_pq_recall_floor",
    "similarity_ivf_pq_residual_indexed_recall_at_5",
    "embedding_binary_incremental_admitted",
    "similarity_ivf_binary_indexed_recall_at_5",
    "similarity_ivf_pq_indexed_recall_at_5",
    "similarity_ivf_binary_recall_at_5",
    "similarity_ivf_pq_rerank_recall_at_5",
    "similarity_twolevel_recall_at_5",
    "similarity_ivf_pq_residual_recall_at_5",
    "similarity_ivf_kmeans_recall_at_5",
    "similarity_ivf_pq_recall_at_5",
    "similarity_twolevel_topk",
    "similarity_twolevel_assign",
    "dedup_minhash_lsh_candidates",
    "pq_code_collapse_census",
    "similarity_ivf_binary_recall_floor",
    "streaming_stateful_running_extrema",
    "similarity_kmeans_twolevel_refine",
    "similarity_pq_recall_at_5",
    "similarity_opq_lowrank_gain",
    "graph_pagerank_suppliers",
    "dedup_duplicate_clusters",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    targets = sys.argv[2:] or DEFAULT_TARGETS

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark(
        app_name="profile-gates-r16",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    # suite-identical warm-up
    QUERIES["ts_max_900"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    QUERIES["multimodal_frame_sample"](spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()

    def job_count() -> int:
        return len(tracker.getJobIdsForGroup(None) or [])

    results: dict[str, dict] = {}
    for name in targets:
        if name not in QUERIES:
            continue
        best = None
        for _ in range(2):
            sc.setJobDescription(f"profile:{name}:construct")
            j0 = job_count()
            t0 = time.time()
            df = QUERIES[name](spark, sf_dir)
            t1 = time.time()
            j1 = job_count()
            sc.setJobDescription(f"profile:{name}:exec")
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            j2 = job_count()
            sc.setJobDescription(None)
            rec = {
                "construct_s": round(t1 - t0, 3),
                "exec_s": round(t2 - t1, 3),
                "total_s": round(t2 - t0, 3),
                "construct_jobs": j1 - j0,
                "exec_jobs": j2 - j1,
            }
            if best is None or rec["total_s"] < best["total_s"]:
                best = rec
        results[name] = best
        print(
            f"{name:55s} total={best['total_s']:7.2f}s "
            f"construct={best['construct_s']:7.2f}s ({best['construct_jobs']} jobs) "
            f"exec={best['exec_s']:7.2f}s ({best['exec_jobs']} jobs)",
            flush=True,
        )

    out = os.path.join(REPO, "tools", "profile_gates_r16.json")
    with open(out, "w") as f:
        json.dump({"sf_dir": sf_dir, "gates": results}, f, indent=1)
    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
