"""Capture .explain("formatted") for a set of catalog queries into
plans/r16/<query>_<suffix>.txt — the optimization round's plan evidence.

Gates registered in PLAN_FRAMES (the index-serving gates that
materialize before their tempdir vanishes) are captured through their
LIVE serving-plan factory, so the file shows the real serving plan, not
the post-collect LocalTableScan.

Usage: python tools/capture_plans_r16.py <suffix> [query ...]
"""

from __future__ import annotations

import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from hbase_taggregator_spark.queries import PLAN_FRAMES, QUERIES  # noqa: E402
from hbase_taggregator_spark.session import get_spark  # noqa: E402

DEFAULT_SET = [
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
    "similarity_kmeans_twolevel_refine",
    "similarity_pq_recall_at_5",
    "similarity_opq_lowrank_gain",
    "similarity_ivf_indexed_recall_at_5",
    "graph_pagerank_suppliers",
    "dedup_duplicate_clusters",
    "streaming_stateful_running_extrema",
    "dedup_simhash_pairs",
    "semdedup_survivors",
]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT_SET
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    out_dir = os.path.join(REPO, "plans", "r16")
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name="capture-plans-r16", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    for name in names:
        if name not in QUERIES:
            print(f"skip {name}: not in catalog")
            continue
        try:
            if name in PLAN_FRAMES:
                with tempfile.TemporaryDirectory() as d:
                    df = PLAN_FRAMES[name](spark, sf_dir, d)
                    plan = df._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                            "formatted"
                        )
                    )
                head = "(live serving frame via PLAN_FRAMES)"
            else:
                df = QUERIES[name](spark, sf_dir)
                plan = df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                )
                head = "(registered catalog callable)"
            path = os.path.join(out_dir, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(f"-- {name} {head} sf_dir={sf_dir}\n")
                f.write(plan)
            print(f"wrote {path}")
        except Exception as exc:  # keep capturing the rest
            print(f"ERROR {name}: {exc}")
    spark.stop()


if __name__ == "__main__":
    main()
