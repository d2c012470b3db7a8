"""Round-7 A/B harness for the pagerank pinning strategy (VERDICT r6 task #1).

Times the full gate query (graph_pagerank_suppliers shape: edge build from
lineitem ⋈ orders at sf0.1, 3 power steps, orderBy) end-to-end through the
noop sink, min-of-3 warm runs per variant, clearing cache between variants.

Variants:
  r6        — eager localCheckpoint(e) + persist(nodes) + persist(outdeg)  [current]
  lazy      — fully lazy (r5 shape): rely on planner ReuseExchange
  ckpt_only — eager localCheckpoint(e); nodes/outdeg lazy (no persists)
  persist_e — lazy persist(e) only; nodes/outdeg lazy
  persist_all — lazy persist on e, nodes, outdeg (no checkpoint, no eager job)
"""
from __future__ import annotations

import json
import os
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

from pyspark.sql import DataFrame, functions as F  # noqa: E402
from pyspark.storagelevel import StorageLevel  # noqa: E402

from hbase_taggregator_spark.session import get_spark  # noqa: E402
from hbase_taggregator_spark.sources.parquet import load_table  # noqa: E402


def _loop(e, nodes, outdeg, n_frame, n_iter, damping):
    ranks = nodes.crossJoin(F.broadcast(n_frame)).select(
        "node", (F.lit(1.0) / F.col("__n").cast("double")).alias("rank")
    )
    for _ in range(n_iter):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("__od").cast("double"))
                .cast("decimal(38,18)")
                .alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").cast("double").alias("__in"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(n_frame))
            .select(
                "node",
                (
                    F.lit(1.0 - damping) / F.col("__n").cast("double")
                    + F.lit(damping) * F.coalesce(F.col("__in"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks


def _derive(e):
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_frame = nodes.agg(F.count(F.lit(1)).alias("__n"))
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__od"))
    return nodes, n_frame, outdeg


def pr_r6(edges, n_iter=3, damping=0.85):
    e = edges.select("src", "dst").distinct().localCheckpoint()
    nodes, n_frame, outdeg = _derive(e)
    nodes = nodes.persist(StorageLevel.MEMORY_AND_DISK)
    outdeg = outdeg.persist(StorageLevel.MEMORY_AND_DISK)
    return _loop(e, nodes, outdeg, n_frame, n_iter, damping)


def pr_lazy(edges, n_iter=3, damping=0.85):
    e = edges.select("src", "dst").distinct()
    nodes, n_frame, outdeg = _derive(e)
    return _loop(e, nodes, outdeg, n_frame, n_iter, damping)


def pr_ckpt_only(edges, n_iter=3, damping=0.85):
    e = edges.select("src", "dst").distinct().localCheckpoint()
    nodes, n_frame, outdeg = _derive(e)
    return _loop(e, nodes, outdeg, n_frame, n_iter, damping)


def pr_persist_e(edges, n_iter=3, damping=0.85):
    e = edges.select("src", "dst").distinct().persist(StorageLevel.MEMORY_AND_DISK)
    nodes, n_frame, outdeg = _derive(e)
    return _loop(e, nodes, outdeg, n_frame, n_iter, damping)


def pr_persist_all(edges, n_iter=3, damping=0.85):
    e = edges.select("src", "dst").distinct().persist(StorageLevel.MEMORY_AND_DISK)
    nodes, n_frame, outdeg = _derive(e)
    nodes = nodes.persist(StorageLevel.MEMORY_AND_DISK)
    outdeg = outdeg.persist(StorageLevel.MEMORY_AND_DISK)
    return _loop(e, nodes, outdeg, n_frame, n_iter, damping)


VARIANTS = {
    "r6": pr_r6,
    "lazy": pr_lazy,
    "ckpt_only": pr_ckpt_only,
    "persist_e": pr_persist_e,
    "persist_all": pr_persist_all,
}


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="ab-pagerank-r7", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")

    def build_edges():
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders")
        return li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).select(
            F.col("l_suppkey").alias("src"),
            (F.lit(1_000_000) + F.col("o_custkey")).alias("dst"),
        )

    # warm-up: file listing + codegen
    build_edges().groupBy("src").count().write.format("noop").mode("overwrite").save()

    results = {}
    order = list(VARIANTS) + list(reversed(VARIANTS))  # interleave to de-bias drift
    runs: dict[str, list] = {k: [] for k in VARIANTS}
    for name in order + list(VARIANTS):  # 3 runs each
        fn = VARIANTS[name]
        spark.catalog.clearCache()
        t0 = time.time()
        fn(build_edges()).orderBy("node").write.format("noop").mode("overwrite").save()
        runs[name].append(round(time.time() - t0, 3))
        spark.catalog.clearCache()
    for name, rr in runs.items():
        results[name] = {"runs": rr, "min": min(rr)}
    print(json.dumps(results, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
