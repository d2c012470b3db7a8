"""Focused r6-vs-ckpt_only pagerank A/B: 5 alternating runs each."""
from __future__ import annotations

import json
import os
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

from ab_pagerank_r7 import VARIANTS  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from hbase_taggregator_spark.session import get_spark  # noqa: E402
from hbase_taggregator_spark.sources.parquet import load_table  # noqa: E402


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="ab-pagerank-r7b", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")

    def build_edges():
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders")
        return li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).select(
            F.col("l_suppkey").alias("src"),
            (F.lit(1_000_000) + F.col("o_custkey")).alias("dst"),
        )

    build_edges().groupBy("src").count().write.format("noop").mode("overwrite").save()

    names = ["r6", "ckpt_only"]
    runs = {k: [] for k in names}
    for i in range(10):
        name = names[i % 2]
        spark.catalog.clearCache()
        t0 = time.time()
        VARIANTS[name](build_edges()).orderBy("node").write.format("noop").mode(
            "overwrite"
        ).save()
        runs[name].append(round(time.time() - t0, 3))
    print(json.dumps({k: {"runs": v, "min": min(v)} for k, v in runs.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
