"""Generate an sf1-scale bench dataset (10× sf0.1) inside the repo.

/root/testdata is read-only and stops at sf0.1, so the order-of-magnitude
scaling evidence (BENCH sf1 section) needs locally-derived data: each fact
table is unioned 10× with key shifts that keep join relationships intact
(orderkey shifts consistently across orders/lineitem; event/doc/vec ids
shift so uniqueness properties survive). Dimension tables stay fixed —
facts grow faster than dims at real scale, and the plans under test
(shuffle sizing, broadcast choices, LSH bucket caps) are exercised by the
fact side. Embeddings get a deterministic per-copy jitter so the vector
set isn't 10 identical clusters (which would funnel LSH into degenerate
buckets); documents get a per-copy suffix for the same reason, preserving
the original in-copy duplicate rate.

Everything here is plan-deterministic Spark expressions — no RNG state —
so repeated generation is bit-identical. Usage:

    python tools/make_sf1.py [out_dir]   # default <repo>/.benchdata/sf1
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from hbase_taggregator_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
COPIES = 10

#: key shifts chosen above every sf0.1 max key
ORDERKEY_SHIFT = 1_000_000
EVENTID_SHIFT = 10_000_000
DOCID_SHIFT = 1_000_000
VECID_SHIFT = 1_000_000


def generate(spark: SparkSession, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    copies = spark.range(COPIES).select(F.col("id").cast("int").alias("__c"))

    def fanout(df):
        return df.crossJoin(F.broadcast(copies))

    # dimensions: unchanged
    for t in ("region", "nation", "customer", "supplier", "part"):
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out_dir}/{t}.parquet"
        )

    orders = spark.read.parquet(f"{SRC}/orders.parquet")
    fanout(orders).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.col("__c") * ORDERKEY_SHIFT
    ).drop("__c").repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/orders.parquet"
    )

    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    fanout(li).withColumn(
        "l_orderkey", F.col("l_orderkey") + F.col("__c") * ORDERKEY_SHIFT
    ).drop("__c").repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/lineitem.parquet"
    )

    events = spark.read.parquet(f"{SRC}/events.parquet")
    fanout(events).withColumn(
        "event_id", F.col("event_id") + F.col("__c").cast("long") * EVENTID_SHIFT
    ).drop("__c").repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/events.parquet"
    )

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    fanout(docs).withColumn(
        "doc_id", F.col("doc_id") + F.col("__c").cast("long") * DOCID_SHIFT
    ).withColumn(
        "text",
        F.when(F.col("__c") == 0, F.col("text")).otherwise(
            F.concat(F.col("text"), F.lit(" copyvariant "), F.col("__c"))
        ),
    ).drop("__c").repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    jitter = F.transform(
        F.col("embedding"),
        lambda x, i: (
            x.cast("double")
            + F.col("__c").cast("double")
            * 0.003
            * (F.pmod(F.hash(F.col("vec_id"), i), F.lit(7)) - 3).cast("double")
        ).cast("float"),
    )
    fanout(emb).withColumn("embedding", jitter).withColumn(
        "vec_id", F.col("vec_id") + F.col("__c").cast("long") * VECID_SHIFT
    ).drop("__c").repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet"
    )


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else f"{REPO}/.benchdata/sf1"
    spark = get_spark(app_name="make-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    generate(spark, out_dir)
    for t in ("lineitem", "events", "documents", "embeddings"):
        n = spark.read.parquet(f"{out_dir}/{t}.parquet").count()
        print(f"{t}: {n} rows")
    spark.stop()


if __name__ == "__main__":
    main()
