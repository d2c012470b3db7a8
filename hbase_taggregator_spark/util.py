"""Small shared utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, factor: int = 1) -> DataFrame:
    """Spread a narrow input across the cluster before compute-heavy
    projections (hashing, per-pair scoring).

    A small parquet file scans as one partition, which would serialize e.g.
    MinHash's 16 hashes/shingle on a single core; a 100 TB table already has
    thousands of partitions and is returned untouched — the repartition
    shuffle only ever pays for itself on narrow inputs.
    """
    target = df.sparkSession.sparkContext.defaultParallelism * factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
