"""Small shared utilities."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def local_df(spark, rows, schema) -> DataFrame:
    """A driver-local DataFrame in ONE partition.

    ``createDataFrame(list)`` parallelizes the rows across
    ``defaultParallelism`` Python-backed RDD slices, so EVERY job that
    evaluates the frame — a broadcast build, a sidecar write, a scan of
    a materialized gate result — round-trips one Python worker per
    slice (32 on the bench box) for a table of a few hundred rows.
    Measured r15: a 1,024-row sidecar write read 6.9 s through
    ``coalesce(1)`` (the slices drain SEQUENTIALLY through one task's
    Python pipe) and ~0.5 s through the default 32-slice scan; the same
    frame born in one slice evaluates in ~0.2 s and writes ONE file
    with no coalesce. Values are identical — only the slice count
    changes."""
    sc = spark.sparkContext
    return spark.createDataFrame(sc.parallelize(rows, numSlices=1), schema)


def _file_len(spark, path: str) -> int | None:
    """Size in bytes of one scan input file; None when the scheme can't be
    stat'ed cheaply. Local paths avoid the JVM round-trip entirely."""
    if path.startswith("file:"):
        try:
            return os.path.getsize(path[len("file:"):] or "/")
        except OSError:
            return None
    try:  # hdfs:// s3a:// … — one FileSystem stat per file, only ever
        # paid for a handful of files (see ensure_parallelism)
        jvm = spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(path)
        fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
        return fs.getFileStatus(p).getLen()
    except Exception:
        return None


def ensure_parallelism(df: DataFrame, factor: int = 1) -> DataFrame:
    """Spread a narrow input across the cluster before compute-heavy
    projections (hashing, per-pair scoring).

    A small parquet file scans as one partition, which would serialize e.g.
    MinHash's 16 hashes/shingle on a single core; a 100 TB table already
    has thousands of partitions and is returned untouched — the
    repartition shuffle only ever pays for itself on narrow inputs.

    Narrowness is decided from the scan's own file inventory
    (``df.inputFiles()``), never by materializing the plan as an RDD: the
    old ``df.rdd.getNumPartitions()`` probe compiled the physical plan per
    call and reported pre-AQE splits on DSv2 sources. Decision table:

    - many files (≥ target): already parallel — untouched, no stat calls.
    - few files: stat just those few; if their bytes still split to fewer
      partitions than the target under ``maxPartitionBytes``, repartition.
      Few-but-huge files therefore stay untouched (Spark splits them).
    - no file inventory (in-memory or DSv2 source): untouched — the
      source owns its split planning and a blind repartition could just as
      easily SHRINK it.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism * factor
    try:
        files = df.inputFiles()
    except Exception:
        return df
    if not files or len(files) >= target:
        return df
    raw = str(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b")
    ).lower().removesuffix("b")
    mult = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30}.get(raw[-1:], 1)
    max_bytes = int(raw.rstrip("kmg") or "134217728") * mult
    total = 0
    for f in files:
        n = _file_len(spark, f)
        if n is None:  # unknown scheme: don't risk shrinking a big scan
            return df
        total += n
    est = max(len(files), -(-total // max_bytes))
    if est < target:
        return df.repartition(target)
    return df
