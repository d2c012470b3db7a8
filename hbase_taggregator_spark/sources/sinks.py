"""Sinks: persist engine results (the reference returns maps over RPC and
has no storage sink at all — SURVEY.md §2.2 'sinks / file formats').

Thin, opinionated wrappers over `DataFrameWriter` that bake in the two
decisions that matter at 100 TB:

- **partitioned layout**: date/key partition columns so downstream scans
  prune directories (`write_partitioned`);
- **bounded file counts**: a pre-write repartition on the partition columns
  so each partition directory gets a controlled number of files instead of
  (tasks × partitions) small files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).parquet(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    files_per_partition: int = 1,
    mode: str = "overwrite",
) -> None:
    """Partitioned parquet with small-file control: shuffle rows to their
    partition before writing so each directory holds ``files_per_partition``
    files (the classic cure for the tasks×partitions small-file explosion)."""
    (
        df.repartition(files_per_partition, *partition_cols)
        .write.mode(mode)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", True).csv(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Columnar ORC sink (native Spark codec — the other columnar
    interchange format large warehouses standardize on)."""
    df.write.mode(mode).orc(path)
