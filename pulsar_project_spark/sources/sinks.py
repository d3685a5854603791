"""Parquet sink helpers — the write half of the engine's I/O surface
(reference: whole-state JSON dumps, ``memory.py:63-76``/``task.py:406-421``;
here: partitioned columnar tables, SURVEY.md §1.3).

``write_partitioned`` is the 100 TB default layout: hive-style
partition directories on a low-cardinality column mean every downstream
query filtering on it prunes whole directories at planning time
(PartitionFilters in the scan, zero I/O for pruned partitions), and
``maxRecordsPerFile`` bounds file sizes so a hot partition doesn't
produce one giant file."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str, partition_by: str | list[str],
                      max_records_per_file: int | None = None,
                      mode: str = "overwrite") -> None:
    cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    w = df.write.mode(mode).partitionBy(*cols)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
