"""SparkSession factory tuned for this engine.

Local test profile: ``local[N]`` single-JVM. The same builder settings are
the ones we would ship to a 1000-executor cluster — AQE for runtime
re-planning (skew joins, partition coalescing), broadcast threshold sized
for the star-schema dimension tables, Arrow enabled for the few Pandas-UDF
operators (multimodal decode, lenient JSON parse).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "pulsar_project_spark",
              cpus: str | int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Knobs chosen for scale-out semantics even in local mode:

    * AQE on: runtime shuffle coalescing + skew-join splitting — at 100 TB
      the events/user_id and lineitem/orderkey shuffles are skew-prone.
    * shuffle.partitions matches parallelism locally; on a real cluster
      this is overridden (AQE coalesces down from a high initial count).
    * Arrow on: the Pandas-UDF operators (multimodal, lenient JSON) move
      batches, not rows.
    * Session timezone pinned UTC so timestamp semantics are stable across
      driver/executor and match the DuckDB correctness oracle.
    * Runtime bloom-filter join reduction is LEFT AT ITS DEFAULT (on,
      ``spark.sql.optimizer.runtime.bloomFilter.enabled``): on shuffle
      joins with a selective build side (the fact-fact rollup shapes
      here), Catalyst injects a bloom probe into the stream side's scan
      stage automatically — the correct engine-level form of the
      "pre-filter the big side with a sketch of the small side" pattern,
      so no operator in this package hand-rolls one.
    """
    n = str(cpus or _DEFAULT_CPUS)
    builder = (
        SparkSession.builder
        .master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        # Write-path fixed overhead (round 13, guide §1.2/§6): every tx
        # staging write and streaming foreachBatch landing pays the
        # Hadoop commit protocol per commit. Three legitimate trims,
        # measured together at -19% per small parquet write (interleaved
        # A/B, BENCH_NOTES r13): (a) no _SUCCESS marker — nothing here
        # consumes it (the tx manifest IS the commit record; Delta and
        # Iceberg ship with it off for the same reason); (b) commit
        # algorithm v2 — task output promoted at task commit, no second
        # job-commit rename fan-out (safe: every staging dir is
        # single-writer by construction, uuid-scoped); (c) raw local FS
        # — skips .crc sidecar write+read per file; on a real cluster
        # the object-store FS applies and this key is a no-op.
        .config("spark.hadoop.mapreduce.fileoutputcommitter"
                ".marksuccessfuljobs", "false")
        .config("spark.hadoop.mapreduce.fileoutputcommitter"
                ".algorithm.version", "2")
        .config("spark.hadoop.fs.file.impl",
                "org.apache.hadoop.fs.RawLocalFileSystem")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
