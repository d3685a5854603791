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
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
