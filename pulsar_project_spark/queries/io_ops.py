"""Declared queries: I/O-format parity (SURVEY.md §2.1 — the
reference's ``read_json`` / ``write_json`` persistence surface,
``utils.py`` file helpers).

The roundtrip query proves the JSON path end to end INSIDE the oracle
gate: events are projected to an integer/string-only record, written as
JSON lines, read back with an explicit schema, and aggregated — the
oracle aggregates the original parquet, so any loss or drift in the
JSON write/read path (type mangling, row loss, encoding) breaks the
hash match.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType,
)

from pulsar_project_spark.registry import declare
from pulsar_project_spark.sources.tables import load_events

_JSONL_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
    StructField("ts_us", LongType()),
    StructField("value_cents", LongType()),
])

_ROUNDTRIP_SQL = """
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents,
       CAST(max(epoch_us(ts)) AS BIGINT) AS last_us
FROM events
GROUP BY event_type
"""


@declare("jsonl_roundtrip_counts", oracle=_ROUNDTRIP_SQL)
def q_jsonl_roundtrip_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """write_json → read_json roundtrip (reference persistence model,
    ``utils.py`` save/load helpers): events are serialized to JSON
    lines and read back with an explicit schema; the aggregate over the
    roundtripped rows must hash-match the oracle's aggregate over the
    ORIGINAL parquet. Values are projected to integers before the write
    (cents, epoch micros) so the JSON text layer has no float-repr
    freedom.

    Scale shape: one write + one scan of the projected columns; the
    aggregate is a low-cardinality grouped count with map-side
    partials. In production the JSON side is the landing zone and the
    parquet side the warehouse — this query is the ingestion-parity
    audit between them."""
    tmp = os.path.join(tempfile.mkdtemp(prefix="jsonl_rt_"), "events_jsonl")
    ev = load_events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "ts_us",
        F.round(F.col("value") * 100).cast("bigint").alias("value_cents"),
    )
    ev.write.mode("overwrite").json(tmp)
    back = spark.read.schema(_JSONL_SCHEMA).json(tmp)
    return back.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum("value_cents").alias("total_cents"),
        F.max("ts_us").alias("last_us"),
    )
