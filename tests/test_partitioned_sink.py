"""Partitioned sink: layout, roundtrip, and planning-time pruning."""

from __future__ import annotations

import io
import os
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_partitioned_write_prunes_at_plan_time(spark, tmp_path):
    from pulsar_project_spark.sources.sinks import read_partitioned, write_partitioned
    from pulsar_project_spark.sources.tables import load_events

    ev = load_events(spark, SF_SMOKE)
    out = str(tmp_path / "events_by_type")
    write_partitioned(ev, out, "event_type", max_records_per_file=50_000)

    # hive-style directories exist per type
    dirs = {d for d in os.listdir(out) if d.startswith("event_type=")}
    assert dirs == {f"event_type={t}" for t in
                    ("click", "view", "purchase", "signup", "error")}

    back = read_partitioned(spark, out)
    assert back.count() == ev.count()

    filtered = back.filter(F.col("event_type") == "purchase")
    buf = io.StringIO()
    with redirect_stdout(buf):
        filtered.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "purchase" in plan
    assert filtered.count() == ev.filter(F.col("event_type") == "purchase").count()


def test_merge_upsert_keyed_last_wins(spark, tmp_path):
    import pyspark.sql.functions as F

    from pulsar_project_spark.sources.sinks import merge_upsert

    path = str(tmp_path / "topics")
    base = spark.createDataFrame(
        [("a", 1, 10), ("b", 1, 20)], "topic string, ver int, freq int")
    merge_upsert(spark, path, base, ["topic"], "ver")
    # update a, insert c
    upd = spark.createDataFrame(
        [("a", 2, 11), ("c", 1, 30)], "topic string, ver int, freq int")
    merge_upsert(spark, path, upd, ["topic"], "ver")
    got = {(r.topic, r.ver, r.freq)
           for r in spark.read.parquet(path).collect()}
    assert got == {("a", 2, 11), ("b", 1, 20), ("c", 1, 30)}
    # idempotent under retry: re-apply the same batch, nothing changes
    merge_upsert(spark, path, upd, ["topic"], "ver")
    again = {(r.topic, r.ver, r.freq)
             for r in spark.read.parquet(path).collect()}
    assert again == got


def test_range_layout_clusters_days_per_file(spark, tmp_path):
    """Write-time data layout: repartitionByRange(day) +
    sortWithinPartitions(ts_us) must produce files whose day spans
    don't overlap across files (each file covers a contiguous day
    range) — the property that makes parquet min/max row-group pruning
    effective on time-filtered scans at 100 TB."""
    import pyspark.sql.functions as F
    from pulsar_project_spark.sources.tables import load_events
    from tests.conftest import SF_SMOKE

    out = str(tmp_path / "range_layout")
    ev = load_events(spark, SF_SMOKE).withColumn(
        "day", F.expr("ts_us div 86400000000")
    )
    (
        ev.repartitionByRange(4, "day")
        .sortWithinPartitions("day", "ts_us")
        .write.mode("overwrite").parquet(out)
    )
    back = spark.read.parquet(out).select(
        F.input_file_name().alias("f"), "day"
    )
    spans = back.groupBy("f").agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    ).collect()
    spans = sorted([(r.lo, r.hi) for r in spans])
    assert len(spans) >= 2
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, f"file day ranges overlap: {(lo1, hi1)} vs {(lo2, hi2)}"
