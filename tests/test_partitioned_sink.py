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
