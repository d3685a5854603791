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
