"""Streaming == batch parity (SURVEY.md §2.9 test strategy): each
streaming pipeline's final state must equal its batch formulation —
and the batch formulations are oracle-checked elsewhere, so the chain
stream → batch → DuckDB is closed."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_topic_frequencies_stream_matches_batch(spark):
    from pulsar_project_spark.sources.tables import load_events
    from pulsar_project_spark.streaming import run_topic_frequencies

    got = run_topic_frequencies(spark, SF_SMOKE).orderBy("topic").collect()
    want = (
        load_events(spark, SF_SMOKE)
        .groupBy(F.col("event_type").alias("topic"))
        .agg(F.count("*").alias("frequency"), F.max("ts_us").alias("last_updated_us"))
        .orderBy("topic")
        .collect()
    )
    assert [r.asDict() for r in got] == [r.asDict() for r in want]


def test_windowed_counts_stream_matches_batch(spark):
    from pulsar_project_spark.sources.tables import load_events
    from pulsar_project_spark.streaming import run_windowed_counts

    got = run_windowed_counts(spark, SF_SMOKE)
    ev = load_events(spark, SF_SMOKE).withColumn(
        "event_time", F.timestamp_micros(F.col("ts_us"))
    )
    want = (
        ev.groupBy(F.window("event_time", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.unix_micros(F.col("w.start")).alias("win_start_us"), "event_type", "n")
    )
    # availableNow append mode: every window at-or-before the final
    # watermark is emitted; with a bounded input that is all but the
    # trailing watermark margin — assert emitted ⊆ batch and ≥ 90%.
    got_rows = {tuple(r) for r in got.collect()}
    want_rows = {tuple(r) for r in want.collect()}
    assert got_rows <= want_rows
    assert len(got_rows) >= 0.9 * len(want_rows)


def test_keep_last_state_matches_batch_tail(spark):
    from pulsar_project_spark.sources.tables import load_events
    from pulsar_project_spark.streaming import run_keep_last_state

    got = run_keep_last_state(spark, SF_SMOKE, n=5)
    ev = load_events(spark, SF_SMOKE)
    want = (
        ev.groupBy("user_id")
        .agg(F.sort_array(F.collect_list(F.struct("ts_us", "event_id"))).alias("s"))
        .select(
            "user_id",
            F.size("s").alias("n_seen"),
            F.concat_ws(",", F.transform(
                F.expr("slice(s, greatest(size(s) - 4, 1), 5)"),
                lambda x: x["event_id"].cast("string"),
            )).alias("tail_event_ids"),
        )
    )
    got_map = {r["user_id"]: (r["n_seen"], r["tail_event_ids"]) for r in got.collect()}
    want_map = {r["user_id"]: (r["n_seen"], r["tail_event_ids"]) for r in want.collect()}
    assert got_map == want_map


def test_stream_stream_join_matches_batch(spark):
    from pulsar_project_spark.sources.tables import load_events
    from pulsar_project_spark.streaming import run_stream_stream_join

    got = run_stream_stream_join(spark, SF_SMOKE, horizon_minutes=30)
    ev = load_events(spark, SF_SMOKE)
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("event_id").alias("click_id"),
        F.col("ts_us").alias("click_ts_us"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "value",
        F.col("ts_us").alias("purchase_ts_us"),
    )
    horizon_us = 30 * 60 * 1_000_000
    want = purchases.join(
        clicks,
        (purchases["user_id"] == clicks["c_user"])
        & (clicks["click_ts_us"] < purchases["purchase_ts_us"])
        & (clicks["click_ts_us"] >= purchases["purchase_ts_us"] - horizon_us),
    ).select("purchase_id", "user_id", "value", "click_id",
             "purchase_ts_us", "click_ts_us")
    got_rows = {tuple(r) for r in got.collect()}
    want_rows = {tuple(r) for r in want.collect()}
    # single availableNow batch: no state eviction can drop matches
    assert got_rows == want_rows
    assert len(want_rows) > 0


def test_streaming_dedup_removes_doubled_input(spark):
    from pulsar_project_spark.sources.tables import load_events
    from pulsar_project_spark.streaming import run_streaming_dedup

    got = {(r.event_type, r.n) for r in
           run_streaming_dedup(spark, SF_SMOKE).collect()}
    want = {(r.event_type, r["count"]) for r in
            load_events(spark, SF_SMOKE).groupBy("event_type").count().collect()}
    # input was unioned with itself; dedup must restore raw counts
    assert got == want


def test_session_windows_stream_subset_of_batch(spark):
    import __spark_entry__ as e
    from pulsar_project_spark.streaming import run_session_windows

    got = run_session_windows(spark, SF_SMOKE)
    want = e.queries()["user_session_stats"](spark, SF_SMOKE)
    # append mode emits only watermark-closed sessions: emitted ⊆ batch,
    # and with a 10-min watermark vs a 30-day corpus, nearly all of it.
    got_rows = {tuple(r) for r in got.collect()}
    want_rows = {tuple(r) for r in want.collect()}
    assert got_rows <= want_rows
    assert len(got_rows) >= 0.9 * len(want_rows)


def test_windowed_counts_checkpoint_restart(spark, tmp_path):
    from pulsar_project_spark.streaming import run_windowed_counts

    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    first = run_windowed_counts(spark, SF_SMOKE, sink_dir=sink, checkpoint=ckpt)
    n1 = first.count()
    assert n1 > 0
    # restart against the SAME checkpoint + sink: the offset log shows
    # no new source files, so the rerun must commit nothing — the
    # exactly-once-across-restarts contract.
    second = run_windowed_counts(spark, SF_SMOKE, sink_dir=sink, checkpoint=ckpt)
    assert second.count() == n1


def test_streaming_debounce_matches_batch(spark):
    from pulsar_project_spark.streaming.pipeline import run_streaming_debounce

    # 2-day gap: the test corpus has no sub-second same-key bursts, so a
    # wide gap is what exercises BOTH branches (kept and suppressed).
    gap = 2 * 86400 * 1_000_000
    got = run_streaming_debounce(spark, SF_SMOKE, gap_us=gap)
    from pyspark.sql.window import Window
    from pulsar_project_spark.sources.tables import load_events

    # batch replica of the same greedy rule: a row is kept iff it is
    # > gap after the previously KEPT row of its (user, type) chain.
    # The chain is sequential per key — replicate with a pandas fold.
    ev = (
        load_events(spark, SF_SMOKE)
        .select("user_id", "event_type", "event_id", "ts_us")
        .toPandas()
        .sort_values(["user_id", "event_type", "ts_us", "event_id"])
    )
    import collections
    kept = collections.Counter()
    dropped = collections.Counter()
    last = {}
    for r in ev.itertuples():
        k = (r.user_id, r.event_type)
        if k not in last or r.ts_us - last[k] > gap:
            kept[r.event_type] += 1
            last[k] = r.ts_us
        else:
            dropped[r.event_type] += 1
    got_rows = {r.event_type: (r.n_total, r.n_kept, r.n_debounced)
                for r in got.collect()}
    want = {t: (kept[t] + dropped[t], kept[t], dropped[t]) for t in got_rows}
    assert got_rows == want
    assert any(d for (_, _, d) in got_rows.values()), "no suppression exercised"


def test_tws_debounce_gated_without_protobuf(spark):
    """The transformWithStateInPandas variant must either work (env has
    protobuf) or raise a clear ImportError naming the fallback — never
    crash a stream."""
    from pulsar_project_spark.streaming.pipeline import run_streaming_debounce_tws

    try:
        import google.protobuf  # noqa: F401
        has_pb = True
    except ImportError:
        has_pb = False
    if has_pb:
        df = run_streaming_debounce_tws(spark, SF_SMOKE)
        assert df.schema.fieldNames() == [
            "user_id", "event_type", "n_kept", "n_debounced"]
    else:
        import pytest as _pytest
        with _pytest.raises(ImportError, match="run_streaming_debounce"):
            run_streaming_debounce_tws(spark, SF_SMOKE)
