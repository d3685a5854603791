"""Declared queries: Structured Streaming surface (SURVEY.md §2.9).

Two certification tiers. FULL-ORACLE queries land their stream in the
transactional table log via txn-keyed ``tx_append_txn`` (exactly-once
is a gate: restart + forced-replay must commit nothing) and hash the
landed result against DuckDB over the ORIGINAL parquet —
``streaming_tx_exactly_once_census`` pioneered the recipe and round 11
extended it to ``streaming_topic_frequencies``,
``streaming_windowed_counts``, and ``streaming_keep_last_state``
(VERDICT r10 order #1). The rest are rows-only by design (their final
state is genuinely arrival-order- or state-machine-shaped), with BATCH
twins fully oracle-checked elsewhere and tests/test_streaming.py
asserting streaming == batch — closing the chain stream → batch →
DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pulsar_project_spark.registry import declare
from pulsar_project_spark.streaming import (
    run_keep_last_state,
    run_session_windows,
    run_streaming_debounce,
    run_stream_stream_join,
    run_streaming_dedup,
    run_topic_frequencies,
    run_windowed_counts,
)


# Streaming aggregations drop rows whose event time is NULL (the
# window expression has no bucket for them), so every oracle filters
# ts IS NOT NULL explicitly. epoch_us is nonnegative on every corpus
# (post-1970), so DuckDB // (floor) == Spark div (trunc) here.
_TOPIC_FREQ_SQL = """
SELECT event_type AS topic,
       count(*) AS frequency,
       CAST(max(epoch_us(ts)) AS BIGINT) AS last_updated_us
FROM events
WHERE ts IS NOT NULL
GROUP BY event_type
"""


@declare("streaming_topic_frequencies", oracle=_TOPIC_FREQ_SQL)
def q_streaming_topic_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL-ORACLE streaming aggregation (upgraded from rows-only,
    VERDICT r10 order #1): update-mode agg keyed (topic, day) with a
    watermark (reference topic upsert + frequency++, memory.py:315-344),
    every micro-batch's running totals landed in a TRANSACTIONAL table
    via txn-keyed ``tx_append_txn``, the stream restarted against its
    checkpoint (must commit nothing) and batch 0 force-replayed (must
    deduplicate) before the last-wins rollup is read — so the per-topic
    census hashes against DuckDB over the original parquet, and a lost
    batch, doubled batch, or watermark drop breaks the driver gate."""
    return run_topic_frequencies(spark, sf_dir)


_WINDOWED_COUNTS_SQL = """
WITH mx AS (SELECT max(epoch_us(ts)) AS m FROM events),
w AS (
  SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS win_start_us,
         event_type, count(*) AS n
  FROM events WHERE ts IS NOT NULL
  GROUP BY 1, 2
)
SELECT win_start_us, event_type, n
FROM w, mx
WHERE win_start_us + 3600000000 <= mx.m - 600000000
"""


@declare("streaming_windowed_counts", oracle=_WINDOWED_COUNTS_SQL)
def q_streaming_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL-ORACLE watermarked tumbling windows (upgraded from
    rows-only, VERDICT r10 order #1): append mode emits each
    watermark-closed window exactly once into a txn-landed tx table
    (restart + forced-replay gated). The oracle states the emission
    rule in closed form: a 1-hour window emits iff its end is at or
    before (max event time − 10-minute delay) — the final watermark of
    a drained bounded stream (boundary pinned empirically: end == wm
    emits; Spark's ms-flooring of the watermark is unobservable at
    second-aligned window ends). Late-data drops cannot occur: the one
    staged source file makes batch 0 the only data batch, and batch
    0 runs at watermark 0."""
    return run_windowed_counts(spark, sf_dir)


_KEEP_LAST_SQL = """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts_us DESC NULLS FIRST,
                                     event_id DESC) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n_seen
  FROM events
)
SELECT user_id, n_seen,
       string_agg(CAST(event_id AS VARCHAR), ','
                  ORDER BY ts_us NULLS LAST, event_id) AS tail_event_ids
FROM e WHERE rn <= 5
GROUP BY user_id, n_seen
"""


@declare("streaming_keep_last_state", oracle=_KEEP_LAST_SQL)
def q_streaming_keep_last_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL-ORACLE custom stateful operator (upgraded from rows-only,
    VERDICT r10 order #1): ``applyInPandasWithState`` per-user last-N
    tail (records[-n:], memory.py:125, as managed streaming state),
    per-batch state landed in a txn-keyed tx table, last-wins per user
    by batch id after the restart + forced-replay gates. The oracle is
    the closed-form tail: within the single data batch the operator
    sorts by (ts_us, event_id), so the landed tail equals the global
    top-5-by-(ts_us, event_id) in ascending order and n_seen equals
    the per-user row count (NULL ts sorts last ascending in pandas,
    mirrored by NULLS FIRST under DESC in the oracle)."""
    return run_keep_last_state(spark, sf_dir)


@declare("streaming_debounce")
def q_streaming_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming debounce (applyInPandasWithState; 1-second
    same-key suppression): one BIGINT of state per live (user, type).
    Batch twin debounce_events_1s is oracle-checked; the parity test
    runs both at a gap wide enough to exercise suppression."""
    return run_streaming_debounce(spark, sf_dir)


@declare("streaming_session_windows")
def q_streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked per-user session windows (30-min gap), append mode —
    only watermark-closed sessions emit. Batch twin: user_session_stats
    (oracle-checked); test asserts emission ⊆ batch."""
    return run_session_windows(spark, sf_dir)


@declare("streaming_exact_dedup")
def q_streaming_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked streaming dedup on event id over a deliberately
    doubled input — state-bounded exactly-once ingestion. Batch twin:
    per-type counts of the raw events (oracle-checked as
    group_count_by_type); test asserts streaming == batch."""
    return run_streaming_dedup(spark, sf_dir)


@declare("streaming_stream_stream_join")
def q_streaming_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream inner join (clicks → purchases within
    1 hour — the SAME lookback as the oracle-checked batch twin
    ``attribution_window_join``, so the twin-pairing test can assert
    exact per-purchase parity): state-store-bounded on both sides."""
    return run_stream_stream_join(spark, sf_dir, horizon_minutes=60)


@declare("mq_pipeline_roundtrip")
def q_mq_pipeline_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pulsar-shaped MQ pipeline: produce events as keyed binary
    messages → stream-consume → decode → aggregate → publish to an
    output topic → read it back (sources.mq; BASELINE.json north star
    'Structured Streaming + Pulsar source/sink')."""
    from pulsar_project_spark.sources.mq import roundtrip_pipeline

    return roundtrip_pipeline(spark, sf_dir)


@declare("streaming_cdc_apply")
def q_streaming_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC: the change log as micro-batches, folded into a
    state table by a seq-respecting max-struct MERGE (retry/out-of-order
    safe); tombstoned deletes filtered at read. Named twin:
    ``cdc_apply_net_state`` (oracle-backed)."""
    from pulsar_project_spark.streaming.pipeline import run_streaming_cdc_apply
    return run_streaming_cdc_apply(spark, sf_dir)


@declare("streaming_left_outer_attribution")
def q_streaming_left_outer_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream LEFT OUTER join (clicks that never
    convert within 30 min emit with NULL purchase columns once the
    watermark closes them) — the abandonment semantics the inner join
    can't express. Batch twin: unattributed_clicks_census
    (oracle-checked); the twin test asserts streaming ⊆ batch with
    equality on the watermark-closable prefix."""
    from pulsar_project_spark.streaming.pipeline import (
        run_stream_stream_left_join,
    )
    return run_stream_stream_left_join(spark, sf_dir)


_LATE_WM_US = 10 * 60 * 1_000_000  # the streaming family's watermark delay


@declare(
    "late_arrival_census",
    oracle=f"""
WITH arr AS (
  SELECT event_type, epoch_us(ts) AS ts_us, event_id, event_id % 8 AS shard
  FROM events
  WHERE event_type IS NOT NULL AND ts IS NOT NULL AND event_id IS NOT NULL
), w AS (
  SELECT event_type, ts_us,
         max(ts_us) OVER (PARTITION BY shard ORDER BY event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING) AS seen_max
  FROM arr
)
SELECT event_type, count(*) AS n_events,
       CAST(sum(CASE WHEN seen_max IS NOT NULL
                      AND ts_us < seen_max - {_LATE_WM_US}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_late
FROM w GROUP BY event_type
""",
)
def q_late_arrival_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming OBSERVABILITY at rest: how much data would a
    10-minute watermark silently drop? Arrival order is the ingestion
    id; each of 8 arrival shards tracks its running max event time
    (exactly how Spark's per-partition watermark heuristic sees the
    stream before the global min), and an event is late when it
    arrives more than the delay behind its shard's high-water mark.
    Running the census BEFORE deploying a watermark turns "pick 10
    minutes" from folklore into a measured loss rate. Partitioned
    running-max windows — no global sort; one exchange on shard, one
    tiny per-type aggregate."""
    from pulsar_project_spark.sources.tables import load_events
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    ev = load_events(spark, sf_dir).filter(
        F.col("event_type").isNotNull() & F.col("ts_us").isNotNull()
        & F.col("event_id").isNotNull()
    ).select("event_type", "ts_us", "event_id",
             (F.col("event_id") % 8).alias("shard"))
    w = (Window.partitionBy("shard").orderBy("event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    flagged = ev.select(
        "event_type", "ts_us",
        F.max("ts_us").over(w).alias("seen_max"),
    )
    return flagged.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(
            F.when(
                F.col("seen_max").isNotNull()
                & (F.col("ts_us") < F.col("seen_max") - _LATE_WM_US), 1
            ).otherwise(0)
        ).cast("bigint").alias("n_late"),
    )


_TX_SINK_SQL = """
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents,
       CAST(max(epoch_us(ts)) AS BIGINT) AS last_us
FROM events
GROUP BY event_type
"""


@declare("streaming_tx_exactly_once_census", oracle=_TX_SINK_SQL)
def q_streaming_tx_exactly_once_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ONE streaming query strong enough to carry a full hash
    oracle: events stream-land into the transactional table log via an
    idempotent foreachBatch sink (txn id = (app, batchId) inside the
    manifest — the commit and its replay check share one atomic CAS),
    then the run restarts the stream against the same checkpoint (must
    commit nothing) AND force-replays batch 0's commit (must
    deduplicate). Only after surviving both does it census the landed
    table — against the oracle's census of the ORIGINAL parquet, so a
    lost batch, doubled batch, or value drift through the
    stream-land-read chain breaks the hash. Exactly-once here is not a
    claim, it's the gate."""
    from pulsar_project_spark.streaming.pipeline import run_streaming_tx_sink

    return run_streaming_tx_sink(spark, sf_dir)


@declare("streaming_retractable_agg")
def q_streaming_retractable_agg(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Rows-only by design (stateful streaming); twin-paired with the
    oracle-backed `retractable_agg_view_census` — equality pinned in
    tests/test_streaming.py."""
    from pulsar_project_spark.streaming.pipeline import (
        run_streaming_retractable_agg,
    )
    return run_streaming_retractable_agg(spark, sf_dir)


@declare("streaming_ks_drift")
def q_streaming_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only by design (stateful streaming); twin-paired with the
    oracle-backed `ks_distance_order_values` — equality pinned in
    tests/test_streaming.py."""
    from pulsar_project_spark.streaming.pipeline import (
        run_streaming_ks_drift,
    )
    return run_streaming_ks_drift(spark, sf_dir)


@declare("streaming_cms_heavy_hitters")
def q_streaming_cms_heavy_hitters(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Rows-only by design (stateful streaming); twin-paired with the
    oracle-backed `cms_heavy_hitters` — equality pinned in
    tests/test_streaming.py."""
    from pulsar_project_spark.streaming.pipeline import (
        run_streaming_cms_heavy_hitters,
    )
    return run_streaming_cms_heavy_hitters(spark, sf_dir)


@declare("streaming_lc_distinct")
def q_streaming_lc_distinct(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Rows-only by design (stateful streaming); twin-paired with the
    oracle-backed `lc_distinct_bitmap_census` — equality pinned in
    tests/test_streaming.py."""
    from pulsar_project_spark.streaming.pipeline import (
        run_streaming_lc_distinct,
    )
    return run_streaming_lc_distinct(spark, sf_dir)


def _tx_cdf_sql() -> str:
    from pulsar_project_spark.queries.io_ops import _TX_CDF_SQL
    return _TX_CDF_SQL


@declare("streaming_tx_change_feed", oracle=_tx_cdf_sql())
def q_streaming_tx_change_feed(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """FULL-ORACLE streaming query (upgraded from rows-only in the
    round-8 continuation): a genuine streaming run over the custom
    Python DataSource tailing the tx log's manifest chain, folding
    per-commit weighted changes into a STATE tx table via exactly-once
    ``tx_append_txn``, drained twice against one checkpoint. The final
    census carries the SAME oracle as the batch twin
    ``tx_change_feed_census`` — sound because stream offsets are
    manifest versions (every micro-batch is a whole (start, end]
    commit window, so both sides of a commit net within one batch) and
    the per-(side, type) partials are additive. This closes the chain
    storage → stream → storage → DuckDB with a driver hash at every
    link."""
    from pulsar_project_spark.streaming.pipeline import (
        run_streaming_tx_change_feed,
    )
    return run_streaming_tx_change_feed(spark, sf_dir)


_TX_MV_SQL = """
WITH base AS (
  SELECT event_id, user_id, event_type,
         CAST(round(value * 100) AS BIGINT) AS cents,
         ((event_id % 3) + 3) % 3 AS r3
  FROM events
),
live AS (
  SELECT user_id, event_type, cents FROM base
  WHERE (r3 IN (0, 1)
         AND (user_id IS NULL OR (user_id NOT BETWEEN 100 AND 300
                                  AND user_id NOT BETWEEN 400 AND 500)))
     OR r3 = 2 OR event_id IS NULL
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN user_id BETWEEN 0 AND 50 THEN cents * 2
                     ELSE cents END) AS BIGINT) AS total_cents
FROM live
GROUP BY event_type
"""


@declare("streaming_tx_mv_census", oracle=_TX_MV_SQL)
def q_streaming_tx_mv_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING MATERIALIZED VIEW off the change data feed — the IVM
    capstone composing the round-8 streaming CDF source with the
    retractable fold (VERDICT r8 order #6): a commit history spanning
    every commit class (two appends, a layout-only compaction, a DV
    delete, a COW delete, a RENAME COLUMN, a post-rename append, and a
    COW UPDATE) is tailed by the ``tx_change_feed`` streaming source —
    now column-mapping-aware, presenting every generation under the
    FINAL logical schema — and folded per micro-batch into a maintained
    aggregate tx table via exactly-once ``tx_append_txn``, drained
    twice against one checkpoint (the restart must commit nothing).
    The final view hash-matches the oracle's direct census of the live
    rows replayed from raw events: view(table) == fold(changes(table))
    certified through a real stream, across a rename boundary, with
    transactional storage on both ends."""
    from pulsar_project_spark.streaming.pipeline import run_streaming_tx_mv

    return run_streaming_tx_mv(spark, sf_dir)


_TX_TRACKED_SINK_SQL = """
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents,
       CAST(max(epoch_us(ts)) AS BIGINT) AS last_us
FROM events
GROUP BY event_type
UNION ALL
SELECT '__row_ids__', n, (n * (n - 1)) // 2, n - 1
FROM (SELECT CAST(count(*) AS BIGINT) AS n FROM events)
WHERE n > 0
"""


@declare("streaming_tx_tracked_sink_census", oracle=_TX_TRACKED_SINK_SQL)
def q_streaming_tx_tracked_sink_census(spark: SparkSession,
                                       sf_dir: str) -> DataFrame:
    """Exactly-once streaming landing into a ROW-TRACKED tx table —
    the second full-oracle streaming query. Beyond the exactly-once
    census (whose per-type counts a doubled batch would break), the
    ID-ALGEBRA row pins identity assignment itself without depending
    on batch boundaries: ids are {0..n-1} as a multiset iff every row
    landed exactly once AND no replay burned id range, so the oracle
    can state sum(_rid) = n(n-1)/2 and max(_rid) = n-1 in closed form.
    The run restarts the stream against its checkpoint and
    force-replays batch 0's commit; both must leave version AND
    row_hwm untouched (asserted in the runner) before the census is
    even computed. See ``run_streaming_tx_tracked_sink``."""
    from pulsar_project_spark.streaming.pipeline import (
        run_streaming_tx_tracked_sink,
    )

    return run_streaming_tx_tracked_sink(spark, sf_dir)
