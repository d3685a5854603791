"""Regression tests for the round-4 ADVICE.md dirty-input findings.

Each test reconstructs the exact adversarial input the advisory named
and checks the fixed behavior directly (plus oracle parity where the
query is oracle-backed):

* ``schema_evolution_union_counts`` — a NEGATIVE odd ``event_id``
  yields ``% 2 == -1`` in both engines, so an ``== 1`` batch split
  dropped the row from both batches while the oracle kept it in
  ``n_events``. The split is now ``!= 0`` and must partition ALL rows.
* ``interval_join_bucketed`` — exact row semantics: an interval
  exploded over several buckets must NOT emit phantom all-NULL rows
  from its empty buckets, and a fully-unmatched interval must surface
  exactly ONE null-point row (not one per bucket).
* ``bpe_encode_census`` — the ranked merge array must be ordered by
  rank even when ``collect_list`` runs across a multi-partition
  shuffle (Spark documents collect_list order as non-deterministic;
  the fix carries rank in the struct and ``array_sort``s).
"""

from __future__ import annotations

import os
import tempfile

import duckdb
import pytest
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from pulsar_project_spark.registry import ORACLES, QUERIES


def _write_events_with_negative_ids() -> str:
    sf_dir = tempfile.mkdtemp(prefix="dirty_ev_")
    base_us = 1_704_067_200_000_000
    ids = [-3, -2, -1, 0, 1, 2, 3, 4]
    tbl = pa.table({
        "event_id": pa.array(ids, pa.int64()),
        "ts": pa.array([base_us + i * 1_000_000 for i in range(len(ids))],
                       pa.timestamp("us")),
        "user_id": pa.array([1] * len(ids), pa.int64()),
        "event_type": pa.array(["click", "purchase"] * 4, pa.string()),
        "value": pa.array([float(i) for i in range(len(ids))], pa.float64()),
        "props": pa.array(['{"k": 1}'] * len(ids), pa.string()),
    })
    pq.write_table(tbl, os.path.join(sf_dir, "events.parquet"))
    return sf_dir


def test_schema_evolution_split_partitions_negative_ids(spark):
    name = "schema_evolution_union_counts"
    sf_dir = _write_events_with_negative_ids()
    got = QUERIES[name](spark, sf_dir).collect()
    # every input row must survive the batch split: 8 rows total
    assert sum(r["n_events"] for r in got) == 8
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW events AS "
            f"SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
        )
        want = sorted(tuple(r) for r in con.execute(ORACLES[name]).fetchall())
    finally:
        con.close()
    assert sorted(tuple(r) for r in got) == want


def test_interval_join_row_semantics_exact(spark):
    from pulsar_project_spark.operators.temporal import interval_join_bucketed

    # bucket width 10: interval A [5, 25] spans buckets 0-2 but only
    # bucket 1 holds its single matching point; interval B [40, 65]
    # spans buckets 4-6 and matches nothing.
    intervals = spark.createDataFrame(
        [("A", 5, 25), ("B", 40, 65)], "name string, s long, e long"
    )
    points = spark.createDataFrame(
        [(1, 12), (2, 30), (3, 99)], "pid long, ts long"
    )
    rows = interval_join_bucketed(
        intervals, points, start="s", end="e", ts="ts", bucket_us=10
    ).collect()
    by_name: dict[str, list] = {}
    for r in rows:
        by_name.setdefault(r["name"], []).append(r)
    # A: exactly its one match, NO phantom NULL rows from buckets 0/2
    assert len(by_name["A"]) == 1 and by_name["A"][0]["p_pid"] == 1
    # B: exactly ONE null-point row despite spanning 3 empty buckets
    assert len(by_name["B"]) == 1 and by_name["B"][0]["p_pid"] is None


def test_bpe_merge_order_survives_multipartition_shuffle(spark):
    from pulsar_project_spark.operators.text_analysis import (
        bpe_encode_census,
        learn_bpe_merges,
    )

    docs = spark.createDataFrame(
        [(i, "banana bandana cabana") for i in range(64)],
        "doc_id long, text string",
    ).repartition(16)
    merges = learn_bpe_merges(docs, n_merges=4).orderBy("rank").collect()
    assert [m["rank"] for m in merges] == list(range(1, len(merges) + 1))
    census = bpe_encode_census(docs, n_merges=4).collect()
    # identical docs ⇒ identical token counts regardless of partitioning
    assert len({(r["n_words"], r["n_bpe_tokens"]) for r in census}) == 1


# ---------------------------------------------------------------------------
# round-5 ADVICE: multimodal oracles used signed SQL modulo while the
# Python synthesizers use Python's non-negative modulo, so a NEGATIVE
# doc_id diverged (negative pixel values / empty generate_series on the
# oracle side). All oracles now normalize with ((x % k) + k) % k; this
# corpus pins the fix for every stdlib codec family at once.
# ---------------------------------------------------------------------------

_MM_NEGATIVE_ID_QUERIES = (
    "wav_codec_roundtrip_features",
    "wav_spectral_tilt_features",
    "wav_decimate2_features",
    "pgm_resize_features",
    "rawv_frame_sample_features",
    "png_decode_features",
    "png_permissive_decode_census",
    "jpeg_entropy_roundtrip_features",
    "jpeg_pixel_decode_features",
    "jpeg_color_pixel_decode_features",
    "jpeg_color_permissive_decode_census",
    # round-7: permissive corrupt-census twins (the -21/-7 ids below
    # exercise the % 7 == 0 corruption rule on the signed branch)
    "pgm_permissive_decode_census",
    "rawv_permissive_sample_census",
    # round-6 sweep #2: the asset-catalog family CRASHED on negative
    # ids (signed % made the modality element_at index 0, an ANSI
    # error) — as_assets now uses pmod, oracles ((x%4+4)%4)
    "multimodal_asset_catalog",
    "image_decode_stub",
    "video_frame_sample_plan",
    "audio_chunk_plan",
)


def _write_docs_with_negative_ids() -> str:
    sf_dir = tempfile.mkdtemp(prefix="dirty_docs_")
    # -21 and -7 hit the permissive census's % 7 == 0 corruption rule
    # on the signed branch; the rest cover every residue sign case.
    ids = [-21, -17, -7, -3, -1, 0, 2, 5]
    texts = [f"doc {i} alpha beta" for i in range(len(ids))]
    tbl = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(ids), pa.string()),
        "source": pa.array(["dirty"] * len(ids), pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, os.path.join(sf_dir, "documents.parquet"))
    return sf_dir


@pytest.mark.gate  # codec family oracle sweep
def test_multimodal_codecs_match_oracle_on_negative_doc_ids(spark):
    sf_dir = _write_docs_with_negative_ids()
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS "
            f"SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
        )
        for name in _MM_NEGATIVE_ID_QUERIES:
            got = sorted(
                tuple(repr(x) for x in r)
                for r in QUERIES[name](spark, sf_dir).collect()
            )
            want = sorted(
                tuple(repr(x) for x in r)
                for r in con.execute(ORACLES[name]).fetchall()
            )
            assert got == want, f"{name} diverged on negative doc_ids"
    finally:
        con.close()


def test_cdc_snapshot_half_median_cut_matches_oracle(spark):
    """Round-6 self-review: CAST(double AS BIGINT) truncates in Spark
    but ROUNDS in DuckDB, so a .5-valued median cut (even event count,
    odd middle-pair sum) could shift the time-travel boundary by 1 µs
    between engines — with an event sitting exactly there, the
    snapshots diverge. Both sides now floor() before the cast; this
    corpus manufactures the exact case: four events at consecutive
    microseconds, median 1001.5, and the event at 1002 µs must be
    EXCLUDED by both engines."""
    name = "cdc_snapshot_at_time"
    sf_dir = tempfile.mkdtemp(prefix="dirty_cut_")
    base = 1_704_067_200_000_000
    ts = [base + 1000, base + 1001, base + 1002, base + 1003]
    tbl = pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([1, 2, 3, 4], pa.int64()),
        "event_type": pa.array(["view"] * 4, pa.string()),
        "value": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
        "props": pa.array(['{"k": 1}'] * 4, pa.string()),
    })
    pq.write_table(tbl, os.path.join(sf_dir, "events.parquet"))
    got = sorted(
        tuple(repr(x) for x in r)
        for r in QUERIES[name](spark, sf_dir).collect()
    )
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW events AS "
            f"SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
        )
        want = sorted(
            tuple(repr(x) for x in r)
            for r in con.execute(ORACLES[name]).fetchall()
        )
    finally:
        con.close()
    assert got == want
    # the floored cut is 1001: users 3 and 4 are after the snapshot
    users = {eval(r[0]) for r in got}
    assert users <= {1, 2}


# ---------------------------------------------------------------------------
# round-6 sweep #3: MIXED-SIGN ids through the full documents and
# events fuzz families. The in-suite fuzz corpora generate ids as
# range(n), so every signed-modulo asymmetry (Python/numpy non-negative
# % in synthesizers vs SQL signed %, pmod vs %, element_at index 0
# under ANSI) was invisible until a negative-id shard arrived. The
# first run of this sweep found and fixed SIX queries: the four
# asset-catalog crashes, the coercion family's element_at-0 crash, the
# urljoin CASE divergence, and the mergeable rollup's vanishing
# negative-odd rows.
# ---------------------------------------------------------------------------


@pytest.mark.gate  # full-family sweep: certification arm
def test_documents_family_matches_oracle_on_mixed_sign_ids(spark):
    import random

    import tests.test_fuzz_oracle as T

    rng = random.Random(5)
    texts = [" ".join(rng.choices(T._WORDS, k=rng.randint(0, 40)))
             for _ in range(12)]
    ids = [-9, -7, -5, -3, -2, -1, 0, 1, 2, 5, 8, 13]
    sf_dir = tempfile.mkdtemp(prefix="negid_docs_")
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(ids), pa.string()),
        "source": pa.array(["neg"] * len(ids), pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), f"{sf_dir}/documents.parquet")
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS "
            f"SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
        )
        for name in T._PIPELINE_FUZZED + T._FUZZED:
            got = sorted(tuple(repr(x) for x in r)
                         for r in QUERIES[name](spark, sf_dir).collect())
            want = sorted(tuple(repr(x) for x in r)
                          for r in con.execute(ORACLES[name]).fetchall())
            assert got == want, f"{name} diverged on mixed-sign doc_ids"
    finally:
        con.close()


@pytest.mark.gate  # full-family sweep: certification arm
def test_events_family_matches_oracle_on_mixed_sign_ids(spark):
    import random
    import shutil

    import tests.test_fuzz_oracle as T

    rng = random.Random(11)
    base = 1_704_067_200_000_000
    n = 40
    rows = [(rng.randint(-5, 5), rng.randint(0, 18 * 86400),
             rng.choice(T._EVENT_TYPES), rng.randint(0, 50000),
             rng.randint(0, 99)) for _ in range(n)]
    eids = list(range(-n // 2, n - n // 2))
    sf_dir = tempfile.mkdtemp(prefix="negid_ev_")
    pq.write_table(pa.table({
        "event_id": pa.array(eids, pa.int64()),
        "ts": pa.array([base + s * 1_000_000 for (_, s, _, _, _) in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([u for (u, _, _, _, _) in rows], pa.int64()),
        "event_type": pa.array([t for (_, _, t, _, _) in rows], pa.string()),
        "value": pa.array([c / 100.0 for (_, _, _, c, _) in rows],
                          pa.float64()),
        "props": pa.array(['{"k": %d}' % k for (_, _, _, _, k) in rows],
                          pa.string()),
    }), f"{sf_dir}/events.parquet")
    shutil.copy("/root/testdata/sf0.001/customer.parquet",
                f"{sf_dir}/customer.parquet")
    con = duckdb.connect()
    try:
        for t in ("events", "customer"):
            con.execute(
                f"CREATE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        for name in T._EVENTS_FUZZED:
            got = sorted(tuple(repr(x) for x in r)
                         for r in QUERIES[name](spark, sf_dir).collect())
            want = sorted(tuple(repr(x) for x in r)
                          for r in con.execute(ORACLES[name]).fetchall())
            assert got == want, f"{name} diverged on mixed-sign event_ids"
    finally:
        con.close()
