"""Executable data contracts the engine's determinism rests on.

The oracle-parity guarantees assume three corpus invariants; this test
makes them explicit and CHECKED rather than folklore, at every shipped
scale factor:

* ``doc_id`` / ``event_id`` / ``vec_id`` are keys (unique) — every
  top-k / argmax / eviction tiebreak ends in the id, so duplicate ids
  would make "which row wins" engine-dependent;
* ``events.ts`` is non-null — event time is an ingestion invariant
  (every temporal window orders by it; the NULL-ordering pins in this
  repo cover VALUE columns, not time itself);
* ``events.event_type``/``documents.lang`` may be null-bearing in the
  wild (the NULL-input gate covers that); ids may not;
* ``documents.n_chars`` is non-null and non-negative — the padding
  census buckets by floor(n_chars/256) on both engines, and a negative
  length is corrupt data (both sides now floor identically, but the
  contract keeps the invariant visible).

If a future corpus generation breaks one of these, this test names the
broken contract instead of letting a hash mismatch surface it.
"""

from __future__ import annotations

import duckdb
import pytest

_SFS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")


@pytest.mark.parametrize("sf_dir", _SFS)
def test_ids_are_keys_and_ts_is_total(sf_dir):
    con = duckdb.connect()
    try:
        for table, key in (("documents", "doc_id"), ("events", "event_id"),
                           ("embeddings", "vec_id")):
            n, nd = con.execute(
                f"SELECT count(*), count(DISTINCT {key}) "
                f"FROM read_parquet('{sf_dir}/{table}.parquet')"
            ).fetchone()
            assert n == nd, f"{sf_dir}/{table}: {key} is not unique"
        null_ts = con.execute(
            f"SELECT count(*) FROM read_parquet('{sf_dir}/events.parquet') "
            "WHERE ts IS NULL"
        ).fetchone()[0]
        assert null_ts == 0, f"{sf_dir}: events.ts carries NULLs"
        bad_len = con.execute(
            f"SELECT count(*) FROM read_parquet('{sf_dir}/documents.parquet') "
            "WHERE n_chars IS NULL OR n_chars < 0"
        ).fetchone()[0]
        assert bad_len == 0, f"{sf_dir}: documents.n_chars null/negative"
    finally:
        con.close()
