"""NULL-input correctness gate: Spark vs DuckDB on a corpus FULL of holes.

The fixed sf corpora contain no NULLs, so NULL-handling divergence
between the engine and its oracles is invisible to the driver until
real data arrives — and at 100 TB, NULL text, NULL embeddings, NULL
users, and malformed JSON are certainties, not corner cases. This gate
runs every oracle-bearing query over documents/events/embeddings
tables seeded with exactly those holes and requires equality.

The round-3 sweep behind this test found and fixed:
* NULL embedding → DIVIDE_BY_ZERO / divergent rows in the vector family
  (now filtered at ``with_norm``/``srp_buckets``: not a point in the
  space; mirrored WHERE in oracles);
* NULL text → Python-worker crash in the multimodal decode (now
  filtered at ``as_assets``: no payload, not an asset);
* NULL text → NULL langid scores vs oracle's 0/'und' (coalesced);
* malformed props → DuckDB json_extract ERROR vs Spark NULL
  (json_valid guards in four oracles);
* NULL value → Spark NULLS FIRST vs DuckDB NULLS LAST flipping the
  eviction argmin and decile assignment (ordering now pinned);
* NULL user_id counted by the mergeable rollup's pair-set re-count
  (COUNT of column, not rows) and its NULL event_type group dropped by
  a non-null-safe merge join (eqNullSafe);
* NULL event_type row kept by the unpivot oracle but never pivoted
  (oracle now mirrors the pivot's explicit column list).

``udtf_json_path_stats`` is the one allowed divergence: the UDTF is the
JSON5 surface — deliberately MORE permissive than the strict-JSON
oracle ('$error' rows for unparseable input, a '$' leaf for {}), so its
shared oracle only holds on strict corpora (which the driver's is).
"""

from __future__ import annotations

import re
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pulsar_project_spark.registry import ORACLES, QUERIES
from tests.conftest import canary_params

_ALLOWED_DIVERGENT = {"udtf_json_path_stats"}
_BASE_US = 1_704_067_200_000_000


@pytest.fixture(scope="module")
def null_sf_dir() -> str:
    d = tempfile.mkdtemp(prefix="null_sf_")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(8), pa.int64()),
        "text": pa.array(["filter merge scan", None, "the scan window",
                          None, "merge merge", None, "", "zzz"], pa.string()),
        "lang": pa.array(["en", "en", None, "en", "en", "en", "en", "en"],
                         pa.string()),
        "source": pa.array(["s1"] * 8, pa.string()),
        "n_chars": pa.array([17, None, 15, None, 11, None, 0, 3], pa.int64()),
    }), f"{d}/documents.parquet")
    # row 10 carries VALID JSON with a non-numeric k — '{"k": "abc"}'
    # must yield NULL via try_cast on both engines, not fail the query
    # (ADVICE r3: the fuzz corpus only ever generated integer k)
    pq.write_table(pa.table({
        "event_id": pa.array(range(11), pa.int64()),
        "ts": pa.array([_BASE_US + i * 1_000_000 for i in range(11)],
                       pa.timestamp("us")),
        "user_id": pa.array([1, 2, 1, None, 2, 1, 2, 1, 2, 1, 2],
                            pa.int64()),
        "event_type": pa.array(["view", "click", "purchase", "view", None,
                                "click", "purchase", "view", "click", "view",
                                "click"], pa.string()),
        "value": pa.array([1.0, 2.5, None, 4.0, 5.0, None, 7.25, 8.0, 9.0,
                           10.0, 2.0], pa.float64()),
        "props": pa.array(['{"k": 1}', None, '{"k": 3}', 'not json',
                           '{"k": 5}', None, '{"k": 7}', '{}', '{"k": 9}',
                           '{"k": 10}', '{"k": "abc"}'], pa.string()),
    }), f"{d}/events.parquet")
    pq.write_table(pa.table({
        "vec_id": pa.array(range(4), pa.int64()),
        "embedding": pa.array([[1.0] * 64, None, [0.5] * 64, [0.0] * 64],
                              pa.list_(pa.float32())),
        "label": pa.array([1, 2, None, 1], pa.int32()),
    }), f"{d}/embeddings.parquet")
    return d


_SMALL_TABLES = {"documents", "events", "embeddings"}
_ALL_TABLES = ("documents", "events", "embeddings", "orders", "customer",
               "lineitem", "nation", "region", "part", "supplier")

_NAMES = sorted(
    n for n, o in ORACLES.items()
    if n not in _ALLOWED_DIVERGENT
    and (lambda used: used and used <= _SMALL_TABLES)(
        {t for t in _ALL_TABLES if re.search(rf"\b{t}\b", o)})
)


def _key(rows):
    return sorted(tuple(repr(x) for x in r) for r in rows)


@pytest.fixture(scope="module")
def null_duck(null_sf_dir):
    import duckdb

    con = duckdb.connect()
    for t in sorted(_SMALL_TABLES):
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{null_sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", canary_params(_NAMES))
def test_matches_oracle_on_null_riddled_corpus(name, spark, null_sf_dir,
                                               null_duck):
    got = _key(QUERIES[name](spark, null_sf_dir).collect())
    want = _key(null_duck.execute(ORACLES[name]).fetchall())
    assert got == want
