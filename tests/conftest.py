from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"

# Canary subset kept in the DEFAULT (driver-budget) selection of the
# per-query sweep files; the rest of each sweep carries the `gate`
# marker (pytest.ini). One representative per operator family, so a
# broken family still fails the default suite fast.
CANARY_QUERIES = frozenset({
    "simple_rag_topk",                  # retrieval flagship
    "group_count_by_type",              # exact agg baseline
    "revenue_rollup_region_nation",     # warehouse rollup
    "exact_dedup_fingerprint",          # dedup
    "minhash_candidate_pairs",          # LSH banding
    "pq_code_assignment",               # PQ encode
    "ivf_cell_assignment",              # IVF / kmeans
    "latest_event_per_user",            # window/state shapes
    "json_props_extract",               # text/JSON extraction
    "daily_user_series_gapfilled",      # timeseries
    "cms_heavy_hitters",                # sketches
    "streaming_topic_frequencies",      # streaming drain
    "tx_compaction_roundtrip_census",   # tx lifecycle
    "multimodal_corpus_pipeline",       # multimodal codecs
    "bpe_fixed_encode_census",          # text-analysis fold
    "neardup_components",               # iterative clustering
    "salted_skew_join_topn",            # skew handling
    "mq_pipeline_roundtrip",            # message-queue source
})


def canary_params(names):
    """Parametrize a full per-query sweep so only the canary subset
    runs by default; every other name carries the `gate` marker."""
    return [n if n in CANARY_QUERIES
            else pytest.param(n, marks=pytest.mark.gate)
            for n in names]


@pytest.fixture(scope="session")
def spark():
    from pulsar_project_spark.session import get_spark

    s = get_spark("pytest", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    from pulsar_project_spark.sources.tables import TABLE_NAMES

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_CORRECT}/{t}.parquet'")
    yield con


def assert_matches_oracle(spark, duck, name: str, sf_dir: str = SF_CORRECT) -> None:
    """Shared assertion: declared query == its DuckDB oracle."""
    import __spark_entry__ as e
    from tools.check_oracle import compare

    sdf = e.queries()[name](spark, sf_dir).toPandas()
    ddf = duck.execute(e.oracle_sql()[name]).fetchdf()
    problems = compare(name, sdf, ddf)
    assert not problems, f"{name}: {problems}"
