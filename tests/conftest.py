from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


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
