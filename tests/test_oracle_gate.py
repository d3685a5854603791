"""The driver gate as a test: every declared query vs its DuckDB oracle.

Parametrized over the registry, so a new declared query is covered the
moment it's registered. No-oracle entries get a rows-only smoke check,
mirroring the driver's weaker path.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as e
from tests.conftest import SF_CORRECT, assert_matches_oracle, canary_params

_NAMES = sorted(e.queries())


@pytest.mark.parametrize("name", canary_params(_NAMES))
def test_declared_query(name, spark, duck):
    if name in e.oracle_sql():
        assert_matches_oracle(spark, duck, name)
    else:
        df = e.queries()[name](spark, SF_CORRECT)
        assert df.count() >= 0  # rows-only: runs and has a stable schema
        assert df.columns


def test_every_oracle_has_query():
    assert set(e.oracle_sql()) <= set(e.queries())
