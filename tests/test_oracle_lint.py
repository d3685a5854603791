"""Oracle-SQL type lint — regression gate for the round-1 failure class.

DuckDB promotes ``sum()`` over INTEGER/BIGINT to HUGEINT (INT128);
Spark returns BIGINT. The driver's value hash distinguishes the two
(HUGEINT leaves the int64 numpy family on the pandas side), so any
oracle whose OUTPUT schema contains a HUGEINT column will hash-mismatch
even when every value is equal. ``DESCRIBE <select>`` gives DuckDB's
output types without executing the query, so this lints all 74 oracles
in milliseconds: every integer-sum output column must be wrapped in
``CAST(... AS BIGINT)`` (interior sums that feed a cast are fine — only
the output schema is hashed).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as e

_BANNED = {"HUGEINT", "UHUGEINT"}


def _output_types(duck, sql: str) -> list[tuple[str, str]]:
    return [(row[0], row[1]) for row in duck.execute(f"DESCRIBE {sql}").fetchall()]


def test_no_hugeint_oracle_output_columns(duck):
    bad = []
    for name, sql in sorted(e.oracle_sql().items()):
        for col, typ in _output_types(duck, sql):
            if typ.upper() in _BANNED:
                bad.append(f"{name}.{col}: {typ}")
    assert not bad, (
        "oracle output columns that DuckDB types as HUGEINT — wrap the "
        f"sum in CAST(... AS BIGINT): {bad}"
    )


def test_lint_fires_on_bare_integer_sum(duck):
    """Failing-on-purpose fixture: proves DESCRIBE surfaces the HUGEINT
    promotion this lint exists to catch."""
    types = _output_types(
        duck, "SELECT sum(r_regionkey) AS s FROM region"
    )
    assert types == [("s", "HUGEINT")]
