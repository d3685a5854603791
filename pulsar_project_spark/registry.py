"""Declared-query registry: every operator the engine claims as done.

Each entry pairs a PySpark plan builder ``(spark, sf_dir) -> DataFrame``
with the ANSI-SQL oracle string DuckDB runs over the same parquet tables.
The driver hash-compares the two at sf0.01 (row count + schema +
order-insensitive value hash) — so every computed column is aliased to
the SAME name on both sides, every top-k carries a total-order tiebreak,
and money/measure sums go through DECIMAL so floating-point summation
order (Spark partial aggregation vs DuckDB single-node) can't skew the
last bits.

``__spark_entry__.py`` re-exports this registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def declare(name: str, oracle: str | None = None):
    """Register a declared query (and its DuckDB oracle, when the op is
    SQL-expressible — streaming/stateful ops omit it → rows-only check)."""
    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return wrap


# Import for side effects: each module declares its queries at import time.
def _load_all() -> None:
    from pulsar_project_spark import queries as _q  # noqa: F401


_load_all()
