"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship keyword-overlap retrieval (the
reference's ``simple_rag``, utils.py:326-330) on sf0.001. ``queries()`` /
``oracle_sql()`` expose the declared-operator registry from
``pulsar_project_spark.registry`` — one entry per implemented operator
from SURVEY.md §2, each with a DuckDB oracle unless the op is not
SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pulsar_project_spark.queries.retrieval import q_simple_rag_topk

    return q_simple_rag_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pulsar_project_spark.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from pulsar_project_spark.registry import ORACLES

    return dict(ORACLES)
