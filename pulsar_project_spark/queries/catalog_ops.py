"""Declared queries: catalog joins (SURVEY.md §2.3, §2.6).

The tool catalog is derived from part×supplier (FIXTURES.md §4 recipe):
``p_brand`` plays the tool name (25 brands across 2000 parts → heavy
cross-server name collisions, exactly the dict-overwrite scenario), and
``p_partkey % 10`` plays the server registration order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_project_spark.operators.catalog import extension_lookup, kv_lookup
from pulsar_project_spark.operators.retention import keep_last_n, last_wins_dedup
from pulsar_project_spark.registry import declare
from pulsar_project_spark.sources.tables import load_events, load_table

_TOOLS_CTE = """
tools AS (
  SELECT p_brand AS tool_name,
         p_partkey % 10 AS server_order,
         p_partkey
  FROM part
)
"""


def _tools_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        F.col("p_brand").alias("tool_name"),
        (F.col("p_partkey") % 10).alias("server_order"),
        "p_partkey",
    )


@declare(
    "tool_catalog_last_wins",
    oracle=f"""
WITH {_TOOLS_CTE}
SELECT tool_name, server_order, p_partkey
FROM (
  SELECT *, row_number() OVER (PARTITION BY tool_name
                               ORDER BY server_order DESC, p_partkey DESC) AS rn
  FROM tools
)
WHERE rn = 1
""",
)
def q_tool_catalog_last_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tool-catalog union with last-wins collision handling: the dict
    overwrite at manager.py:230 — later server's entry replaces earlier."""
    return last_wins_dedup(
        _tools_df(spark, sf_dir),
        ["tool_name"],
        [F.desc("server_order"), F.desc("p_partkey")],
    )


@declare(
    "tool_routing_first_match",
    oracle=f"""
WITH {_TOOLS_CTE}
SELECT tool_name, server_order, p_partkey
FROM (
  SELECT *, row_number() OVER (PARTITION BY tool_name
                               ORDER BY server_order ASC, p_partkey ASC) AS rn
  FROM tools
)
WHERE rn = 1
""",
)
def q_tool_routing_first_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """call_tool routing: linear scan across servers, dispatch to the
    FIRST server listing the name (manager.py:236-250)."""
    return keep_last_n(
        _tools_df(spark, sf_dir),
        ["tool_name"],
        [F.asc("server_order"), F.asc("p_partkey")],
        1,
    )


# Reference map (task.py:140-155) plus two event-type entries so the
# declared query exercises BOTH the hit and the default path.
_EXT_EXTRA = {"click": "html", "view": "md"}
_EXT_VALUES = (
    "(VALUES ('plan','md'),('guide','md'),('tutorial','md'),('recipe','md'),"
    "('article','md'),('report','md'),('manual','md'),('novel','txt'),"
    "('note','txt'),('journal','txt'),('poem','txt'),('story','txt'),"
    "('dialogue','txt'),('click','html'),('view','md')) v(ctype, vext)"
)


@declare(
    "extension_lookup_default",
    oracle=f"""
SELECT event_id, event_type, coalesce(vext, 'txt') AS ext
FROM events
LEFT JOIN {_EXT_VALUES} ON lower(event_type) = ctype
""",
)
def q_extension_lookup_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """content_type → extension broadcast lookup with dict.get default
    (task.py:138-156). event_type plays content_type; two types map,
    the rest fall through to the 'txt' default."""
    from pulsar_project_spark.operators.catalog import EXTENSION_MAP

    ev = load_events(spark, sf_dir).select("event_id", "event_type")
    out = extension_lookup(spark, ev, "event_type", mapping={**EXTENSION_MAP, **_EXT_EXTRA})
    return out.select("event_id", "event_type", "ext")


@declare(
    "kv_lookup_miss_message",
    oracle="""
SELECT k AS key,
       coalesce(n_name, 'Cannot find any value associated to key ''' || k || ''' in memory data.') AS result
FROM (VALUES (0),(7),(24),(99),(1234)) probe(k)
LEFT JOIN nation ON n_nationkey = k
""",
)
def q_kv_lookup_miss_message(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KV point lookup with the reference's miss text (memory.py:257-261).
    nation plays the KV store (key=n_nationkey, value=n_name); probes
    include keys that miss."""
    nation = load_table(spark, sf_dir, "nation")
    kv = nation.select(F.col("n_nationkey").alias("key"), F.col("n_name").alias("value"))
    keys = spark.createDataFrame([(0,), (7,), (24,), (99,), (1234,)], ["key"])
    return kv_lookup(kv, keys)
