"""Declared queries: argument whitelist projection + schema-driven
casting (SURVEY.md §2.2 — ``client.py:87-101``, ``memory.py:212-244``).

The reference validates a tool call by (a) dropping arg keys not in the
operation's ``input_schema.properties`` and (b) coercing surviving args
to the schema-declared types. Fixture args are built in-query from
``events.props`` (same pattern as the fenced-JSON fixture)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import MapType, StringType

from pulsar_project_spark.registry import declare
from pulsar_project_spark.sources.tables import load_events

# the op's declared input schema: key → type (memory.py:155-165 shape)
_SCHEMA_KEYS = ("k", "verbose")

# json_valid guards: DuckDB's json_extract_string ERRORS on malformed
# JSON where Spark's get_json_object returns NULL — the guards (NULL j →
# NULL extractions, no error) give the oracle Spark's semantics on
# dirty props. Found by the NULL/malformed-input sweep. The OUTER guard
# matters too: a non-numeric k (props '{"k": "abc"}') splices an
# unquoted token into the constructed args string, making j ITSELF
# malformed — Spark's from_json/get_json_object then yield NULL, so the
# oracle NULLs out any j that isn't valid JSON before extracting.
_ARGS_RAW_SQL = (
    """'{"k": ' || CASE WHEN json_valid(props) """
    """THEN json_extract_string(props, '$.k') END || """
    """', "verbose": true, "debug": "on"}'"""
)
_ARGS_SQL = (
    f"CASE WHEN json_valid({_ARGS_RAW_SQL}) THEN {_ARGS_RAW_SQL} END"
)


@declare(
    "arg_whitelist_projection",
    oracle=f"""
WITH docs AS (
  SELECT event_id, {_ARGS_SQL} AS j FROM events
)
SELECT event_id, 'k' AS arg_key, json_extract_string(j, '$.k') AS arg_val
FROM docs WHERE json_extract_string(j, '$.k') IS NOT NULL
UNION ALL
SELECT event_id, 'verbose' AS arg_key, json_extract_string(j, '$.verbose') AS arg_val
FROM docs WHERE json_extract_string(j, '$.verbose') IS NOT NULL
""",
)
def q_arg_whitelist_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep only args the schema declares (client.py:87-90): parse the
    args object to a map, map_filter against the literal key whitelist,
    explode to a relation. All JVM-side."""
    ev = load_events(spark, sf_dir)
    args_json = F.concat(
        F.lit('{"k": '), F.get_json_object("props", "$.k"),
        F.lit(', "verbose": true, "debug": "on"}'),
    )
    allowed = F.array(*[F.lit(k) for k in _SCHEMA_KEYS])
    args = F.from_json(args_json, MapType(StringType(), StringType()))
    kept = F.map_filter(args, lambda k, v: F.array_contains(allowed, k))
    return ev.select(
        "event_id", F.explode(kept).alias("arg_key", "arg_val")
    )


@declare(
    "arg_schema_casting",
    oracle=f"""
WITH docs AS (
  SELECT event_id, {_ARGS_SQL} AS j FROM events
)
SELECT event_id,
       try_cast(json_extract_string(j, '$.k') AS INT) AS k_int,
       CASE WHEN lower(json_extract_string(j, '$.verbose')) IN ('true','t','yes','y') THEN true
            WHEN lower(json_extract_string(j, '$.verbose')) IN ('false','f','no','n') THEN false
            ELSE NULL END AS verbose_bool,
       try_cast(json_extract_string(j, '$.k') AS INT) IS NOT NULL AS k_valid
FROM docs
""",
)
def q_arg_schema_casting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-driven arg coercion (memory.py:218-239): number→int,
    boolean→bool via the reference's truthy-string table, plus the
    validity predicate that gates dispatch (memory.py:241-244)."""
    from pulsar_project_spark.functions.coerce import to_boolean

    ev = load_events(spark, sf_dir)
    args_json = F.concat(
        F.lit('{"k": '), F.get_json_object("props", "$.k"),
        F.lit(', "verbose": true, "debug": "on"}'),
    )
    docs = ev.select("event_id", args_json.alias("j"))
    k = F.get_json_object("j", "$.k").try_cast("int")
    return docs.select(
        "event_id",
        k.alias("k_int"),
        to_boolean(F.get_json_object("j", "$.verbose")).alias("verbose_bool"),
        k.isNotNull().alias("k_valid"),
    )


# lenient_json_parse moved to queries/lenient_ops.py (rows-only query,
# registered after the oracle-checked core — see that module's docstring).
