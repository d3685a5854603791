"""Declared queries: fenced-JSON + structured-response extraction
(SURVEY.md §2.8 — split_content_and_json, structured-output extraction).

The corpus has no fenced blocks, so the fixture is built in-query from
``events``: a deterministic agent-response document wrapping the JSON
props payload in a ``` fence with narration around it. Both engines
construct the identical string, then extract and parse it back — the
round-trip checks fence scanning + JSON field extraction + boolean
coercion in one query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_project_spark.functions.coerce import to_boolean
from pulsar_project_spark.functions.json_extract import extract_fenced_json
from pulsar_project_spark.registry import declare
from pulsar_project_spark.sources.tables import load_events

# Synthetic agent response: think-text + fenced JSON (language-tagged for
# even ids — the tag-strip path, utils.py:147-150) + trailing prose.
_DOC_SQL = (
    "'I will now record the result.' || chr(10) || "
    "CASE WHEN event_id % 2 = 0 THEN '```json' ELSE '```' END || chr(10) || "
    """'{"think": "analyze", "finished": ' || CASE WHEN value > 50 THEN 'true' ELSE '"no"' END || """
    "', \"payload\": ' || props || '}' || chr(10) || '```' || chr(10) || 'Done.'"
)


@declare(
    "fenced_json_roundtrip",
    oracle=f"""
WITH docs AS (
  SELECT event_id, {_DOC_SQL} AS response FROM events
), extracted AS (
  -- json_valid guard: a malformed props payload rides into the fence,
  -- and DuckDB's json_extract_string ERRORS on it where Spark's
  -- get_json_object returns NULL; NULLing invalid payloads here gives
  -- the oracle Spark's semantics on dirty data
  SELECT event_id, CASE WHEN json_valid(p) THEN p END AS payload FROM (
    SELECT event_id,
           regexp_extract(response,
             '```(?:json|html|css|python|javascript|xml)?\\s*([\\{{\\[].*?[\\}}\\]])\\s*```', 1) AS p
    FROM docs
  )
)
SELECT event_id,
       json_extract_string(payload, '$.think') AS think,
       CASE WHEN lower(json_extract_string(payload, '$.finished')) IN ('true','t','yes','y') THEN true
            WHEN lower(json_extract_string(payload, '$.finished')) IN ('false','f','no','n') THEN false
            WHEN try_cast(json_extract_string(payload, '$.finished') AS DOUBLE) = 1.0 THEN true
            WHEN try_cast(json_extract_string(payload, '$.finished') AS DOUBLE) = 0.0 THEN false
            ELSE NULL END AS finished,
       TRY_CAST(json_extract_string(payload, '$.payload.k') AS INT) AS k_val
FROM extracted
""",
)
def q_fenced_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split_content_and_json strict path (utils.py:134-163) + structured
    response projection (client.py:194-214) + finished-flag boolean
    coercion (client.py:210): build fenced doc → extract fence → parse →
    typed fields. Everything JVM-side: regexp_extract + get_json_object."""
    ev = load_events(spark, sf_dir)
    doc = F.concat(
        F.lit("I will now record the result.\n"),
        F.when(F.col("event_id") % 2 == 0, F.lit("```json")).otherwise(F.lit("```")),
        F.lit("\n"),
        F.lit('{"think": "analyze", "finished": '),
        F.when(F.col("value") > 50, F.lit("true")).otherwise(F.lit('"no"')),
        F.lit(', "payload": '),
        F.col("props"),
        F.lit("}\n```\nDone."),
    )
    docs = ev.select("event_id", doc.alias("response"))
    extracted = docs.select(
        "event_id", extract_fenced_json("response").alias("payload")
    )
    return extracted.select(
        "event_id",
        F.get_json_object("payload", "$.think").alias("think"),
        to_boolean(F.get_json_object("payload", "$.finished")).alias("finished"),
        # try_cast: a non-numeric k is dirty data, not a query failure
        F.get_json_object("payload", "$.payload.k").try_cast("int").alias("k_val"),
    )
