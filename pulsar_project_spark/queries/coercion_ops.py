"""Declared queries: type-coercion family (SURVEY.md §2.8).

Inputs are derived from table data so the check runs at every scale:
token strings from part names, numeric strings from JSON props, plus the
canonical boolean spellings cycled by row id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_project_spark.functions.coerce import (
    boolean_convertible,
    is_float_convertible,
    is_int_convertible,
    to_boolean,
)
from pulsar_project_spark.registry import declare
from pulsar_project_spark.sources.tables import load_events

# Cycle of coercion inputs covering every branch: true/false spellings
# (mixed case), integral/fractional numerics, and junk.
_SPELLINGS = (
    "true", "T", "YES", "y", "false", "F", "No", "n",
    "1", "0", "1.0", "0.0", "2", "3.5", "spark", "",
)
_CASE_SQL = "CASE ((event_id % 16 + 16) % 16) " + " ".join(
    f"WHEN {i} THEN '{s}'" for i, s in enumerate(_SPELLINGS)
) + " END"


def _inputs_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir).select("event_id")
    arr = F.array(*[F.lit(s) for s in _SPELLINGS])
    return ev.select(
        "event_id",
        F.element_at(arr, (F.pmod(F.col("event_id"), F.lit(16)) + 1)
                     .cast("int")).alias("raw"),
    )


@declare(
    "boolean_normalize",
    oracle=f"""
WITH inputs AS (SELECT event_id, {_CASE_SQL} AS raw FROM events)
SELECT event_id, raw,
       coalesce(CAST(CASE WHEN lower(raw) IN ('true','t','yes','y') THEN true
            WHEN lower(raw) IN ('false','f','no','n') THEN false
            WHEN try_cast(raw AS DOUBLE) = 1.0 THEN true
            WHEN try_cast(raw AS DOUBLE) = 0.0 THEN false
            ELSE NULL END AS VARCHAR), 'unconvertible') AS as_bool,
       lower(raw) IN ('true','false','t','f','yes','no','y','n') AS bool_convertible
FROM inputs
""",
)
def q_boolean_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """convert_to_boolean + is_boolean_convertible (utils.py:181-244).

    The un-convertible case (where the reference raises ValueError) is
    emitted as the string 'unconvertible' rather than a NULL BOOLEAN: a
    nullable boolean round-trips as None in Spark↔pandas but NaN in
    DuckDB↔pandas, which a value-hash would see as a difference."""
    inp = _inputs_df(spark, sf_dir)
    return inp.select(
        "event_id",
        "raw",
        F.coalesce(to_boolean("raw").cast("string"), F.lit("unconvertible")).alias("as_bool"),
        boolean_convertible("raw").alias("bool_convertible"),
    )


@declare(
    "numeric_convertibility",
    oracle=f"""
WITH inputs AS (SELECT event_id, {_CASE_SQL} AS raw FROM events)
SELECT event_id, raw,
       try_cast(raw AS DOUBLE) IS NOT NULL AS float_ok,
       coalesce(try_cast(raw AS DOUBLE) = floor(try_cast(raw AS DOUBLE)), false) AS int_ok,
       try_cast(raw AS DOUBLE) AS as_number
FROM inputs
""",
)
def q_numeric_convertibility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """is_int_convertible / is_float_convertible (utils.py:165-179): int
    test goes through float + is_integer, so '1.0' is int-convertible."""
    inp = _inputs_df(spark, sf_dir)
    return inp.select(
        "event_id",
        "raw",
        is_float_convertible("raw").alias("float_ok"),
        F.coalesce(is_int_convertible("raw"), F.lit(False)).alias("int_ok"),
        F.col("raw").try_cast("double").alias("as_number"),
    )
