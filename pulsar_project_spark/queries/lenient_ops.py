"""Declared query: json5-lenient parse surface (SURVEY.md §2.8 —
``utils.py:140,162``).

Split out of ``args_ops`` so this rows-only query (no DuckDB oracle —
Python-defined leniency semantics, SURVEY.md §7.6) registers AFTER the
oracle-checked core: the driver's per-round correctness budget covers
the first ~50 registry entries, and a guaranteed-``no_oracle`` row
shouldn't consume one of those slots."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_project_spark.registry import declare
from pulsar_project_spark.sources.tables import load_events


@declare("lenient_json_parse")
def q_lenient_json_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """json5-leniency surface (utils.py:140,162): single quotes,
    unquoted keys, trailing commas — parsed by the Arrow-batched
    lenient UDF into canonical strict JSON, then field-extracted.
    Python-defined semantics → rows-only check (SURVEY.md §7.6)."""
    from pulsar_project_spark.functions.lenient_json import lenient_json_canonical

    ev = load_events(spark, sf_dir)
    messy = F.concat(
        F.lit("{think: 'записываю', k: "),
        F.get_json_object("props", "$.k"),
        F.lit(", tags: ['a', 'b',], }"),
    )
    # compute-bound Python stage: don't inherit the scan's (possibly
    # single-file → single-partition) layout — see udtf twin below
    docs = ev.select("event_id", messy.alias("messy")).repartition(
        spark.sparkContext.defaultParallelism
    )
    parsed = docs.select(
        "event_id", lenient_json_canonical(F.col("messy")).alias("canonical")
    )
    return parsed.select(
        "event_id",
        "canonical",
        F.get_json_object("canonical", "$.k").cast("int").alias("k_val"),
        F.get_json_object("canonical", "$.think").alias("think"),
    )


_PATHS_SQL = """
SELECT '$.' || k AS path,
       count(*) AS n,
       min(json_extract_string(props, '$.' || k)) AS min_v,
       max(json_extract_string(props, '$.' || k)) AS max_v
FROM (SELECT props, unnest(json_keys(props)) AS k FROM events
      WHERE props IS NOT NULL AND json_valid(props))
GROUP BY 1
"""
# ^ json_valid guard: DuckDB's json_keys ERRORS on malformed JSON;
# Spark's from_json returns NULL → the row silently drops. The guard
# gives the oracle the native twin's drop semantics. (The UDTF twin is
# MORE permissive on dirty data — JSON5 grammar, and a '$error' row for
# the unparseable remainder — so on non-strict corpora only the native
# twin matches this oracle; the driver corpus is strict-valid.)
#
# Assumes UNIQUE top-level keys as well as flat ones: on a duplicate
# key ('{"k":1,"k":2}') Spark's from_json map keeps one last-wins entry
# while DuckDB's json_keys unnests BOTH occurrences, so n/min/max would
# diverge. Valid by construction for the events corpus (props is
# object-serialized); dup-key JSON belongs to the UDTF twin's turf.


@declare("json_path_stats_native", oracle=_PATHS_SQL)
def q_json_path_stats_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native (JVM-side) twin of ``udtf_json_path_stats``: the same
    schema-on-read census of ``events.props``, but via
    ``from_json(props, map<string,string>)`` + ``explode`` — ONE strict
    JSON parse per row inside whole-stage codegen, no Python worker at
    all. Spark's Jackson parser renders non-string scalars as their
    JSON text when the target field is string (87 → "87"), exactly what
    DuckDB's ``json_extract_string`` does, so both twins share
    ``_PATHS_SQL`` as the oracle.

    The UDTF twin stays as the JSON5 surface (comments, single quotes,
    trailing commas — grammars Jackson rejects); THIS is the one to run
    when the column is known-strict JSON: at 100 TB a Python parse per
    row is the expensive path for data the JVM can parse natively
    (round-2 verdict flagged the UDTF at 13.4 s / 9% of bench; this
    plan is a single scan → explode → low-cardinality grouped agg with
    map-side partials).

    Top-level keys only (the corpus's props are flat); the UDTF twin
    walks nested leaves."""
    ev = load_events(spark, sf_dir).select("props")
    kv = ev.select(
        F.explode(F.from_json("props", "map<string,string>")).alias("k", "v")
    )
    return (
        kv.groupBy(F.concat(F.lit("$."), F.col("k")).alias("path"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        )
    )


@declare("udtf_json_path_stats", oracle=_PATHS_SQL)
def q_udtf_json_path_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read census via a Python UDTF (the Spark 4 table-
    function surface): LATERAL-join every event's props through
    ``Json5PathsUDTF`` (Arrow-optimized) and aggregate per leaf path —
    the "what shapes live in this semi-structured column" profile. The
    UDTF grammar is JSON5; this corpus's props happen to be strict
    JSON, which is what lets DuckDB's json_extract act as the oracle
    (min/max compare lexicographically on the extracted text in both
    engines).

    Scale shape: UDTF rows flow Arrow-batched; the per-path aggregate
    is a low-cardinality grouped count with map-side partials."""
    from pyspark.sql.functions import udtf

    from pulsar_project_spark.functions.lenient_json import Json5PathsUDTF

    J = udtf(Json5PathsUDTF, returnType="path: string, value: string",
             useArrow=True)
    spark.udtf.register("json5_paths", J)
    # The UDTF stage is compute-bound Python (per-row generator across
    # the Arrow boundary) — it must NOT inherit the scan's partitioning:
    # a small single-file corpus scans as ONE partition, serializing the
    # whole UDTF on one core (measured 11 s for 100k rows at sf0.1; the
    # same rows in 32 partitions take well under a second). Repartition
    # the 1-column projection to the session's parallelism before the
    # lateral join — the shuffle moves only `props`.
    n_slots = spark.sparkContext.defaultParallelism
    (
        load_events(spark, sf_dir).select("props")
        .repartition(n_slots)
        .createOrReplaceTempView("udtf_props_src")
    )
    return spark.sql("""
        SELECT p.path, count(*) AS n,
               min(p.value) AS min_v, max(p.value) AS max_v
        FROM udtf_props_src, LATERAL json5_paths(props) p
        GROUP BY p.path
    """)
