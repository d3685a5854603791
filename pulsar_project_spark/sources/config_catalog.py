"""Config-directory catalog scan (SURVEY.md §2.1 —
``collect_mcp_server_configs``, reference ``manager.py:121-161``: one
``config.json`` per server subdirectory → server catalog).

Spark-first: ONE ``spark.read.json`` with ``recursiveFileLookup`` over
the base directory — a single distributed scan regardless of how many
thousand config files exist — with the server name derived from
``input_file_name()`` (parent directory), replacing the reference's
driver-side ``os.walk`` loop."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


CONFIG_SCHEMA = "command STRING, args ARRAY<STRING>, env MAP<STRING, STRING>"


def scan_server_configs(spark: SparkSession, base_dir: str) -> DataFrame:
    """(server, command, args, env_keys, config_path) catalog from a
    directory tree of per-server ``config.json`` files. Explicit schema:
    config shape is a contract (manager.py:121-161), not something to
    re-infer per scan."""
    raw = (
        spark.read.schema(CONFIG_SCHEMA)
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "config.json")
        .json(base_dir)
        .withColumn("config_path", F.input_file_name())
    )
    server = F.element_at(F.split(F.col("config_path"), "/"), -2)
    return raw.select(
        server.alias("server"),
        "command",
        "args",
        F.coalesce(F.map_keys("env"), F.array().cast("array<string>")).alias("env_keys"),
        "config_path",
    )
