"""Declared queries, grouped by operator family (SURVEY.md §2).

Importing this package registers every declared query into
``pulsar_project_spark.registry``.
"""

from pulsar_project_spark.queries import agg_ops  # noqa: F401
from pulsar_project_spark.queries import analytics  # noqa: F401
from pulsar_project_spark.queries import analytics2  # noqa: F401
from pulsar_project_spark.queries import args_ops  # noqa: F401
from pulsar_project_spark.queries import catalog_ops  # noqa: F401
from pulsar_project_spark.queries import clustering_ops  # noqa: F401
from pulsar_project_spark.queries import coercion_ops  # noqa: F401
from pulsar_project_spark.queries import dedup_ops  # noqa: F401
from pulsar_project_spark.queries import events_state  # noqa: F401
from pulsar_project_spark.queries import extraction  # noqa: F401
from pulsar_project_spark.queries import grouping_ops  # noqa: F401
from pulsar_project_spark.queries import multimodal_ops  # noqa: F401
from pulsar_project_spark.queries import relational_ops  # noqa: F401
from pulsar_project_spark.queries import retrieval  # noqa: F401
from pulsar_project_spark.queries import similarity_ops  # noqa: F401
from pulsar_project_spark.queries import sketch_ops  # noqa: F401
from pulsar_project_spark.queries import sql_api_ops  # noqa: F401
from pulsar_project_spark.queries import streaming_ops  # noqa: F401
from pulsar_project_spark.queries import temporal_ops  # noqa: F401
from pulsar_project_spark.queries import timeseries_ops  # noqa: F401
from pulsar_project_spark.queries import text_analysis_ops  # noqa: F401
from pulsar_project_spark.queries import text_ops  # noqa: F401
from pulsar_project_spark.queries import window_ops  # noqa: F401
