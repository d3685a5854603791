"""Declared queries, grouped by operator family (SURVEY.md §2).

Importing this package registers every declared query into
``pulsar_project_spark.registry``.

REGISTRY ORDER IS LOAD-BEARING: the driver's per-round correctness gate
hash-compares roughly the FIRST 50 registry entries against their DuckDB
oracles. The core set is pinned BY NAME in ``registry.CORE_FIRST`` (and
re-ordered to the front after all imports) — import order here only
determines the order of the EXTENSIONS that follow. Regression gate:
``tests/test_registry_order.py``.
"""

# --- reference-parity core: must land inside the driver's ~50-entry budget ---
from pulsar_project_spark.queries import retrieval  # noqa: F401  (1-2: flagship)
from pulsar_project_spark.queries import text_ops  # noqa: F401  (3-8)
from pulsar_project_spark.queries import extraction  # noqa: F401  (9)
from pulsar_project_spark.queries import catalog_ops  # noqa: F401  (10-13)
from pulsar_project_spark.queries import args_ops  # noqa: F401  (14-15)
from pulsar_project_spark.queries import coercion_ops  # noqa: F401  (16-17)
from pulsar_project_spark.queries import events_state  # noqa: F401  (18-23)
from pulsar_project_spark.queries import agg_ops  # noqa: F401  (24-28)
from pulsar_project_spark.queries import analytics  # noqa: F401  (29-35)
from pulsar_project_spark.queries import analytics2  # noqa: F401  (36-37)
from pulsar_project_spark.queries import sql_api_ops  # noqa: F401  (38-39)
from pulsar_project_spark.queries import window_ops  # noqa: F401  (40)
from pulsar_project_spark.queries import temporal_ops  # noqa: F401  (41-42)
from pulsar_project_spark.queries import timeseries_ops  # noqa: F401  (43-45)
from pulsar_project_spark.queries import text_analysis_ops  # noqa: F401  (46-49)
from pulsar_project_spark.queries import dedup_ops  # noqa: F401  (50: simhash first)
from pulsar_project_spark.queries import capstones  # noqa: F401  (r10 lifecycles)

# --- extensions: register after the core ---
from pulsar_project_spark.queries import clustering_ops  # noqa: F401
from pulsar_project_spark.queries import grouping_ops  # noqa: F401
from pulsar_project_spark.queries import relational_ops  # noqa: F401
from pulsar_project_spark.queries import similarity_ops  # noqa: F401
from pulsar_project_spark.queries import sketch_ops  # noqa: F401
from pulsar_project_spark.queries import multimodal_ops  # noqa: F401
from pulsar_project_spark.queries import streaming_ops  # noqa: F401
from pulsar_project_spark.queries import label_ops  # noqa: F401
from pulsar_project_spark.queries import cjk_ops  # noqa: F401
from pulsar_project_spark.queries import corpus_ops  # noqa: F401
from pulsar_project_spark.queries import pipeline_ops  # noqa: F401
from pulsar_project_spark.queries import skew_ops  # noqa: F401
from pulsar_project_spark.queries import star_ops  # noqa: F401
from pulsar_project_spark.queries import io_ops  # noqa: F401
from pulsar_project_spark.queries import lenient_ops  # noqa: F401
from pulsar_project_spark.queries import layout_ops  # noqa: F401
from pulsar_project_spark.queries import cdc_ops  # noqa: F401
from pulsar_project_spark.queries import graph_ops  # noqa: F401
from pulsar_project_spark.queries import tpch_shapes  # noqa: F401
