"""pulsar_project_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query / data-processing surface of
``aeromechanic000/pulsar-project`` ("Pulsar Agent") on Apache Spark:

* the agent's data plane (keyword-overlap retrieval, memory/task stores,
  retention + eviction policies, tool-catalog joins, content extraction)
  as declarative DataFrame / SQL plans that Catalyst optimizes, and
* the LLM-data-pipeline extensions a 100 TB training-data corpus needs
  (dedup, similarity search, multimodal columns, text analysis).

Layout
------
``sources/``    parquet table loaders, catalog registration, stream sources
``functions/``  scalar expression builders (text, coercion, json, vectors)
``operators/``  relational operators (retrieval, retention, catalog, dedup,
                similarity, textstats, multimodal)
``plans/``      full analytic queries (star-schema reporting)
``streaming/``  Structured Streaming pipelines (memory-update micro-batch)

Every operator is built DataFrame-first: filters/projections push down to
the parquet scan, small-side joins broadcast, aggregations keep map-side
partial aggregation, and nothing collects to the driver in a hot path.
"""

__version__ = "0.1.0"

from pulsar_project_spark.session import get_spark  # noqa: F401
