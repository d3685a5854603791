"""Declared queries, grouped by operator family (SURVEY.md §2).

Importing this package registers every declared query into
``pulsar_project_spark.registry``.
"""

from pulsar_project_spark.queries import retrieval  # noqa: F401
