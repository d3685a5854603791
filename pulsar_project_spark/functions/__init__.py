from pulsar_project_spark.functions import text  # noqa: F401
