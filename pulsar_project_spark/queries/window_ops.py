"""Declared queries: ranking-window breadth (rank/dense_rank/ntile/
percent_rank/cume_dist) beyond the row_number retention patterns —
SURVEY.md §2.7 notes the reference needs none of these; a complete
analytic surface has them."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pulsar_project_spark.registry import declare
from pulsar_project_spark.sources.tables import load_events


@declare(
    "user_value_ranks",
    oracle="""
SELECT event_id, user_id, value,
       rank()         OVER w AS rnk,
       dense_rank()   OVER w AS drnk,
       ntile(4)       OVER w AS quartile,
       percent_rank() OVER w AS prank,
       cume_dist()    OVER w AS cdist
FROM (SELECT event_id, user_id, value FROM events WHERE event_type = 'purchase')
WINDOW w AS (PARTITION BY user_id ORDER BY value DESC, event_id ASC)
""",
)
def q_user_value_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full ranking-function family per user over purchase values.
    percent_rank/cume_dist are exact rationals of row counts — identical
    doubles in both engines given the same total order (hence the
    event_id tiebreak)."""
    ev = load_events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return ev.select(
        "event_id", "user_id", "value",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("prank"),
        F.cume_dist().over(w).alias("cdist"),
    )
