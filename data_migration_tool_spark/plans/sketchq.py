"""Sketch aggregates (HyperLogLog approximate distinct).

Sketch values are engine-specific (Spark's HLL++ and DuckDB's HLL give
different estimates), so the oracle contract is: hash-check the EXACT
distinct count, and a per-engine boolean asserting that engine's own
sketch lands within the documented error envelope (5% here, 5× the
rsd=0.01 requested from Spark's HLL++).
Both engines must emit ``true`` — the sketch path itself is exercised
and bounded, while the hashed payload stays deterministic.

At 100 TB this is the whole point of sketches: countDistinct shuffles
every distinct value; approx_count_distinct shuffles one ~1.5 kB HLL
register set per group, mergeable map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_migration_tool_spark.tables import load_table


def sketch_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
            F.countDistinct("event_id").alias("exact_events"),
            F.approx_count_distinct("event_id", rsd=0.01).alias("approx_events"),
        )
        .select(
            "event_type",
            "exact_users",
            "exact_events",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("users_sketch_ok"),
            (
                F.abs(F.col("approx_events") - F.col("exact_events"))
                <= 0.05 * F.col("exact_events")
            ).alias("events_sketch_ok"),
        )
    )


SKETCH_DISTINCT_SQL = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS exact_users,
       COUNT(DISTINCT event_id) AS exact_events,
       ABS(approx_count_distinct(user_id) - COUNT(DISTINCT user_id))
         <= 0.05 * COUNT(DISTINCT user_id) AS users_sketch_ok,
       ABS(approx_count_distinct(event_id) - COUNT(DISTINCT event_id))
         <= 0.05 * COUNT(DISTINCT event_id) AS events_sketch_ok
FROM events
GROUP BY event_type
"""
