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


def sketch_price_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile sketch with the same oracle contract as the HLL query:
    hash-check the EXACT median (bit-identical cross-engine), plus a
    per-engine boolean asserting the engine's own quantile sketch
    (Spark: Greenwald-Khanna at 1e-4 rank accuracy; DuckDB: t-digest)
    lands inside the exactly-computed [p48, p52] envelope.

    At 100 TB exact percentile needs all values per group on one
    reducer; approx_percentile ships one mergeable ~KB sketch per
    partition — the envelope check is what makes the trade auditable."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.expr(
                "percentile(l_extendedprice, array(0.48, 0.5, 0.52))"
            ).alias("ex"),
            F.expr("approx_percentile(l_extendedprice, 0.5, 10000)").alias("ap"),
        )
        .select(
            "l_returnflag",
            F.col("ex")[1].alias("exact_median"),
            ((F.col("ap") >= F.col("ex")[0]) & (F.col("ap") <= F.col("ex")[2])).alias(
                "sketch_ok"
            ),
        )
    )


SKETCH_MEDIAN_SQL = """
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.5) AS exact_median,
       approx_quantile(l_extendedprice, 0.5)
         BETWEEN quantile_cont(l_extendedprice, 0.48)
             AND quantile_cont(l_extendedprice, 0.52) AS sketch_ok
FROM lineitem
GROUP BY l_returnflag
"""


def sketch_hll_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup: per-HOUR HLL sketch states
    (``hll_sketch_agg``, Apache DataSketches) unioned up to per-DAY
    distinct-user estimates (``hll_union_agg``) — the state-table
    pattern approx_count_distinct cannot do (its output is a scalar;
    a sketch STATE unions losslessly, so hourly partials roll up to
    day/week/month without rescanning events).

    At 100 TB: the hourly pass is the only event-scale shuffle; the
    rollup moves one ~KB register blob per (hour, type) — this is how
    hypertable distinct-rollups stay O(buckets), not O(events).

    Oracle contract (same as sketch_distinct_users): the hashed payload
    is the EXACT per-day distinct count plus a per-engine boolean that
    its own sketch estimate lands within 5%; DuckDB checks its native
    approx_count_distinct, Spark checks the merged DataSketches HLL —
    both must emit true."""
    e = load_table(spark, sf_dir, "events")
    day = F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
    hourly = (
        e.select(
            day.alias("day"),
            F.date_trunc("hour", "ts").alias("hour"),
            "user_id",
        )
        .groupBy("day", "hour")
        .agg(F.hll_sketch_agg("user_id", F.lit(14)).alias("sk"))
    )
    daily_est = (
        hourly.groupBy("day")
        .agg(F.hll_union_agg("sk").alias("sk"))
        .select("day", F.hll_sketch_estimate("sk").alias("est"))
    )
    exact = e.select(day.alias("day"), "user_id").groupBy("day").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return exact.join(daily_est, "day").select(
        "day",
        "exact_users",
        (
            F.abs(F.col("est") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("rollup_sketch_ok"),
    )


SKETCH_HLL_ROLLUP_SQL = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       COUNT(DISTINCT user_id) AS exact_users,
       ABS(approx_count_distinct(user_id) - COUNT(DISTINCT user_id))
         <= 0.05 * COUNT(DISTINCT user_id) AS rollup_sketch_ok
FROM events
GROUP BY 1
"""
