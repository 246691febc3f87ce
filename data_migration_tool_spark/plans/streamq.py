"""Structured Streaming plan under the correctness gate (SURVEY §2.9).

``events_stream_daily_counts`` runs a REAL streaming query — file
source → watermarked tumbling-window aggregation → memory sink with
``Trigger.AvailableNow`` — and returns the sink contents. Because
AvailableNow drains everything in one pass, the result equals the batch
window aggregation, so a plain SQL oracle checks the streaming path
end-to-end (watermark semantics, window assignment, state store).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_migration_tool_spark.streaming.file_stream import windowed_event_counts
from data_migration_tool_spark.tables import _nanos_timestamp_cols, table_path


def events_stream_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily tumbling-window counts per event_type, computed by
    Structured Streaming over the events table staged as a landed file.

    At 100 TB: the file source lists incrementally (only new files per
    micro-batch), the watermark bounds window state to ~2 days, and the
    windowed agg is the same map-side-combined shuffle as its batch
    twin — state size follows (windows × event_types), not row count."""
    src = table_path(sf_dir, "events")
    work = tempfile.mkdtemp(prefix="dmt_stream_")
    landing = os.path.join(work, "landing")
    os.makedirs(landing)
    shutil.copy(src, os.path.join(landing, "events.parquet"))

    ns_cols = _nanos_timestamp_cols(src)
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(os.path.join(landing, "events.parquet")).schema
    stream = spark.readStream.schema(schema).parquet(landing)
    for c in ns_cols:
        stream = stream.withColumn(c, F.expr(f"timestamp_micros(`{c}` div 1000)"))

    sink = f"events_daily_{uuid.uuid4().hex[:8]}"
    q = (
        windowed_event_counts(stream, window="1 day", watermark="1 day")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(sink).select(
        F.date_format("window_start", "yyyy-MM-dd").alias("day"),
        "event_type",
        "n_events",
        "sum_value",
    )


def events_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization as a REAL stateful streaming query:
    file source → ``applyInPandasWithState`` (per-user open-session
    state, emit-on-update) → memory sink, drained with AvailableNow.

    With a single drain every emitted (user, session) row is final, so
    the result equals batch sessionization and a plain SQL oracle
    checks the stateful path end-to-end (state round-trip, Arrow
    transfer, update-mode emission). See streaming/stateful.py for the
    100 TB state-size argument."""
    from data_migration_tool_spark.streaming.stateful import sessionize_stream

    src = table_path(sf_dir, "events")
    work = tempfile.mkdtemp(prefix="dmt_sess_stream_")
    landing = os.path.join(work, "landing")
    os.makedirs(landing)
    shutil.copy(src, os.path.join(landing, "events.parquet"))

    ns_cols = _nanos_timestamp_cols(src)
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(os.path.join(landing, "events.parquet")).schema
    stream = spark.readStream.schema(schema).parquet(landing)
    for c in ns_cols:
        stream = stream.withColumn(c, F.expr(f"timestamp_micros(`{c}` div 1000)"))

    sink = f"events_sessions_{uuid.uuid4().hex[:8]}"
    q = (
        sessionize_stream(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(sink)


EVENTS_STREAM_SESSIONS_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800 * 1000000 THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessioned AS (
  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS duration_us,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM sessioned
GROUP BY user_id, session_id
"""


EVENTS_STREAM_DAILY_SQL = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""
