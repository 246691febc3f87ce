"""SparkSession factory tuned for both local testing and cluster scale.

The reference delegates execution to BigQuery; here the SparkSession *is*
the warehouse. Config notes (scale rationale):

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  and dynamic broadcast-join conversion replace the reference's static
  ``batchDistribution`` throttles.
- ``spark.sql.shuffle.partitions`` defaults to 2-4x cores locally; on a
  1000-executor cluster AQE coalesces from a high initial number, so the
  setting is a ceiling, not a hand-tuned constant.
- Arrow enabled for every pandas interchange (Pandas UDFs are the only
  sanctioned Python-side path; row-at-a-time UDFs are banned in this
  codebase).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for local[32] testing; override any of them via the
# ``extra`` dict or real spark-submit conf on a cluster.
_BASE_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.parquet.filterPushdown": "true",
    # read INT64(TIMESTAMP_NANOS) parquet columns as long; tables.load_table
    # converts them to micros timestamps (Spark has no nanos timestamp type)
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.shuffle.partitions": "32",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
    # long-lived drivers: ContextCleaner frees superseded localCheckpoint
    # blocks only after a JVM GC; force one at least every 5 min so block
    # storage tracks live state, not allocation history (see SCALE.md)
    "spark.cleaner.periodicGC.interval": "5min",
    "spark.ui.enabled": "false",
    "spark.sql.warehouse.dir": "/tmp/dmt-spark-warehouse",
}


def get_spark(
    app_name: str = "data-migration-tool-spark",
    master: str | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default *).
    On a real cluster pass ``master=None`` with an externally configured
    session — ``getOrCreate`` reuses it without clobbering cluster conf.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_BASE_CONF)
    if extra:
        conf.update(extra)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
