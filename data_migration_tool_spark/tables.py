"""Table loading & registration.

The reference's unit of work is the schema-qualified table backed by files
on object storage (SURVEY §1.1); here a table is a parquet directory/file
under a scale-factor dir, registered as a temp view so both the DataFrame
API and ``spark.sql`` can reach it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _nanos_timestamp_cols(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark reads them as
    long (``spark.sql.legacy.parquet.nanosAsLong``); we restore them to
    micros timestamps. Footer-only read, negligible cost. A directory
    table (Spark-written part files — the layout of any real lake) is
    probed via its first part file: one writer produced the directory,
    so part schemas agree."""
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        parts = sorted(
            n for n in os.listdir(path) if n.endswith(".parquet")
        )
        if not parts:
            return []
        path = os.path.join(path, parts[0])
    try:
        schema = pq.ParquetFile(path).schema
    except Exception:  # noqa: BLE001 — remote URIs etc.
        return []
    # The check must use the PARQUET (not Arrow) schema: Arrow surfaces
    # legacy INT96 timestamps as timestamp[ns] too, but Spark reads
    # INT96 as plain TIMESTAMP with no nanosAsLong involvement — only
    # INT64 columns annotated Timestamp(nanoseconds) take the
    # long-restore path.
    out = []
    for i in range(len(schema)):
        col = schema.column(i)
        if "." in col.path:  # nested leaf — top-level restore only
            continue
        if col.physical_type == "INT64" and "timeUnit=nanoseconds" in str(
            col.logical_type
        ):
            out.append(col.name)
    return out


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table. Parquet scan → columnar, pushdown-capable."""
    path = table_path(sf_dir, name)
    ns_cols = _nanos_timestamp_cols(path)
    if ns_cols:
        # runtime-settable; required even when the caller built the
        # session without our defaults (e.g. the driver's own session)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        # truncate (not round) to micros — matches how micros-native
        # engines surface nanos data
        df = df.withColumn(c, F.expr(f"timestamp_micros(`{c}` div 1000)"))
    return normalize_timestamps(df)


def normalize_timestamps(df: DataFrame) -> DataFrame:
    """Cast every TIMESTAMP_NTZ column to plain TIMESTAMP.

    Parquet ``timestamp[us]`` WITHOUT a timezone surfaces as
    TIMESTAMP_NTZ in Spark 4; every downstream ``unix_micros()`` call and
    every streaming watermark requires plain TIMESTAMP. The session
    timezone is pinned UTC (session.py), so the cast preserves the stored
    wall-clock exactly — and DuckDB (the oracle) treats the same bytes as
    tz-less wall-clock, which under UTC is the identical instant. Applied
    inside ``load_table`` (not only in ``get_spark``) so the driver's own
    session gets the fix too; streaming readers call it directly."""
    from pyspark.sql.types import TimestampNTZType

    for f in df.schema.fields:
        if isinstance(f.dataType, TimestampNTZType):
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return df


def register_tables(
    spark: SparkSession,
    sf_dir: str,
    names: tuple[str, ...] = TPCH_TABLES,
) -> dict[str, DataFrame]:
    """Register each table as a temp view named after itself.

    Views are lazy: registration costs only a schema read, so calling this
    per-query is cheap and keeps every query self-contained.
    """
    out: dict[str, DataFrame] = {}
    for name in names:
        path = table_path(sf_dir, name)
        if not os.path.exists(path):
            continue
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
