"""Bucketed table layout (SURVEY §1.2: clustering ≈ bucketing; §4.1
"clustering fields on target tables").

The reference records clustering columns per table and passes them to
``bq load`` — BigQuery then co-locates rows (reference:
``src/datamigration/dags/datamigration_utils/hive_bq_load_utils.py:184-192``
``--clustering_fields``; column discovery via the INFORMATION_SCHEMA
UNION query in ``datamigration_utils/constants.py:54-64``). The Spark-native
equivalent is hash bucketing: ``bucketBy(n, key)`` at write time makes
every subsequent equi-join or aggregation on ``key`` between
identically-bucketed tables *shuffle-free* — the single biggest
repeated-cost lever for a 100 TB fact table that is joined on the same
key daily. Bucket counts must match on both sides; sortBy makes the
sort-merge join sort-free as well.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 32,
    sort: bool = True,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table.

    Bucketing requires ``saveAsTable`` (the bucket spec lives in the
    catalog, not the files), which is why this takes a table name, not
    a path.
    """
    writer = df.write.format(fmt).mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.saveAsTable(table)


def bucket_spec(spark: SparkSession, table: str) -> tuple[list[str], int] | None:
    """(bucket columns, bucket count) of a catalog table, or None if the
    table isn't bucketed. Lets a join planner check co-location before
    relying on it."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    info = {r["col_name"]: r["data_type"] for r in rows}
    if "Num Buckets" not in info:
        return None
    cols = [c.strip(" `") for c in info["Bucket Columns"].strip("[]").split(",")]
    return cols, int(info["Num Buckets"])
