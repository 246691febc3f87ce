"""Table writers with the reference's load semantics (SURVEY S5/S6).

- truncate-vs-drop: the reference truncates target tables before CSV
  loads but DROPS them for parquet sources (schema may change;
  ``hive_bq_load_utils.py:230-246``). Spark equivalents:
  ``mode("overwrite")`` with/without ``overwriteSchema`` semantics.
- partitioned writes (``partitionBy``) for time/hive partition fields;
  clustering ≈ ``sortWithinPartitions`` before write (files arrive
  internally sorted, enabling row-group skipping at read time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",  # overwrite=truncate/drop, append=incremental
    partition_by: list[str] | None = None,
    cluster_by: list[str] | None = None,
    delimiter: str | None = None,
    target_file_rows: int | None = None,
) -> None:
    """Write a table directory.

    At 100 TB: ``partition_by`` low-cardinality date/region columns only
    (each value is a directory); ``cluster_by`` sorts within output
    files so min/max row-group stats prune point lookups;
    ``target_file_rows`` caps rows per file via maxRecordsPerFile
    (avoids giant single files without a repartition shuffle).
    """
    if cluster_by:
        df = df.sortWithinPartitions(*cluster_by)
    writer = df.write.mode(mode).format(fmt)
    if fmt == "csv" and delimiter:
        writer = writer.option("sep", delimiter)
    if fmt == "xml":
        writer = writer.option("rootTag", "rows").option("rowTag", "row")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if target_file_rows:
        writer = writer.option("maxRecordsPerFile", str(target_file_rows))
    writer.save(path)
