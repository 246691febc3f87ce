"""Schema evolution on load (the drift case every long-running
migration hits: the source added, dropped, or retyped a column between
incremental runs; reference scope: the fixed DDL-declared schemas of
SURVEY §1.3 meeting Hive's evolving reality).

Two pieces:

- ``read_evolved``: parquet read with ``mergeSchema`` — the union
  schema across files, older files NULL-padded. Per-file footer
  schemas are metadata, so the merge is a driver-side footer pass, not
  a data scan.
- ``align_to_target``: project any evolved frame onto the DECLARED
  target schema — missing columns materialize as typed NULLs, drifted
  types cast (the load-side half of the type-override contract,
  global_typeconvert.config.yaml:3-4), extra columns drop. The
  returned report makes the drift auditable instead of silent; the
  projection is zero-shuffle and fuses into the scan.

Appending ``align_to_target(read_evolved(...), declared)`` is the
evolution-safe incremental load: the target table's schema never
drifts, and every deviation is logged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Parquet read across files with differing (compatible) schemas:
    union schema, missing columns NULL."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def align_to_target(
    df: DataFrame, target_schema: T.StructType
) -> tuple[DataFrame, dict[str, list[str]]]:
    """Project ``df`` onto ``target_schema`` (by case-insensitive
    name): missing → typed NULL, type drift → cast, extras → dropped.
    Returns (aligned frame, drift report)."""
    report: dict[str, list[str]] = {"added_null": [], "cast": [], "dropped": []}
    by_name = {f.name.lower(): f for f in df.schema.fields}
    target_names = {f.name.lower() for f in target_schema.fields}
    cols = []
    for f in target_schema.fields:
        src = by_name.get(f.name.lower())
        if src is None:
            report["added_null"].append(f.name)
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        elif src.dataType != f.dataType:
            report["cast"].append(
                f"{f.name}:{src.dataType.simpleString()}->{f.dataType.simpleString()}"
            )
            cols.append(F.col(src.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.col(src.name).alias(f.name))
    report["dropped"] = sorted(n for n in by_name if n not in target_names)
    return df.select(*cols), report
