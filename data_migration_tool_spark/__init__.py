"""data_migration_tool_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of GoogleCloudPlatform/data-migration-tool.

The reference (see SURVEY.md) is an event-driven ETL/validation pipeline:
DDL extraction, SQL dialect translation, schema migration, bulk/incremental
data loads, and source↔target data validation, all audited to log tables
that are themselves queried with relational SQL.

This package re-expresses that surface Spark-first:

- ``session``    — tuned SparkSession factory (AQE, shuffle sizing).
- ``tables``     — testdata/catalog loaders.
- ``functions``  — scalar/hash/vector/text expression builders (JVM-side).
- ``operators``  — validation (DVT-equivalent), dedup, similarity, text ops.
- ``audit``      — append-only parquet audit tables + audit queries.
- ``sources``    — format/delimiter/schema-string readers, bulk +
  incremental loaders with rerun semantics.
- ``translate``  — SQL dialect transpiler (Teradata/Oracle/Redshift/Hive →
  Spark SQL) and dry-run validation.
- ``streaming``  — windowed incremental consumption + Structured Streaming
  file-source dispatch.
- ``plans``      — ready-made query plans (the engine's headline queries).

Everything is declarative DataFrame/SQL so Catalyst handles pushdown,
pruning, join selection and AQE handles skew/coalescing at scale.
"""

__version__ = "0.1.0"

from data_migration_tool_spark.session import get_spark  # noqa: F401
