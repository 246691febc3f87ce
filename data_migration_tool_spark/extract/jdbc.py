"""JDBC catalog scans (SURVEY S8-S10; reference
``build_teradata_ddl_extraction_group.py:87-198``,
``build_oracle_ddl_extraction_group.py:84-131``,
``build_redshift_ddl_extraction_group.py:61-75``).

Each dialect's system-catalog query is pushed down through
``spark.read.format("jdbc")`` with the ``query`` option — the warehouse
executes it, Spark receives the result as a DataFrame. No JDBC drivers
ship in this environment, so ``read_catalog`` raises a clear error at
.load() time; the query shapes, option plumbing, and downstream DDL
reconstruction (``catalog.reconstruct_create_table``) are testable
without a live warehouse.

Scale: catalog tables are metadata-sized; ``fetchsize`` and a single
partition are correct here (don't parallelize tiny JDBC reads — the
reference's dumper uses one connection for the same reason).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class JdbcSource:
    url: str  # jdbc:teradata://host/..., jdbc:oracle:thin:@..., jdbc:redshift://...
    user: str
    password: str
    driver: str | None = None  # e.g. com.teradata.jdbc.TeraDriver


# Per-dialect catalog queries: DDL text (Teradata keeps it verbatim),
# column inventories (Oracle/Redshift reconstruct DDL from columns).
CATALOG_QUERIES: dict[str, str] = {
    # S8: dbc.TablesV carries the original CREATE text per table
    "teradata": (
        "SELECT DatabaseName AS database_name, TableName AS table_name, "
        "RequestText AS ddl_text FROM dbc.TablesV "
        "WHERE DatabaseName = '{database}' AND TableKind = 'T'"
    ),
    # S9: all_tab_columns, ordinal-ordered — feed to
    # catalog.reconstruct_create_table (ordered string agg) for DDL
    "oracle": (
        "SELECT table_name, column_name, "
        "data_type || CASE WHEN data_type = 'VARCHAR2' "
        "THEN '(' || data_length || ')' ELSE '' END AS data_type, "
        "column_id AS ordinal_position "
        "FROM all_tab_columns WHERE owner = '{database}'"
    ),
    # S10: pg_tables listing; DDL via per-table SHOW TABLE follow-ups
    "redshift": (
        "SELECT schemaname AS database_name, tablename AS table_name "
        "FROM pg_tables WHERE schemaname = '{database}'"
    ),
}


def catalog_query(dialect: str, database: str) -> str:
    if dialect not in CATALOG_QUERIES:
        raise ValueError(
            f"unsupported JDBC dialect {dialect!r} (have {sorted(CATALOG_QUERIES)})"
        )
    return CATALOG_QUERIES[dialect].format(database=database)


def jdbc_reader(spark: SparkSession, src: JdbcSource, query: str):
    """DataFrameReader with the catalog query pushed down. Split out
    from ``read_catalog`` so tests can assert the option plumbing
    without a driver on the classpath."""
    reader = (
        spark.read.format("jdbc")
        .option("url", src.url)
        .option("user", src.user)
        .option("password", src.password)
        .option("query", query)
        .option("fetchsize", "1000")
    )
    if src.driver:
        reader = reader.option("driver", src.driver)
    return reader


def read_catalog(
    spark: SparkSession, src: JdbcSource, dialect: str, database: str
) -> DataFrame:
    """Catalog scan for one source database. Raises at load() when the
    JDBC driver is absent (this environment ships none)."""
    return jdbc_reader(spark, src, catalog_query(dialect, database)).load()
