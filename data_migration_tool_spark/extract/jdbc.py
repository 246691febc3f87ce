"""JDBC catalog scans (SURVEY S8-S10; reference
``build_teradata_ddl_extraction_group.py:87-198``,
``build_oracle_ddl_extraction_group.py:84-131``,
``build_redshift_ddl_extraction_group.py:61-75``).

Each dialect's system-catalog query is pushed down through
``spark.read.format("jdbc")`` with the ``query`` option — the warehouse
executes it, Spark receives the result as a DataFrame. No warehouse
JDBC drivers ship in this environment, so against Teradata/Oracle/
Redshift ``read_catalog`` raises a clear error at .load() time; the
query shapes, option plumbing, and downstream DDL reconstruction
(``catalog.reconstruct_create_table``) are interface-tested without a
live warehouse, and the whole path is exercised LIVE end-to-end against
a DuckDB JDBC driver when one is discoverable in a local maven/coursier
cache (``find_local_driver_jar``; tests/test_report_jdbc.py
``test_live_jdbc_catalog_end_to_end`` — real driver registration, real
query pushdown, real result marshalling through the same
``jdbc_reader`` options).

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
    JDBC driver is absent (this environment ships no warehouse ones)."""
    return jdbc_reader(spark, src, catalog_query(dialect, database)).load()


def find_local_driver_jar(artifact: str = "duckdb_jdbc") -> str | None:
    """Locate a JDBC driver jar in the machine's local maven/coursier
    caches (standard repository layout — no network, no install). Used
    by the live end-to-end test: any cached driver jar turns the
    interface-level JDBC tests into a real pushdown round-trip."""
    import glob
    import os
    import re

    # main-artifact jars only: <artifact>-<numeric version>.jar. The
    # anchored numeric tail rejects classifier jars (-sources, -javadoc,
    # -tests), which match the glob but contain no driver class.
    name_re = re.compile(rf"^{re.escape(artifact)}-(\d+(?:\.\d+)*)\.jar$")

    def version_key(path: str) -> tuple[int, ...]:
        m = name_re.match(os.path.basename(path))
        return tuple(int(p) for p in m.group(1).split("."))

    home = os.path.expanduser("~")
    for root in (
        os.path.join(home, ".cache", "coursier"),
        os.path.join(home, ".m2", "repository"),
        os.path.join(home, ".ivy2"),
    ):
        if not os.path.isdir(root):
            continue
        hits = [
            h
            for h in glob.glob(
                os.path.join(root, "**", f"{artifact}-*.jar"), recursive=True
            )
            if name_re.match(os.path.basename(h))
        ]
        if hits:
            # numeric component-wise max: 0.10.3 beats 0.9.2 (a plain
            # lexicographic sort would return the older jar)
            return max(hits, key=version_key)
    return None
