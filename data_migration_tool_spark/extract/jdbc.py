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


def read_table(
    spark: SparkSession,
    src: JdbcSource,
    table: str,
    partition_column: str | None = None,
    num_partitions: int | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    fetchsize: int = 10_000,
) -> DataFrame:
    """Read a live warehouse TABLE over JDBC — the source side of a
    live validation run (reference: DVT connects to the source
    warehouse via ``--source-conn`` and compares it against the target,
    ``translation/dvt/main.py:36-56,153``; this engine's
    ``operators/validation.py`` takes DataFrames, so this reader is the
    bridge: ``column_validation(read_table(...), lake_copy, spec)``).

    Unlike the metadata-sized catalog scans, a data table read must
    PARALLELIZE: with ``partition_column`` (a roughly-uniform numeric
    column, typically the PK) the read issues ``num_partitions``
    range-bounded queries concurrently — Spark's standard JDBC
    partitioning. Bounds are discovered with one pushed-down MIN/MAX
    when not given. Without a partition column the read is a single
    connection (correct for small dimension tables; wrong for facts —
    pass the PK).

    Predicate/column pushdown apply as usual: filters and projections
    on the returned DataFrame reach the warehouse in the generated
    per-partition queries."""
    reader = (
        spark.read.format("jdbc")
        .option("url", src.url)
        .option("user", src.user)
        .option("password", src.password)
        .option("dbtable", table)
        .option("fetchsize", str(fetchsize))
    )
    if src.driver:
        reader = reader.option("driver", src.driver)
    if partition_column:
        if lower_bound is None or upper_bound is None:
            bounds = (
                jdbc_reader(
                    spark,
                    src,
                    f"SELECT MIN({partition_column}) AS lo, "
                    f"MAX({partition_column}) AS hi FROM {table}",
                )
                .load()
                .first()
            )
            lower_bound = bounds["lo"] if lower_bound is None else lower_bound
            upper_bound = bounds["hi"] if upper_bound is None else upper_bound
        if lower_bound is None or upper_bound is None:
            # Empty table (or all-NULL partition column): MIN/MAX came
            # back NULL. Stringifying None into lowerBound/upperBound
            # fails deep inside Spark's JDBC option parsing, so fall
            # back to the single-connection unpartitioned read — it
            # returns the same (empty) result with a sane plan.
            return reader.load()
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    return reader.load()


def _sql_literal(v) -> str:
    """Render a watermark value as a SQL literal. Strings and temporal
    values quote (a datetime stringifies to ``WHERE ts > 2026-08-15
    10:00:00`` otherwise — a syntax error on every dialect); numerics
    and bools render bare; anything else is an error rather than a
    silently-broken predicate."""
    import datetime

    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, datetime.datetime):
        return "'" + v.isoformat(sep=" ") + "'"
    if isinstance(v, datetime.date):
        return "'" + v.isoformat() + "'"
    if isinstance(v, bool) or isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        import math

        if not math.isfinite(v):
            # bare `nan`/`inf` is invalid or dialect-dependent SQL —
            # keep the loud-TypeError promise instead of emitting it
            raise TypeError(
                f"non-finite float watermark literal is not portable SQL: {v!r}"
            )
        return str(v)
    import decimal

    if isinstance(v, decimal.Decimal):
        return str(v)
    raise TypeError(
        f"unsupported watermark literal type {type(v).__name__!r}: {v!r}"
    )


def read_table_incremental(
    spark: SparkSession,
    src: JdbcSource,
    table: str,
    watermark_column: str,
    last_high_watermark=None,
    partition_column: str | None = None,
    num_partitions: int | None = None,
):
    """High-watermark incremental pull over JDBC: read only rows whose
    ``watermark_column`` (a monotonically growing id or timestamp)
    exceeds the last recorded high-water mark — the JDBC twin of the
    file-landing incremental loader (``sources/incremental.py``, S6;
    the reference tracks per-table incremental state in audit tables,
    ``hive_inc_load_table_list``). Returns ``(df, new_high)``; the
    caller persists ``new_high`` (audit sink) and passes it back on the
    next pull — exactly-once at the slice grain as long as writers
    only append rows with larger watermarks.

    The slice is bounded on BOTH sides: ``wm > last AND wm <= hi``,
    where ``hi`` is probed first via one pushed-down MAX. The upper
    bound matters under concurrent appends — the slice read is lazy
    and may execute long after the probe, so rows landing in between
    carry ``wm > hi``; without the bound they'd be delivered in this
    pull AND again next pull (whose predicate starts at ``> hi``).
    With it, every pull reads exactly the half-open window
    ``(last, hi]`` that the persisted mark describes — the windowed
    consumption contract of the reference's incremental loader
    (``hive_bq_load_utils_inc.py:60-79``, ``constants.py:84-90``).

    The predicate is part of the pushed-down subquery, so the
    warehouse filters before any data moves AND the optional
    partition-bound discovery (see ``read_table``) scans only the
    slice. ``new_high`` comes from a MAX over the same lower bound —
    no data pulled to answer it; when the slice is empty, the old
    mark is returned unchanged."""
    lower_pred = (
        f"{watermark_column} > {_sql_literal(last_high_watermark)}"
        if last_high_watermark is not None
        else "1=1"
    )
    hi = (
        jdbc_reader(
            spark,
            src,
            f"SELECT MAX({watermark_column}) AS hi FROM {table} "
            f"WHERE {lower_pred}",
        )
        .load()
        .first()["hi"]
    )
    if hi is None:
        return spark.createDataFrame([], read_table(spark, src, table).schema), (
            last_high_watermark
        )
    pred = f"{lower_pred} AND {watermark_column} <= {_sql_literal(hi)}"
    slice_rel = f"(SELECT * FROM {table} WHERE {pred}) inc_slice"
    df = read_table(
        spark,
        src,
        slice_rel,
        partition_column=partition_column,
        num_partitions=num_partitions,
    )
    return df, hi


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
