"""Translation error-report rule filtering (SURVEY P7/U3) and JDBC
catalog-scan interface (S8-S10)."""

from __future__ import annotations

import pytest

from data_migration_tool_spark.extract.jdbc import (
    JdbcSource,
    catalog_query,
    jdbc_reader,
    read_catalog,
)
from data_migration_tool_spark.translate.report import (
    pattern_predicate,
    rules_predicate,
    split_translation_report,
    translated_files,
)

RULES = [
    {"field": "Category", "matchType": "equals", "value": "NoTargetSupportForFeature"},
    {"field": "Message", "matchType": "contains", "value": "fallback", "caseSensitive": True},
]


@pytest.fixture()
def report(spark):
    return spark.createDataFrame(
        [
            ("a.sql", "NoTargetSupportForFeature", "SET table dropped"),
            ("a.sql", "notargetsupportforfeature", "case-folded category"),
            ("b.sql", "ParseError", "syntax error near FALLBACK"),
            ("b.sql", "Whatever", "uses fallback mode"),
            ("c.sql", "ParseError", "boom"),
        ],
        "file_path string, Category string, Message string",
    )


def test_rules_filter_split(spark, report):
    failed, ignored = split_translation_report(report, RULES)
    # a.sql: both rows ignorable (equals is case-folded by default)
    # b.sql: row2 matches contains-rule (case-sensitive: 'fallback' not 'FALLBACK'),
    #        row1 does not → b fails; c fails
    assert sorted(r.file_path for r in failed.collect()) == ["b.sql", "c.sql"]
    assert ignored.count() == 3
    all_files = spark.createDataFrame(
        [("a.sql",), ("b.sql",), ("c.sql",), ("d.sql",)], "file_path string"
    )
    ok = sorted(r.file_path for r in translated_files(all_files, failed).collect())
    assert ok == ["a.sql", "d.sql"]  # d had no errors at all


def test_no_rules_all_error_files_fail(spark, report):
    failed, ignored = split_translation_report(report, [])
    assert failed.count() == 3 and ignored.count() == 0


def test_pattern_predicate(spark, report):
    pred = pattern_predicate("Message=syntax,Category=Whatever")
    assert sorted(
        r.file_path for r in report.filter(pred).select("file_path").distinct().collect()
    ) == ["b.sql"]
    assert pattern_predicate("") is None
    assert rules_predicate([]) is None


def test_bad_match_type():
    with pytest.raises(ValueError, match="matchType"):
        rules_predicate([{"field": "x", "value": "y", "matchType": "regex"}])


# ------------------------------------------------------------------- jdbc

def test_catalog_queries():
    q = catalog_query("teradata", "finance")
    assert "dbc.TablesV" in q and "'finance'" in q
    q = catalog_query("oracle", "EDW_ODB")
    assert "all_tab_columns" in q and "ordinal_position" in q
    q = catalog_query("redshift", "public")
    assert "pg_tables" in q
    with pytest.raises(ValueError, match="dialect"):
        catalog_query("mysql", "db")


def test_jdbc_reader_options_and_graceful_failure(spark):
    src = JdbcSource(url="jdbc:teradata://h/db", user="u", password="p")
    reader = jdbc_reader(spark, src, catalog_query("teradata", "db"))
    assert reader is not None
    # no driver on the classpath → load must raise, not hang/segfault
    with pytest.raises(Exception):
        read_catalog(spark, src, "teradata", "db")
