"""Transpiler / statement / dry-run / DDL-executor tests.

Fixtures are the reference's own conformance corpus
(``/root/reference/src/tests/end_to_end/input/ddl/`` and
``samples/ddl/`` — SURVEY §4.2.1); the tests assert our Spark-side
translation of each construct, not the reference's code.
"""

from __future__ import annotations

import pathlib

import pytest

from data_migration_tool_spark.translate.dryrun import dry_run_file
from data_migration_tool_spark.translate.executor import execute_ddl_fixpoint
from data_migration_tool_spark.translate.statements import (
    classify_statement,
    find_created_tables,
    split_statements,
    strip_comments,
)
from data_migration_tool_spark.translate.transpiler import map_type, transpile_ddl

REF_DDL = pathlib.Path("/root/reference/src/tests/end_to_end/input/ddl")
REF_SAMPLES = pathlib.Path("/root/reference/samples/ddl")


def _read(p: pathlib.Path) -> str:
    return p.read_text()


# --- type mapping -----------------------------------------------------------


@pytest.mark.parametrize(
    "src,expected",
    [
        ("BYTEINT", "TINYINT"),
        ("SMALLINT", "SMALLINT"),
        ("INTEGER", "INT"),
        ("BIGINT", "BIGINT"),
        ("DECIMAL(15,2)", "DECIMAL(15,2)"),
        ("DECIMAL(38,12)", "DECIMAL(38,12)"),
        ("DECIMAL(20,0)", "DECIMAL(20,0)"),
        ("NUMBER", "DECIMAL(38,0)"),
        ("NUMBER(38,4)", "DECIMAL(38,4)"),
        ("FLOAT", "DOUBLE"),
        ("CHAR(25)", "STRING"),
        ("VARCHAR(44)", "STRING"),
        ("VARCHAR2 (40)", "STRING"),
        ("character varying(25)", "STRING"),
        ("DATE", "DATE"),
        ("TIMESTAMP(0)", "TIMESTAMP_NTZ"),
        ("TIMESTAMP(6) WITH TIME ZONE", "TIMESTAMP"),
        ("JSON(5000)", "STRING"),
        ("VARBYTE(1024)", "BINARY"),
        ("DATETIME", "TIMESTAMP_NTZ"),
    ],
)
def test_map_type(src, expected):
    assert map_type(src) == expected


def test_map_type_override():
    # global_typeconvert.config.yaml contract: datetime → TIMESTAMP
    assert map_type("datetime", {"datetime": "TIMESTAMP"}) == "TIMESTAMP"


def test_map_type_unknown_returns_none():
    assert map_type("GEOMETRY") is None


# --- Teradata corpus --------------------------------------------------------


def test_transpile_teradata_lineitem():
    t = transpile_ddl(_read(REF_DDL / "teradata/lineitem.sql"), "teradata")
    assert (t.source_database, t.source_table) == ("tpch", "lineitem")
    assert len(t.columns) == 16
    by_name = {c.name: c for c in t.columns}
    assert by_name["L_QUANTITY"].spark_type == "DECIMAL(15,2)"
    assert by_name["L_RETURNFLAG"].spark_type == "STRING"
    assert by_name["L_SHIPDATE"].spark_type == "DATE"
    assert not by_name["L_ORDERKEY"].nullable
    assert t.cluster_by == ["L_ORDERKEY"]
    # table options surfaced as warnings, not silently eaten
    assert any("FALLBACK" in w for w in t.warnings)


def test_transpile_teradata_all_corpus_files():
    for f in sorted((REF_DDL / "teradata").glob("*.sql")):
        t = transpile_ddl(_read(f), "teradata")
        assert t.columns, f.name
        assert all(c.spark_type for c in t.columns), f.name
        # nothing unparsed in the reference's own corpus
        assert not any("unparsed" in w or "unmapped" in w for w in t.warnings), (
            f.name,
            t.warnings,
        )


def test_transpile_ppl_data_types_type_fidelity():
    t = transpile_ddl(_read(REF_DDL / "teradata/ppl_data_types.sql"), "teradata")
    by = {c.name: c.spark_type for c in t.columns}
    assert by["RECORD_ID"] == "DECIMAL(20,0)"
    assert by["BYTEINT_FIELD"] == "TINYINT"
    assert by["DECIMAL_FIELD_5"] == "DECIMAL(38,12)"
    assert by["JSON_FIELD"] == "STRING"
    assert by["NUMBER_FIELD_1"] == "DECIMAL(38,0)"
    assert by["NUMBER_FIELD_2"] == "DECIMAL(38,4)"
    assert by["TIMESTAMP_FIELD_1"] == "TIMESTAMP_NTZ"
    assert by["TIMESTAMP_FIELD_3"] == "TIMESTAMP"
    assert by["VARBYTE_FIELD"] == "BINARY"


def test_name_mapping():
    t = transpile_ddl(
        _read(REF_DDL / "teradata/region.sql"),
        "teradata",
        name_mapping={"tpch": "tpch_target"},
    )
    assert t.database == "tpch_target"
    assert t.qualified_name == "tpch_target.region"


# --- Oracle / Redshift samples ---------------------------------------------


def test_transpile_oracle_countries():
    t = transpile_ddl(_read(REF_SAMPLES / "oracle/EDW_ODB.COUNTRIES.sql"), "oracle")
    by = {c.name: c.spark_type for c in t.columns}
    assert by == {
        "COUNTRY_ID": "STRING",
        "COUNTRY_NAME": "STRING",
        "REGION_ID": "DECIMAL(38,0)",
    }
    assert not t.columns[0].nullable


def test_transpile_redshift_supplier():
    t = transpile_ddl(_read(REF_SAMPLES / "redshift/mig_test_supplier.sql"), "redshift")
    assert len(t.columns) == 7
    assert all(c.spark_type == "STRING" for c in t.columns[1:])
    assert t.columns[0].spark_type == "INT"
    assert t.cluster_by == ["s_suppkey"]  # SORTKEY → cluster hint
    assert any("DISTSTYLE" in w for w in t.warnings)


def test_transpile_all_redshift_samples():
    for f in sorted((REF_SAMPLES / "redshift").glob("*.sql")):
        t = transpile_ddl(_read(f), "redshift")
        assert t.columns, f.name
        assert not any("unparsed" in w or "unmapped" in w for w in t.warnings), (
            f.name,
            t.warnings,
        )


# --- generated Spark SQL round-trips through Spark --------------------------


def test_spark_sql_executes(spark, tmp_path):
    t = transpile_ddl(_read(REF_DDL / "teradata/nation.sql"), "teradata")
    t.database = None  # default catalog db for the test
    t.table = "translate_nation_rt"
    spark.sql("DROP TABLE IF EXISTS translate_nation_rt")
    spark.sql(t.spark_sql(location=str(tmp_path / "nation_rt")))
    fields = {f.name: f.dataType.simpleString() for f in spark.table(t.table).schema}
    assert fields["N_NATIONKEY"] == "int"
    assert fields["N_NAME"] == "string"
    spark.sql("DROP TABLE IF EXISTS translate_nation_rt")


def test_schema_ddl_usable_for_read(spark):
    t = transpile_ddl(_read(REF_DDL / "teradata/region.sql"), "teradata")
    df = spark.createDataFrame([], schema=t.schema_ddl())
    assert [f.name for f in df.schema] == ["R_REGIONKEY", "R_NAME", "R_COMMENT"]


# --- statements -------------------------------------------------------------


def test_split_statements_comment_and_string_aware():
    content = (
        "SELECT 1; -- trailing; comment\n"
        "SELECT 'a;b' AS x;\n"
        "/* block; comment */ SELECT 2;"
    )
    stmts = split_statements(content)
    assert len(stmts) == 3
    assert "'a;b'" in stmts[1]


def test_split_statements_bteq_mode():
    content = "BEGIN SELECT 1; EXCEPTION WHEN ERROR THEN x; END; SELECT 2;"
    stmts = split_statements(content, mode="BTEQ")
    assert stmts == ["SELECT 1", "SELECT 2"]


def test_strip_comments_keeps_string_literals():
    assert strip_comments("SELECT '--not a comment' -- real\n").strip() == (
        "SELECT '--not a comment'"
    )


@pytest.mark.parametrize(
    "stmt,expected",
    [
        ("CREATE SET TABLE db.t (a INT)", "create_table"),
        ("CREATE OR REPLACE VIEW v AS SELECT 1", "create_view"),
        ("INSERT INTO t VALUES (1)", "insert"),
        ("SEL * FROM t", "select"),
        ("WITH c AS (SELECT 1) SELECT * FROM c", "select"),
        ("UPDATE t SET a=1", "update"),
        ("DEL FROM t", "delete"),
        ("-- only a comment", "comment_only"),
    ],
)
def test_classify_statement(stmt, expected):
    assert classify_statement(stmt) == expected


def test_find_created_tables():
    stmts = split_statements(
        "CREATE TABLE tpch.a (x INT); CREATE OR REPLACE VIEW tpch.v AS SELECT 1;"
        "-- CREATE TABLE tpch.commented (y INT);\nSELECT 2;"
    )
    assert find_created_tables(stmts) == {"tpch.a", "tpch.v"}


# --- dry-run ----------------------------------------------------------------


def test_dry_run_file(spark, tables):
    content = (
        "SELECT o_orderkey FROM orders WHERE o_totalprice > 100;\n"
        "SELECT no_such_col FROM orders;\n"
        "-- comment only;\n"
    )
    results = dry_run_file(spark, content)
    statuses = [(r.statement_type, r.status) for r in results]
    assert ("select", "success") in statuses
    assert ("select", "fail") in statuses
    fail = next(r for r in results if r.status == "fail")
    assert fail.error


def test_dry_run_does_not_execute_dml(spark, tmp_path):
    spark.sql("DROP TABLE IF EXISTS dryrun_probe")
    spark.sql(
        f"CREATE TABLE dryrun_probe (a INT) USING parquet "
        f"LOCATION '{tmp_path / 'probe'}'"
    )
    spark.sql("INSERT INTO dryrun_probe VALUES (1)")
    results = dry_run_file(spark, "DELETE FROM dryrun_probe;")
    # parquet tables reject DELETE at analysis → recorded as fail, and
    # regardless: nothing may execute
    assert results[0].statement_type == "delete"
    assert spark.table("dryrun_probe").count() == 1
    spark.sql("DROP TABLE IF EXISTS dryrun_probe")


# --- retry-fixpoint executor ------------------------------------------------


def test_execute_ddl_fixpoint_resolves_dependencies(spark, tmp_path):
    spark.sql("DROP VIEW IF EXISTS fx_view")
    spark.sql("DROP TABLE IF EXISTS fx_base")
    stmts = [
        # view depends on the table: fails on round 1, succeeds on round 2
        "CREATE VIEW fx_view AS SELECT * FROM fx_base",
        f"CREATE TABLE fx_base (a INT) USING parquet LOCATION '{tmp_path / 'fx'}'",
    ]
    results = execute_ddl_fixpoint(spark, stmts, max_workers=1)
    by = {r.statement: r for r in results}
    assert by[stmts[1]].status == "success"
    assert by[stmts[0]].status == "success"
    assert by[stmts[0]].attempts == 2
    spark.sql("DROP VIEW fx_view")
    spark.sql("DROP TABLE fx_base")


def test_execute_ddl_fixpoint_stops_without_progress(spark):
    results = execute_ddl_fixpoint(
        spark, ["CREATE VIEW never_v AS SELECT * FROM missing_tbl"], max_workers=1
    )
    assert results[0].status == "fail"
    assert results[0].error


# --------------------------------------------------------------- DML/SQL

def test_translate_dml_name_mapping_and_literals():
    from data_migration_tool_spark.translate.dml import translate_statement

    t = translate_statement(
        "UPDATE DMT_DATASET.EMPLOYEE1 SET emp_name = 'a.b DMT_DATASET.x' where emp_no = 1",
        name_mapping={"dmt_dataset": "tgt_ds"},
    )
    assert t.sql.startswith("UPDATE tgt_ds.EMPLOYEE1")
    assert "'a.b DMT_DATASET.x'" in t.sql  # literals untouched
    assert t.statement_type == "update"


def test_translate_teradata_abbreviations():
    from data_migration_tool_spark.translate.dml import translate_statement

    t = translate_statement("SEL * FROM test.EMPLOYEE1", name_mapping={"test": "t2"})
    assert t.sql == "SELECT * FROM t2.EMPLOYEE1"
    assert t.statement_type == "select"
    t = translate_statement("DEL FROM test.EMPLOYEE2 ALL")
    assert t.sql == "DELETE FROM test.EMPLOYEE2"


def test_translate_qualify_rewrites_not_warns():
    from data_migration_tool_spark.translate.dml import translate_statement

    t = translate_statement(
        "SELECT a FROM t QUALIFY ROW_NUMBER() OVER (ORDER BY a) = 1"
    )
    # auto-rewritten to a windowed subquery since r4 — no warning left
    assert not t.warnings
    assert "QUALIFY" not in t.sql.upper()
    assert "__qual_0" in t.sql and "EXCEPT" in t.sql


def test_translate_reference_dml_corpus_dry_runs(spark, tmp_path):
    """Every statement in the reference's Teradata/Redshift/Oracle DML+SQL
    samples translates and passes Spark's analyze-only dry run against
    mapped target tables."""
    import glob

    from data_migration_tool_spark.translate.dml import translate_file
    from data_migration_tool_spark.translate.dryrun import dry_run_statement

    spark.sql("CREATE DATABASE IF NOT EXISTS dmltest")
    for tbl, ddl in {
        "employee1": "(emp_no int, emp_name string, job_title string, manager_id int, salary double, commission double, dept_no int)",
        "employee2": "(emp_no int, emp_name string, job_title string, manager_id int, salary double, commission double, dept_no int)",
        "test1": "(t_name string, t_number int, t_age string)",
        "countries": "(country_id string, country_name string, region_id int)",
    }.items():
        spark.sql(f"CREATE TABLE IF NOT EXISTS dmltest.{tbl} {ddl} USING parquet")

    mapping = {
        "dmt_dataset": "dmltest",
        "test": "dmltest",
        "mig_test": "dmltest",
        "edw_odb": "dmltest",
        "tpch": "dmltest",
    }
    files = (
        glob.glob("/root/reference/samples/dml/teradata/*.sql")
        + glob.glob("/root/reference/samples/dml/redshift/dml_[123].sql")
        + glob.glob("/root/reference/samples/sql/teradata/*.sql")
        + glob.glob("/root/reference/samples/sql/redshift/*.sql")
        + glob.glob("/root/reference/src/tests/end_to_end/input/sql/teradata/*.sql")
        + glob.glob("/root/reference/samples/sql/oracle/*.sql")
        + glob.glob("/root/reference/samples/dml/oracle/dml_1.sql")
    )
    assert len(files) >= 14
    n_stmts = 0
    n_oracle = 0
    for path in files:
        dialect = (
            "teradata"
            if "teradata" in path
            else ("oracle" if "oracle" in path else "redshift")
        )
        for t in translate_file(open(path).read(), dialect, mapping):
            known = (
                "EMPLOYEE" in t.sql
                or "test1" in t.sql
                or "countries" in t.sql.lower()
            )
            if not known or "supplier" in t.sql or "part" in t.sql:
                continue  # tpch.* not materialized here
            res = dry_run_statement(spark, t.sql)
            if "invalid_col" in t.sql:
                # DML_Use_Case_2.sql is the reference's own deliberate
                # error sample ("-- Error due to invalid_col not
                # exist") — the dry run must now CATCH it (it silently
                # passed before the column-probe fix)
                assert res.status == "fail" and "invalid_col" in res.error
                n_stmts += 1
                continue
            assert res.status == "success", f"{path}: {t.sql[:80]} -> {res.error}"
            n_stmts += 1
            if dialect == "oracle":
                n_oracle += 1
    assert n_stmts >= 14 and n_oracle >= 5
    spark.sql("DROP DATABASE dmltest CASCADE")


def test_rewrite_decode_nested_and_default():
    from data_migration_tool_spark.translate.dml import rewrite_decode

    got = rewrite_decode(
        "SELECT DECODE(status, 'A', 1, 'B', DECODE(sub, 'x', 2, 9), 0) FROM t"
    )
    assert "DECODE" not in got.upper()
    assert got.count("CASE") == 2 and got.count("END") == 2
    assert "ELSE 0" in got and "ELSE 9" in got


def test_qualify_rewrite_executes(spark, tables):
    from data_migration_tool_spark.translate.dml import translate_statement

    ts = translate_statement(
        "SEL o_custkey, o_orderkey, o_totalprice FROM orders "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey "
        "ORDER BY o_totalprice DESC, o_orderkey) = 1",
        dialect="teradata",
    )
    assert not ts.warnings
    got = {(r.o_custkey, r.o_orderkey) for r in spark.sql(ts.sql).collect()}
    want = {
        (r.o_custkey, r.o_orderkey)
        for r in spark.sql(
            "SELECT o_custkey, o_orderkey FROM (SELECT o_custkey, o_orderkey,"
            " ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice"
            " DESC, o_orderkey) rn FROM orders) WHERE rn = 1"
        ).collect()
    }
    assert got == want and len(got) > 0
    # schema must not leak the generated column
    assert spark.sql(ts.sql).columns == ["o_custkey", "o_orderkey", "o_totalprice"]


def test_qualify_with_trailer_and_decode_combined(spark, tables):
    from data_migration_tool_spark.translate.dml import translate_statement

    ts = translate_statement(
        "SEL o_orderkey, DECODE(o_orderstatus, 'F', 'done', 'open') AS st "
        "FROM orders QUALIFY RANK() OVER (ORDER BY o_totalprice DESC) <= 5 "
        "ORDER BY o_orderkey LIMIT 3",
        dialect="teradata",
    )
    assert not ts.warnings and "DECODE" not in ts.sql.upper()
    rows = spark.sql(ts.sql).collect()
    assert len(rows) == 3 and rows[0].st in ("done", "open")


def test_connect_by_rewrites_to_recursive_cte():
    from data_migration_tool_spark.translate.dml import translate_statement

    ts = translate_statement(
        "SELECT emp_id, name, LEVEL FROM emp "
        "START WITH mgr_id IS NULL "
        "CONNECT BY PRIOR emp_id = mgr_id",
        dialect="oracle",
    )
    assert not ts.warnings
    up = ts.sql.upper()
    assert up.startswith("WITH RECURSIVE")
    assert "CONNECT BY" not in up and "START WITH" not in up
    assert "JOIN __HIER P ON C.MGR_ID = P.EMP_ID" in up


def test_connect_by_prior_on_right_and_nocycle_warns():
    from data_migration_tool_spark.translate.dml import translate_statement

    ts = translate_statement(
        "SELECT emp_id FROM emp START WITH mgr_id IS NULL "
        "CONNECT BY NOCYCLE mgr_id = PRIOR emp_id",
        dialect="oracle",
    )
    assert any("NOCYCLE" in w for w in ts.warnings)
    assert "JOIN __hier p ON c.mgr_id = p.emp_id" in ts.sql


def test_connect_by_unsupported_condition_warns():
    from data_migration_tool_spark.translate.dml import translate_statement

    ts = translate_statement(
        "SELECT emp_id FROM emp CONNECT BY PRIOR emp_id = mgr_id "
        "AND dept = PRIOR dept",
        dialect="oracle",
    )
    assert any("rewrite manually" in w for w in ts.warnings)
    assert "CONNECT BY" in ts.sql  # left untouched


def test_connect_by_executes_org_chart(spark):
    from data_migration_tool_spark.translate.dml import translate_statement

    spark.createDataFrame(
        [(1, None, "ceo"), (2, 1, "vp_a"), (3, 1, "vp_b"),
         (4, 2, "eng"), (5, 4, "intern")],
        "emp_id int, mgr_id int, name string",
    ).createOrReplaceTempView("emp")
    ts = translate_statement(
        "SELECT name, LEVEL FROM emp WHERE LEVEL >= 2 "
        "START WITH mgr_id IS NULL "
        "CONNECT BY PRIOR emp_id = mgr_id "
        "ORDER BY LEVEL, name",
        dialect="oracle",
    )
    rows = [(r[0], r[1]) for r in spark.sql(ts.sql).collect()]
    assert rows == [("vp_a", 2), ("vp_b", 2), ("eng", 3), ("intern", 4)]


def test_td_function_rewrites_execute(spark):
    from data_migration_tool_spark.translate.dml import translate_statement

    spark.createDataFrame(
        [(0.0, None, "hello world")], "a double, b double, s string"
    ).createOrReplaceTempView("tdq")
    ts = translate_statement(
        "SEL NULLIFZERO(a) AS z, ZEROIFNULL(b) AS nz, "
        "INDEX(s, 'world') AS pos FROM tdq",
        dialect="teradata",
    )
    assert "NULLIFZERO" not in ts.sql.upper()
    r = spark.sql(ts.sql).first()
    assert r.z is None and r.nz == 0.0 and r.pos == 7


def test_td_function_rewrite_spares_ddl_primary_index():
    from data_migration_tool_spark.translate.dml import translate_statement

    ts = translate_statement(
        "CREATE TABLE t (id INT) UNIQUE PRIMARY INDEX (id)",
        dialect="teradata",
    )
    assert "INSTR" not in ts.sql.upper()


def test_td_function_rewrite_nested_args():
    from data_migration_tool_spark.translate.dml import rewrite_td_functions

    out = rewrite_td_functions(
        "SELECT ZEROIFNULL(NULLIFZERO(x + f(y, z))) FROM t"
    )
    assert out == "SELECT COALESCE(NULLIF(x + f(y, z), 0), 0) FROM t"


def test_td_function_rewrite_same_name_nested():
    from data_migration_tool_spark.translate.dml import rewrite_td_functions

    out = rewrite_td_functions("SELECT NULLIFZERO(NULLIFZERO(x)) FROM t")
    assert out == "SELECT NULLIF(NULLIF(x, 0), 0) FROM t"


def test_td_function_rewrite_skips_string_literals():
    from data_migration_tool_spark.translate.dml import rewrite_td_functions

    sql = "UPDATE t SET v = INDEX(s, 'x') WHERE note = 'see INDEX(2)'"
    out = rewrite_td_functions(sql)
    assert out == "UPDATE t SET v = INSTR(s, 'x') WHERE note = 'see INDEX(2)'"

    # escaped '' inside the literal must not end the literal early
    sql2 = "SELECT 'it''s INDEX(1)' , ZEROIFNULL(x) FROM t"
    out2 = rewrite_td_functions(sql2)
    assert out2 == "SELECT 'it''s INDEX(1)' , COALESCE(x, 0) FROM t"


def test_teradata_top_to_limit():
    from data_migration_tool_spark.translate.dml import translate_statement

    ts = translate_statement(
        "SEL TOP 10 a, b FROM db.t ORDER BY a", dialect="teradata"
    )
    assert ts.sql.endswith("ORDER BY a LIMIT 10") and "TOP" not in ts.sql
    assert ts.warnings == []

    pct = translate_statement("SELECT TOP 5 PERCENT a FROM t", dialect="teradata")
    assert "TOP 5 PERCENT" in pct.sql  # untouched
    assert any("PERCENT" in w for w in pct.warnings)


def test_oracle_plus_outer_join_left():
    from data_migration_tool_spark.translate.dml import translate_statement

    ts = translate_statement(
        "SELECT e.name, d.dname FROM emp e, dept d "
        "WHERE e.deptno = d.deptno(+) AND e.sal > 100",
        dialect="oracle",
    )
    assert (
        ts.sql == "SELECT e.name, d.dname FROM emp e LEFT JOIN dept d "
        "ON e.deptno = d.deptno WHERE e.sal > 100"
    )
    assert ts.warnings == []

    # marker on the LEFT column → the other table drives
    ts2 = translate_statement(
        "SELECT e.name FROM emp e, dept d WHERE e.deptno(+) = d.deptno",
        dialect="oracle",
    )
    assert "FROM dept d LEFT JOIN emp e ON e.deptno = d.deptno" in ts2.sql

    # both sides marked → refuse with a warning, SQL untouched
    ts3 = translate_statement(
        "SELECT 1 FROM a, b WHERE a.x(+) = b.y AND b.z(+) = a.w",
        dialect="oracle",
    )
    assert "(+)" in ts3.sql
    assert any("(+)" in w for w in ts3.warnings)


def test_oracle_sysdate_dual_rownum():
    from data_migration_tool_spark.translate.dml import translate_statement

    ts = translate_statement("SELECT SYSDATE FROM dual", dialect="oracle")
    assert ts.sql.strip() == "SELECT CURRENT_TIMESTAMP"

    lit = translate_statement("SELECT 'SYSDATE stays' FROM dual", dialect="oracle")
    assert "'SYSDATE stays'" in lit.sql

    lim = translate_statement(
        "SELECT a FROM t WHERE x = 1 AND ROWNUM <= 10", dialect="oracle"
    )
    assert lim.sql == "SELECT a FROM t WHERE x = 1 LIMIT 10"

    mid = translate_statement(
        "SELECT a FROM t WHERE ROWNUM < 5 AND x = 1", dialect="oracle"
    )
    assert any("ROWNUM" in w for w in mid.warnings)


def test_rewrite_decode_skips_string_literals():
    from data_migration_tool_spark.translate.dml import rewrite_decode

    sql = "SELECT DECODE(x, 1, 'DECODE(a, b)', 'other') FROM t"
    got = rewrite_decode(sql)
    assert got == (
        "SELECT CASE x WHEN 1 THEN 'DECODE(a, b)' ELSE 'other' END FROM t"
    )


def test_redshift_function_rewrites_execute(spark):
    from data_migration_tool_spark.translate.dml import translate_statement

    spark.createDataFrame(
        [(None, "hello world", "2024-03-05 23:30:00")],
        "a double, s string, t string",
    ).createOrReplaceTempView("rsq")
    ts = translate_statement(
        "SELECT NVL(a, -1, -2) AS nv, ISNULL(a, 0) AS isn, "
        "LEN(s) AS n, CHARINDEX('world', s) AS pos, "
        "DATEADD(day, 2, CAST(t AS TIMESTAMP)) AS d2, "
        "DATEDIFF(day, CAST(t AS TIMESTAMP), "
        "TIMESTAMP'2024-03-06 01:00:00') AS dd FROM rsq",
        dialect="redshift",
    )
    for gone in ("NVL", "ISNULL", "LEN(", "CHARINDEX", "DATEADD", "DATEDIFF"):
        assert gone not in ts.sql.upper().replace("LENGTH", ""), ts.sql
    r = spark.sql(ts.sql).first()
    assert r.nv == -1.0 and r.isn == 0.0
    assert r.n == 11 and r.pos == 7
    assert str(r.d2).startswith("2024-03-07 23:30")
    # 90 minutes apart but ONE day boundary crossed — Redshift counts 1
    assert r.dd == 1


def test_redshift_getdate_top_and_quoted_datepart():
    from data_migration_tool_spark.translate.dml import translate_statement

    ts = translate_statement(
        "SELECT TOP 3 GETDATE() AS now, DATEADD('hour', 1, ts) AS h "
        "FROM t WHERE note = 'call GETDATE() later'",
        dialect="redshift",
    )
    assert ts.sql.rstrip().endswith("LIMIT 3")
    assert "CURRENT_TIMESTAMP" in ts.sql
    assert "'call GETDATE() later'" in ts.sql  # literal untouched
    assert "TIMESTAMPADD(HOUR, 1, ts)" in ts.sql


def test_redshift_unknown_datepart_and_to_char_warn():
    from data_migration_tool_spark.translate.dml import translate_statement

    ts = translate_statement(
        "SELECT DATEDIFF(epoch, a, b), TO_CHAR(a, 'YYYY-MM-DD') FROM t",
        dialect="redshift",
    )
    assert "DATEDIFF(epoch" in ts.sql  # left untouched
    assert any("datepart" in w for w in ts.warnings)
    assert any("TO_CHAR" in w for w in ts.warnings)


def test_redshift_datediff_boundary_truncation(spark):
    from data_migration_tool_spark.translate.dml import translate_statement

    ts = translate_statement(
        "SELECT DATEDIFF(month, TIMESTAMP'2024-01-31 10:00:00', "
        "TIMESTAMP'2024-02-01 09:00:00') AS m, "
        "DATEDIFF(us, TIMESTAMP'2024-01-01 00:00:00', "
        "TIMESTAMP'2024-01-01 00:00:01') AS us",
        dialect="redshift",
    )
    r = spark.sql(ts.sql).first()
    assert r.m == 1  # one month boundary, though < 1 full month apart
    assert r.us == 1_000_000


def test_redshift_datediff_week_sunday_rewrite(spark):
    """Redshift weeks run Sunday–Saturday; Spark's WEEK functions are
    ISO-Monday. The rewrite truncates both operands to their week's
    Sunday and counts 7-day steps — exact for every pair, including
    ones straddling only a Sunday — and leaves an info note (not a
    manual-review warning)."""
    from data_migration_tool_spark.translate.dml import translate_statement

    ts = translate_statement(
        "SELECT DATEDIFF(week, a, b) AS w FROM t", dialect="redshift"
    )
    assert "DAYOFWEEK" in ts.sql and "DIV 7" in ts.sql
    assert any(w.startswith("info:") and "Sunday" in w for w in ts.warnings)

    # 2026-08-08 is a Saturday, 2026-08-09 a Sunday: one-day pair
    # straddling exactly a Sunday boundary → 1 week under Redshift,
    # 0 under the old ISO-Monday truncation
    spark.createDataFrame(
        [("2026-08-08", "2026-08-09"), ("2026-08-09", "2026-08-10"),
         ("2026-08-03", "2026-08-16")],
        "a string, b string",
    ).createOrReplaceTempView("t")
    got = [r.w for r in spark.sql(ts.sql).collect()]
    assert got == [1, 0, 2]


def test_oracle_to_char_warns_and_hive_transform_warns():
    from data_migration_tool_spark.translate.dml import translate_statement

    ts = translate_statement(
        "SELECT TO_CHAR(hiredate, 'YYYY-MM-DD') FROM emp", dialect="oracle"
    )
    assert any("TO_CHAR" in w for w in ts.warnings)

    th = translate_statement(
        "SELECT TRANSFORM(a, b) USING 'python script.py' AS (x, y) FROM t",
        dialect="hive",
    )
    assert any("TRANSFORM" in w for w in th.warnings)
    # plain Hive QL passes through warning-free
    ok = translate_statement(
        "SELECT key, v FROM t LATERAL VIEW explode(vals) e AS v",
        dialect="hive",
    )
    assert ok.warnings == []


def test_reference_error_sample_fails_dry_run_with_detail(spark):
    """The reference ships a deliberately-broken DML sample
    (samples/dml/redshift/dml_error_3.sql: misspelled columns, arity
    mismatch) to exercise its error reporting. Our dry run must
    classify every statement as FAILED with a usable error message —
    the negative path of the conformance corpus."""
    from data_migration_tool_spark.translate.dml import translate_file
    from data_migration_tool_spark.translate.dryrun import dry_run_statement

    spark.sql("CREATE DATABASE IF NOT EXISTS dmlerr")
    spark.sql(
        "CREATE TABLE IF NOT EXISTS dmlerr.test1 "
        "(t_name string, t_number int, t_age string) USING parquet"
    )
    try:
        content = open(
            "/root/reference/samples/dml/redshift/dml_error_3.sql"
        ).read()
        results = [
            dry_run_statement(spark, t.sql)
            for t in translate_file(
                content, "redshift", {"mig_test": "dmlerr"}
            )
        ]
        assert len(results) == 3
        for r in results:
            assert r.status == "fail", r
            assert r.error  # a message the report can surface
        # the errors must name the actual problems
        blob = " ".join(r.error for r in results)
        assert "t_numbers" in blob or "t_names" in blob  # unresolved col
    finally:
        spark.sql("DROP DATABASE dmlerr CASCADE")


def test_reference_oracle_ddl_corpus_transpiles(spark):
    """Every Oracle DDL in the reference's end-to-end input corpus
    transpiles: NUMBER/VARCHAR2 map, inline `CONSTRAINT name NOT NULL`
    attaches nullability to the right column, and the produced DDL
    executes on Spark."""
    import glob
    import pathlib

    from data_migration_tool_spark.translate.transpiler import transpile_ddl

    files = sorted(
        glob.glob(
            "/root/reference/src/tests/end_to_end/input/ddl/oracle/*.sql"
        )
    )
    assert len(files) >= 7
    spark.sql("CREATE DATABASE IF NOT EXISTS oddl")
    try:
        n_tables = 0
        for path in files:
            content = pathlib.Path(path).read_text()
            if "CREATE OR REPLACE VIEW" in content.upper():
                # the view sample routes through translate_statement:
                # column-list CREATE VIEW is Spark-native once the
                # Oracle-only WITH READ ONLY tail is stripped
                from data_migration_tool_spark.translate.dml import (
                    translate_statement,
                )

                ts = translate_statement(content, "oracle")
                assert ts.statement_type == "create_view"
                assert "READ ONLY" not in ts.sql.upper()
                plan = spark._jsparkSession.sessionState().sqlParser()
                plan.parsePlan(ts.sql)  # Spark-parseable
                continue
            n_tables += 1
            t = transpile_ddl(
                pathlib.Path(path).read_text(),
                "oracle",
                name_mapping={"edw_odb": "oddl"},
            )
            assert t.columns, path
            assert all(c.spark_type != "STRING" or "VARCHAR" in c.source_type.upper()
                       or "CHAR" in c.source_type.upper() or "CLOB" in c.source_type.upper()
                       for c in t.columns), (path, t.columns)
            spark.sql(f"DROP TABLE IF EXISTS {t.qualified_name}")
            spark.sql(t.spark_sql())
            got = {f.name.lower() for f in spark.table(t.qualified_name).schema.fields}
            assert got == {c.name.lower() for c in t.columns}, path
        assert n_tables >= 6
        # nullability lands on the named column, not its neighbor
        t1 = transpile_ddl(
            pathlib.Path(files[0]).read_text(), "oracle",
            name_mapping={"edw_odb": "oddl"},
        )
        byname = {c.name.lower(): c for c in t1.columns}
        assert byname["region_id"].nullable is False
        assert byname["region_name"].nullable is True
    finally:
        spark.sql("DROP DATABASE oddl CASCADE")
