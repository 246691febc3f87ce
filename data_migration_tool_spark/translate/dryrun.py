"""DML dry-run validation (SURVEY §4.2.3; reference
``dml_validation_dag.py:46-48,192-214`` validates DML with BigQuery
dry-run jobs — no execution, errors reported per statement).

Spark equivalent, split by statement class:

- queries (SELECT/WITH): ``spark.sql(stmt)`` — classic-mode analysis
  is eager (resolves tables/columns, raises AnalysisException) but
  execution is lazy, so nothing runs;
- commands (INSERT/UPDATE/DELETE/CREATE/...): ``EXPLAIN <stmt>`` —
  commands execute eagerly under plain ``spark.sql``, so they must be
  wrapped. Spark 4's EXPLAIN reports analysis failures as output text
  ("Error occurred during query planning"), not exceptions, so the
  output is inspected.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import SparkSession

from data_migration_tool_spark.translate.statements import (
    classify_statement,
    split_statements,
)


@dataclass
class DryRunResult:
    statement: str
    statement_type: str
    status: str  # success | fail | skipped
    error: str | None = None


_EXPLAIN_ERROR_MARKER = "Error occurred during query planning"
_ANALYSIS_EXC_RE = re.compile(r"[\w.]*AnalysisException: ")

# UPDATE/MERGE only analyze against v2 tables with row-level-op support
# (Delta etc.); against plain parquet tables Spark reports an
# unsupported-operation planning error even for a perfectly translated
# statement. The dry run then falls back to syntax + target-table
# resolution — the same contract the reference's BigQuery dry-run gives
# minus column checks (documented capability gap, not a translation
# failure).
_TARGET_RES = [
    ("update", re.compile(r"^UPDATE\s+([\w$#.`\"]+)", re.I)),
    ("merge", re.compile(r"^MERGE\s+INTO\s+([\w$#.`\"]+)", re.I)),
]


def _parse_and_resolve_target(spark: SparkSession, stmt: str, stype: str) -> DryRunResult:
    try:
        spark._jsparkSession.sessionState().sqlParser().parsePlan(stmt)  # syntax
    except Exception as e:  # noqa: BLE001
        return DryRunResult(stmt, stype, "fail", str(e).split("\n")[0][:500])
    for t, pat in _TARGET_RES:
        if t == stype:
            m = pat.match(stmt.strip())
            if m:
                tbl = m.group(1).replace("`", "").replace('"', "")
                if not spark.catalog.tableExists(tbl):
                    return DryRunResult(
                        stmt, stype, "fail", f"target table not found: {tbl}"
                    )
                if stype == "update":
                    return _analyze_update_columns(spark, stmt, tbl)
                if stype == "delete":
                    return _analyze_delete_predicate(spark, stmt, tbl)
    return DryRunResult(stmt, stype, "success")


_DELETE_WHERE_RE = re.compile(
    r"^DELETE\s+FROM\s+[\w$#.`\"]+\s+WHERE\s+(?P<where>.*)$", re.I | re.S
)


def _analyze_delete_predicate(
    spark: SparkSession, stmt: str, tbl: str
) -> DryRunResult:
    """Predicate validation for DELETE on v1 parquet (where Spark's
    analyzer stops at UNSUPPORTED_FEATURE.TABLE_OPERATION before it
    resolves the WHERE clause): probe the predicate as a SELECT, which
    the analyzer can resolve against the target schema."""
    m = _DELETE_WHERE_RE.match(stmt.strip())
    if not m:
        return DryRunResult(stmt, "delete", "success")
    try:
        spark.sql(f"SELECT * FROM {tbl} WHERE {m.group('where')}")
    except Exception as e:  # noqa: BLE001
        return DryRunResult(stmt, "delete", "fail", str(e).split("\n")[0][:500])
    return DryRunResult(stmt, "delete", "success")


_UPDATE_RE = re.compile(
    r"^UPDATE\s+[\w$#.`\"]+\s+SET\s+(?P<set>.*?)(?:\s+WHERE\s+(?P<where>.*))?$",
    re.I | re.S,
)


def _analyze_update_columns(
    spark: SparkSession, stmt: str, tbl: str
) -> DryRunResult:
    """Column-level validation for UPDATE, which Spark cannot analyze
    against v1 parquet tables (EXPLAIN errors before resolving
    references, so target-existence alone let misspelled columns
    through — the reference's dml_error_3 negative sample). The SET and
    WHERE clauses are re-expressed as a SELECT over the target, which
    Spark CAN analyze: assignment targets are checked against the
    catalog schema, assignment values and the predicate resolve through
    the analyzer."""
    m = _UPDATE_RE.match(stmt.strip())
    if not m:
        return DryRunResult(stmt, "update", "success")
    cols = {f.name.lower() for f in spark.table(tbl).schema.fields}
    exprs = []
    for assign in _split_set_list(m.group("set")):
        if "=" not in assign:
            continue
        target, value = assign.split("=", 1)
        target = target.strip().strip('`"')
        if target.lower() not in cols:
            return DryRunResult(
                stmt,
                "update",
                "fail",
                f"unresolved SET column `{target}` on {tbl}",
            )
        exprs.append(value.strip())
    probe = f"SELECT {', '.join(exprs) or '*'} FROM {tbl}"
    if m.group("where"):
        probe += f" WHERE {m.group('where')}"
    try:
        spark.sql(probe)  # eager analysis
    except Exception as e:  # noqa: BLE001
        return DryRunResult(stmt, "update", "fail", str(e).split("\n")[0][:500])
    return DryRunResult(stmt, "update", "success")


def _split_set_list(s: str) -> list[str]:
    """Split a SET list on top-level commas (paren/quote aware)."""
    parts, buf, depth, i, n = [], [], 0, 0, len(s)
    while i < n:
        ch = s[i]
        if ch == "'":
            j = i + 1
            while j < n and s[j] != "'":
                j += 1
            buf.append(s[i : j + 1])
            i = j + 1
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(buf))
            buf = []
            i += 1
            continue
        buf.append(ch)
        i += 1
    parts.append("".join(buf))
    return [p.strip() for p in parts if p.strip()]


def dry_run_statement(spark: SparkSession, stmt: str) -> DryRunResult:
    stype = classify_statement(stmt)
    if stype == "comment_only":
        return DryRunResult(stmt, stype, "skipped")
    try:
        if stype == "select":
            spark.sql(stmt)  # eager analysis, lazy execution
            return DryRunResult(stmt, stype, "success")
        plan = spark.sql(f"EXPLAIN EXTENDED {stmt}").collect()[0][0]
        # Spark reports analysis failures inside EXPLAIN output two
        # ways: the planner marker, or (Spark 4, e.g. INSERT arity /
        # unresolved-column errors) an inline AnalysisException under
        # "== Analyzed Logical Plan ==" with NO marker — missing the
        # second form silently passed broken INSERTs (caught by the
        # reference's dml_error_3.sql negative sample).
        exc = _ANALYSIS_EXC_RE.search(plan)
        if _EXPLAIN_ERROR_MARKER in plan or exc:
            if stype in ("update", "merge") or (
                stype == "delete" and "UNSUPPORTED_FEATURE" in plan
            ):
                # v1 parquet targets: the analyzer rejects the OPERATION
                # before resolving references — an engine limitation,
                # not a statement error; fall back to target + column /
                # predicate probes
                return _parse_and_resolve_target(spark, stmt, stype)
            if _EXPLAIN_ERROR_MARKER in plan:
                detail = plan.split(_EXPLAIN_ERROR_MARKER, 1)[1].strip()[:500]
            else:
                detail = plan[exc.start():].strip()[:500]
            return DryRunResult(stmt, stype, "fail", detail or _EXPLAIN_ERROR_MARKER)
        return DryRunResult(stmt, stype, "success")
    except Exception as e:  # noqa: BLE001 — parse/analysis errors are data here
        return DryRunResult(stmt, stype, "fail", str(e).split("\n")[0][:500])


def dry_run_file(
    spark: SparkSession, content: str, mode: str = "SQL"
) -> list[DryRunResult]:
    """Validate every statement in a DML/SQL file; mirrors the per-file
    success/fail summary the reference writes to dmt_dml_validation."""
    return [
        dry_run_statement(spark, s) for s in split_statements(content, mode)
    ]
