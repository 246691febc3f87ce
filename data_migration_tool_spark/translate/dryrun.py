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
    return DryRunResult(stmt, stype, "success")


def dry_run_statement(spark: SparkSession, stmt: str) -> DryRunResult:
    stype = classify_statement(stmt)
    if stype == "comment_only":
        return DryRunResult(stmt, stype, "skipped")
    try:
        if stype == "select":
            spark.sql(stmt)  # eager analysis, lazy execution
            return DryRunResult(stmt, stype, "success")
        plan = spark.sql(f"EXPLAIN EXTENDED {stmt}").collect()[0][0]
        if _EXPLAIN_ERROR_MARKER in plan:
            detail = plan.split(_EXPLAIN_ERROR_MARKER, 1)[1].strip()[:500]
            if stype in ("update", "merge"):
                return _parse_and_resolve_target(spark, stmt, stype)
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
