"""Run-status reporting (SURVEY §2.10 UD3; reference
``common_utils/operators/reporting_operator.py:54-164``).

Every pipeline run ends with one ``dmt_report_table`` record carrying
the run status and a nested array of per-task errors. Status
classification mirrors the reference exactly:

- ``Success``          — no failed tasks
- ``Partial Success``  — every failure is a dynamically-mapped (per-item
  fan-out) task and nothing upstream-failed
- ``Failed``           — otherwise

The reference scrapes Airflow task states and log files; here task
outcomes are plain ``TaskResult`` values the pipeline collects, and the
record goes to the parquet audit log.
"""

from __future__ import annotations

import datetime
from dataclasses import dataclass

from data_migration_tool_spark.audit.log import AuditLog

SUCCESS_STATUS = "Success"
PARTIAL_SUCCESS = "Partial Success"
FAILED_STATUS = "Failed"


@dataclass
class TaskResult:
    task_name: str
    success: bool
    error_message: str | None = None
    dynamic: bool = False  # part of a per-item fan-out (mapped task)
    upstream_failed: bool = False  # skipped because a dependency failed
    log_link: str | None = None


def classify(results: list[TaskResult]) -> str:
    failed = [r for r in results if not r.success and not r.upstream_failed]
    upstream = [r for r in results if r.upstream_failed]
    if not failed and not upstream:
        return SUCCESS_STATUS
    if failed and all(r.dynamic for r in failed) and not upstream:
        return PARTIAL_SUCCESS
    return FAILED_STATUS


def build_run_report(
    config: dict,
    dag_name: str,
    results: list[TaskResult],
    execution_time: datetime.datetime | None = None,
) -> dict:
    """One dmt_report_table-shaped record (nested Error array — SURVEY
    F12 REPEATED RECORD build)."""
    errors = [
        {
            "task_name": r.task_name,
            "error_message": r.error_message or "",
            "log_link": r.log_link or "",
        }
        for r in results
        if not r.success and not r.upstream_failed
    ]
    return {
        "unique_id": str(config.get("unique_id", "")),
        "source_db": str(config.get("source", "")),
        "dag_name": dag_name,
        "execution_time": execution_time or datetime.datetime.now(datetime.timezone.utc),
        "dag_status": classify(results),
        "Error": errors,
    }


def save_run_report(audit: AuditLog, report: dict) -> str:
    """Append the record; return the status. Raises RuntimeError on a
    Failed run after persisting (reference fails the DAG run)."""
    audit.insert_rows("dmt_report_table", [report])
    status = report["dag_status"]
    if status == FAILED_STATUS:
        failed = [e["task_name"] for e in report["Error"]]
        raise RuntimeError(f"Task {failed} failed. Failing this run.")
    return status
