"""Controller dispatch (SURVEY §3.1 steps 2-3; reference
``controller_dag.py:182-241`` branch table, ``event_listener/main.py``
envelope handling, ``transformation.py`` payload decode).

An *event* is what the reference's Pub/Sub push delivers: an envelope
with ``eventType`` and a base64-JSON payload. ``determine_pipeline``
reproduces the branch table verbatim; ``Controller`` maps pipeline ids
to registered callables and runs them, reporting each run to the audit
log. The event source can be anything that yields envelopes — the
streaming file-watcher (``streaming.file_stream.watch_config_dir``)
replaces GCS notifications.
"""

from __future__ import annotations

import base64
import json
from collections.abc import Callable
from typing import Any

from data_migration_tool_spark.audit.log import AuditLog
from data_migration_tool_spark.orchestrate.config import normalize_and_validate_config
from data_migration_tool_spark.orchestrate.reporting import (
    TaskResult,
    build_run_report,
    save_run_report,
)

# Pipeline ids (the reference's next_dag_id values, de-Airflowed)
EXTRACT_DDL = "extract_ddl"
BATCH_TRANSLATE = "batch_sql_translation"
VALIDATION = "validation"
DATA_LOAD_TERADATA = "data_load_teradata"
DATA_LOAD_HIVE = "data_load_hive"
DATA_LOAD_HIVE_INC = "data_load_hive_inc"
DATA_LOAD_REDSHIFT = "data_load_redshift"
TRANSFER_LOG_TERADATA = "transfer_run_log_teradata"
TRANSFER_LOG_REDSHIFT = "transfer_run_log_redshift"

_JDBC_SOURCES = ("teradata", "oracle", "redshift", "db2")


def decode_event_payload(data_b64: str) -> dict:
    """base64 → JSON config (SURVEY F11; reference transformation.py:9-14)."""
    return json.loads(base64.b64decode(data_b64))


def determine_pipeline(event_type: str, config: dict[str, Any]) -> str | None:
    """The controller branch table (controller_dag.py:182-241). Returns a
    pipeline id or None for unsupported combinations (reference logs and
    routes to end_task)."""
    if event_type == "OBJECT_FINALIZE":
        op_type = config.get("type")
        source = config.get("source")
        if op_type in ("ddl", "sql", "dml"):
            if source in _JDBC_SOURCES:
                if config.get("validation_only") == "yes":
                    return VALIDATION
                if config.get("extract_ddl") == "yes" and op_type not in ("sql", "dml"):
                    return EXTRACT_DDL
                return BATCH_TRANSLATE
            if source == "hive":
                return EXTRACT_DDL
            return None
        if op_type == "data":
            if config.get("validation_only") == "yes":
                return VALIDATION
            return {
                "teradata": DATA_LOAD_TERADATA,
                "hive": DATA_LOAD_HIVE,
                "hive_inc": DATA_LOAD_HIVE_INC,
                "redshift": DATA_LOAD_REDSHIFT,
            }.get(source)
        return None
    if event_type == "TRANSFER_RUN_FINISHED":
        return {
            "on_premises": TRANSFER_LOG_TERADATA,
            "redshift": TRANSFER_LOG_REDSHIFT,
        }.get(config.get("dataSourceId"))
    return None


class Controller:
    """Routes validated configs to registered pipeline callables and
    audits every run (reference: controller_dag + ReportingOperator)."""

    def __init__(self, audit: AuditLog):
        self.audit = audit
        self.pipelines: dict[str, Callable[[dict], list[TaskResult]]] = {}

    def register(self, pipeline_id: str, fn: Callable[[dict], list[TaskResult]]) -> None:
        self.pipelines[pipeline_id] = fn

    def handle(self, event_type: str, config: dict[str, Any]) -> str | None:
        """Validate → branch → run → report. Returns the run status, or
        None when no pipeline matched (unsupported combination)."""
        if event_type == "OBJECT_FINALIZE":
            config = normalize_and_validate_config(config)
        pipeline_id = determine_pipeline(event_type, config)
        if pipeline_id is None:
            return None
        fn = self.pipelines.get(pipeline_id)
        if fn is None:
            raise KeyError(f"no pipeline registered for id {pipeline_id!r}")
        try:
            results = fn(config)
        except Exception as exc:  # noqa: BLE001 — any task error becomes a report
            results = [TaskResult(pipeline_id, False, str(exc))]
        report = build_run_report(config, pipeline_id, results)
        try:
            save_run_report(self.audit, report)
        except RuntimeError:
            pass  # status is in the report; callers inspect it
        return report["dag_status"]
