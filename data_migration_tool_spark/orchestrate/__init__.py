"""Orchestration layer: config validation, controller dispatch, batch
making, and run reporting (SURVEY §2.10 UD1-UD3, §3 entry points).

Replaces the reference's Composer/Airflow control plane (controller_dag,
ReportingOperator, parallelization_utils) with plain driver-side Python:
one Spark driver orchestrates, executors do the data work, and every run
writes the same audit shapes (``dmt_report_table``) the reference does.
"""

from data_migration_tool_spark.orchestrate.batching import run_batches
from data_migration_tool_spark.orchestrate.config import (
    ConfigError,
    normalize_and_validate_config,
)
from data_migration_tool_spark.orchestrate.controller import (
    Controller,
    determine_pipeline,
)
from data_migration_tool_spark.orchestrate.reporting import (
    TaskResult,
    build_run_report,
    save_run_report,
)

__all__ = [
    "ConfigError",
    "Controller",
    "TaskResult",
    "build_run_report",
    "determine_pipeline",
    "normalize_and_validate_config",
    "run_batches",
    "save_run_report",
]
