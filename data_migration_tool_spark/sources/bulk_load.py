"""Bulk data-load pipeline (SURVEY S5, §3.3 entry point C, bulk half).

Reference flow (``hive_data_load_dag.py:58-118`` +
``hive_bq_load_utils.py``): read per-table metadata (format, delimiter,
partition flags, schema string) → size guard → truncate/drop → load →
audit row per table → rerun protocol skips already-PASSed tables via
anti-join (constants.py:28-38).

Here the metadata comes from the ``hive_ddl_metadata`` audit table (or a
caller-supplied list of TableLoadSpec), the warehouse is a parquet
directory tree, and the rerun anti-join is ``audit.queries.tables_to_load``.
"""

from __future__ import annotations

import datetime
import os
import uuid
from dataclasses import dataclass

from pyspark.sql import SparkSession

from data_migration_tool_spark.audit.log import AuditLog
from data_migration_tool_spark.sources.readers import read_table
from data_migration_tool_spark.sources.writers import write_table

# Reference skips tables > 16 TB (hive_bq_load_utils.py:154-173)
MAX_TABLE_BYTES = 16 * 1024**4


@dataclass
class TableLoadSpec:
    database: str
    table: str
    source_path: str
    fmt: str = "parquet"
    delimiter: str | None = None
    schema_ddl: str | None = None
    partition_by: list[str] | None = None
    cluster_by: list[str] | None = None


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    if os.path.isfile(path):
        total = os.path.getsize(path)
    return total


def load_table(
    spark: SparkSession,
    spec: TableLoadSpec,
    warehouse: str,
    audit: AuditLog | None = None,
    run_id: str | None = None,
    mode: str = "overwrite",
    max_bytes: int = MAX_TABLE_BYTES,
) -> str:
    """Load one table into ``warehouse/db/table``; returns PASS/SKIP/FAIL
    and writes a ``hive_bqload_audit`` row (audit row written LAST so a
    crash re-runs the table — the reference's idempotency convention)."""
    run_id = run_id or uuid.uuid4().hex
    status, reason = "PASS", None
    target = os.path.join(warehouse, spec.database, spec.table)
    size = _dir_bytes(spec.source_path)
    if size > max_bytes:
        status, reason = "FAIL", f"table size {size} exceeds {max_bytes} bytes limit"
        if audit is not None:
            # Twin observability rows, matching the reference
            # (hive_bq_load_utils.py:154-173 always records the skip):
            # the per-table FAIL row below carries the load outcome;
            # this dmt_guard_events row makes the guard engagement
            # itself queryable alongside the dedup/ANN guards.
            from data_migration_tool_spark.audit.log import guard_event

            guard_event(
                audit,
                guard="bulk_load_max_bytes",
                action="refuse",
                subject=f"{spec.database}.{spec.table}",
                implied_cost=int(size),
                cap=int(max_bytes),
                detail=reason,
            )
    else:
        try:
            df = read_table(
                spark,
                spec.source_path,
                fmt=spec.fmt,
                delimiter=spec.delimiter,
                schema_ddl=spec.schema_ddl,
            )
            if spec.fmt == "parquet" and mode == "overwrite":
                # drop-vs-truncate: parquet sources may change schema →
                # drop the previous tree entirely (reference :230-246)
                import shutil

                shutil.rmtree(target, ignore_errors=True)
            write_table(
                df,
                target,
                partition_by=spec.partition_by,
                cluster_by=spec.cluster_by,
                mode=mode,
            )
        except Exception as e:  # noqa: BLE001 — per-table isolation
            status, reason = "FAIL", str(e)[:500]
    if audit is not None:
        audit.insert_rows(
            "hive_bqload_audit",
            [
                {
                    "load_dtm": datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None),
                    "run_id": run_id,
                    "hive_db_name": spec.database,
                    "bq_dataset": spec.database,
                    "tablename": spec.table,
                    "bq_job_id": f"job_{run_id}_{spec.table}",
                    "load_status": status,
                    "reason_for_failure": reason,
                }
            ],
        )
    return status


def bulk_load(
    spark: SparkSession,
    specs: list[TableLoadSpec],
    warehouse: str,
    audit: AuditLog,
    rerun: bool = True,
    run_id: str | None = None,
) -> dict[str, str]:
    """Load a batch of tables with the rerun protocol: tables already
    PASS-loaded (per audit) are skipped. Per-table failures don't stop
    the batch (reference's dynamic-task-mapping isolation, UD2)."""
    run_id = run_id or uuid.uuid4().hex
    done: set[tuple[str, str]] = set()
    if rerun and audit.exists("hive_bqload_audit"):
        from pyspark.sql import functions as F

        done = {
            (r["hive_db_name"], r["tablename"])
            for r in audit.table("hive_bqload_audit")
            .filter(F.col("load_status") == "PASS")
            .select("hive_db_name", "tablename")
            .distinct()
            .collect()
        }
    results: dict[str, str] = {}
    for spec in specs:
        key = f"{spec.database}.{spec.table}"
        if (spec.database, spec.table) in done:
            results[key] = "SKIP"
            continue
        results[key] = load_table(spark, spec, warehouse, audit, run_id)
    return results
