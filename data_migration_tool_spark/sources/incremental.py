"""Incremental (time-windowed) load pipeline (SURVEY S6/S13, ST2-ST4;
reference ``hive_bq_load_utils_inc.py`` + ``hive_inc_data_load_dag.py``).

Semantics mirrored from the reference:
1. consume file-arrival records whose publish_time falls in the schedule
   window (1-day lookback from the latest record — constants.py:84-90);
2. parse ``db/table`` from each path and verify the table exists
   (``hive_bq_load_utils_inc.py:82-139``);
3. copy files into dated staging, one copy-status audit row per file
   (``:193-278``);
4. derive the affected-table list from PASS copy rows
   (constants.py:92-100) and append-load per table (``:542-667``).

The append itself is idempotent per (run, file): rerunning skips files
already marked PASS for the same dated staging path (ST4's
exactly-once-ish dedup via audit anti-join).
"""

from __future__ import annotations

import datetime
import os
import re
import shutil
import uuid

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from data_migration_tool_spark.audit.log import AuditLog
from data_migration_tool_spark.audit.queries import (
    affected_tables_from_copy_status,
    files_in_window,
)
from data_migration_tool_spark.sources.readers import read_table

# db/table from "<prefix>/<db>/<table>/<file>" (reference parses GCS
# object names the same way, hive_bq_load_utils_inc.py:82-115)
_PATH_RE = re.compile(r"(?:^|/)([^/]+)/([^/]+)/[^/]+$")


def parse_db_table(path: str) -> tuple[str, str] | None:
    m = _PATH_RE.search(path)
    return (m.group(1), m.group(2)) if m else None


def stage_files(
    audit: AuditLog,
    staging_root: str,
    run_time: datetime.datetime | None = None,
    lookback_days: int = 1,
    known_tables: set[tuple[str, str]] | None = None,
) -> list[dict]:
    """Steps 1-3: window query → path parse → copy to dated staging with
    per-file status rows. Returns the copy-status rows written."""
    run_time = run_time or datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)
    unique_id = uuid.uuid4().hex
    date_dir = run_time.strftime("%Y%m%d")
    rows = []
    already = set()
    if audit.exists("hive_inc_load_table_list"):
        already = {
            (r["source_path"], r["destination_path"])
            for r in audit.table("hive_inc_load_table_list")
            .filter(F.col("file_copy_status") == "PASS")
            .select("source_path", "destination_path")
            .collect()
        }
    for r in files_in_window(audit, lookback_days).collect():
        src = r["file_name"]
        parsed = parse_db_table(src)
        t0 = datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)
        if parsed is None:
            status, db, tbl, dst = "FAIL", None, None, None
        else:
            db, tbl = parsed
            if known_tables is not None and (db, tbl) not in known_tables:
                status, dst = "FAIL", None
            else:
                dst = os.path.join(staging_root, date_dir, db, tbl, os.path.basename(src))
                if (src, dst) in already:
                    continue  # rerun: already copied for this window
                try:
                    os.makedirs(os.path.dirname(dst), exist_ok=True)
                    shutil.copy(src, dst)
                    status = "PASS"
                except OSError:
                    status = "FAIL"
        rows.append(
            {
                "unique_id": unique_id,
                "job_run_time": run_time,
                "load_start_time": t0,
                "load_end_time": datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None),
                "hive_db": db,
                "bq_dataset": db,
                "table_name": tbl,
                "source_path": src,
                "destination_path": dst,
                "file_copy_status": status,
            }
        )
    if rows:
        audit.insert_rows("hive_inc_load_table_list", rows)
    return rows


def incremental_append(
    spark: SparkSession,
    audit: AuditLog,
    warehouse: str,
    fmt: str = "parquet",
    delimiter: str | None = None,
    schema_ddl: str | None = None,
) -> dict[str, int]:
    """Step 4: per affected table, append-load every staged file from the
    latest run date. Returns {db.table: files_loaded}."""
    loaded: dict[str, int] = {}
    cs = audit.table("hive_inc_load_table_list")
    latest = cs.agg(F.max(F.to_date("job_run_time")).alias("d"))
    files = (
        cs.crossJoin(F.broadcast(latest))
        .filter(
            (F.to_date("job_run_time") == F.col("d"))
            & (F.col("file_copy_status") == "PASS")
        )
        .select("hive_db", "table_name", "destination_path")
        .distinct()
        .collect()
    )
    affected = affected_tables_from_copy_status(audit).collect()
    for t in affected:
        db, tbl = t["hive_db"], t["table_name"]
        paths = [
            f["destination_path"]
            for f in files
            if f["hive_db"] == db and f["table_name"] == tbl
        ]
        if not paths:
            continue
        df = read_table(
            spark, paths[0] if len(paths) == 1 else os.path.dirname(paths[0]),
            fmt=fmt, delimiter=delimiter, schema_ddl=schema_ddl,
        ) if len(paths) == 1 else spark.read.format(fmt).load(paths)
        df.write.mode("append").parquet(os.path.join(warehouse, db, tbl))
        loaded[f"{db}.{tbl}"] = len(paths)
    return loaded
