"""End-to-end pipeline lifecycle (SURVEY §3.1/§3.3): config file drop →
streaming watcher → controller branch → bulk load → column validation →
audit rows → run report — the reference's event chain collapsed into
one Spark driver, every boundary exercised for real."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from data_migration_tool_spark.audit.log import AuditLog
from data_migration_tool_spark.audit.queries import (
    dvt_passed_tables,
    validation_run_summary,
)
from data_migration_tool_spark.operators.validation import (
    ValidationSpec,
    column_validation,
)
from data_migration_tool_spark.orchestrate import Controller, TaskResult
from data_migration_tool_spark.orchestrate import controller as C
from data_migration_tool_spark.sources.bulk_load import TableLoadSpec, bulk_load
from data_migration_tool_spark.streaming.file_stream import watch_config_dir

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def env(spark, tmp_path):
    return {
        "landing": tmp_path / "landing",
        "ckpt": tmp_path / "ckpt",
        "warehouse": str(tmp_path / "warehouse"),
        "audit": AuditLog(spark, str(tmp_path / "dmt_logs")),
    }


def _data_load_pipeline(spark, env):
    """The data_load_hive pipeline: load each table, validate each loaded
    table against its source, one TaskResult per step (UD2 dynamic-task
    isolation semantics)."""

    def pipeline(config: dict) -> list[TaskResult]:
        results: list[TaskResult] = []
        specs = [
            TableLoadSpec(
                database=config["dataset"],
                table=t,
                source_path=f"{SF_DIR}/{t}.parquet",
            )
            for t in config["tables"]
        ]
        statuses = bulk_load(spark, specs, env["warehouse"], env["audit"])
        for key, status in statuses.items():
            results.append(
                TaskResult(f"load:{key}", status in ("PASS", "SKIP"), dynamic=True)
            )
        for t in config["tables"]:
            src = spark.read.parquet(f"{SF_DIR}/{t}.parquet")
            tgt = spark.read.parquet(f"{env['warehouse']}/{config['dataset']}/{t}")
            spec = ValidationSpec(
                validation_type="column",
                source_table=t,
                target_table=f"{config['dataset']}.{t}",
                count_cols=["*"],
            )
            res = column_validation(src, tgt, spec).withColumn(
                "run_id", F.lit(config["unique_id"])
            )
            env["audit"].insert_df(
                "dmt_dvt_results",
                res.select(
                    "run_id",
                    F.lit(f"count:{t}").alias("validation_name"),
                    "validation_type",
                    F.current_timestamp().alias("start_time"),
                    F.col("source_table_name"),
                    "target_table_name",
                    "source_column_name",
                    "aggregation_type",
                    "group_by_columns",
                    "source_agg_value",
                    "target_agg_value",
                    "difference",
                    "pct_difference",
                    "pct_threshold",
                    "validation_status",
                    F.lit(None)
                    .cast("array<struct<key:string,value:string>>")
                    .alias("labels"),
                    F.lit(None).cast("string").alias("configuration_json"),
                ),
            )
            n_fail = res.filter(F.col("validation_status") == "fail").count()
            results.append(TaskResult(f"validate:{t}", n_fail == 0, dynamic=True))
        return results

    return pipeline


def test_config_drop_to_report(spark, env):
    env["landing"].mkdir()
    ctl = Controller(env["audit"])
    ctl.register(C.DATA_LOAD_HIVE, _data_load_pipeline(spark, env))
    statuses: list[str | None] = []

    def dispatch(batch_df, batch_id):
        for r in batch_df.collect():
            cfg = json.loads(r["value"])
            statuses.append(ctl.handle("OBJECT_FINALIZE", cfg))

    config = {
        "type": "data",
        "source": "hive",
        "unique_id": "e2e-1",
        "dataset": "tpch",
        "tables": ["region", "nation"],
    }
    (env["landing"] / "cfg.json").write_text(json.dumps(config))
    q = watch_config_dir(
        spark, str(env["landing"]), str(env["ckpt"]), dispatch, available_now=True
    )
    assert q.awaitTermination(120)

    assert statuses == ["Success"]
    # warehouse holds the loaded tables, row-for-row
    for t in ("region", "nation"):
        src_n = spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()
        assert spark.read.parquet(f"{env['warehouse']}/tpch/{t}").count() == src_n
    # audit trail: loads PASS, validations success, report Success
    loads = env["audit"].table("hive_bqload_audit").collect()
    assert {r.load_status for r in loads} == {"PASS"}
    summary = validation_run_summary(env["audit"]).collect()
    assert all(r.table_status == "PASS" for r in summary)
    passed = dvt_passed_tables(env["audit"]).collect()
    assert {r.source_table_name for r in passed} == {"region", "nation"}
    report = env["audit"].table("dmt_report_table").first()
    assert report.dag_status == "Success" and report.unique_id == "e2e-1"

    # second drop of the same config → rerun protocol SKIPs the loads
    # (exactly-once files + idempotent tables), report still Success
    (env["landing"] / "cfg2.json").write_text(json.dumps(config))
    q2 = watch_config_dir(
        spark, str(env["landing"]), str(env["ckpt"]), dispatch, available_now=True
    )
    assert q2.awaitTermination(120)
    assert statuses == ["Success", "Success"]
    loads2 = env["audit"].table("hive_bqload_audit").collect()
    assert len(loads2) == 2  # no new load rows — both tables were SKIP


def test_translation_config_drop_ddl_then_dml(spark, env, tmp_path):
    """SURVEY §3.1 steps 5-6 as one in-process chain: a type=ddl config
    over the reference's TPC-H Teradata corpus creates real Spark tables;
    a type=dml config then translates + dry-runs the DML samples against
    them, with translationErrorFilterRules turning known-ignorable
    errors into a Success run."""
    import shutil

    from data_migration_tool_spark.orchestrate.pipelines import (
        sql_translation_pipeline,
    )

    ctl = Controller(env["audit"])
    ctl.register(C.BATCH_TRANSLATE, sql_translation_pipeline(spark, env["audit"]))

    # ---- DDL phase: reference corpus → transpile → execute
    ddl_in, ddl_out = tmp_path / "ddl_in", tmp_path / "ddl_out"
    ddl_in.mkdir(), ddl_out.mkdir()
    corpus = "/root/reference/src/tests/end_to_end/input/ddl/teradata"
    for f in ("region.sql", "nation.sql", "supplier.sql", "lineitem.sql"):
        shutil.copy(f"{corpus}/{f}", ddl_in / f)
    status = ctl.handle(
        "OBJECT_FINALIZE",
        {
            "type": "ddl",
            "source": "teradata",
            "unique_id": "xlate-ddl-1",
            "nameMappingList": {
                "name_map": [
                    {"source": {"schema": "tpch"}, "target": {"schema": "td_mig"}}
                ]
            },
            "migrationTask": {
                "translationConfigDetails": {
                    "sourcePath": str(ddl_in),
                    "targetPath": str(ddl_out),
                }
            },
        },
    )
    assert status == "Success"
    for t in ("region", "nation", "supplier", "lineitem"):
        assert spark.catalog.tableExists(f"td_mig.{t}")
        assert (ddl_out / f"{t}.sql").read_text().startswith("CREATE TABLE")
    assert len(spark.table("td_mig.lineitem").schema) == 16
    agg = env["audit"].table("dmt_translation_aggregated_results").first()
    assert (agg.total_files, agg.successful_files, agg.failed_files) == (4, 4, 0)

    # ---- DML phase: employee tables + reference DML samples + one bad file
    spark.sql("CREATE DATABASE IF NOT EXISTS dmt_tgt")
    for tbl in ("employee1", "employee2"):
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS dmt_tgt.{tbl} (emp_no int, emp_name string,"
            " job_title string, manager_id int, salary double, commission double,"
            " dept_no int) USING parquet"
        )
    dml_in, dml_out = tmp_path / "dml_in", tmp_path / "dml_out"
    dml_in.mkdir(), dml_out.mkdir()
    for f in ("DML_Use_Case_1.sql", "DML_Use_Case_4.sql", "DML_Use_Case_5.sql"):
        shutil.copy(f"/root/reference/samples/dml/teradata/{f}", dml_in / f)
    (dml_in / "bad.sql").write_text("SELECT * FROM missing_db.missing_tbl;\n")
    dml_config = {
        "type": "dml",
        "source": "teradata",
        "unique_id": "xlate-dml-1",
        "nameMappingList": {"DMT_DATASET": "dmt_tgt"},
        "migrationTask": {
            "translationConfigDetails": {
                "sourcePath": str(dml_in),
                "targetPath": str(dml_out),
            }
        },
    }
    # bad.sql fails its dry run; failures are dynamic tasks → Partial Success
    assert ctl.handle("OBJECT_FINALIZE", dml_config) == "Partial Success"
    rows = {
        r.input_file_name: r.status
        for r in env["audit"].table("dmt_translation_results").collect()
        if r.unique_id == "xlate-dml-1"
    }
    assert rows["bad.sql"] == "fail"
    assert rows["DML_Use_Case_4.sql"] == "success"
    assert "dmt_tgt.EMPLOYEE1" in (dml_out / "DML_Use_Case_4.sql").read_text()

    # ---- rerun with a filter rule marking dry-run errors ignorable (P7)
    dml_config["unique_id"] = "xlate-dml-2"
    dml_config["translationErrorFilterRules"] = [
        {"field": "category", "value": "dryrun", "matchType": "contains"}
    ]
    assert ctl.handle("OBJECT_FINALIZE", dml_config) == "Success"
