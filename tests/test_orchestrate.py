"""Orchestration layer: config validation, controller branch table,
batch maker, run reporting (SURVEY §2.10-2.11, §3.1; reference
controller_dag.py:182-241, reporting_operator.py:54-164,
parallelization_utils.py:1-7, input_validation_utils.py:76-135)."""

from __future__ import annotations

import pytest

from data_migration_tool_spark.audit.log import AuditLog
from data_migration_tool_spark.orchestrate import (
    ConfigError,
    Controller,
    TaskResult,
    build_run_report,
    determine_pipeline,
    normalize_and_validate_config,
    run_batches,
    save_run_report,
)
from data_migration_tool_spark.orchestrate import controller as C
from data_migration_tool_spark.orchestrate.controller import decode_event_payload
from data_migration_tool_spark.orchestrate.reporting import classify


# ---------------------------------------------------------------- config

def test_config_normalization(tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    (src / "a.sql").write_text("SELECT 1")
    out = tmp_path / "out"
    out.mkdir()
    cfg = {
        "type": "DDL",
        "source": "Teradata",
        "migrationTask": {
            "translationConfigDetails": {
                "sourcePath": f"{src}/",
                "targetPath": f"{out}/",
            }
        },
    }
    cfg = normalize_and_validate_config(cfg)
    assert cfg["type"] == "ddl"
    assert cfg["source"] == "teradata"
    details = cfg["migrationTask"]["translationConfigDetails"]
    assert not details["sourcePath"].endswith("/")


def test_config_missing_type():
    with pytest.raises(ConfigError, match="type"):
        normalize_and_validate_config({"source": "hive"})


def test_config_empty_input_dir(tmp_path):
    src = tmp_path / "empty"
    src.mkdir()
    cfg = {
        "type": "sql",
        "source": "oracle",
        "migrationTask": {
            "translationConfigDetails": {"sourcePath": str(src), "targetPath": str(tmp_path)}
        },
    }
    with pytest.raises(ConfigError, match="No translation input files"):
        normalize_and_validate_config(cfg)


def test_config_validation_params_missing(tmp_path):
    cfg = {
        "type": "data",
        "source": "hive",
        "validation_config": {"validation_params_file_path": str(tmp_path / "nope.csv")},
    }
    with pytest.raises(ConfigError, match="parameters file not found"):
        normalize_and_validate_config(cfg)


def test_config_secret_resolution(tmp_path, monkeypatch):
    params = tmp_path / "p.csv"
    params.write_text("x")
    cfg = {
        "type": "data",
        "source": "teradata",
        "validation_config": {
            "validation_params_file_path": str(params),
            "source_config": {"password": "secret:DMT_TEST_PW"},
        },
    }
    with pytest.raises(ConfigError, match="Secret not resolvable"):
        normalize_and_validate_config(dict(cfg))
    monkeypatch.setenv("DMT_TEST_PW", "hunter2")
    assert normalize_and_validate_config(dict(cfg))["type"] == "data"


# ------------------------------------------------------------- batching

def test_run_batches():
    out = list(run_batches(list("abcdefg"), 3, "load"))
    assert [rid for rid, _ in out] == ["load-0", "load-1", "load-2"]
    assert [b for _, b in out] == [["a", "b", "c"], ["d", "e", "f"], ["g"]]
    assert list(run_batches([], 3)) == []
    with pytest.raises(ValueError):
        list(run_batches([1], 0))


# ------------------------------------------------------------ controller

@pytest.mark.parametrize(
    ("event", "config", "expected"),
    [
        ("OBJECT_FINALIZE", {"type": "ddl", "source": "teradata"}, C.BATCH_TRANSLATE),
        (
            "OBJECT_FINALIZE",
            {"type": "ddl", "source": "teradata", "extract_ddl": "yes"},
            C.EXTRACT_DDL,
        ),
        (
            "OBJECT_FINALIZE",
            {"type": "sql", "source": "oracle", "extract_ddl": "yes"},
            C.BATCH_TRANSLATE,  # extract_ddl ignored for sql/dml
        ),
        (
            "OBJECT_FINALIZE",
            {"type": "dml", "source": "redshift", "validation_only": "yes"},
            C.VALIDATION,
        ),
        ("OBJECT_FINALIZE", {"type": "ddl", "source": "hive"}, C.EXTRACT_DDL),
        ("OBJECT_FINALIZE", {"type": "data", "source": "teradata"}, C.DATA_LOAD_TERADATA),
        ("OBJECT_FINALIZE", {"type": "data", "source": "hive"}, C.DATA_LOAD_HIVE),
        ("OBJECT_FINALIZE", {"type": "data", "source": "hive_inc"}, C.DATA_LOAD_HIVE_INC),
        ("OBJECT_FINALIZE", {"type": "data", "source": "redshift"}, C.DATA_LOAD_REDSHIFT),
        (
            "OBJECT_FINALIZE",
            {"type": "data", "source": "hive", "validation_only": "yes"},
            C.VALIDATION,
        ),
        ("OBJECT_FINALIZE", {"type": "ddl", "source": "mysql"}, None),
        ("TRANSFER_RUN_FINISHED", {"dataSourceId": "on_premises"}, C.TRANSFER_LOG_TERADATA),
        ("TRANSFER_RUN_FINISHED", {"dataSourceId": "redshift"}, C.TRANSFER_LOG_REDSHIFT),
        ("OBJECT_DELETE", {"type": "ddl", "source": "hive"}, None),
    ],
)
def test_determine_pipeline(event, config, expected):
    assert determine_pipeline(event, config) == expected


def test_decode_event_payload():
    import base64
    import json

    payload = base64.b64encode(json.dumps({"type": "data"}).encode()).decode()
    assert decode_event_payload(payload) == {"type": "data"}


def test_controller_handle_runs_pipeline_and_reports(spark, tmp_path):
    audit = AuditLog(spark, str(tmp_path / "logs"))
    ctl = Controller(audit)
    seen = []

    def pipeline(cfg):
        seen.append(cfg["unique_id"])
        return [TaskResult("load_t1", True)]

    ctl.register(C.DATA_LOAD_HIVE, pipeline)
    status = ctl.handle(
        "OBJECT_FINALIZE", {"type": "data", "source": "hive", "unique_id": "u1"}
    )
    assert status == "Success"
    assert seen == ["u1"]
    reports = audit.table("dmt_report_table").collect()
    assert len(reports) == 1 and reports[0].dag_status == "Success"


def test_controller_handle_pipeline_error_becomes_failed_report(spark, tmp_path):
    audit = AuditLog(spark, str(tmp_path / "logs"))
    ctl = Controller(audit)
    ctl.register(C.DATA_LOAD_REDSHIFT, lambda cfg: 1 / 0 and [])
    status = ctl.handle(
        "OBJECT_FINALIZE", {"type": "data", "source": "redshift", "unique_id": "u2"}
    )
    assert status == "Failed"
    row = audit.table("dmt_report_table").first()
    assert row.Error[0].task_name == C.DATA_LOAD_REDSHIFT


def test_controller_unsupported_returns_none(spark, tmp_path):
    ctl = Controller(AuditLog(spark, str(tmp_path / "logs")))
    assert ctl.handle("OBJECT_FINALIZE", {"type": "data", "source": "mongodb"}) is None


# ------------------------------------------------------------- reporting

def test_classify_statuses():
    ok = TaskResult("a", True)
    hard_fail = TaskResult("b", False, "boom")
    mapped_fail = TaskResult("c", False, "boom", dynamic=True)
    upstream = TaskResult("d", False, upstream_failed=True)
    assert classify([ok]) == "Success"
    assert classify([ok, mapped_fail]) == "Partial Success"
    assert classify([ok, hard_fail]) == "Failed"
    assert classify([ok, mapped_fail, upstream]) == "Failed"


def test_run_report_roundtrip(spark, tmp_path):
    audit = AuditLog(spark, str(tmp_path / "logs"))
    report = build_run_report(
        {"unique_id": "u3", "source": "hive"},
        "data_load_hive",
        [TaskResult("t1", True), TaskResult("t2", False, "bad row", dynamic=True)],
    )
    assert report["dag_status"] == "Partial Success"
    save_run_report(audit, report)
    row = audit.table("dmt_report_table").first()
    assert row.unique_id == "u3"
    assert row.Error[0].error_message == "bad row"


def test_save_failed_report_raises(spark, tmp_path):
    audit = AuditLog(spark, str(tmp_path / "logs"))
    report = build_run_report(
        {"unique_id": "u4", "source": "hive"}, "d", [TaskResult("t", False, "x")]
    )
    with pytest.raises(RuntimeError, match="failed"):
        save_run_report(audit, report)
    assert audit.table("dmt_report_table").count() == 1  # persisted before raise


def test_reference_sample_configs_parse_and_rules_compile():
    """Every sample config shipped by the reference
    (samples/configs/{teradata,oracle,redshift,hive}) must flow through
    config normalization without crashing: either it validates, or it
    fails with a ConfigError naming a missing PATH (the expected
    local-env outcome for gs:// placeholders) — never a KeyError or
    TypeError. Its translationErrorFilterRules must compile into a
    report predicate."""
    import glob
    import json

    from data_migration_tool_spark.orchestrate.config import (
        ConfigError,
        normalize_and_validate_config,
    )
    from data_migration_tool_spark.translate.report import rules_predicate

    files = sorted(
        glob.glob("/root/reference/samples/configs/*/*.json")
    )
    assert len(files) >= 10
    n_rules = 0
    for path in files:
        cfg = json.load(open(path))
        try:
            out = normalize_and_validate_config(cfg)
            assert out["type"] in ("ddl", "sql", "dml", "data")
        except ConfigError as e:
            # template placeholders ("<ddl/sql>", gs:// paths) must be
            # rejected by a NAMED validation rule, not crash
            msg = str(e)
            assert any(
                s in msg
                for s in (
                    "path",
                    "Path",
                    "not found",
                    "input files",
                    "unsupported operation type",
                )
            ), f"{path}: unexpected validation error: {msg}"
        rules = cfg.get("translationErrorFilterRules")
        if rules:
            pred = rules_predicate(rules)
            assert pred is not None
            n_rules += 1
    assert n_rules >= 2
