"""EP1 end-to-end (SURVEY §5.2.4): partition layout, both sides of the
quality gate, invalid-batch routing, state-table audit trail."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from serverless_data_pipeline_spark.config import EngineConfig
from serverless_data_pipeline_spark.plans.control import PipelineControl
from serverless_data_pipeline_spark.plans.pipeline import run_pipeline
from serverless_data_pipeline_spark.plans.state import StateTable

TS = dt.datetime(2024, 6, 15, 9, 0, 0)
REQUIRED = {"id": T.LongType(), "ts": T.TimestampType()}


@pytest.fixture
def paths(tmp_path):
    return {k: str(tmp_path / k)
            for k in ("processed", "archive", "errors", "state")}


def _batch(spark, rows=None):
    rows = rows or [(1, TS, "OK"), (2, TS, "ALSO ok")]
    return spark.createDataFrame(rows, "id long, ts timestamp, note string")


def test_e2e_success_partition_layout(spark, paths):
    state = StateTable(spark, paths["state"])
    res = run_pipeline(_batch(spark), processed_path=paths["processed"],
                       archive_path=paths["archive"],
                       error_path=paths["errors"], state=state,
                       required=REQUIRED)
    assert res.status == "SUCCEEDED"
    assert res.counts == {"processed": 2, "invalid": 0}
    # Firehose-style hive layout (py:197)
    leaf = os.path.join(paths["processed"],
                        "year=2024", "month=6", "day=15", "hour=9")
    assert os.path.isdir(leaf)
    assert os.path.isdir(paths["archive"])
    # state audit trail covers every stage
    stages_seen = {r.stage for r in state.history(res.pipeline_id).collect()}
    assert {"ingest", "validate", "quality", "sink"} <= stages_seen
    # strings were cleaned by transform
    out = spark.read.parquet(paths["processed"])
    assert {r.note for r in out.collect()} == {"ok", "also ok"}


def test_e2e_quality_gate_fail_side(spark, paths):
    state = StateTable(spark, paths["state"])
    res = run_pipeline(
        _batch(spark), processed_path=paths["processed"],
        archive_path=paths["archive"], error_path=paths["errors"],
        state=state, required=REQUIRED,
        quality_rules=[F.col("id") > 99],          # 0% pass rate
        config=EngineConfig(quality_threshold=0.95))
    assert res.status == "FAILED"
    assert res.failure_reason == "Data quality score below threshold"
    assert not os.path.exists(paths["processed"])  # gate blocked the sink


def test_e2e_quality_gate_pass_side(spark, paths):
    state = StateTable(spark, paths["state"])
    res = run_pipeline(
        _batch(spark), processed_path=paths["processed"],
        archive_path=paths["archive"], error_path=paths["errors"],
        state=state, required=REQUIRED,
        quality_rules=[F.col("id") >= 1],          # 100% pass rate
        config=EngineConfig(quality_threshold=0.95))
    assert res.status == "SUCCEEDED"
    assert os.path.exists(paths["processed"])


def test_e2e_invalid_batch_routes_to_error(spark, paths):
    state = StateTable(spark, paths["state"])
    bad = spark.createDataFrame(
        [(None, TS, "x"), (None, TS, "y")], "id long, ts timestamp, note string")
    res = run_pipeline(bad, processed_path=paths["processed"],
                       archive_path=paths["archive"],
                       error_path=paths["errors"], state=state,
                       required=REQUIRED)
    assert res.status == "FAILED"
    assert res.failure_reason == "validation_failed"
    assert os.path.exists(paths["errors"])         # quarantined, not dropped
    quarantined = spark.read.json(paths["errors"])
    assert quarantined.count() == 2
    assert "_error_reason" in quarantined.columns


def test_e2e_partial_invalid_quarantines_rows(spark, paths):
    state = StateTable(spark, paths["state"])
    mixed = spark.createDataFrame(
        [(1, TS, "good"), (None, TS, "bad")], "id long, ts timestamp, note string")
    res = run_pipeline(mixed, processed_path=paths["processed"],
                       archive_path=paths["archive"],
                       error_path=paths["errors"], state=state,
                       required=REQUIRED)
    assert res.status == "SUCCEEDED"
    assert res.counts == {"processed": 1, "invalid": 1}


def test_sla_stage_timings_recorded(spark, paths):
    """Every state row carries stage/total wall-clock (the 2 h
    state-machine-timeout analogue, py:427) and totals are monotone in
    append order."""
    import json
    state = StateTable(spark, paths["state"])
    res = run_pipeline(_batch(spark), processed_path=paths["processed"],
                       archive_path=paths["archive"],
                       error_path=paths["errors"], state=state,
                       required=REQUIRED)
    assert res.status == "SUCCEEDED"
    rows = sorted(state.history(res.pipeline_id).collect(),
                  key=lambda r: r.timestamp)
    details = [json.loads(r.detail) for r in rows]
    for d in details:
        assert d["stage_elapsed_s"] >= 0.0
        assert d["total_elapsed_s"] >= 0.0
    totals = [d["total_elapsed_s"] for d in details]
    assert totals == sorted(totals)


def test_sla_budget_breach_fails_run(spark, paths):
    """A zero budget breaches at the first stage boundary: the run flips
    to FAILED with reason sla_budget_exceeded, a FAILED state row lands,
    and the processed sink is never written (abort-without-output)."""
    import json
    state = StateTable(spark, paths["state"])
    res = run_pipeline(_batch(spark), processed_path=paths["processed"],
                       archive_path=paths["archive"],
                       error_path=paths["errors"], state=state,
                       required=REQUIRED,
                       config=EngineConfig(sla_budget_s=0.0))
    assert res.status == "FAILED"
    assert res.failure_reason == "sla_budget_exceeded"
    assert not os.path.exists(paths["processed"])
    failed = [r for r in state.history(res.pipeline_id).collect()
              if r.status == "FAILED"]
    assert len(failed) == 1
    d = json.loads(failed[0].detail)
    assert d["reason"] == "sla_budget_exceeded"
    assert d["budget_s"] == 0.0


def test_state_table_compaction(spark, paths):
    import glob
    state = StateTable(spark, paths["state"])
    for i in range(5):
        state.append(f"p{i}", "stage", "RUNNING", {})
    files_before = len(glob.glob(paths["state"] + "/*.parquet"))
    n = state.compact()
    files_after = len(glob.glob(paths["state"] + "/*.parquet"))
    assert n == 5
    assert files_after < files_before
    assert state.history().count() == 5          # nothing lost


def test_control_plane_listing(spark, paths):
    state = StateTable(spark, paths["state"])
    res = run_pipeline(_batch(spark), processed_path=paths["processed"],
                       archive_path=paths["archive"],
                       error_path=paths["errors"], state=state,
                       required=REQUIRED)
    ctl = PipelineControl(state)
    current = ctl.list_pipelines()
    assert len(current) == 1 and current[0]["status"] == "SUCCEEDED"
    history = ctl.get_pipeline(res.pipeline_id)
    assert len(history) >= 4
    ctl.cancel_pipeline(res.pipeline_id)
    assert ctl.list_pipelines(status="CANCELLED")


def test_control_plane_start_and_update(spark, paths):
    state = StateTable(spark, paths["state"])
    ctl = PipelineControl(state)
    pid = ctl.start_pipeline(source="api", data_type="json",
                             priority="high", metadata={"batch_id": "b-1"})
    assert pid.startswith("pipeline-")
    listed = ctl.list_pipelines(status="SUBMITTED")
    assert [p["pipeline_id"] for p in listed] == [pid]
    ctl.update_pipeline(pid, priority="low")
    cur = {p["pipeline_id"]: p for p in ctl.list_pipelines()}
    assert cur[pid]["status"] == "UPDATED"
    hist = ctl.get_pipeline(pid)
    assert [h["status"] for h in hist] == ["SUBMITTED", "UPDATED"]
