"""S9 scheduled trigger: fixed-rate ticks, overrun-skip semantics
(py:658-666 — hourly EventBridge rate rule). Pure logic, no Spark."""

from __future__ import annotations

from serverless_data_pipeline_spark.plans.scheduler import ScheduledTrigger


class _Clock:
    def __init__(self) -> None:
        self.t = 0.0

    def __call__(self) -> float:
        return self.t

    def sleep(self, d: float) -> None:
        self.t += d


def _trigger(clock: _Clock, work_duration: float | list[float],
             interval: float = 10.0) -> ScheduledTrigger:
    durations = ([work_duration] * 100 if isinstance(work_duration, float)
                 else list(work_duration))

    def work() -> None:
        clock.t += durations.pop(0)

    return ScheduledTrigger(run_once=work, interval_s=interval,
                            clock=clock, sleep=clock.sleep)


def test_fixed_rate_ticks_not_fixed_delay():
    # 2s of work per run must NOT push later runs later: starts stay on
    # the 0/10/20 grid, not 0/12/24.
    clock = _Clock()
    runs = _trigger(clock, 2.0).run(max_runs=3)
    assert runs == [0.0, 10.0, 20.0]


def test_overrun_skips_missed_ticks():
    # A 25s run over a 10s interval skips ticks 10 and 20 entirely
    # (EventBridge semantics: no stacked catch-up backlog).
    clock = _Clock()
    runs = _trigger(clock, [25.0, 1.0, 1.0]).run(max_runs=3)
    assert runs == [0.0, 30.0, 40.0]


def test_no_sleep_after_final_run():
    clock = _Clock()
    _trigger(clock, 1.0).run(max_runs=2)
    # final run started at t=10, took 1s; no trailing sleep to t=20
    assert clock.t == 11.0


# ---------------------------------------------------------------- S9 native


def test_scheduled_batch_query_incremental_across_restarts(spark, tmp_path):
    """The streaming-trigger schedule hands each tick ONLY files landed
    since the last processed tick, surviving a query restart (the
    checkpoint, not the driver loop, owns progress)."""
    import json

    from pyspark.sql import types as T

    from serverless_data_pipeline_spark.plans.scheduler import (
        scheduled_batch_query,
    )

    raw = tmp_path / "raw"
    raw.mkdir()
    schema = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("v", T.StringType())])
    seen: list[list[int]] = []

    def land(ids):
        p = raw / f"batch_{ids[0]}.json"
        p.write_text("\n".join(json.dumps({"id": i, "v": f"r{i}"})
                               for i in ids))

    def run_batch(df, tick):
        ids = [r["id"] for r in df.select("id").collect()]
        if ids:
            seen.append(sorted(ids))

    ckpt = str(tmp_path / "ckpt")
    land([0, 1, 2])
    q = scheduled_batch_query(spark, str(raw), schema, run_batch, ckpt,
                              available_now=True)
    q.awaitTermination(120)
    assert seen == [[0, 1, 2]]

    # New files only on the next scheduled drain — and a restart does not
    # re-deliver the already-processed tick.
    land([3, 4])
    q = scheduled_batch_query(spark, str(raw), schema, run_batch, ckpt,
                              available_now=True)
    q.awaitTermination(120)
    assert seen == [[0, 1, 2], [3, 4]]


def test_scheduled_batch_query_bounds_tick_input(spark, tmp_path):
    """maxFilesPerTrigger caps a backlogged landing zone: 4 files drain as
    multiple bounded ticks, never one giant catch-up batch."""
    import json

    from pyspark.sql import types as T

    from serverless_data_pipeline_spark.plans.scheduler import (
        scheduled_batch_query,
    )

    raw = tmp_path / "raw"
    raw.mkdir()
    schema = T.StructType([T.StructField("id", T.LongType())])
    for i in range(4):
        (raw / f"f{i}.json").write_text(json.dumps({"id": i}))
    sizes: list[int] = []

    q = scheduled_batch_query(
        spark, str(raw), schema,
        lambda df, tick: sizes.append(df.count()),
        str(tmp_path / "ckpt"), available_now=True, max_files_per_tick=2)
    q.awaitTermination(120)
    assert sum(sizes) == 4
    assert max(sizes) <= 2 and len(sizes) >= 2


def test_scheduled_batch_query_fires_on_interval_grid(spark, tmp_path):
    """processingTime mode: ticks keep firing on the wall-clock grid and
    pick up files landed between ticks (the EventBridge rate-rule shape)."""
    import json
    import time as _time

    from pyspark.sql import types as T

    from serverless_data_pipeline_spark.plans.scheduler import (
        scheduled_batch_query,
    )

    raw = tmp_path / "raw"
    raw.mkdir()
    schema = T.StructType([T.StructField("id", T.LongType())])
    got: list[int] = []

    (raw / "a.json").write_text(json.dumps({"id": 1}))
    q = scheduled_batch_query(
        spark, str(raw), schema,
        lambda df, tick: got.extend(r["id"] for r in df.collect()),
        str(tmp_path / "ckpt"), interval_s=1)
    try:
        deadline = _time.time() + 60
        while 1 not in got and _time.time() < deadline:
            _time.sleep(0.2)
        (raw / "b.json").write_text(json.dumps({"id": 2}))
        while 2 not in got and _time.time() < deadline:
            _time.sleep(0.2)
    finally:
        q.stop()
    assert sorted(got) == [1, 2]
