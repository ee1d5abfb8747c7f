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
