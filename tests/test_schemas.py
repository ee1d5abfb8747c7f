"""Schema-on-read unit adaptivity + fixture-drift guard.

Round-3 postmortem: the driver regenerated events.parquet with
TIMESTAMP(MICROS) while ``load_table`` hard-applied the round-2 nanos shim
(read long, div 1000), silently collapsing 30 days of 2024 into ~43 minutes
of 1970 — and the pytest suite stayed green because every test used literal
fixtures. These tests close both gaps: the reader is pinned against one
file of EACH physical unit, and registry queries run against the real
``/root/testdata`` fixtures with a DuckDB oracle so fixture drift fails the
suite, not just the driver.
"""

from __future__ import annotations

import datetime
import importlib.util

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from serverless_data_pipeline_spark.schemas import (
    _parquet_timestamp_unit, load_table,
)

SF001 = "/root/testdata/sf0.001"

TS = [
    datetime.datetime(2024, 1, 1, 12, 0, 0),
    datetime.datetime(2024, 1, 15, 6, 30, 0),
    datetime.datetime(2024, 1, 30, 23, 59, 59),
]


def _write_events(dirpath, unit: str) -> str:
    tbl = pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "ts": pa.array(TS, pa.timestamp(unit)),
        "user_id": pa.array([10, 20, 30], pa.int64()),
        "event_type": pa.array(["a", "b", "c"], pa.string()),
        "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
        "props": pa.array(["{}", "{}", "{}"], pa.string()),
    })
    path = f"{dirpath}/events.parquet"
    # version 2.6 physically stores ns as TIMESTAMP(NANOS), us as MICROS.
    pq.write_table(tbl, path, version="2.6")
    return path


@pytest.mark.parametrize("unit", ["ns", "us", "ms"])
def test_load_table_adapts_to_physical_timestamp_unit(spark, tmp_path, unit):
    d = tmp_path / unit
    d.mkdir()
    path = _write_events(d, unit)
    assert _parquet_timestamp_unit(path, "ts") == unit
    got = [r.ts for r in
           load_table(spark, str(d), "events").orderBy("event_id").collect()]
    assert got == TS
    # The full registered schema (not just ts) must survive both paths.
    assert load_table(spark, str(d), "events").schema["ts"].simpleString() \
        == "ts:timestamp"


def test_footer_probe_handles_missing_and_nontimestamp(tmp_path):
    p = tmp_path / "t.parquet"
    pq.write_table(pa.table({"x": pa.array([1], pa.int64())}), p)
    assert _parquet_timestamp_unit(str(p), "ts") is None
    assert _parquet_timestamp_unit(str(p), "x") is None
    assert _parquet_timestamp_unit(str(tmp_path / "absent.parquet"), "ts") is None


def test_fixture_events_timestamps_not_collapsed(spark):
    """Drift guard: whatever unit the driver regenerates the fixture with,
    load_table must agree with a plain inference read (and never 1970)."""
    ev = load_table(spark, SF001, "events")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    assert lo.year >= 2000, f"events ts collapsed: min={lo}"
    if _parquet_timestamp_unit(f"{SF001}/events.parquet", "ts") != "ns":
        plain = spark.read.parquet(f"{SF001}/events.parquet") \
            .agg(F.min("ts"), F.max("ts")).first()
        assert (lo, hi) == (plain[0], plain[1])


@pytest.fixture(scope="module")
def oracle_gate():
    """The driver-identical comparator from scripts/check_oracles.py plus a
    DuckDB connection with the sf0.001 fixture views registered."""
    import duckdb

    spec = importlib.util.spec_from_file_location(
        "check_oracles", "/root/repo/scripts/check_oracles.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    con = duckdb.connect()
    for t in mod.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF001}/{t}.parquet')")
    yield mod, con
    con.close()


@pytest.mark.parametrize("name", [
    "f_datetime_json",     # events scalar datetime path — the r3 casualty
    "st3_window_agg",      # events windowed agg — row counts explode on drift
    "t_etl_suite",         # events ETL stage chain
    "g1_groupby_agg",      # lineitem flagship — guards the relational side
])
def test_registry_query_matches_oracle_on_fixtures(spark, oracle_gate, name):
    mod, con = oracle_gate
    import __spark_entry__ as entry_mod

    sdf = entry_mod.queries()[name](spark, SF001).toPandas()
    odf = con.execute(entry_mod.oracle_sql()[name]).df()
    verdict = mod.compare(name, sdf, odf)
    assert verdict == "OK", f"{name}: {verdict}"


def test_stream_staging_rekeys_on_fixture_change(tmp_path):
    """The staged stream dir must change when the source file's
    mtime/size changes — a regenerated fixture may never serve stale
    data (r3 VERDICT item: staging was keyed by path alone)."""
    import os
    import time

    from __spark_entry__ import _stage_events_stream_dir

    src = tmp_path / "events.parquet"
    _write_events(tmp_path, "us")
    d1, unit1 = _stage_events_stream_dir(str(src))
    assert unit1 == "us"
    assert os.path.exists(os.path.join(d1, "events.parquet"))
    # same source, unchanged -> same staging dir (idempotent)
    d1b, _ = _stage_events_stream_dir(str(src))
    assert d1b == d1
    # touch the file into the future (regeneration) -> new staging dir
    st = os.stat(src)
    os.utime(src, (st.st_atime, st.st_mtime + 10))
    d2, _ = _stage_events_stream_dir(str(src))
    assert d2 != d1
    assert os.path.exists(os.path.join(d2, "events.parquet"))
