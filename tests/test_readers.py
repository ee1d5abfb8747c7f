"""S1 permissive JSON ingest: malformed lines survive into
_corrupt_record instead of failing the batch (errors/ prefix py:198)."""

from __future__ import annotations

from pyspark.sql import types as T

from serverless_data_pipeline_spark.sources.readers import (
    CORRUPT_COL, read_csv_raw, read_json_raw, split_corrupt,
)

SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("name", T.StringType()),
])


def test_corrupt_lines_quarantined_not_fatal(spark, tmp_path):
    p = tmp_path / "in.json"
    p.write_text('{"id": 1, "name": "ok"}\n'
                 'not json at all\n'
                 '{"id": 2, "name": "fine"}\n')
    df = read_json_raw(spark, str(p), SCHEMA)
    assert CORRUPT_COL in df.columns
    good, bad = split_corrupt(df)
    assert sorted(r.id for r in good.collect()) == [1, 2]
    assert CORRUPT_COL not in good.columns
    assert bad.count() == 1
    assert bad.first()[CORRUPT_COL] == "not json at all"


def test_csv_corrupt_lines_quarantined(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("id,name\n"
                 "1,ok\n"
                 "not-a-long,broken\n"
                 "2,fine\n")
    df = read_csv_raw(spark, str(p), SCHEMA)
    good, bad = split_corrupt(df)
    assert sorted(r.id for r in good.collect()) == [1, 2]
    assert bad.count() == 1
    assert "not-a-long" in bad.first()[CORRUPT_COL]


def test_schema_on_read_no_inference(spark, tmp_path):
    p = tmp_path / "in.json"
    p.write_text('{"id": 7, "name": "x", "extra": true}\n')
    df = read_json_raw(spark, str(p), SCHEMA)
    # explicit schema wins: extra field dropped, declared types kept
    assert [f.name for f in df.schema.fields] == ["id", "name", CORRUPT_COL]
    assert df.first().id == 7
