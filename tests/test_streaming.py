"""ST* streaming operators: file-source drip -> windowed aggs equal the
batch plan; quarantine split; stateful per-key totals (SURVEY §5.2.5)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from serverless_data_pipeline_spark.sources.readers import read_stream_files
from serverless_data_pipeline_spark.streaming.sinks import (
    start_quarantining_stream,
)
from serverless_data_pipeline_spark.streaming.stateful import (
    running_user_totals,
)
from serverless_data_pipeline_spark.streaming.windows import (
    session_agg, stream_stream_join, tumbling_agg,
)

SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
])


def _write_drips(spark, path):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [(i, base + dt.timedelta(minutes=17 * i), i % 3,
             "click" if i % 2 else "view", float(i))
            for i in range(40)]
    df = spark.createDataFrame(rows, SCHEMA)
    # several files -> several micro-batches with maxFilesPerTrigger
    df.repartition(4).write.mode("overwrite").parquet(path)
    return spark.read.schema(SCHEMA).parquet(path)


def test_streaming_tumbling_equals_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    batch_df = _write_drips(spark, src)
    stream = read_stream_files(spark, src, SCHEMA, max_files_per_trigger=1)
    agg = tumbling_agg(stream, width="1 hour", watermark="2 hours")
    q = (agg.writeStream.format("memory").queryName("tumbled")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM tumbled").collect()
    expect = tumbling_agg(batch_df, width="1 hour").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, expect))


def test_streaming_session_equals_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    batch_df = _write_drips(spark, src)
    stream = read_stream_files(spark, src, SCHEMA, max_files_per_trigger=2)
    agg = session_agg(stream, gap="30 minutes", watermark="2 hours")
    q = (agg.writeStream.format("memory").queryName("sessions")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM sessions").collect()
    expect = session_agg(batch_df, gap="30 minutes").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, expect))


def test_streaming_watermark_withholds_open_windows(spark, tmp_path):
    """ST4: in append mode only windows CLOSED by the final watermark
    (end <= max_ts - delay) are emitted; later windows are withheld."""
    src = str(tmp_path / "src")
    batch_df = _write_drips(spark, src)   # spans ~11 hours of event time
    # one batch for all files: with per-file batches the processing ORDER
    # decides which rows are already late (watermark races) — valid
    # semantics, but nondeterministic for a test
    stream = read_stream_files(spark, src, SCHEMA, max_files_per_trigger=50)
    agg = tumbling_agg(stream, width="1 hour", keys=(), watermark="2 hours")
    q = (agg.writeStream.format("memory").queryName("appended")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    emitted = {r.window_start for r in spark.sql("SELECT * FROM appended").collect()}
    all_windows = {r.window_start
                   for r in tumbling_agg(batch_df, width="1 hour", keys=()).collect()}
    import datetime as _dt
    max_ts = batch_df.agg(F.max("ts")).first()[0]
    closed = {w for w in all_windows
              if w + _dt.timedelta(hours=1) <= max_ts - _dt.timedelta(hours=2)}
    assert emitted == closed
    assert emitted and emitted != all_windows   # some windows withheld


def test_stream_stream_join_equals_batch(spark, tmp_path):
    """Two file streams joined on user_id with an event-time range bound
    must produce exactly the batch join of the same frames (the
    main-ingest x analytics two-stream shape, py:161-174)."""
    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    lbatch = _write_drips(spark, lsrc)
    base = dt.datetime(2024, 1, 1, 0, 10, 0)  # right trails left by 10 min
    rrows = [(100 + i, base + dt.timedelta(minutes=17 * i), i % 3,
              "score", float(i) / 2) for i in range(40)]
    rbatch = spark.createDataFrame(rrows, SCHEMA)
    rbatch.repartition(4).write.mode("overwrite").parquet(rsrc)
    rbatch = spark.read.schema(SCHEMA).parquet(rsrc)

    lstream = read_stream_files(spark, lsrc, SCHEMA, max_files_per_trigger=1)
    rstream = read_stream_files(spark, rsrc, SCHEMA, max_files_per_trigger=1)
    # Files arrive in arbitrary order, so event time regresses between
    # micro-batches; the watermark must exceed the full data span (11 h)
    # or genuinely-late rows are (correctly) evicted and stream < batch.
    joined = stream_stream_join(lstream, rstream, key="user_id",
                                watermark="1 day", max_delay="30 minutes")
    q = (joined.selectExpr("l_event_id", "r_event_id")
         .writeStream.format("memory").queryName("ssjoin")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.l_event_id, r.r_event_id)
           for r in spark.sql("SELECT * FROM ssjoin").collect()}
    expect = {(r.l_event_id, r.r_event_id)
              for r in stream_stream_join(lbatch, rbatch, key="user_id")
              .select("l_event_id", "r_event_id").collect()}
    assert got == expect and len(got) > 0


def test_streaming_quarantine_split(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_drips(spark, src)
    stream = read_stream_files(spark, src, SCHEMA, max_files_per_trigger=2)
    q = start_quarantining_stream(
        stream, good_path=str(tmp_path / "good"),
        error_path=str(tmp_path / "err"),
        checkpoint=str(tmp_path / "ckpt"),
        validity=F.col("value") >= 5.0)
    q.awaitTermination(120)
    good = spark.read.parquet(str(tmp_path / "good"))
    bad = spark.read.json(str(tmp_path / "err"))
    assert good.count() == 35 and bad.count() == 5
    assert {"year", "month", "day", "hour"} <= set(good.columns)
    assert bad.filter("_error_reason = 'stream_validation_failed'").count() == 5


def test_stream_resume_is_exactly_once(spark, tmp_path):
    """Restarting a checkpointed file-sink query must be exactly-once:
    a re-run with no new input appends nothing; new files are consumed
    once (the replayed-delivery idempotence the reference leaves to SQS
    dedup + Firehose, py:133-137, handled natively by Spark's
    checkpoint + file-sink commit log)."""
    src, sink, ckpt = (str(tmp_path / p) for p in ("src", "sink", "ckpt"))
    _write_drips(spark, src)

    def run_once():
        stream = read_stream_files(spark, src, SCHEMA,
                                   max_files_per_trigger=2)
        q = (stream.writeStream.format("parquet")
             .option("path", sink).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run_once()
    assert spark.read.parquet(sink).count() == 40
    run_once()                                   # no new input: no-op
    assert spark.read.parquet(sink).count() == 40
    base = dt.datetime(2024, 2, 1)
    extra = spark.createDataFrame(
        [(100 + i, base + dt.timedelta(minutes=i), 0, "late", 1.0)
         for i in range(5)], SCHEMA)
    extra.coalesce(1).write.mode("append").parquet(src)
    run_once()                                   # new file consumed once
    run_once()                                   # and only once
    assert spark.read.parquet(sink).count() == 45


def test_stream_sink_failure_routes_to_dlq(spark, tmp_path):
    """S7: a batch whose sink write keeps failing lands in the DLQ path
    after max_retries instead of crashing the query (py:122-137)."""
    src = str(tmp_path / "src")
    _write_drips(spark, src)
    stream = read_stream_files(spark, src, SCHEMA, max_files_per_trigger=50)
    good_path = tmp_path / "good"
    good_path.write_text("not a directory")       # parquet write must fail
    q = start_quarantining_stream(
        stream, good_path=str(good_path),
        error_path=str(tmp_path / "err"),
        checkpoint=str(tmp_path / "ckpt"),
        validity=F.lit(True), max_retries=2)
    q.awaitTermination(120)
    dlq = spark.read.json(str(tmp_path / "err") + "_dlq")
    assert dlq.count() == 40                      # whole batch preserved
    assert dlq.filter(
        "_error_reason LIKE 'sink_failed_after_2_retries%'").count() == 40


def test_ep3_streaming_pipeline(spark, tmp_path):
    """EP3 composed: readStream -> watermark -> T6 -> quarantined
    partitioned sink, as one query."""
    from serverless_data_pipeline_spark.plans.streaming_pipeline import (
        run_streaming_pipeline,
    )
    src = str(tmp_path / "src")
    _write_drips(spark, src)
    stream = read_stream_files(spark, src, SCHEMA, max_files_per_trigger=2)
    q = run_streaming_pipeline(
        stream, processed_path=str(tmp_path / "good"),
        error_path=str(tmp_path / "err"),
        checkpoint=str(tmp_path / "ckpt"),
        validity=F.col("value") >= 2.0,
        trigger={"availableNow": True})
    q.awaitTermination(120)
    good = spark.read.parquet(str(tmp_path / "good"))
    assert good.count() == 38                      # 2 rows quarantined
    assert "processed_ts" in good.columns          # T6 applied in-stream
    assert "event_hour" in good.columns
    assert {"year", "month", "day", "hour"} <= set(good.columns)
    assert spark.read.json(str(tmp_path / "err")).count() == 2


def test_stateful_running_totals(spark, tmp_path):
    src = str(tmp_path / "src")
    batch_df = _write_drips(spark, src)
    stream = read_stream_files(spark, src, SCHEMA, max_files_per_trigger=2)
    totals = running_user_totals(stream.select("user_id", "value"))
    q = (totals.writeStream.format("memory").queryName("totals")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    # final state per user (last update wins) == batch aggregate
    final = (spark.sql("SELECT * FROM totals")
             .groupBy("user_id").agg(F.max("n_events").alias("n"),
                                     F.max("sum_value").alias("s")))
    expect = {(r.user_id, r.n, r.s) for r in
              batch_df.groupBy("user_id")
              .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
              .collect()}
    got = {(r.user_id, r.n, r.s) for r in final.collect()}
    assert got == expect


def test_stream_dedup_equals_batch_on_redelivery(spark, tmp_path):
    """stream_dedup drops redelivered records by key in-stream: a drip
    where every event is delivered twice (distinct files -> distinct
    micro-batches) must come out exactly once, matching the batch
    fallback on the same data."""
    from serverless_data_pipeline_spark.streaming.windows import stream_dedup

    src = str(tmp_path / "dup_src")
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [(i, base + dt.timedelta(minutes=i), i % 3, "click", float(i))
            for i in range(20)]
    df = spark.createDataFrame(rows, SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(src)
    df.coalesce(1).write.mode("append").parquet(src)  # full redelivery

    stream = read_stream_files(spark, src, SCHEMA, max_files_per_trigger=1)
    ded = stream_dedup(stream, ["event_id"], ts_col="ts", watermark="1 hour")
    q = (ded.writeStream.format("memory").queryName("dedup_stream")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT event_id FROM dedup_stream").collect()
    assert sorted(r.event_id for r in got) == list(range(20))

    batch = stream_dedup(spark.read.schema(SCHEMA).parquet(src),
                         ["event_id"])
    assert sorted(r.event_id for r in batch.select("event_id").collect()) \
        == list(range(20))


def test_redelivery_stream_bounded_retry_and_dlq(spark, tmp_path):
    """S7 bounded-retry contract (SQS redrive, py:133-137) at row grain:
    a transient-poison row fails deliveries 1-2 and lands in the good
    sink with attempts=3; a permanent-poison row exhausts all 3
    deliveries and lands in the DLQ with attempts=3 and a reason;
    healthy rows land with attempts=1. Nothing is lost or duplicated."""
    from serverless_data_pipeline_spark.streaming.sinks import (
        start_redelivery_stream,
    )
    src = str(tmp_path / "src")
    _write_drips(spark, src)                       # event_id 0..39
    stream = read_stream_files(spark, src, SCHEMA, max_files_per_trigger=2)

    def succeeds_at(attempt):
        transient = (F.col("event_id") % 10 == 3) & (F.lit(attempt) < 3)
        permanent = F.col("event_id") % 10 == 7
        return ~transient & ~permanent

    q = start_redelivery_stream(
        stream, good_path=str(tmp_path / "good"),
        dlq_path=str(tmp_path / "dlq"),
        checkpoint=str(tmp_path / "ckpt"),
        succeeds_at=succeeds_at, max_receive_count=3,
        trigger={"availableNow": True})
    q.awaitTermination(120)

    good = spark.read.parquet(str(tmp_path / "good"))
    assert good.count() == 36                      # 4 permanent-poison out
    att = {r.event_id: r.attempts for r in good.collect()}
    assert all(att[i] == 3 for i in att if i % 10 == 3)
    assert all(att[i] == 1 for i in att if i % 10 not in (3, 7))
    assert not any(i % 10 == 7 for i in att)
    dlq = spark.read.json(str(tmp_path / "dlq"))
    assert sorted(r.event_id for r in dlq.collect()) == [7, 17, 27, 37]
    assert dlq.filter("attempts = 3").count() == 4
    assert dlq.filter(
        "_error_reason = 'failed_after_3_deliveries'").count() == 4


def test_stream_static_enrich_batch_parity(spark, tmp_path):
    """Stream-static join: the streamed result must equal the plain
    batch join, the dim must broadcast, and left-join semantics must
    keep unmatched stream rows with NULL dim columns."""
    from serverless_data_pipeline_spark.streaming.windows import (
        stream_static_enrich,
    )
    rows = [(i, "click" if i % 3 == 0 else
             ("view" if i % 3 == 1 else "mystery")) for i in range(30)]
    batch = spark.createDataFrame(rows, "event_id int, event_type string")
    batch.write.parquet(str(tmp_path / "land"))
    dim = spark.createDataFrame(
        [("click", 2), ("view", 5)], "event_type string, weight int")

    enriched_batch = stream_static_enrich(batch, dim, "event_type")
    assert "BroadcastHashJoin" in enriched_batch._jdf.queryExecution() \
        .executedPlan().toString()
    got_batch = {(r.event_id, r.weight) for r in enriched_batch.collect()}
    assert (0, 2) in got_batch and (1, 5) in got_batch
    assert (2, None) in got_batch            # left join keeps unmatched

    stream = spark.readStream.schema(batch.schema).parquet(
        str(tmp_path / "land"))
    q = (stream_static_enrich(stream, dim, "event_type")
         .writeStream.format("parquet")
         .option("path", str(tmp_path / "out"))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got_stream = {(r.event_id, r.weight)
                  for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert got_stream == got_batch


def test_redelivery_batch_replay_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: replaying the SAME epoch after a
    restart must overwrite its own output, not append duplicates —
    good rows, attempt counts and DLQ rows all identical after a
    double run."""
    from serverless_data_pipeline_spark.streaming.sinks import (
        redeliver_batch,
    )
    batch = spark.createDataFrame(
        [(i, float(i)) for i in range(20)], "event_id long, value double")

    def succeeds_at(attempt):
        transient = (F.col("event_id") % 10 == 3) & (F.lit(attempt) < 3)
        permanent = F.col("event_id") % 10 == 7
        return ~transient & ~permanent

    good, dlq = str(tmp_path / "good"), str(tmp_path / "dlq")
    for _replay in range(2):                      # same epoch twice
        redeliver_batch(batch, 0, good, dlq, succeeds_at, 3)
    g = spark.read.parquet(good)
    # 18 = 16 first-attempt + 2 transient at attempt 3 (a duplicated
    # replay would read 36)
    assert g.count() == 18
    att = {r.event_id: r.attempts for r in g.collect()}
    assert att[3] == att[13] == 3
    assert all(att[i] == 1 for i in att if i % 10 != 3)
    d = spark.read.json(dlq)
    assert sorted(r.event_id for r in d.collect()) == [7, 17]
    # epoch/attempt scoping surfaces as partition columns on read
    assert {"epoch", "attempt"} <= set(g.columns)
    # config drift (r8 ADVICE): a replay running FEWER attempts must
    # clear the first run's higher-attempt dirs — without the
    # epoch-prefix reset, attempt=3's two transient successes would
    # survive as stale duplicates next to the new DLQ verdicts
    redeliver_batch(batch, 0, good, dlq, succeeds_at, 2)
    g2 = spark.read.parquet(good)
    assert g2.count() == 16                       # attempt-1 rows only
    assert g2.agg(F.max("attempt")).first()[0] == 1
    d2 = spark.read.json(dlq)                     # transients now DLQ'd
    assert sorted(r.event_id for r in d2.collect()) == [3, 7, 13, 17]
    # ...and the SYMMETRIC drift (r9 ADVICE): max_receive_count RAISED
    # back — previously-DLQ'd transients now succeed, so the stale DLQ
    # epoch dir must be cleared too or rows 3/13 would appear in BOTH
    # sinks after the replay
    redeliver_batch(batch, 0, good, dlq, succeeds_at, 3)
    g3 = spark.read.parquet(good)
    assert g3.count() == 18
    d3 = spark.read.json(dlq)
    assert sorted(r.event_id for r in d3.collect()) == [7, 17]


def test_drift_monitor_stream_flags_and_replay(spark, tmp_path):
    """Streaming drift monitor (X17 in foreachBatch): a stream
    containing a category the reference lacks flags its epoch (PSI
    over threshold, the NEW category counted in n_added on the
    streamed path, nothing in n_removed); a stream matching the
    reference reports every shift statistic exactly zero. Replay of
    the same epoch overwrites, never duplicates; an EMPTY batch is a
    liveness condition, never a drift alarm."""
    from serverless_data_pipeline_spark.streaming.monitor import (
        drift_monitor_batch, start_drift_monitor_stream,
    )
    src = str(tmp_path / "src")
    _write_drips(spark, src)             # ids 0..39, click/view 50/50
    import datetime as _dt
    schema = SCHEMA
    t0 = _dt.datetime(2024, 1, 1)
    # click-only reference: the stream's 'view' half is a NEW category
    reference = spark.createDataFrame(
        [(i, t0, i, "click", 1.0) for i in range(40)], schema)
    stream = read_stream_files(spark, src, schema,
                               max_files_per_trigger=100)
    q = start_drift_monitor_stream(
        stream, reference, "event_type", str(tmp_path / "mon"),
        str(tmp_path / "ck"), trigger={"availableNow": True})
    q.awaitTermination(120)
    rows = spark.read.parquet(str(tmp_path / "mon")).collect()
    assert len(rows) == 1                # all files fit one trigger
    r0 = rows[0]
    assert r0.drifted and r0.n_rows == 40
    # the streamed path must attribute 'view' as ADDED, not removed
    assert r0.n_added == 1 and r0.n_removed == 0
    assert r0.n_cat_ref == 1 and r0.n_cat_batch == 2
    assert r0.psi > 0.25 and r0.tvd >= 0 and r0.js >= 0
    from serverless_data_pipeline_spark.operators.stages import (
        category_counts,
    )
    ref_counts = category_counts(reference, "event_type")
    # empty micro-batch: liveness, not drift — NULL stats, no flag
    empty = spark.createDataFrame([], schema)
    drift_monitor_batch(empty, 3, ref_counts, "event_type",
                        str(tmp_path / "mon_empty"))
    er = spark.read.parquet(str(tmp_path / "mon_empty")).collect()[0]
    assert er.n_rows == 0 and not er.drifted
    assert er.psi is None and er.js is None and er.tvd is None
    assert er.n_removed == 1             # the whole reference vanished
    # self-comparison: zero everywhere, stable
    batch = spark.read.parquet(src)
    for _replay in range(2):                       # idempotent replay
        drift_monitor_batch(batch, 7,
                            category_counts(batch, "event_type"),
                            "event_type", str(tmp_path / "self"))
    self_rows = spark.read.parquet(str(tmp_path / "self")).collect()
    assert len(self_rows) == 1                     # no duplicate rows
    r = self_rows[0]
    assert (r.psi, r.js, r.tvd) == (0.0, 0.0, 0.0)
    assert not r.drifted and r.epoch == 7
    assert r.n_added == r.n_removed == 0
    assert r.n_rows == 40


def test_mix_shift_from_counts_equals_corpus_form(spark):
    """The precomputed-counts form (r8 verdict #2) is BIT-IDENTICAL to
    the corpus form: same categories (NULL included), same counts,
    fractions, PSI/JS terms — on sides with disjoint, overlapping and
    NULL categories."""
    from serverless_data_pipeline_spark.operators.stages import (
        category_counts, mix_shift, mix_shift_from_counts,
        mix_shift_summarize,
    )
    a = spark.createDataFrame(
        [("en",)] * 6 + [("de",)] * 3 + [(None,)] * 2 + [("zh",)],
        "lang string")
    b = spark.createDataFrame(
        [("en",)] * 2 + [("fr",)] * 5 + [(None,)] * 1,
        "lang string")
    corpus = {r.category: r for r in mix_shift(a, b, "lang").collect()}
    counts = {r.category: r for r in mix_shift_from_counts(
        category_counts(a, "lang"),
        category_counts(b, "lang")).collect()}
    assert set(corpus) == set(counts) == {"en", "de", "zh", "fr", None}
    for cat, cr in corpus.items():
        assert cr.asDict() == counts[cat].asDict()
    s1 = mix_shift_summarize(mix_shift(a, b, "lang")).first().asDict()
    s2 = mix_shift_summarize(mix_shift_from_counts(
        category_counts(a, "lang"),
        category_counts(b, "lang"))).first().asDict()
    assert s1 == s2


def test_drift_monitor_numeric_profile_drift(spark, tmp_path):
    """Numeric drift in the monitor (r10 verdict #2): a reference whose
    `value` carries a planted +10 mean shift and a 1-in-4 null surge
    — while its categorical mix matches the batch exactly — must
    produce an epoch row that is categorical-stable (psi 0) yet
    numeric-drifted, with BOTH max-abs deltas exact; self-comparison
    reads zero deltas and no flag; an empty batch carries NULL deltas
    and no flag (liveness, not drift); numeric_cols without a
    reference profile is a usage error."""
    from serverless_data_pipeline_spark.operators.stages import (
        category_counts, profile_columns,
    )
    from serverless_data_pipeline_spark.streaming.monitor import (
        drift_monitor_batch,
    )
    src = str(tmp_path / "src")
    batch = _write_drips(spark, src)     # value = 0..39, mean 19.5
    ref = batch.select(
        "event_type",
        F.when(F.col("event_id") % 4 == 0,
               F.lit(None).cast("double"))
         .otherwise(F.col("value") + 10.0).alias("value"))
    rc = category_counts(ref, "event_type")
    rp = profile_columns(ref, ["value"])
    drift_monitor_batch(batch, 0, rc, "event_type",
                        str(tmp_path / "m"), reference_profile=rp,
                        numeric_cols=["value"])
    r = spark.read.parquet(str(tmp_path / "m")).collect()[0]
    assert r.psi == 0.0 and not r.drifted      # categorical stable
    # ref mean: (sum(0..39) - sum(0,4..36) + 30*10)/30 = 30.0
    assert r.max_abs_vavg_delta == 10.5        # |19.5 - 30.0|
    assert r.max_abs_null_frac_delta == 0.25   # |0 - 10/40|
    assert r.numeric_drifted
    # self-comparison: zero deltas, no flag
    drift_monitor_batch(batch, 1, category_counts(batch, "event_type"),
                        "event_type", str(tmp_path / "m_self"),
                        reference_profile=profile_columns(
                            batch, ["value"]),
                        numeric_cols=["value"])
    s = spark.read.parquet(str(tmp_path / "m_self")).collect()[0]
    assert s.max_abs_vavg_delta == 0.0
    assert s.max_abs_null_frac_delta == 0.0
    assert not s.numeric_drifted
    # empty batch: NULL deltas, both flags false (liveness, not drift)
    empty = spark.createDataFrame([], SCHEMA)
    drift_monitor_batch(empty, 2, rc, "event_type",
                        str(tmp_path / "m_empty"),
                        reference_profile=rp, numeric_cols=["value"])
    e = spark.read.parquet(str(tmp_path / "m_empty")).collect()[0]
    assert e.n_rows == 0 and not e.drifted and not e.numeric_drifted
    assert e.max_abs_vavg_delta is None
    # without numeric_cols the columns exist as NULL/false (stable
    # sink schema across monitor configs)
    drift_monitor_batch(batch, 3, rc, "event_type",
                        str(tmp_path / "m_nonum"))
    n = spark.read.parquet(str(tmp_path / "m_nonum")).collect()[0]
    assert n.max_abs_vavg_delta is None and not n.numeric_drifted
    import pytest
    with pytest.raises(ValueError, match="reference_profile"):
        drift_monitor_batch(batch, 4, rc, "event_type",
                            str(tmp_path / "m_bad"),
                            numeric_cols=["value"])
    # coverage guard (r10 review): a reference profile built over a
    # DIFFERENT column set would leave every delta NULL and silently
    # disable the numeric alarm forever — rejected up front instead
    renamed = profile_columns(ref.withColumnRenamed("value", "val"),
                              ["val"])
    with pytest.raises(ValueError, match="no rows for numeric_cols"):
        drift_monitor_batch(batch, 5, rc, "event_type",
                            str(tmp_path / "m_mis"),
                            reference_profile=renamed,
                            numeric_cols=["value"])


def test_liveness_alarm_on_silent_stream(spark, tmp_path):
    """The monitor's liveness companion (r10 verdict #6): a feed that
    goes quiet produces k consecutive empty monitor epochs — the mix
    alarm stays silent by design, the liveness alarm pages. Planted
    silent stream: live epochs then empty ones through the REAL
    monitor sink; plus the edge laws (recovery resets the tail,
    never-live sinks count every epoch, an empty sink is a deployment
    condition not a page, k validated)."""
    from serverless_data_pipeline_spark.operators.stages import (
        category_counts,
    )
    from serverless_data_pipeline_spark.streaming.monitor import (
        drift_monitor_batch, liveness_alarm,
    )
    src = str(tmp_path / "src")
    batch = _write_drips(spark, src)
    rc = category_counts(batch, "event_type").localCheckpoint()
    mon = str(tmp_path / "mon")
    empty = spark.createDataFrame([], SCHEMA)
    # epochs 0-1 live, then the feed dies: 2-4 empty
    for ep, b in [(0, batch), (1, batch), (2, empty), (3, empty),
                  (4, empty)]:
        drift_monitor_batch(b, ep, rc, "event_type", mon)
    sink = spark.read.parquet(mon)
    a = liveness_alarm(sink, k=3).collect()[0]
    assert a.n_epochs == 5 and a.last_epoch == 4
    assert a.last_live_epoch == 1 and a.empty_tail == 3
    assert a.silent
    assert not liveness_alarm(sink, k=4).first().silent
    # recovery: a live epoch resets the tail
    drift_monitor_batch(batch, 5, rc, "event_type", mon)
    r = liveness_alarm(spark.read.parquet(mon), k=3).first()
    assert r.empty_tail == 0 and not r.silent
    assert r.last_live_epoch == 5
    # never-live sink: every epoch counts toward the tail
    mon2 = str(tmp_path / "mon2")
    drift_monitor_batch(empty, 0, rc, "event_type", mon2)
    drift_monitor_batch(empty, 1, rc, "event_type", mon2)
    n = liveness_alarm(spark.read.parquet(mon2), k=2).first()
    assert n.last_live_epoch is None and n.empty_tail == 2 and n.silent
    # empty monitor sink: no evidence, no page
    z = liveness_alarm(sink.filter("epoch < 0"), k=1).first()
    assert z.n_epochs == 0 and z.empty_tail == 0 and not z.silent
    import pytest
    with pytest.raises(ValueError):
        liveness_alarm(sink, k=0)


def test_dlq_depth_and_throughput_alarms(spark, tmp_path):
    """The other two CloudWatch-alarm analogues (reference py:551-575):
    DLQ depth (threshold 1 — any dead-letter row pages, with the modal
    reason surfaced for triage) and the high-throughput alarm (k
    consecutive epochs over the record threshold)."""
    from serverless_data_pipeline_spark.streaming.monitor import (
        dlq_depth_alarm, throughput_alarm,
    )
    dlq = spark.createDataFrame(
        [(1, "sink_failed"), (2, "sink_failed"), (3, "poison_row")],
        "event_id long, _error_reason string")
    a = dlq_depth_alarm(dlq).first()
    assert a.depth == 3 and a.n_reasons == 2 and a.alarm
    assert a.top_reason == "sink_failed"
    assert not dlq_depth_alarm(dlq, threshold=4).first().alarm
    # empty queue: depth 0, no page, NULL triage
    e = dlq_depth_alarm(dlq.filter("event_id < 0")).first()
    assert e.depth == 0 and not e.alarm and e.top_reason is None
    # sinks without a reason column still alarm on depth
    nr = dlq_depth_alarm(dlq.select("event_id")).first()
    assert nr.depth == 3 and nr.alarm and nr.top_reason is None
    # throughput: epochs 0-1 calm, 2-3 hot -> hot_tail 2 pages at k=2
    mon = spark.createDataFrame(
        [(0, 100), (1, 900), (2, 1500), (3, 2000)],
        "epoch long, n_rows long")
    t = throughput_alarm(mon, threshold=1000, k=2).first()
    assert t.hot_tail == 2 and t.alarm and t.last_epoch == 3
    assert not throughput_alarm(mon, threshold=1000, k=3).first().alarm
    # a calm epoch resets the tail; all-hot counts every epoch
    calm = mon.union(spark.createDataFrame([(4, 10)], mon.schema))
    assert throughput_alarm(calm, threshold=1000, k=1).first().hot_tail == 0
    hot = throughput_alarm(mon.filter("epoch >= 2"),
                           threshold=1000, k=2).first()
    assert hot.hot_tail == 2 and hot.alarm
    import pytest
    with pytest.raises(ValueError):
        throughput_alarm(mon, k=0)
    with pytest.raises(ValueError):
        dlq_depth_alarm(dlq, threshold=0)


def test_drift_monitor_never_rescans_reference(spark, tmp_path):
    """start_drift_monitor_stream aggregates the static reference ONCE
    (eager checkpoint of its category counts AND, with numeric_cols,
    of its column profile). Functional proof that no epoch rescans
    the reference corpus: the reference's parquet files are DELETED
    after stream start, and the monitor still produces correct
    per-epoch rows — any per-epoch rescan would throw FileNotFound."""
    import shutil

    from serverless_data_pipeline_spark.streaming.monitor import (
        start_drift_monitor_stream,
    )
    src = str(tmp_path / "src")
    _write_drips(spark, src)             # ids 0..39, click/view 50/50
    ref_path = str(tmp_path / "ref")
    spark.read.parquet(src).write.parquet(ref_path)
    reference = spark.read.parquet(ref_path)
    stream = read_stream_files(spark, src, SCHEMA,
                               max_files_per_trigger=2)
    q = start_drift_monitor_stream(
        stream, reference, "event_type", str(tmp_path / "mon"),
        str(tmp_path / "ck"), numeric_cols=["value"],
        trigger={"availableNow": True})
    shutil.rmtree(ref_path)              # reference gone mid-stream
    q.awaitTermination(120)
    rows = spark.read.parquet(str(tmp_path / "mon")).collect()
    assert len(rows) >= 2                # several epochs all succeeded
    assert all(r.n_cat_ref == 2 for r in rows)   # counts frame intact
    assert sum(r.n_rows for r in rows) == 40     # every batch compared
    # the numeric profile was checkpointed too: every epoch computed
    # a real vavg delta against the vanished reference
    assert all(r.max_abs_vavg_delta is not None for r in rows)
    # neither a corpus nor a histogram = a usage error, caught early
    import pytest as _pt
    with _pt.raises(ValueError):
        start_drift_monitor_stream(stream, None, "event_type",
                                   str(tmp_path / "m2"),
                                   str(tmp_path / "ck2"))


def test_tokenizer_health_monitor_composition(spark, tmp_path):
    """The r10 features compose into tokenizer-health monitoring: a
    streamed corpus is encoded with the committed artifact
    (byte_fallback) and the per-doc unk_rate — the byte-escape rate —
    is watched by the NUMERIC drift monitor against the clean
    corpus's profile. A batch flooded with non-ASCII garbage must
    flag numeric drift (mean escape rate jumps); a clean batch must
    not. This is the dashboard a curator actually runs: encoding
    health per micro-batch, in-flight."""
    from serverless_data_pipeline_spark.operators.bpe import (
        bpe_encode_ids,
    )
    from serverless_data_pipeline_spark.operators.bpe_artifact import (
        COMMITTED_MERGES, build_vocab,
    )
    from serverless_data_pipeline_spark.operators.stages import (
        category_counts, profile_columns,
    )
    from serverless_data_pipeline_spark.streaming.monitor import (
        drift_monitor_batch,
    )
    v = build_vocab()

    def encoded(df):
        return bpe_encode_ids(df, "text", COMMITTED_MERGES, v,
                              byte_fallback=True,
                              unk_col="unk_rate").select(
            "lang", "unk_rate")

    clean = spark.createDataFrame(
        [(i, "a scan can lower column as at par low", "en")
         for i in range(40)], "doc_id long, text string, lang string")
    ref = encoded(clean)
    rc = category_counts(ref, "lang").localCheckpoint()
    rp = profile_columns(ref, ["unk_rate"]).localCheckpoint()
    # clean epoch: escape rate matches the reference -> no flag
    drift_monitor_batch(encoded(clean), 0, rc, "lang",
                        str(tmp_path / "tokmon"),
                        reference_profile=rp,
                        numeric_cols=["unk_rate"],
                        vavg_delta_threshold=0.1)
    ok = spark.read.parquet(str(tmp_path / "tokmon")).collect()[0]
    assert not ok.numeric_drifted and ok.max_abs_vavg_delta == 0.0
    # garbage epoch: half the docs are non-ASCII floods -> mean
    # byte-escape rate jumps -> numeric drift pages while the
    # categorical lang mix stays stable
    garbage = spark.createDataFrame(
        [(i, "汉字" * 10 if i % 2 == 0
          else "a scan can lower column as at par low", "en")
         for i in range(40)], "doc_id long, text string, lang string")
    drift_monitor_batch(encoded(garbage), 1, rc, "lang",
                        str(tmp_path / "tokmon"),
                        reference_profile=rp,
                        numeric_cols=["unk_rate"],
                        vavg_delta_threshold=0.1)
    hot = (spark.read.parquet(str(tmp_path / "tokmon"))
           .filter("epoch = 1").collect()[0])
    assert hot.numeric_drifted and hot.max_abs_vavg_delta > 0.1
    assert not hot.drifted                 # lang mix did NOT shift


def test_streaming_incremental_packing_loop(spark, tmp_path):
    """The packing artifact maintained by a STREAM (the X7 loop shape
    applied to pack_token_blocks): each landing batch runs
    resume_token_blocks against the persisted packed state inside
    foreachBatch — tick 1 bootstraps, tick N touches only the tail
    rows + the new docs — and after two ticks the on-disk state
    equals one batch repack of everything, ids and spans."""
    import json

    from serverless_data_pipeline_spark.operators.corpus import (
        pack_token_blocks, resume_token_blocks,
    )
    land = tmp_path / "land"
    land.mkdir()
    state_dir = str(tmp_path / "packed")
    kw = dict(block_len=5, eos_id=99, n_shards=2)

    def write_batch(names_rows):
        for name, rows in names_rows.items():
            with open(land / name, "w") as fh:
                for doc_id, ids in rows:
                    fh.write(json.dumps(
                        {"doc_id": doc_id, "token_ids": ids}) + "\n")

    def pack_epoch(batch, epoch_id):
        if batch.isEmpty():
            return
        try:
            state = batch.sparkSession.read.parquet(state_dir)
            out = resume_token_blocks(state, batch, "doc_id",
                                      "token_ids", **kw)
            tails = (state.groupBy("shard")
                     .agg(F.max("block_id").alias("tb")))
            keep = (state.join(tails, "shard")
                    .filter(F.col("block_id") < F.col("tb"))
                    .drop("tb"))
            merged = keep.unionByName(out).localCheckpoint()
        except Exception as e:
            if "PATH_NOT_FOUND" not in str(e):
                raise
            merged = pack_token_blocks(batch, "doc_id", "token_ids",
                                       drop_last=False, **kw)
        merged.write.mode("overwrite").parquet(state_dir)

    a = [(i, list(range(3 * i, 3 * i + i % 4))) for i in range(10)]
    b = [(i, list(range(7 * i, 7 * i + i % 5))) for i in range(10, 18)]
    write_batch({"b1.jsonl": a})
    q = (spark.readStream
         .schema("doc_id long, token_ids array<int>")
         .json(str(land))
         .writeStream.foreachBatch(pack_epoch)
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    write_batch({"b2.jsonl": b})
    q = (spark.readStream
         .schema("doc_id long, token_ids array<int>")
         .json(str(land))
         .writeStream.foreachBatch(pack_epoch)
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    def key(rows):
        return {(r.shard, r.block_id, tuple(r.ids),
                 tuple((s.start, s.len, s.doc_id)
                       for s in r.doc_spans)) for r in rows}
    allb = spark.createDataFrame(a + b,
                                 "doc_id long, token_ids array<int>")
    assert key(spark.read.parquet(state_dir).collect()) == key(
        pack_token_blocks(allb, "doc_id", "token_ids",
                          drop_last=False, **kw).collect())


def test_commit_packed_batch_idempotent_and_crash_safe(spark, tmp_path):
    """The log-structured packing commit: bootstrap writes a FULL
    version, ordinary ticks write DELTAS only (the resume output —
    O(batch) write), re-delivered ticks are no-ops, an uncommitted
    (crashed) directory is ignored as a basis and simply overwritten,
    the compaction tick folds the chain into a fresh full and prunes
    everything older (crash leftovers included), and at every stage
    the merged state equals a one-shot repack."""
    import os

    from serverless_data_pipeline_spark.operators.corpus import (
        commit_packed_batch, latest_packed_state, pack_token_blocks,
    )
    sp = str(tmp_path / "state")
    kw = dict(block_len=5, eos_id=99, n_shards=2, compact_every=2)
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "doc_id long, token_ids array<int>")

    def key(rows):
        return {(r.shard, r.block_id, tuple(r.ids),
                 tuple((s.start, s.len, s.doc_id)
                       for s in r.doc_spans)) for r in rows}

    def repack(rows):
        return key(pack_token_blocks(
            mk(rows), "doc_id", "token_ids", drop_last=False,
            block_len=5, eos_id=99, n_shards=2).collect())

    a = [(i, list(range(i % 4))) for i in range(10)]
    b = [(i, list(range(i % 5))) for i in range(10, 18)]
    c = [(i, list(range(i % 3 + 1))) for i in range(18, 24)]
    d = [(i, list(range(i % 4 + 1))) for i in range(24, 29)]

    # tick 0 bootstraps a FULL version
    assert commit_packed_batch(spark, mk(a), sp, 0, **kw) is True
    assert os.path.exists(f"{sp}/v000000000000/_FULL")
    # tick 1 is a DELTA: only tail + new blocks land in its directory
    assert commit_packed_batch(spark, mk(b), sp, 1, **kw) is True
    assert not os.path.exists(f"{sp}/v000000000001/_FULL")
    v1 = spark.read.parquet(f"{sp}/v000000000001")
    full01 = latest_packed_state(spark, sp)
    assert v1.count() < full01.count()  # delta, not a state rewrite
    assert key(full01.collect()) == repack(a + b)
    # re-delivery of tick 1: provable no-op
    st1 = key(latest_packed_state(spark, sp).collect())
    assert commit_packed_batch(spark, mk(b), sp, 1, **kw) is False
    assert key(latest_packed_state(spark, sp).collect()) == st1
    # crash simulation: a partial (uncommitted) v2 must not become the
    # basis and must be overwritable by the real tick 2 — which is the
    # compact_every=2 COMPACTION tick (one delta since the full): it
    # writes a fresh FULL and prunes v0/v1
    part = tmp_path / "state" / "v000000000002"
    part.mkdir()
    (part / "garbage.parquet").write_bytes(b"not parquet")
    assert commit_packed_batch(spark, mk(c), sp, 2, **kw) is True
    assert key(latest_packed_state(spark, sp).collect()) == \
        repack(a + b + c)
    names = sorted(p for p in os.listdir(sp) if p.startswith("v"))
    assert names == ["v000000000002"]
    assert os.path.exists(f"{sp}/v000000000002/_FULL")
    # post-compaction delta keeps composing exactly
    assert commit_packed_batch(spark, mk(d), sp, 3, **kw) is True
    assert key(latest_packed_state(spark, sp).collect()) == \
        repack(a + b + c + d)


def test_packing_stream_end_to_end(spark, tmp_path):
    """The whole loop as ONE streaming query (availableNow drain per
    landing wave): the maintained state equals a one-shot repack of
    everything landed."""
    import json
    from serverless_data_pipeline_spark.operators.corpus import (
        latest_packed_state, pack_token_blocks, packing_stream,
    )
    land = tmp_path / "land"
    land.mkdir()
    sp = str(tmp_path / "state")
    kw = dict(block_len=5, eos_id=99, n_shards=2)

    def write_batch(name, rows):
        with open(land / name, "w") as fh:
            for doc_id, ids in rows:
                fh.write(json.dumps(
                    {"doc_id": doc_id, "token_ids": ids}) + "\n")

    a = [(i, list(range(3 * i, 3 * i + i % 4))) for i in range(10)]
    b = [(i, list(range(7 * i, 7 * i + i % 5))) for i in range(10, 18)]
    write_batch("b1.jsonl", a)
    for _ in range(2):
        q = packing_stream(
            spark, str(land), "doc_id long, token_ids array<int>",
            sp, str(tmp_path / "ck"), available_now=True, **kw)
        q.awaitTermination(120)
        if _ == 0:
            write_batch("b2.jsonl", b)

    def key(rows):
        return {(r.shard, r.block_id, tuple(r.ids),
                 tuple((s.start, s.len, s.doc_id)
                       for s in r.doc_spans)) for r in rows}
    assert key(latest_packed_state(spark, sp).collect()) == key(
        pack_token_blocks(
            spark.createDataFrame(a + b,
                                  "doc_id long, token_ids array<int>"),
            "doc_id", "token_ids", drop_last=False, **kw).collect())

def test_packing_stream_pins_state_root_ownership(spark, tmp_path):
    """r11 ADVICE: the stream writes a _STREAM ownership marker — the
    FULLY-QUALIFIED checkpoint URI, so restarting the same stream with
    a differently-SPELLED path to the same checkpoint (trailing slash,
    file: scheme) keeps owning the root instead of locking itself
    out."""
    import json
    import os
    from serverless_data_pipeline_spark.operators.corpus import (
        packing_stream,
    )
    land = tmp_path / "land"
    land.mkdir()
    sp = str(tmp_path / "state")
    with open(land / "b1.jsonl", "w") as fh:
        fh.write(json.dumps({"doc_id": 1, "token_ids": [1, 2, 3]}) + "\n")
    q = packing_stream(
        spark, str(land), "doc_id long, token_ids array<int>",
        sp, str(tmp_path / "ck"), available_now=True,
        block_len=5, eos_id=99, n_shards=2)
    q.awaitTermination(120)
    assert os.path.exists(f"{sp}/_STREAM")
    with open(f"{sp}/_STREAM") as fh:
        got = fh.read()
    assert got.startswith("file:")
    assert got.endswith(str(tmp_path / "ck"))
    # same checkpoint, different spellings: still the rightful owner
    for spelling in (str(tmp_path / "ck") + "/",
                     "file://" + str(tmp_path / "ck")):
        with open(land / f"b_{len(spelling)}.jsonl", "w") as fh:
            fh.write(json.dumps(
                {"doc_id": 2 + len(spelling), "token_ids": [4, 5]})
                + "\n")
        q = packing_stream(
            spark, str(land), "doc_id long, token_ids array<int>",
            sp, spelling, available_now=True,
            block_len=5, eos_id=99, n_shards=2)
        q.awaitTermination(120)   # raises through the stream if denied


def test_commit_packed_batch_tail_manifest_makes_tick_state_free(
        spark, tmp_path):
    """r12 (the last per-tick scale cliff): every version writes a
    |shards|-row _tails manifest, and an ordinary tick resumes from
    the NEWEST basis manifest without reading the state parquet at
    all — pinned by DELETING every basis version's parquet part-files
    (manifests and markers kept) before the tick. The manifest tick's
    output is bit-identical to the scan-path tick of an intact twin
    root."""
    import os

    from serverless_data_pipeline_spark.operators.corpus import (
        commit_packed_batch,
    )
    kw = dict(block_len=5, eos_id=99, n_shards=2, compact_every=100)
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "doc_id long, token_ids array<int>")

    def key(rows):
        return {(r.shard, r.block_id, tuple(r.ids),
                 tuple((s.start, s.len, s.doc_id)
                       for s in r.doc_spans)) for r in rows}

    a = [(i, list(range(i % 4))) for i in range(10)]
    b = [(i, list(range(i % 5))) for i in range(10, 18)]
    c = [(i, list(range(i % 3 + 1))) for i in range(18, 24)]
    roots = {}
    for name in ("intact", "gutted"):
        sp = str(tmp_path / name)
        assert commit_packed_batch(spark, mk(a), sp, 0, **kw)
        assert commit_packed_batch(spark, mk(b), sp, 1, **kw)
        assert os.path.exists(f"{sp}/v000000000000/_tails/_SUCCESS")
        assert os.path.exists(f"{sp}/v000000000001/_tails/_SUCCESS")
        roots[name] = sp
    # gut the basis chain: every state part-file gone, sidecars kept
    for v in ("v000000000000", "v000000000001"):
        vd = os.path.join(roots["gutted"], v)
        removed = 0
        for f in os.listdir(vd):
            if not f.startswith(("_", ".")):
                os.remove(os.path.join(vd, f))
                removed += 1
        assert removed > 0
    # the ordinary tick still commits — zero state-parquet reads
    assert commit_packed_batch(spark, mk(c), roots["gutted"], 2, **kw)
    assert commit_packed_batch(spark, mk(c), roots["intact"], 2, **kw)
    got = spark.read.parquet(f"{roots['gutted']}/v000000000002")
    want = spark.read.parquet(f"{roots['intact']}/v000000000002")
    assert key(got.collect()) == key(want.collect())


def test_commit_packed_batch_missing_manifest_falls_back_to_scan(
        spark, tmp_path):
    """Crash between the version commit and the manifest write leaves
    a committed version WITHOUT _tails: the next tick falls back to
    the one-pass state scan and the state still equals a one-shot
    repack (manifest-vs-scan equivalence)."""
    import shutil

    from serverless_data_pipeline_spark.operators.corpus import (
        commit_packed_batch, latest_packed_state, pack_token_blocks,
    )
    kw = dict(block_len=5, eos_id=99, n_shards=2, compact_every=100)
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "doc_id long, token_ids array<int>")

    def key(rows):
        return {(r.shard, r.block_id, tuple(r.ids),
                 tuple((s.start, s.len, s.doc_id)
                       for s in r.doc_spans)) for r in rows}

    a = [(i, list(range(i % 4))) for i in range(10)]
    b = [(i, list(range(i % 5))) for i in range(10, 18)]
    c = [(i, list(range(i % 3 + 1))) for i in range(18, 24)]
    sp = str(tmp_path / "state")
    assert commit_packed_batch(spark, mk(a), sp, 0, **kw)
    assert commit_packed_batch(spark, mk(b), sp, 1, **kw)
    shutil.rmtree(f"{sp}/v000000000001/_tails")   # crash simulation
    assert commit_packed_batch(spark, mk(c), sp, 2, **kw)
    assert key(latest_packed_state(spark, sp).collect()) == key(
        pack_token_blocks(mk(a + b + c), "doc_id", "token_ids",
                          drop_last=False, block_len=5, eos_id=99,
                          n_shards=2).collect())


def test_commit_packed_batch_stream_marker_and_replay_warning(
        spark, tmp_path):
    """r11 ADVICE both halves: a commit carrying a different stream_id
    than the root's _STREAM marker raises (tick-id collisions from a
    fresh checkpoint would silently drop data), and a NON-EMPTY batch
    swallowed as a replayed tick warns loudly."""
    import pytest

    from serverless_data_pipeline_spark.operators.corpus import (
        commit_packed_batch,
    )
    kw = dict(block_len=5, eos_id=99, n_shards=2)
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "doc_id long, token_ids array<int>")
    a = [(i, list(range(i % 4))) for i in range(6)]
    b = [(i, list(range(i % 5))) for i in range(6, 12)]
    sp = str(tmp_path / "state")
    assert commit_packed_batch(spark, mk(a), sp, 0, stream_id="ck-A",
                               **kw)
    with pytest.raises(ValueError, match="owned by stream"):
        commit_packed_batch(spark, mk(b), sp, 1, stream_id="ck-B", **kw)
    # the rightful owner keeps committing
    assert commit_packed_batch(spark, mk(b), sp, 1, stream_id="ck-A",
                               **kw)
    # replayed non-empty tick: no-op, but LOUD
    with pytest.warns(RuntimeWarning, match="already"):
        assert commit_packed_batch(spark, mk(b), sp, 1,
                                   stream_id="ck-A", **kw) is False


def test_resume_raises_on_duplicate_distinct_tail_rows(spark):
    """r11 ADVICE: a corrupt state carrying TWO DISTINCT rows at a
    shard's max block_id must raise, not resume from an arbitrary
    max_by survivor."""
    import pytest

    from serverless_data_pipeline_spark.operators.corpus import (
        pack_token_blocks, resume_token_blocks,
    )
    a = [(i, list(range(i % 4 + 1))) for i in range(8)]
    docs = spark.createDataFrame(a, "doc_id long, token_ids array<int>")
    state = pack_token_blocks(docs, "doc_id", "token_ids",
                              drop_last=False, block_len=5, eos_id=99,
                              n_shards=2)
    tail = max(state.filter("shard = 0").collect(),
               key=lambda r: r.block_id)
    forged = spark.createDataFrame(
        [(0, int(tail.block_id), [1, 2],
          [(0, 2, 12345)])],
        state.schema)
    newdocs = spark.createDataFrame(
        [(100, [7, 8, 9])], "doc_id long, token_ids array<int>")
    with pytest.raises(ValueError, match="multiple distinct rows"):
        resume_token_blocks(state.unionByName(forged), newdocs,
                            "doc_id", "token_ids", block_len=5,
                            eos_id=99, n_shards=2).collect()


def test_commit_packed_batch_random_tick_stream_equals_repack(
        spark, tmp_path):
    """Randomized composition pin (r12): a stream of ticks with mixed
    batch sizes, a compaction mid-stream, and manifests randomly
    stripped (forcing the scan fallback on some ticks) still converges
    to exactly the one-shot repack — manifest path and scan path are
    interchangeable at every step."""
    import os
    import random
    import shutil

    from serverless_data_pipeline_spark.operators.corpus import (
        commit_packed_batch, latest_packed_state, pack_token_blocks,
    )
    rng = random.Random(1234)
    kw = dict(block_len=7, eos_id=99, n_shards=3, compact_every=3)
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "doc_id long, token_ids array<int>")

    def key(rows):
        return {(r.shard, r.block_id, tuple(r.ids),
                 tuple((s.start, s.len, s.doc_id)
                       for s in r.doc_spans)) for r in rows}

    sp = str(tmp_path / "state")
    all_rows, nxt = [], 0
    for tick in range(6):
        n = rng.randint(1, 12)
        batch = [(i, list(range(rng.randint(0, 9))))
                 for i in range(nxt, nxt + n)]
        nxt += n
        all_rows += batch
        assert commit_packed_batch(spark, mk(batch), sp, tick, **kw)
        if rng.random() < 0.5:
            # crash-simulate the manifest away on a random subset of
            # versions — later ticks must fall back to the scan path
            for d in os.listdir(sp):
                t = os.path.join(sp, d, "_tails")
                if d.startswith("v") and os.path.isdir(t) \
                        and rng.random() < 0.5:
                    shutil.rmtree(t)
        assert key(latest_packed_state(spark, sp).collect()) == key(
            pack_token_blocks(mk(all_rows), "doc_id", "token_ids",
                              drop_last=False, block_len=7, eos_id=99,
                              n_shards=3).collect())


def test_commit_packed_batch_manifest_with_custom_shard_and_order(
        spark, tmp_path):
    """The tail-manifest path composes with training-order packing
    (shard_col/order_by — the global_shuffle discipline): ticks resume
    from the manifest under custom sharding and the merged state still
    equals the one-shot repack with the same layout."""
    from serverless_data_pipeline_spark.operators.corpus import (
        commit_packed_batch, latest_packed_state, pack_token_blocks,
    )
    kw = dict(block_len=5, eos_id=99, n_shards=2, order_by="pos",
              shard_col="tshard")
    schema = ("doc_id long, token_ids array<int>, tshard int, "
              "pos long")

    def rows(lo, hi):
        # custom shard = doc_id % 3, order = reversed within shard
        # (ordering must still be append-only ACROSS batches per the
        # resume contract: later batches carry larger pos)
        return [(i, list(range(i % 4 + 1)), i % 3, lo + hi - i)
                for i in range(lo, hi)]

    def key(rws):
        return {(r.shard, r.block_id, tuple(r.ids),
                 tuple((s.start, s.len, s.doc_id)
                       for s in r.doc_spans)) for r in rws}

    mk = lambda r: spark.createDataFrame(r, schema)  # noqa: E731
    sp = str(tmp_path / "state")
    a, b = rows(0, 9), rows(100, 108)
    assert commit_packed_batch(spark, mk(a), sp, 0,
                               compact_every=100, **kw)
    assert commit_packed_batch(spark, mk(b), sp, 1,
                               compact_every=100, **kw)
    assert key(latest_packed_state(spark, sp).collect()) == key(
        pack_token_blocks(mk(a + b), "doc_id", "token_ids",
                          drop_last=False, block_len=5, eos_id=99,
                          n_shards=2, order_by="pos",
                          shard_col="tshard").collect())


def test_read_tail_manifest_raises_on_duplicate_shard_rows(
        spark, tmp_path):
    """r12 ADVICE / verdict #3: the manifest fast path must be no
    weaker than the scan fallback — a corrupt _tails sidecar carrying
    TWO rows for one shard raises instead of silently feeding
    conflicting prior offsets into the resume."""
    import shutil

    import pytest

    from serverless_data_pipeline_spark.operators.corpus import (
        _read_tail_manifest, commit_packed_batch,
    )
    kw = dict(block_len=5, eos_id=99, n_shards=2, compact_every=100)
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "doc_id long, token_ids array<int>")
    a = [(i, list(range(i % 4 + 1))) for i in range(8)]
    sp = str(tmp_path / "state")
    assert commit_packed_batch(spark, mk(a), sp, 0, **kw)
    vd = f"{sp}/v000000000000"
    mf = spark.read.parquet(f"{vd}/_tails")
    (mf.unionByName(mf.limit(1)).coalesce(1)
       .write.mode("overwrite").parquet(f"{vd}/_tails_forged"))
    shutil.rmtree(f"{vd}/_tails")
    shutil.move(f"{vd}/_tails_forged", f"{vd}/_tails")
    with pytest.raises(ValueError, match="appears more than once"):
        _read_tail_manifest(spark, vd, 5)
    # and the next tick surfaces it instead of committing mis-offsets
    with pytest.raises(ValueError, match="appears more than once"):
        commit_packed_batch(spark, mk([(100, [1, 2])]), sp, 1, **kw)


def test_claim_stream_marker_atomic_first_claim(
        spark, tmp_path, monkeypatch):
    """r12 ADVICE, r13 hardening: on local filesystems the first
    claim publishes by HARD LINK (link(2) fails with EEXIST
    atomically), so two racing first-claimants resolve to exactly one
    winner even when both passed the exists() probe — rename(2) could
    not arbitrate this because it silently replaces the destination.
    The interloper here lands atomically in the worst window (after
    our exists() probe and temp write, before our publish); our
    createLink must lose, and verify-after-claim raises with the
    winner's id instead of proceeding unchecked."""
    import pytest

    from serverless_data_pipeline_spark.operators import util
    from serverless_data_pipeline_spark.operators.corpus import (
        _claim_stream_marker,
    )
    real = util.hadoop_fs
    sp = str(tmp_path / "state")

    class RaceFS:
        """Delegate to the real JVM fs, but land an interloper's
        marker between the claimant's temp write and its atomic
        publish — the widest race window that remains."""

        def __init__(self, fs, marker):
            self._fs, self._marker = fs, marker

        def __getattr__(self, name):
            return getattr(self._fs, name)

        def create(self, path, overwrite):
            out = self._fs.create(path, overwrite)
            if ".claim." in path.toString():
                w = self._fs.create(self._marker, True)
                w.write(bytearray(b"ck-INTERLOPER"))
                w.close()
            return out

    def patched(s, path):
        fs, jp = real(s, path)
        if path.endswith("/_STREAM"):
            return RaceFS(fs, jp), jp
        return fs, jp

    monkeypatch.setattr(util, "hadoop_fs", patched)
    with pytest.raises(ValueError, match="owned by stream"):
        _claim_stream_marker(spark, sp, "ck-A")
    monkeypatch.undo()
    # the marker holds the actual winner; the rightful owner proceeds
    _claim_stream_marker(spark, sp, "ck-INTERLOPER")
    with pytest.raises(ValueError, match="owned by stream"):
        _claim_stream_marker(spark, sp, "ck-A")
    # the loser's temp never lingers (leaked temps would shadow a
    # later claim attempt's own temp writes)
    leftovers = [p for p in (tmp_path / "state").iterdir()
                 if ".claim." in p.name]
    assert leftovers == []


def test_claim_stream_marker_clean_claim_and_link_content(
        spark, tmp_path):
    """The unraced path: first claim wins atomically, marker carries
    the claimant's exact id, the temp is removed, and a second
    claimant with a different id raises."""
    import pytest

    from serverless_data_pipeline_spark.operators.corpus import (
        _claim_stream_marker,
    )
    sp = str(tmp_path / "state2")
    (tmp_path / "state2").mkdir()
    _claim_stream_marker(spark, sp, "ck-OWNER")
    marker = tmp_path / "state2" / "_STREAM"
    assert marker.read_text() == "ck-OWNER"
    assert [p for p in (tmp_path / "state2").iterdir()
            if ".claim." in p.name] == []
    _claim_stream_marker(spark, sp, "ck-OWNER")   # idempotent
    with pytest.raises(ValueError, match="owned by stream"):
        _claim_stream_marker(spark, sp, "ck-B")
