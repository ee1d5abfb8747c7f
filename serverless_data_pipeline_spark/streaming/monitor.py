"""Streaming data-quality drift monitor (ST family × X17).

The production pattern behind the reference's CloudWatch data-quality
alarms, composed from the X17 drift kernel: every micro-batch's
categorical mix is compared against a STATIC reference corpus
(PSI / Jensen-Shannon / total variation) and ONE summary row per epoch
lands in the monitor sink, flagged when PSI crosses the promote/reject
threshold. A crawler whose language mix collapses, an event stream
whose type distribution shifts, a feed that suddenly drops a category
— all surface as a flagged epoch row while the batch is still in
flight, not in next week's corpus audit.

Scale shape (r9, verdict #2): the reference's category COUNTS are
constant across epochs, so they are computed ONCE —
``start_drift_monitor_stream`` aggregates the reference to its
|categories|-row ``category_counts`` frame at stream start and
eagerly localCheckpoints it; every epoch then runs
``mix_shift_from_counts`` (bit-identical to the corpus form,
pytest-pinned) against that frame, so the per-epoch cost is one BATCH
scan plus a |categories|-row merge — the reference corpus is never
rescanned (pinned by a test that deletes the reference's files after
stream start). Callers holding a persisted histogram (a corpus
registry) pass it directly as ``reference_counts``. Writes are
epoch-scoped overwrites (the ``redeliver_batch`` discipline), so
foreachBatch's at-least-once replay is idempotent.

Numeric drift (r10, verdict #2): ``numeric_cols`` watches numeric
columns the same way — the reference's ``profile_columns`` frame is
computed ONCE at stream start (or passed precomputed as
``reference_profile``), each epoch profiles the BATCH only and runs
``profile_drift_from_profiles`` (bit-identical to the corpus-form
``profile_drift``, pytest-pinned), and the summary row carries the
max-abs null-fraction/mean shifts plus a ``numeric_drifted`` flag
next to PSI.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from serverless_data_pipeline_spark.operators.stages import (
    category_counts, mix_shift_from_counts, mix_shift_summarize,
    profile_columns, profile_drift_from_profiles,
)

__all__ = ["drift_monitor_batch", "start_drift_monitor_stream",
           "liveness_alarm", "dlq_depth_alarm", "throughput_alarm"]


def drift_monitor_batch(batch: DataFrame, epoch_id: int,
                        reference_counts: DataFrame, col: str,
                        out_path: str, *,
                        psi_threshold: float = 0.25,
                        eps: float = 1e-6,
                        reference_profile: DataFrame | None = None,
                        numeric_cols: list[str] | None = None,
                        null_frac_delta_threshold: float = 0.05,
                        vavg_delta_threshold: float = 1.0) -> None:
    """One epoch of the monitor: reference (side A, given as its
    precomputed ``category_counts`` frame) vs this batch (side B) —
    deltas read as batch-relative-to-reference. Writes one row
    (n_rows, n_categories, n_cat_ref, n_cat_batch, n_added,
    n_removed, psi, js, tvd, drifted, max_abs_null_frac_delta,
    max_abs_vavg_delta, numeric_drifted) to ``out_path/epoch=E`` with
    overwrite, so a replayed epoch overwrites itself; the epoch
    surfaces as a partition column on read (a duplicate data column
    would make the parent-path read ambiguous).

    Numeric drift (r9 verdict #2): when ``numeric_cols`` is set,
    ``reference_profile`` (the reference's precomputed
    ``profile_columns`` frame over those columns — computed once at
    stream start, same discipline as the counts) is compared against
    this batch's profile via ``profile_drift_from_profiles``; the
    summary row gains the max absolute null-fraction and mean shifts
    across the watched columns plus the ``numeric_drifted`` flag
    (either max over its threshold). A mean creep or a null surge in
    a numeric feed column then pages in-flight, next to the
    categorical PSI. Without ``numeric_cols`` the three columns are
    written as NULL/false, keeping the sink schema stable.

    ``n_rows`` (the batch row count) falls out of the SAME aggregation
    as the shift statistics; the numeric profile adds ONE more
    single-scan aggregation over the micro-batch (never over the
    reference). An EMPTY micro-batch (a tick with no new rows) is NOT
    a distribution shift: its row carries n_rows=0 with NULL
    psi/js/tvd (and NULL numeric deltas — an empty profile has no
    mean) and both drift flags false — without the guard the eps
    clamp would inflate PSI to 'every category vanished' and page the
    mix alarm for a liveness condition (pair the monitor with a
    liveness alarm on n_rows if silence matters)."""
    has_rows = F.col("n_rows_b") > 0
    per = mix_shift_from_counts(reference_counts,
                                category_counts(batch, col), eps=eps)
    summ = (mix_shift_summarize(per)
            .select(F.col("n_rows_b").alias("n_rows"),
                    F.col("n_categories").cast("long"),
                    F.col("n_cat_a").cast("long").alias("n_cat_ref"),
                    F.col("n_cat_b").cast("long").alias("n_cat_batch"),
                    F.col("n_added").cast("long"),
                    F.col("n_removed").cast("long"),
                    *[F.when(has_rows, F.col(c)).alias(c)
                      for c in ("psi", "js", "tvd")],
                    (has_rows
                     & (F.col("psi") > F.lit(float(psi_threshold))))
                    .alias("drifted")))
    if numeric_cols:
        if reference_profile is None:
            raise ValueError(
                "numeric_cols needs a reference_profile (the "
                "reference's profile_columns frame over those "
                "columns)")
        # the profile join matches on COLUMN NAME — a reference
        # profile built over a renamed/different column set would
        # leave every delta NULL and silently disable the numeric
        # alarm forever (the decode-NULL failure class). The frame is
        # |columns| rows, so the guard is a tiny collect.
        refcols = {r[0]
                   for r in reference_profile.select("column").collect()}
        missing = [c for c in numeric_cols if c not in refcols]
        if missing:
            raise ValueError(
                f"reference_profile has no rows for numeric_cols "
                f"{missing} (it profiles {sorted(refcols)}) — the "
                "numeric alarm would never fire")
        # approx_distinct: the monitor consumes only null_frac/vavg
        # deltas, and the exact-distinct mode would plan an Expand
        # over EVERY micro-batch for a statistic nothing reads
        pd = profile_drift_from_profiles(
            reference_profile,
            profile_columns(batch, numeric_cols, approx_distinct=True))
        ndel = pd.agg(
            F.max(F.abs(F.col("null_frac_delta")))
             .alias("max_abs_null_frac_delta"),
            F.max(F.abs(F.col("vavg_delta")))
             .alias("max_abs_vavg_delta"))
        hb = F.col("n_rows") > 0
        summ = (summ.crossJoin(ndel)            # two one-row frames
                .withColumn(
                    "numeric_drifted",
                    hb & (F.coalesce(
                        F.col("max_abs_null_frac_delta")
                        > F.lit(float(null_frac_delta_threshold)),
                        F.lit(False))
                        | F.coalesce(
                            F.col("max_abs_vavg_delta")
                            > F.lit(float(vavg_delta_threshold)),
                            F.lit(False)))))
    else:
        summ = (summ
                .withColumn("max_abs_null_frac_delta",
                            F.lit(None).cast("double"))
                .withColumn("max_abs_vavg_delta",
                            F.lit(None).cast("double"))
                .withColumn("numeric_drifted", F.lit(False)))
    (summ.write.mode("overwrite")
     .parquet(f"{out_path}/epoch={int(epoch_id)}"))


def _tail_alarm(monitor: DataFrame, ok_pred, k: int,
                marker_col: str | None, tail_col: str,
                flag_col: str) -> DataFrame:
    """Shared skeleton of the two evaluation-period alarms: find the
    latest epoch satisfying ``ok_pred`` (the condition that RESETS the
    alarm), count the trailing epochs after it (every epoch when none
    ever satisfied it), flag when that tail reaches ``k``. The monitor
    sink is |epochs| rows, so the SUM OVER () marker window and the
    one-row aggregate are over a tiny frame by construction (the
    mix-kernel totals discipline)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    w = Window.partitionBy()
    marker = F.max(F.when(ok_pred, F.col("epoch"))).over(w)
    aggs = [F.count("*").cast("long").alias("n_epochs"),
            F.max("epoch").cast("long").alias("last_epoch")]
    if marker_col:
        aggs.append(F.max("__marker").cast("long").alias(marker_col))
    aggs.append(
        F.coalesce(
            F.sum(F.when(F.col("__marker").isNull()
                         | (F.col("epoch") > F.col("__marker")), 1)
                   .otherwise(0)),
            F.lit(0)).cast("long").alias(tail_col))
    return (monitor.withColumn("__marker", marker)
            .agg(*aggs)
            .withColumn(flag_col, F.col(tail_col) >= F.lit(int(k))))


def liveness_alarm(monitor: DataFrame, *, k: int = 3) -> DataFrame:
    """The drift monitor's LIVENESS companion (r9 verdict #6): the
    monitor deliberately reports an empty epoch as n_rows=0 /
    not-drifted (silence is not a distribution shift), so a feed that
    stops producing would never page the mix alarm — this is the other
    half of the reference's CloudWatch alarm pair (the DLQ-depth alarm
    analogue, py:552-562): flag when the stream has gone quiet.

    ``monitor`` is the monitor sink read back (one row per epoch with
    ``epoch`` and ``n_rows``). Returns ONE row:

    - ``n_epochs``, ``last_epoch``
    - ``last_live_epoch`` — the latest epoch that carried rows (NULL
      if none ever did)
    - ``empty_tail`` — how many epochs have elapsed since then (every
      epoch when nothing was ever live)
    - ``silent`` — ``empty_tail >= k``, the page condition

    An EMPTY monitor sink (no epochs at all) reports n_epochs=0 and
    silent=false — no epochs is "the monitor never ran", a deployment
    condition, not evidence the FEED died; alarm on the monitor's own
    freshness for that. Tiny-frame shape: see ``_tail_alarm``."""
    return _tail_alarm(monitor, F.col("n_rows") > 0, k,
                       "last_live_epoch", "empty_tail", "silent")


def dlq_depth_alarm(dlq: DataFrame, *, threshold: int = 1,
                    reason_col: str = "_error_reason") -> DataFrame:
    """The reference's DLQ-depth alarm (py:551-562: threshold 1 — ANY
    visible dead-letter message pages) over the engine's dead-letter /
    quarantine sinks. Returns ONE row: ``depth`` (row count),
    ``n_reasons`` and ``top_reason`` (the modal ``reason_col`` value —
    the first triage question; NULL when the column is absent or the
    queue is empty), and ``alarm`` = depth >= threshold.

    One aggregation over the DLQ table — which is small by the
    system's own success criteria; if the DLQ is corpus-sized the
    alarm is the least of the problems."""
    if threshold < 1:
        raise ValueError("threshold must be >= 1")
    if reason_col in dlq.columns:
        per = (dlq.groupBy(F.col(reason_col).alias("__r"))
               .agg(F.count(F.lit(1)).alias("__c")))
        top = (per.orderBy(F.desc("__c"), F.asc("__r")).limit(1)
               .select(F.col("__r").alias("top_reason"),
                       F.lit(1).alias("__j")))
        return (per.agg(F.coalesce(F.sum("__c"), F.lit(0))
                        .cast("long").alias("depth"),
                        F.count(F.lit(1)).cast("long")
                        .alias("n_reasons"))
                .withColumn("__j", F.lit(1))
                .join(top, "__j", "left").drop("__j")
                .withColumn("alarm",
                            F.col("depth") >= F.lit(int(threshold))))
    return (dlq.agg(F.count(F.lit(1)).cast("long").alias("depth"))
            .select("depth",
                    F.lit(0).cast("long").alias("n_reasons"),
                    F.lit(None).cast("string").alias("top_reason"),
                    (F.col("depth") >= F.lit(int(threshold)))
                    .alias("alarm")))


def throughput_alarm(monitor: DataFrame, *, threshold: int = 1000,
                     k: int = 2) -> DataFrame:
    """The reference's high-incoming-records alarm (py:565-575:
    threshold 1000 records, 2 evaluation periods) over the monitor
    sink — the HIGH-side sibling of ``liveness_alarm``: flag when the
    last ``k`` consecutive epochs each carried more than ``threshold``
    rows (a feed stuck in a replay loop, a scraper gone hot, an
    upstream fanout bug). Returns ONE row: ``n_epochs``,
    ``last_epoch``, ``hot_tail`` (trailing consecutive over-threshold
    epochs) and ``alarm`` = hot_tail >= k. Same tiny-frame shape as
    ``liveness_alarm`` (shared ``_tail_alarm`` skeleton: an alarm
    resets at the latest CALM epoch)."""
    if threshold < 0:
        raise ValueError("threshold must be >= 0")
    return _tail_alarm(monitor, F.col("n_rows") <= threshold, k,
                       None, "hot_tail", "alarm")


def start_drift_monitor_stream(stream: DataFrame, reference: DataFrame,
                               col: str, out_path: str,
                               checkpoint: str, *,
                               psi_threshold: float = 0.25,
                               eps: float = 1e-6,
                               reference_counts: DataFrame | None = None,
                               numeric_cols: list[str] | None = None,
                               reference_profile: DataFrame | None = None,
                               null_frac_delta_threshold: float = 0.05,
                               vavg_delta_threshold: float = 1.0,
                               trigger: dict | None = None
                               ) -> StreamingQuery:
    """Attach the per-epoch drift monitor to a stream. ``reference``
    is a static frame holding the expected distribution of ``col``;
    its category counts are computed ONCE here and eagerly
    checkpointed, so no epoch ever rescans the reference corpus (see
    module docstring). Pass ``reference_counts`` — a persisted
    (category, n) histogram, e.g. from a corpus registry — to skip
    even that single scan (``reference`` is then ignored and may be
    None unless ``numeric_cols`` needs it).

    ``numeric_cols`` (r9 verdict #2) additionally watches those
    numeric columns for null-fraction/mean drift: the reference's
    ``profile_columns`` frame is computed ONCE here (same eager-
    checkpoint discipline as the counts — the no-rescan pin covers
    both), or passed precomputed as ``reference_profile`` (a corpus
    registry's persisted per-version profile). Each epoch then adds
    max-abs deltas and a ``numeric_drifted`` flag to the summary row
    (see ``drift_monitor_batch``)."""
    if reference_counts is None:
        if reference is None:
            raise ValueError(
                "pass a reference corpus or a reference_counts "
                "(category, n) histogram")
        reference_counts = (category_counts(reference, col)
                            .localCheckpoint(eager=True))
    if numeric_cols and reference_profile is None:
        if reference is None:
            raise ValueError(
                "numeric_cols needs a reference corpus or a "
                "precomputed reference_profile")
        reference_profile = (profile_columns(reference,
                                             list(numeric_cols),
                                             approx_distinct=True)
                             .localCheckpoint(eager=True))

    def _process(batch: DataFrame, epoch_id: int) -> None:
        drift_monitor_batch(
            batch, epoch_id, reference_counts, col, out_path,
            psi_threshold=psi_threshold, eps=eps,
            reference_profile=reference_profile,
            numeric_cols=numeric_cols,
            null_frac_delta_threshold=null_frac_delta_threshold,
            vavg_delta_threshold=vavg_delta_threshold)

    return (stream.writeStream.foreachBatch(_process)
            .option("checkpointLocation", checkpoint)
            .trigger(**(trigger or {"availableNow": True}))
            .start())
