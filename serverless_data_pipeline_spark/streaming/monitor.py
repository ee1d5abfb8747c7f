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
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from serverless_data_pipeline_spark.operators.stages import (
    category_counts, mix_shift_from_counts, mix_shift_summarize,
)

__all__ = ["drift_monitor_batch", "start_drift_monitor_stream"]


def drift_monitor_batch(batch: DataFrame, epoch_id: int,
                        reference_counts: DataFrame, col: str,
                        out_path: str, *,
                        psi_threshold: float = 0.25,
                        eps: float = 1e-6) -> None:
    """One epoch of the monitor: reference (side A, given as its
    precomputed ``category_counts`` frame) vs this batch (side B) —
    deltas read as batch-relative-to-reference. Writes one row
    (n_rows, n_categories, n_cat_ref, n_cat_batch, n_added,
    n_removed, psi, js, tvd, drifted) to ``out_path/epoch=E`` with
    overwrite, so a replayed epoch overwrites itself; the epoch
    surfaces as a partition column on read (a duplicate data column
    would make the parent-path read ambiguous).

    ``n_rows`` (the batch row count) falls out of the SAME aggregation
    as the shift statistics — one batch scan per epoch, never a
    separate count() job. An EMPTY micro-batch (a tick with no new
    rows) is NOT a distribution shift: its row carries n_rows=0 with
    NULL psi/js/tvd and drifted=false — without the guard the eps
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
    (summ.write.mode("overwrite")
     .parquet(f"{out_path}/epoch={int(epoch_id)}"))


def start_drift_monitor_stream(stream: DataFrame, reference: DataFrame,
                               col: str, out_path: str,
                               checkpoint: str, *,
                               psi_threshold: float = 0.25,
                               eps: float = 1e-6,
                               reference_counts: DataFrame | None = None,
                               trigger: dict | None = None
                               ) -> StreamingQuery:
    """Attach the per-epoch drift monitor to a stream. ``reference``
    is a static frame holding the expected distribution of ``col``;
    its category counts are computed ONCE here and eagerly
    checkpointed, so no epoch ever rescans the reference corpus (see
    module docstring). Pass ``reference_counts`` — a persisted
    (category, n) histogram, e.g. from a corpus registry — to skip
    even that single scan (``reference`` is then ignored and may be
    None)."""
    if reference_counts is None:
        if reference is None:
            raise ValueError(
                "pass a reference corpus or a reference_counts "
                "(category, n) histogram")
        reference_counts = (category_counts(reference, col)
                            .localCheckpoint(eager=True))

    def _process(batch: DataFrame, epoch_id: int) -> None:
        drift_monitor_batch(batch, epoch_id, reference_counts, col,
                            out_path, psi_threshold=psi_threshold,
                            eps=eps)

    return (stream.writeStream.foreachBatch(_process)
            .option("checkpointLocation", checkpoint)
            .trigger(**(trigger or {"availableNow": True}))
            .start())
