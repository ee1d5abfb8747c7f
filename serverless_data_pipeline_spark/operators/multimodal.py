"""Multimodal columns (charter extension X6).

Image/audio/video payloads ride through the engine as opaque BINARY
columns with a typed metadata struct, exactly like text/vector columns ride
in ordinary DataFrames. The Spark-side plumbing here — schema, batch
iteration, partition-size discipline — is real and tested; the actual
media decoding is STUBBED (image/audio libraries are not in this
container): `decode_stub=True` produces a deterministic fake feature
vector, `decode_stub=False` raises NotImplementedError where a real
decoder (PIL/ffmpeg) would be called.

Scale notes: binary payloads dominate row size, so the operators keep
metadata-only projections separate from payload scans (column pruning
skips the bytes entirely when only metadata is selected), and
`mapInPandas` streams Arrow batches — payload bytes never concentrate on
the driver.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("source", T.StringType()),
    ])),
])

FEATURE_DIM = 8


def attach_binary_payload(df: DataFrame, id_col: str, text_col: str,
                          source_col: str, mime: str = "application/octet-stream") -> DataFrame:
    """Build a multimodal table from any source column by treating its
    UTF-8 bytes as the opaque payload (the fixtures have no real media;
    the column TYPE and flow are what is under test)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.length(payload).cast("long").alias("n_bytes"),
            F.col(source_col).alias("source"),
        ).alias("meta"))


def media_metadata_stats(media: DataFrame) -> DataFrame:
    """Metadata-only aggregate — MUST NOT read payload bytes (verify with
    .explain: ReadSchema excludes `payload`)."""
    return (media.groupBy(F.col("meta.mime").alias("mime"),
                          F.col("meta.source").alias("source"))
            .agg(F.count("*").alias("n_items"),
                 F.sum("meta.n_bytes").alias("total_bytes"),
                 F.round(F.avg("meta.n_bytes"), 4).alias("avg_bytes")))


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode + feature-extract over Arrow batches (mapInPandas).

    Real implementation would decode the payload (image resize / audio
    frame-sample) and run a featurizer. STUB: a deterministic 8-dim
    feature from payload byte statistics — stable across runs/partitions
    so tests can assert on it."""

    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ])

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decoding requires PIL/ffmpeg — not in this "
                    "container; run with decode_stub=True")
            feats, sizes = [], []
            for buf in pdf["payload"]:
                b = bytes(buf)
                sizes.append(len(b))
                # deterministic fake featurizer: byte-bucket histogram.
                # numpy bincount, not a per-byte Python loop (~100x) —
                # same values: np.round is banker's like Python round().
                arr = np.frombuffer(b, dtype=np.uint8)
                hist = np.bincount(arr % FEATURE_DIM,
                                   minlength=FEATURE_DIM).astype(np.float64)
                total = float(len(b)) or 1.0
                feats.append(np.round(hist / total, 6).tolist())
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "n_bytes": sizes, "features": feats})

    from serverless_data_pipeline_spark.operators.util import spread_small_input
    return spread_small_input(media).mapInPandas(_batches, out_schema)


def frame_sample(media: DataFrame, every_n_bytes: int = 64,
                 decode_stub: bool = True) -> DataFrame:
    """Video-style frame sampling stub: emit one row per sampled 'frame'
    (payload offset). Real impl would seek keyframes via ffmpeg; the stub
    samples byte offsets deterministically — the row-explosion shape (one
    media row -> many frame rows) is the part that matters for planning."""
    if not decode_stub:
        raise NotImplementedError("real frame sampling requires ffmpeg")
    n_frames = F.greatest(
        (F.col("meta.n_bytes") / every_n_bytes).cast("long"), F.lit(1))
    return (media.select(
        "media_id", "meta",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"))
        .withColumn("byte_offset", F.col("frame_idx") * every_n_bytes))


def multimodal_join(documents: DataFrame, embeddings: DataFrame) -> DataFrame:
    """X6 — text + vector columns side-by-side: documents ⋈ embeddings on
    the shared id space. Equi-join; broadcast chosen by Catalyst/AQE by
    size."""
    return documents.join(
        embeddings, documents["doc_id"] == embeddings["vec_id"], "inner")
