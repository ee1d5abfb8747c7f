"""Z-order layout keys + bloom-filter write options (S10 extension)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from serverless_data_pipeline_spark.functions.layout import (
    quantize, zorder_key,
)
from serverless_data_pipeline_spark.sources.writers import write_clustered


def _morton_ref(x: int, y: int, bits: int) -> int:
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_zorder_key_matches_reference_interleave(spark):
    rows = [(3, 5), (0, 0), (15, 1), (7, 7), (1023, 511)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {(r.x, r.y): r.z for r in
           df.withColumn("z", zorder_key("x", "y", bits=10)).collect()}
    for x, y in rows:
        assert got[(x, y)] == _morton_ref(x, y, 10), (x, y)


def test_quantize_clamps_and_spans(spark):
    df = spark.createDataFrame([(v,) for v in (-5.0, 0.0, 50.0, 100.0, 500.0)],
                               "v double")
    got = [r.q for r in
           df.select(quantize("v", 0.0, 100.0, bits=8).alias("q")).collect()]
    assert got[0] == 0          # below lo clamps to 0
    assert got[1] == 0
    assert got[2] == 128        # midpoint ~ half of 255
    assert got[3] == 255
    assert got[4] == 255        # above hi clamps to max cell


def test_zorder_clustering_confines_both_dimensions(spark, tmp_path):
    """Files clustered on a Z-key must each cover a small sub-range of
    BOTH source dimensions — the property that makes footer min/max
    prune on either predicate. Plain single-key clustering confines only
    its own column."""
    import pyarrow.parquet as pq

    n = 1 << 12
    df = (spark.range(0, n)
          .withColumn("x", F.pmod(F.col("id") * 2654435761, F.lit(n)))
          .withColumn("y", F.pmod(F.col("id") * 40503, F.lit(n))))
    z = df.withColumn("__z", zorder_key(quantize("x", 0, n - 1, 10),
                                        quantize("y", 0, n - 1, 10),
                                        bits=10))
    path = str(tmp_path / "zclustered")
    write_clustered(z.drop("id"), path, ["__z"], n_files=16)

    spans = {"x": [], "y": []}
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        for ci in range(md.row_group(0).num_columns):
            col = md.row_group(0).column(ci)
            name = col.path_in_schema
            if name in spans:
                mins = [md.row_group(g).column(ci).statistics.min
                        for g in range(md.num_row_groups)]
                maxs = [md.row_group(g).column(ci).statistics.max
                        for g in range(md.num_row_groups)]
                spans[name].append((max(maxs) - min(mins)) / float(n))
    assert len(spans["x"]) >= 8
    # 16 z-files tile a 4x4 grid: each file spans ~1/4 of each dimension.
    for dim in ("x", "y"):
        avg = sum(spans[dim]) / len(spans[dim])
        assert avg <= 0.55, f"{dim} avg span {avg} — no multi-dim locality"


def test_bloom_filter_option_grows_file(spark, tmp_path):
    """No metadata API for blooms in this pyarrow; assert behaviorally:
    the bloom-enabled file must carry extra index bytes for the same
    rows, and stay readable with identical content."""
    df = spark.range(0, 20000).withColumn(
        "needle", F.col("id") * 7919)
    plain, bloomed = str(tmp_path / "plain"), str(tmp_path / "bloomed")
    write_clustered(df, plain, ["id"], n_files=1)
    write_clustered(df, bloomed, ["id"], n_files=1,
                    bloom_filter_cols=["needle"])
    size = {p: sum(os.path.getsize(f)
                   for f in glob.glob(os.path.join(p, "*.parquet")))
            for p in (plain, bloomed)}
    assert size[bloomed] > size[plain]
    assert (spark.read.parquet(bloomed).filter(F.col("needle") == 7919 * 5)
            .count() == 1)
