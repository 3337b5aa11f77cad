"""Streaming aggregations: watermarked tile counts and exact dedup.

Spark-first shapes for the two stream jobs a large ingest pipeline runs
continuously:

* ``tile_counts_stream`` — event-time windowed counts per quadtree tile
  (the streaming analogue of operators/tiles.to_tiles + groupBy). The
  watermark bounds state; late rows beyond it are dropped by Spark.
* ``dedup_stream`` — exact text dedup on a stream via
  ``dropDuplicatesWithinWatermark`` over the same normalize->xxhash64 key
  the batch operator uses (operators/dedup.exact_dedup), so batch and
  stream agree on what "identical" means. State is bounded by the
  watermark instead of growing with the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..index.cells import DOMAIN_UNIT


def tile_counts_stream(
    df: DataFrame,
    zoom: int = 8,
    geometry: str = "geometry",
    ts_col: str = "ts",
    window_duration: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    domain=DOMAIN_UNIT,
) -> DataFrame:
    """Counts per (event-time window, tile). Works on batch frames too
    (same plan minus the watermark), which is how the pytest oracle
    cross-checks it."""
    from ..functions.st import st_cell_point

    d = df.withColumn("__tile", st_cell_point(geometry, zoom, domain=domain))
    if d.isStreaming:
        d = d.withWatermark(ts_col, watermark)
    win = (F.window(F.col(ts_col), window_duration, slide)
           if slide else F.window(F.col(ts_col), window_duration))
    return (
        d.groupBy(win.alias("win"), F.col("__tile").alias("tile"))
        .agg(F.count("*").alias("n"))
        .select(F.col("win.start").alias("win_start"),
                F.col("win.end").alias("win_end"), "tile", "n")
    )


def dedup_stream(
    df: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
    normalize: bool = True,
) -> DataFrame:
    """Keep the first occurrence of each (normalized) text on a stream.

    Uses ``dropDuplicatesWithinWatermark`` so the dedup state is evicted
    once the watermark passes — the only way exact dedup stays bounded on
    an unbounded stream. Batch frames fall back to plain dropDuplicates
    (same key), keeping the operator testable both ways.
    """
    t = F.col(text_col)
    if normalize:
        t = F.lower(F.regexp_replace(t, r"\s+", " "))
    keyed = df.withColumn("__tkey", F.xxhash64(t))
    if keyed.isStreaming:
        out = keyed.withWatermark(ts_col, watermark) \
                   .dropDuplicatesWithinWatermark(["__tkey"])
    else:
        out = keyed.dropDuplicates(["__tkey"])
    return out.drop("__tkey")
