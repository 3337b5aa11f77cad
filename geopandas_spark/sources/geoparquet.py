"""GeoParquet read/write with `geo` file metadata parity.

Reference: ``to_parquet``/``read_parquet`` (io/arrow.py:179/:296) and the
``geo`` metadata blob (io/arrow.py:60-112): version, primary_column and
per-column encoding / geometry_types / crs / bbox. Spark's parquet writer
cannot attach custom file-level metadata, so the engine follows the
reference split:

* ``write_geoparquet(df, path)`` — distributed ``df.write.parquet`` for
  the data (optionally with a covering ``bbox`` struct column — the §4
  pruning backbone) plus a ``_geo_metadata.json`` sidecar carrying the
  exact ``geo`` blob; ``write_geoparquet_file`` writes a single
  pyarrow-backed .parquet with the blob embedded in the file metadata
  (interchange with other GeoParquet readers, dev-scale).
* ``read_geoparquet(spark, path)`` — reads either layout; returns
  (DataFrame, geo_metadata).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

GEO_VERSION = "1.1.0"


def _geometry_types(df: DataFrame, geom: str) -> list[str]:
    from ..functions.st import st_geometry_type

    # Full-column distinct (a tiny aggregate): the `geo` blob must list
    # EXACT types present (io/arrow.py:60-112) — a sampled list could
    # mislead readers that trust it (ADVICE fix: no limit() here).
    rows = (
        df.select(st_geometry_type(geom).alias("t"))
        .distinct().collect()
    )
    return sorted(r["t"] for r in rows if r["t"] is not None)


def geo_metadata(df: DataFrame, geom: str = "geometry",
                 crs: str | None = None,
                 with_bbox_stats: bool = True) -> dict:
    """The ``geo`` blob (io/arrow.py:60-112)."""
    col: dict = {"encoding": "WKB",
                 "geometry_types": _geometry_types(df, geom)}
    if crs is not None:
        col["crs"] = crs
    if with_bbox_stats:
        from ..functions.st import st_bounds

        r = df.select(st_bounds(geom).alias("b")).agg(
            F.min("b.minx"), F.min("b.miny"), F.max("b.maxx"), F.max("b.maxy")
        ).collect()[0]
        if r[0] is not None:
            col["bbox"] = [float(v) for v in r]
    return {"version": GEO_VERSION, "primary_column": geom,
            "columns": {geom: col}}


def write_geoparquet(df: DataFrame, path: str, geom: str = "geometry",
                     crs: str | None = None, covering_bbox: bool = True,
                     mode: str = "overwrite") -> dict:
    """Distributed GeoParquet-style write: data as parquet (+ covering
    bbox struct column for row-group/partition pruning) and the ``geo``
    blob as a sidecar."""
    from ..functions.st import st_bounds

    out = df
    meta = geo_metadata(df, geom, crs)
    if covering_bbox:
        out = out.withColumn("bbox", st_bounds(geom))
        meta["columns"][geom]["covering"] = {
            "bbox": {"xmin": ["bbox", "minx"], "ymin": ["bbox", "miny"],
                     "xmax": ["bbox", "maxx"], "ymax": ["bbox", "maxy"]}}
    out.write.mode(mode).parquet(path)
    with open(os.path.join(path, "_geo_metadata.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return meta


def write_geoparquet_file(df: DataFrame, path: str, geom: str = "geometry",
                          crs: str | None = None) -> dict:
    """Single-file pyarrow write with the ``geo`` blob embedded in the
    parquet file metadata (full interchange parity; dev-scale — collects
    to the driver like the reference's pandas-based writer; row-capped,
    use write_geoparquet for datasets)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from .feather import _guard_single_file

    _guard_single_file(df, "write_geoparquet_file", "write_geoparquet")
    meta = geo_metadata(df, geom, crs)
    pdf = df.toPandas()
    table = pa.Table.from_pandas(pdf)
    existing = table.schema.metadata or {}
    table = table.replace_schema_metadata(
        {**existing, b"geo": json.dumps(meta).encode()})
    pq.write_table(table, path)
    return meta


def read_geoparquet(spark: SparkSession, path: str):
    """-> (DataFrame, geo_metadata | None). Reads both layouts."""
    meta = None
    side = os.path.join(path, "_geo_metadata.json")
    if os.path.isfile(side):
        with open(side) as f:
            meta = json.load(f)
    elif os.path.isfile(path):
        import pyarrow.parquet as pq

        md = pq.read_schema(path).metadata or {}
        if b"geo" in md:
            meta = json.loads(md[b"geo"].decode())
    df = spark.read.parquet(path)
    return df, meta


def bbox_filter(df: DataFrame, minx: float, miny: float, maxx: float,
                maxy: float) -> DataFrame:
    """Pure-SQL bbox predicate on the covering bbox column — Catalyst
    pushes it to parquet row-group stats (read_parquet bbox semantics,
    io/arrow.py:341-344)."""
    return df.filter(
        (F.col("bbox.minx") <= maxx) & (F.col("bbox.maxx") >= minx)
        & (F.col("bbox.miny") <= maxy) & (F.col("bbox.maxy") >= miny)
    )


def write_geoparquet_partitioned(df: DataFrame, path: str,
                                 geom: str = "geometry",
                                 crs: str | None = None,
                                 cell_res: int = 4,
                                 mode: str = "overwrite") -> dict:
    """Spatially-bucketed GeoParquet: rows land in one directory per
    coarse quadtree cell (partition column ``cell`` = the point cell of
    the bbox center at ``cell_res``), plus the covering bbox struct.

    The 100 TB read path this buys: a bbox query prunes whole
    DIRECTORIES via Catalyst partition pruning (``cell IN (...cover...)``
    is a partition-column predicate — no file listing, no footer reads
    for pruned cells), then row groups via the bbox column stats, then
    rows via the bbox predicate. ``cell_res`` 4-8 gives 256-65k buckets;
    pick so each bucket holds >= a few parquet files at target scale."""
    from ..functions.st import st_bounds

    out = df.withColumn("bbox", st_bounds(geom))

    @pandas_udf("long")
    def _cell(mnx: pd.Series, mny: pd.Series, mxx: pd.Series,
              mxy: pd.Series) -> pd.Series:
        from ..index import cells as C

        cx = (mnx.to_numpy(np.float64) + mxx.to_numpy(np.float64)) / 2
        cy = (mny.to_numpy(np.float64) + mxy.to_numpy(np.float64)) / 2
        miss = np.isnan(cx)
        ids = C.point_cell(np.nan_to_num(cx), np.nan_to_num(cy), cell_res)
        return pd.Series(np.where(miss, None, ids))

    out = out.withColumn("cell", _cell("bbox.minx", "bbox.miny",
                                       "bbox.maxx", "bbox.maxy"))
    meta = geo_metadata(df, geom, crs)
    meta["columns"][geom]["covering"] = {
        "bbox": {"xmin": ["bbox", "minx"], "ymin": ["bbox", "miny"],
                 "xmax": ["bbox", "maxx"], "ymax": ["bbox", "maxy"]}}
    # Max feature half-extent: rows are bucketed by their bbox CENTER's
    # cell, so a feature straddling a cell boundary lives in a partition
    # the query cover alone would prune. Any feature intersecting a query
    # bbox has its center within max_half_extent of that bbox, so the
    # reader expands the query by this before computing the cover — exact
    # pruning for non-point data (ADVICE r2 fix).
    ext = out.agg(
        F.max(F.greatest(F.col("bbox.maxx") - F.col("bbox.minx"),
                         F.col("bbox.maxy") - F.col("bbox.miny")) / 2
              ).alias("h")).collect()[0]["h"]
    meta["partitioning"] = {"column": "cell", "scheme": "quadtree-point",
                            "resolution": cell_res,
                            "max_half_extent": float(ext or 0.0)}
    out.write.mode(mode).partitionBy("cell").parquet(path)
    with open(os.path.join(path, "_geo_metadata.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return meta


def read_geoparquet_bbox(spark: SparkSession, path: str,
                         minx: float, miny: float,
                         maxx: float, maxy: float):
    """Partition-pruned bbox read of a write_geoparquet_partitioned
    dataset: cell IN (cover cells of the query bbox at the stored
    resolution) -> Catalyst prunes directories; the bbox-column
    predicate then prunes row groups and rows. Falls back to a plain
    bbox_filter when the dataset is not cell-partitioned."""
    df, meta = read_geoparquet(spark, path)
    part = (meta or {}).get("partitioning")
    if part and part.get("column") == "cell":
        h = part.get("max_half_extent")
        if h is None:
            # old dataset without the extent stat: pruning by the query
            # cover alone would silently drop boundary-straddling
            # features, so skip partition pruning (bbox_filter is exact)
            return bbox_filter(df, minx, miny, maxx, maxy)
        from ..index import cells as C

        res = int(part["resolution"])
        h = float(h)
        # expand by the dataset's max feature half-extent: every feature
        # intersecting the query bbox has its bbox center (= its
        # partition cell) inside the expanded bbox
        flat, off = C.bbox_cover(np.array([minx - h]), np.array([miny - h]),
                                 np.array([maxx + h]), np.array([maxy + h]),
                                 res)
        cover = [int(v) for v in flat[off[0]:off[1]]]
        df = df.filter(F.col("cell").isin(cover))
    return bbox_filter(df, minx, miny, maxx, maxy)
