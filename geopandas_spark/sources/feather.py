"""Feather (Arrow IPC) read/write — reference read_feather/to_feather
(io/arrow.py:367/:223).

Dev-scale by design, like the reference's pandas-backed path: the table
flows through the driver as one Arrow IPC file with the same ``geo``
metadata blob GeoParquet uses. Distributed I/O belongs to
sources/geoparquet.py.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession


def write_feather(df: DataFrame, path: str, geom: str = "geometry",
                  crs: str | None = None) -> dict:
    import pyarrow as pa
    import pyarrow.feather as feather

    from .geoparquet import geo_metadata

    meta = geo_metadata(df, geom, crs)
    table = pa.Table.from_pandas(df.toPandas(), preserve_index=False)
    existing = table.schema.metadata or {}
    table = table.replace_schema_metadata(
        {**existing, b"geo": json.dumps(meta).encode()})
    feather.write_feather(table, path)
    return meta


def read_feather(spark: SparkSession, path: str):
    """-> (DataFrame, geo_metadata | None)."""
    import pyarrow.feather as feather

    table = feather.read_table(path)
    md = table.schema.metadata or {}
    meta = json.loads(md[b"geo"].decode()) if b"geo" in md else None
    return spark.createDataFrame(table.to_pandas()), meta
