"""Shared plumbing for the text-based OGR driver family (GML/GPX/MIF/BNA).

These formats are single-document (or header+body file pairs), so — like
the GeoJSON FeatureCollection path (sources/geojson.py:249-273, mirroring
the reference's driver-side fiona/pyogrio readers at io/file.py:50-146) —
the *container* is parsed driver-side into per-feature records, while the
geometry codec work runs distributed: readers emit GeoJSON geometry
strings and decode via ``st_geomfromgeojson`` (one Arrow-batched pass),
writers encode via ``st_asgeojson`` on the executors and only serialize
the container driver-side (row-capped, like every single-file sink).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def features_to_df(spark: SparkSession, geoms: list, attrs: list[dict],
                   order: list[str], geom: str = "geometry",
                   types: dict | None = None) -> DataFrame:
    """(GeoJSON geometry dicts, attribute dicts) -> DataFrame.

    ``geoms[i]`` is a GeoJSON geometry dict or None; ``attrs[i]`` maps
    column name -> raw value (string when the source is untyped text).
    ``order`` fixes column order; ``types`` optionally pins a column to
    ``long/double/boolean/string`` — unpinned string columns are
    inferred (all-parse-as-int -> long, all-parse-as-float -> double).
    Geometry decoding runs distributed via ``st_geomfromgeojson``.
    """
    import json

    from .geojson import st_geomfromgeojson

    types = dict(types or {})
    cols: dict[str, list] = {c: [a.get(c) for a in attrs] for c in order}
    for c in order:
        if c in types:
            continue
        vals = [v for v in cols[c] if v is not None]
        if vals and all(isinstance(v, str) for v in vals):
            try:
                [int(v) for v in vals]
                types[c] = "long"
            except ValueError:
                try:
                    [float(v) for v in vals]
                    types[c] = "double"
                except ValueError:
                    types[c] = "string"
        elif vals and all(isinstance(v, bool) for v in vals):
            types[c] = "boolean"
        elif vals and all(isinstance(v, int) for v in vals):
            types[c] = "long"
        elif vals and all(isinstance(v, (int, float)) for v in vals):
            types[c] = "double"
        else:
            types[c] = "string"

    _PY = {"long": int, "double": float, "boolean": bool, "string": str}
    _ST = {"long": T.LongType(), "double": T.DoubleType(),
           "boolean": T.BooleanType(), "string": T.StringType()}

    def conv(v, t):
        if v is None:
            return None
        if t == "boolean" and isinstance(v, str):
            return v.strip().upper() in ("T", "TRUE", "1", "Y", "YES")
        return _PY[t](v)

    rows = [
        tuple([json.dumps(g) if g is not None else None]
              + [conv(cols[c][i], types[c]) for c in order])
        for i, g in enumerate(geoms)
    ]
    schema = T.StructType(
        [T.StructField("__gj", T.StringType(), True)]
        + [T.StructField(c, _ST[types[c]], True) for c in order])
    raw = spark.createDataFrame(rows, schema=schema)
    return raw.select(st_geomfromgeojson("__gj").alias(geom), *order)


def collect_features(df: DataFrame, geom: str, writer: str,
                     alternative: str = "write_geojsonseq"):
    """Row-capped driver-side collect for single-file sinks: returns
    (property column names, rows with ``__gj`` GeoJSON geometry strings).
    The geometry encode runs on the executors (st_asgeojson)."""
    import json

    from .feather import _guard_single_file
    from .geojson import st_asgeojson

    _guard_single_file(df, writer, alternative)
    props = [c for c in df.columns if c != geom]
    rows = (df.select(st_asgeojson(geom).alias("__gj"), *props).collect())
    geoms = [json.loads(r["__gj"]) if r["__gj"] is not None else None
             for r in rows]
    return props, geoms, rows
