"""GeoJSON geometry/feature interchange.

Reference surface: ``GeoDataFrame.from_features`` (geodataframe.py:416),
``iterfeatures``/``to_geo_dict`` (:638/:706), ``GeoSeries.to_json`` /
``__geo_interface__`` (geoseries.py:475). Here: column-level conversions
WKB <-> GeoJSON geometry strings plus DataFrame helpers for feature
collections; all Arrow-batched.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..geom.ragged import (
    GEOMETRYCOLLECTION,
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    GeometryBatch,
    GeometryBatchBuilder,
)

_T2NAME = {POINT: "Point", LINESTRING: "LineString", POLYGON: "Polygon",
           MULTIPOINT: "MultiPoint", MULTILINESTRING: "MultiLineString",
           MULTIPOLYGON: "MultiPolygon"}
_NAME2T = {v: k for k, v in _T2NAME.items()}


def geojson_geometry(b: GeometryBatch, g: int) -> dict | None:
    """Geometry g -> GeoJSON geometry dict (3-element positions when the
    row carries Z — RFC 7946 §3.1.1 allows a third ordinate)."""
    t = int(b.types[g])
    if t == 0:
        return None
    hz = (b.zs is not None and b.geom_has_z is not None
          and bool(b.geom_has_z[g]))

    def part_coords(p):
        rings = b.part_rings(p)
        if hz:
            r0, r1 = b.part_ring_off[p], b.part_ring_off[p + 1]
            zs = [b.zs[b.ring_coord_off[r]:b.ring_coord_off[r + 1]]
                  for r in range(r0, r1)]
            rings = [np.column_stack([r, z]) for r, z in zip(rings, zs)]
        pt = int(b.part_types[p])
        if pt == POINT:
            return list(rings[0][0]) if rings and len(rings[0]) else []
        if pt == LINESTRING:
            return [list(c) for c in rings[0]] if rings else []
        return [[list(c) for c in ring] for ring in rings]

    parts = list(range(b.geom_part_off[g], b.geom_part_off[g + 1]))
    if t in (POINT, LINESTRING, POLYGON):
        coords = part_coords(parts[0]) if parts else []
        return {"type": _T2NAME[t], "coordinates": coords}
    if t in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON):
        return {"type": _T2NAME[t],
                "coordinates": [part_coords(p) for p in parts]}
    # GeometryCollection
    geoms = []
    for p in parts:
        pt = int(b.part_types[p])
        geoms.append({"type": _T2NAME[pt], "coordinates": part_coords(p)})
    return {"type": "GeometryCollection", "geometries": geoms}


def _add_geojson(bld: GeometryBatchBuilder, obj: dict) -> None:
    t = obj.get("type")
    c = obj.get("coordinates")

    def has_z_pos(positions) -> bool:
        return any(len(p) > 2 for p in positions)

    def ring_arr(ring):
        return np.array([[p[0], p[1]] for p in ring], dtype=np.float64)

    def ring_zarr(ring):
        return np.array([p[2] if len(p) > 2 else np.nan for p in ring],
                        dtype=np.float64)

    def deep_has_z(coords, depth):
        if depth == 0:
            return has_z_pos(coords)
        return any(deep_has_z(x, depth - 1) for x in coords)

    if t == "Point":
        if not c:
            bld.add(POINT, [(POINT, [])])
        elif len(c) > 2:
            bld.add(POINT, [(POINT, [np.array([[c[0], c[1]]])])],
                    [[np.array([c[2]], dtype=np.float64)]])
        else:
            bld.add(POINT, [(POINT, [np.array([[c[0], c[1]]])])])
    elif t == "LineString":
        if c and has_z_pos(c):
            bld.add(LINESTRING, [(LINESTRING, [ring_arr(c)])],
                    [[ring_zarr(c)]])
        else:
            bld.add(LINESTRING, [(LINESTRING, [ring_arr(c)] if c else [])])
    elif t == "Polygon":
        if deep_has_z(c, 1):
            bld.add(POLYGON, [(POLYGON, [ring_arr(r) for r in c])],
                    [[ring_zarr(r) for r in c]])
        else:
            bld.add(POLYGON, [(POLYGON, [ring_arr(r) for r in c])])
    elif t == "MultiPoint":
        parts = [(POINT, [np.array([[p[0], p[1]]])]) for p in c]
        if has_z_pos(c):
            bld.add(MULTIPOINT, parts,
                    [[np.array([p[2] if len(p) > 2 else np.nan],
                               dtype=np.float64)] for p in c])
        else:
            bld.add(MULTIPOINT, parts)
    elif t == "MultiLineString":
        parts = [(LINESTRING, [ring_arr(ln)]) for ln in c]
        if deep_has_z(c, 1):
            bld.add(MULTILINESTRING, parts, [[ring_zarr(ln)] for ln in c])
        else:
            bld.add(MULTILINESTRING, parts)
    elif t == "MultiPolygon":
        parts = [(POLYGON, [ring_arr(r) for r in poly]) for poly in c]
        if deep_has_z(c, 2):
            bld.add(MULTIPOLYGON, parts,
                    [[ring_zarr(r) for r in poly] for poly in c])
        else:
            bld.add(MULTIPOLYGON, parts)
    elif t == "GeometryCollection":
        parts = []
        zparts = []
        any_z = False
        for sub in obj.get("geometries", []):
            st = sub.get("type")
            sc = sub.get("coordinates")
            if st == "Point":
                parts.append((POINT, [np.array([[sc[0], sc[1]]])]))
                zp = ([np.array([sc[2]], dtype=np.float64)]
                      if len(sc) > 2 else None)
            elif st == "LineString":
                parts.append((LINESTRING, [ring_arr(sc)]))
                zp = [ring_zarr(sc)] if has_z_pos(sc) else None
            elif st == "Polygon":
                parts.append((POLYGON, [ring_arr(r) for r in sc]))
                zp = ([ring_zarr(r) for r in sc]
                      if deep_has_z(sc, 1) else None)
            else:
                continue
            zparts.append(zp)
            any_z = any_z or zp is not None
        if any_z:
            zparts = [zp if zp is not None
                      else [np.full(len(r), np.nan) for r in rings]
                      for (zp, (_pt, rings)) in zip(zparts, parts)]
            bld.add(GEOMETRYCOLLECTION, parts, zparts)
        else:
            bld.add(GEOMETRYCOLLECTION, parts)
    else:
        bld.add_missing()


def st_asgeojson(geom) -> F.Column:
    """WKB -> GeoJSON geometry string (geoseries.py:475)."""

    @pandas_udf("string")
    def _f(s: pd.Series) -> pd.Series:
        from ..geom.wkb import from_wkb

        b = from_wkb(s)
        return pd.Series([
            json.dumps(geojson_geometry(b, g)) if b.types[g] != 0 else None
            for g in range(len(b))
        ])

    return _f(F.col(geom) if isinstance(geom, str) else geom)


def st_geomfromgeojson(js) -> F.Column:
    """GeoJSON geometry string -> WKB."""

    @pandas_udf("binary")
    def _f(s: pd.Series) -> pd.Series:
        from ..geom.wkb import to_wkb

        bld = GeometryBatchBuilder()
        for v in s:
            if v is None:
                bld.add_missing()
            else:
                _add_geojson(bld, json.loads(v))
        return pd.Series(list(to_wkb(bld.finish())))

    return _f(F.col(js) if isinstance(js, str) else js)


def to_features(df: DataFrame, geom: str = "geometry") -> DataFrame:
    """One GeoJSON Feature string per row (iterfeatures,
    geodataframe.py:638) — properties = all non-geometry columns."""
    props = [c for c in df.columns if c != geom]
    prop_struct = F.to_json(F.struct(*[F.col(c) for c in props]))
    return df.select(
        F.concat(
            F.lit('{"type": "Feature", "geometry": '),
            F.coalesce(st_asgeojson(geom), F.lit("null")),
            F.lit(', "properties": '),
            prop_struct,
            F.lit("}"),
        ).alias("feature")
    )


def from_features(df: DataFrame, feature_col: str = "feature",
                  geom: str = "geometry") -> DataFrame:
    """Feature strings -> DataFrame with WKB geometry + properties as a
    JSON string column (from_features, geodataframe.py:416)."""
    g = F.get_json_object(F.col(feature_col), "$.geometry")
    p = F.get_json_object(F.col(feature_col), "$.properties")
    return df.select(
        st_geomfromgeojson(g).alias(geom),
        p.alias("properties"),
    )


def write_geojsonseq(df: DataFrame, path: str, geom: str = "geometry",
                     mode: str = "overwrite") -> None:
    """Distributed newline-delimited GeoJSON (to_file driver='GeoJSONSeq',
    io/file.py:583): one Feature per line, written by the executors as a
    text dataset — the only OGR format that needs no GDAL and scales to
    any size (each partition streams its own lines)."""
    to_features(df, geom).write.mode(mode).text(path)


def read_geojsonseq(spark, path: str, geom: str = "geometry") -> DataFrame:
    """GeoJSONSeq dataset/file -> DataFrame (WKB geometry + properties
    JSON string)."""
    lines = spark.read.text(path)
    return from_features(
        lines.filter(F.length(F.trim("value")) > 0)
        .withColumnRenamed("value", "feature"), "feature", geom)


def write_geojson_file(df: DataFrame, path: str,
                       geom: str = "geometry") -> None:
    """Single FeatureCollection .geojson file (to_file driver='GeoJSON').
    Collects to the driver like the reference's fiona writer — dev-scale
    and row-capped; use write_geojsonseq for datasets (distributed, one
    text part per partition)."""
    from .feather import _guard_single_file

    _guard_single_file(df, "write_geojson_file", "write_geojsonseq")
    feats = [r["feature"] for r in to_features(df, geom).collect()]
    with open(path, "w") as f:
        f.write('{"type": "FeatureCollection", "features": [\n')
        f.write(",\n".join(feats))
        f.write("\n]}\n")


def read_geojson_file(spark, path: str, geom: str = "geometry") -> DataFrame:
    """FeatureCollection .geojson file -> DataFrame."""
    import pandas as _pd

    with open(path) as f:
        fc = json.load(f)
    feats = [json.dumps(ft) for ft in fc.get("features", [])]
    df = spark.createDataFrame(_pd.DataFrame({"feature": feats}))
    return from_features(df, "feature", geom)
