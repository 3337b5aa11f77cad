"""Dataset introspection: ``list_layers``.

Reference: ``geopandas.list_layers(path)`` (io/file.py:123, backed by
pyogrio) returns one row per layer with its name and geometry type. The
engine's storage formats are single-layer containers (GeoParquet file or
directory, Feather), so the listing derives from the ``geo`` metadata
blob each writer embeds: one row per geometry column, with the column
name as the layer name and the blob's ``geometry_types`` collapsed the
way pyogrio reports them (single type, "Unknown" when mixed/absent).
Pure metadata reads — no Spark job, no data scan.
"""

from __future__ import annotations

import json
import os


def _collapse_types(types: list[str] | None) -> str:
    if not types:
        return "Unknown"
    uniq = sorted(set(types))
    return uniq[0] if len(uniq) == 1 else "Unknown"


def _geo_blob(path: str) -> dict | None:
    side = os.path.join(path, "_geo_metadata.json")
    if os.path.isfile(side):
        with open(side) as f:
            return json.load(f)
    if os.path.isfile(path):
        if path.endswith((".feather", ".arrow")):
            import pyarrow.feather as feather

            md = feather.read_table(path).schema.metadata or {}
        else:
            import pyarrow.parquet as pq

            md = pq.read_schema(path).metadata or {}
        if b"geo" in md:
            return json.loads(md[b"geo"].decode())
    return None


def list_layers(path: str) -> list[tuple[str, str]]:
    """[(layer_name, geometry_type)] for the dataset at ``path``.

    GeoParquet file / directory+sidecar / Feather / GeoPackage /
    Shapefile. A container without a ``geo`` blob lists each binary
    column as a potential layer of Unknown type (mirrors pyogrio's
    Unknown for untyped sources).
    """
    if path.endswith(".gpkg"):
        from .gpkg import gpkg_layers

        up = {"POINT": "Point", "LINESTRING": "LineString",
              "POLYGON": "Polygon", "MULTIPOINT": "MultiPoint",
              "MULTILINESTRING": "MultiLineString",
              "MULTIPOLYGON": "MultiPolygon",
              "GEOMETRYCOLLECTION": "GeometryCollection"}
        return [(name, up.get(gtype.upper(), "Unknown"))
                for name, gtype in gpkg_layers(path)]
    if path.endswith(".gpx"):
        # the five fixed OGR GPX layers (sources/gpx.py)
        return [("waypoints", "Point"), ("routes", "LineString"),
                ("tracks", "MultiLineString"), ("route_points", "Point"),
                ("track_points", "Point")]
    if path.endswith(".shp"):
        import struct

        from .shapefile import (SHP_MULTIPOINT, SHP_MULTIPOINTZ, SHP_POINT,
                                SHP_POINTZ, SHP_POLYGON, SHP_POLYGONZ,
                                SHP_POLYLINE, SHP_POLYLINEZ)

        with open(path, "rb") as f:
            head = f.read(100)
        st = struct.unpack("<i", head[32:36])[0]
        name = os.path.splitext(os.path.basename(path))[0]
        tmap = {SHP_POINT: "Point", SHP_POINTZ: "Point",
                SHP_MULTIPOINT: "MultiPoint", SHP_MULTIPOINTZ: "MultiPoint",
                SHP_POLYLINE: "LineString", SHP_POLYLINEZ: "LineString",
                SHP_POLYGON: "Polygon", SHP_POLYGONZ: "Polygon"}
        return [(name, tmap.get(st, "Unknown"))]
    meta = _geo_blob(path)
    if meta is not None:
        cols = meta.get("columns", {})
        return [(name, _collapse_types(col.get("geometry_types")))
                for name, col in sorted(cols.items())]
    # no geo blob: fall back to schema inspection (binary columns)
    if os.path.isfile(path) and not path.endswith((".feather", ".arrow")):
        import pyarrow.parquet as pq

        schema = pq.read_schema(path)
        return [(f.name, "Unknown") for f in schema if f.type == "binary"]
    if os.path.isdir(path):
        import glob as _glob

        import pyarrow.parquet as pq

        parts = sorted(_glob.glob(os.path.join(path, "*.parquet")))
        if parts:
            schema = pq.read_schema(parts[0])
            return [(f.name, "Unknown") for f in schema if f.type == "binary"]
    return []
