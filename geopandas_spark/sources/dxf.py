"""DXF driver — AutoCAD's ASCII interchange format, stdlib parse.

Reference: io/file.py:28-34 maps ``.dxf`` to the OGR ``DXF`` driver.
DXF is a flat stream of (group-code, value) line pairs; the ENTITIES
section holds the features. Supported entities: POINT, LINE,
LWPOLYLINE (closed flag honored by closing the ring), POLYLINE/VERTEX/
SEQEND, and 3DFACE (-> closed ring). Curve/text entities (CIRCLE, ARC,
ELLIPSE, SPLINE, TEXT, MTEXT, INSERT, HATCH) need tessellation or block
expansion the engine does not model and raise naming the entity, the
same honest boundary as the MIF ARC record. Attributes follow OGR's
DXF feature model: ``Layer`` (code 8) and ``EntityHandle`` (code 5).

Like the other single-document drivers (sources/featuretable.py) the
container parses driver-side and geometry decode/encode runs
distributed through the GeoJSON codecs. The writer emits a minimal
ENTITIES-only document (OGR reads those) with POINT / LWPOLYLINE
entities; polygons write one closed LWPOLYLINE per ring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_UNSUPPORTED_ENTITIES = {
    "CIRCLE", "ARC", "ELLIPSE", "SPLINE", "TEXT", "MTEXT", "INSERT",
    "HATCH", "DIMENSION", "LEADER", "MLINE", "SOLID",
}


def _pairs(path: str):
    """DXF stream -> list of (int group code, str value)."""
    out = []
    with open(path) as f:
        lines = [ln.rstrip("\r\n") for ln in f]
    for i in range(0, len(lines) - 1, 2):
        code = lines[i].strip()
        if code == "":
            continue
        out.append((int(code), lines[i + 1].strip()))
    return out


def _entity_geojson(name: str, codes: list[tuple[int, str]]):
    """One entity's (code, value) run -> GeoJSON geometry dict."""
    def fs(c, default=None):
        for k, v in codes:
            if k == c:
                return float(v)
        return default

    if name == "POINT":
        z = fs(30)
        pt = [fs(10), fs(20)] + ([z] if z not in (None, 0.0) else [])
        return {"type": "Point", "coordinates": pt}
    if name == "LINE":
        z1, z2 = fs(30, 0.0), fs(31, 0.0)
        has_z = z1 != 0.0 or z2 != 0.0
        a = [fs(10), fs(20)] + ([z1] if has_z else [])
        b = [fs(11), fs(21)] + ([z2] if has_z else [])
        return {"type": "LineString", "coordinates": [a, b]}
    if name == "LWPOLYLINE":
        pts: list = []
        x = None
        closed = False
        for k, v in codes:
            if k == 10:
                x = float(v)
            elif k == 20:
                pts.append([x, float(v)])
            elif k == 70:
                closed = bool(int(v) & 1)
            elif k == 42 and float(v) != 0.0:
                # bulge = circular-arc segment; flattening it silently
                # would be wrong geometry, the same boundary as ARC
                raise NotImplementedError(
                    "DXF entity 'LWPOLYLINE' with a non-zero bulge "
                    "(group 42) needs arc tessellation the engine does "
                    "not provide")
        if closed and pts and pts[0] != pts[-1]:
            pts.append(list(pts[0]))
        return {"type": "LineString", "coordinates": pts}
    if name == "3DFACE":
        # like LINE: one has_z flag for the whole entity — per-vertex
        # mixed 2D/3D positions would NaN-fill the z of z=0 corners
        corners = []
        for base in (0, 1, 2, 3):
            x, y = fs(10 + base), fs(20 + base)
            if x is None or y is None:
                continue
            corners.append((x, y, fs(30 + base, 0.0)))
        has_z = any(z != 0.0 for _x, _y, z in corners)
        pts = [[x, y] + ([z] if has_z else []) for x, y, z in corners]
        if len(pts) >= 2 and pts[0] != pts[-1]:
            pts.append(list(pts[0]))
        return {"type": "LineString", "coordinates": pts}
    raise NotImplementedError(
        f"DXF entity {name!r} needs curve tessellation / block expansion "
        "the engine does not provide")


def read_dxf(spark: SparkSession, path: str, geom: str = "geometry",
             on_unsupported: str = "raise") -> DataFrame:
    """``.dxf`` ENTITIES -> DataFrame (WKB geometry + Layer /
    EntityHandle string columns, the OGR DXF feature model).

    ``on_unsupported='skip'`` drops curve/text/block entities instead of
    raising — real CAD files are full of TEXT/INSERT, so the honest
    default refusal is opt-out per call."""
    if on_unsupported not in ("raise", "skip"):
        raise ValueError("on_unsupported must be 'raise' or 'skip'")
    stream = _pairs(path)
    # find the ENTITIES section
    ents: list[tuple[str, list]] = []
    in_entities = False
    cur_name = None
    cur: list = []
    vertices: list = []          # POLYLINE ... VERTEX* ... SEQEND
    in_polyline = False
    poly_codes: list = []
    for k, v in stream:
        if k == 0 and v == "SECTION":
            cur_name = None
            continue
        if k == 2 and not in_entities:
            in_entities = v == "ENTITIES"
            continue
        if not in_entities:
            continue
        if k == 0:
            if v == "ENDSEC":
                break
            if in_polyline:
                if v == "VERTEX":
                    vertices.append([])
                    cur = vertices[-1]
                    continue
                if v == "SEQEND":
                    ents.append(("__POLYLINE", [poly_codes, vertices]))
                    in_polyline = False
                    cur_name, cur = None, []
                    continue
            if cur_name:
                ents.append((cur_name, cur))
            if v == "POLYLINE":
                in_polyline = True
                poly_codes = []
                vertices = []
                cur = poly_codes
                cur_name = None
            else:
                cur_name = v
                cur = []
        else:
            cur.append((k, v))
    # flush the pending entity: covers a POLYLINE missing its SEQEND
    # (some exporters / truncation) and a stream truncated before
    # ENDSEC — silent data loss either way if dropped
    if in_polyline:
        ents.append(("__POLYLINE", [poly_codes, vertices]))
    elif cur_name:
        ents.append((cur_name, cur))

    geoms: list = []
    attrs: list[dict] = []
    for name, codes in ents:
        if name == "__POLYLINE":
            poly_codes, vertices = codes
            flags = next((int(v) for k, v in poly_codes if k == 70), 0)
            curved = bool(flags & 6) or any(
                k == 42 and float(v) != 0.0
                for vert in vertices for k, v in vert)
            if curved:
                # curve/spline-fit polylines and arc bulges: flattening
                # silently would be wrong geometry (same boundary as ARC)
                if on_unsupported == "skip":
                    continue
                raise NotImplementedError(
                    "DXF entity 'POLYLINE' with curve/spline fit or arc "
                    "bulges needs tessellation the engine does not "
                    "provide")
            closed = bool(flags & 1)
            pts = []
            for vert in vertices:
                d = dict()
                for k, v in vert:
                    d.setdefault(k, v)
                if 10 in d and 20 in d:
                    pts.append([float(d[10]), float(d[20])])
            if closed and pts and pts[0] != pts[-1]:
                pts.append(list(pts[0]))
            g = {"type": "LineString", "coordinates": pts}
            meta = dict()
            for k, v in poly_codes:
                meta.setdefault(k, v)
        else:
            if name in _UNSUPPORTED_ENTITIES or name not in (
                    "POINT", "LINE", "LWPOLYLINE", "3DFACE"):
                if on_unsupported == "skip":
                    continue
                raise NotImplementedError(
                    f"DXF entity {name!r} needs curve tessellation / "
                    "block expansion the engine does not provide")
            try:
                g = _entity_geojson(name, codes)
            except NotImplementedError:
                if on_unsupported == "skip":
                    continue
                raise
            meta = dict()
            for k, v in codes:
                meta.setdefault(k, v)
        geoms.append(g)
        attrs.append({"Layer": meta.get(8, "0"),
                      "EntityHandle": meta.get(5)})

    from .featuretable import features_to_df

    return features_to_df(spark, geoms, attrs, ["Layer", "EntityHandle"],
                          geom, types={"Layer": "string",
                                       "EntityHandle": "string"})


def _w(f, code: int, val) -> None:
    f.write(f"{code}\n{val}\n")


def write_dxf(df: DataFrame, path: str, geom: str = "geometry") -> None:
    """Minimal ENTITIES-only ``.dxf``: Point -> POINT, (Multi)LineString
    -> LWPOLYLINE (closed flag when the part is a ring), Polygon -> one
    closed LWPOLYLINE per ring. Row-capped single-file sink; geometry
    encode runs on the executors."""
    from .featuretable import collect_features

    props, geoms, rows = collect_features(df, geom, "write_dxf")
    layer_col = "Layer" if "Layer" in props else None
    handle = [0]

    def w_point(f, c, layer):
        _w(f, 0, "POINT")
        handle[0] += 1
        _w(f, 5, format(handle[0], "X"))
        _w(f, 8, layer)
        _w(f, 10, repr(float(c[0])))
        _w(f, 20, repr(float(c[1])))
        if len(c) > 2:
            _w(f, 30, repr(float(c[2])))

    def w_pline(f, pts, layer):
        closed = len(pts) >= 4 and pts[0] == pts[-1]
        body = pts[:-1] if closed else pts
        _w(f, 0, "LWPOLYLINE")
        handle[0] += 1
        _w(f, 5, format(handle[0], "X"))
        _w(f, 8, layer)
        _w(f, 90, len(body))
        _w(f, 70, 1 if closed else 0)
        for p in body:
            _w(f, 10, repr(float(p[0])))
            _w(f, 20, repr(float(p[1])))

    with open(path, "w") as f:
        _w(f, 0, "SECTION")
        _w(f, 2, "ENTITIES")
        for g, r in zip(geoms, rows):
            if g is None:
                continue
            layer = (str(r[layer_col]) if layer_col and
                     r[layer_col] is not None else "0")
            t, c = g["type"], g.get("coordinates")
            if t == "Point":
                w_point(f, c, layer)
            elif t == "MultiPoint":
                for p in c:
                    w_point(f, p, layer)
            elif t == "LineString":
                w_pline(f, c, layer)
            elif t == "MultiLineString":
                for part in c:
                    w_pline(f, part, layer)
            elif t in ("Polygon", "MultiPolygon"):
                polys = [c] if t == "Polygon" else c
                for rings in polys:
                    for ring in rings:
                        w_pline(f, ring, layer)
            else:
                raise ValueError(f"DXF writer cannot store {t}")
        _w(f, 0, "ENDSEC")
        _w(f, 0, "EOF")
