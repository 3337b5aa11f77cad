"""GML (Geography Markup Language) driver — stdlib ``xml.etree``.

Reference: io/file.py:28-34 maps ``.gml``/``.xml`` to the OGR ``GML``
driver. GML is a single XML document, so the container parses
driver-side (same shape as the GeoJSON FeatureCollection path) and the
geometry decode/encode runs distributed through the GeoJSON codecs
(sources/featuretable.py). Both GML 2 (``coordinates``,
``outerBoundaryIs``) and GML 3 (``pos``/``posList``, ``exterior``,
``MultiSurface``/``MultiCurve``, ``srsDimension=3`` for Z) are read;
the writer emits GML 3.1 ``posList`` in the OGR-style
``FeatureCollection`` / ``gml:featureMember`` framing so our own files
round-trip and OGR can read them.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape

from pyspark.sql import DataFrame, SparkSession

_GML_NS = "http://www.opengis.net/gml"

_GEOM_TAGS = {
    "Point", "LineString", "Polygon", "MultiPoint", "MultiLineString",
    "MultiPolygon", "MultiSurface", "MultiCurve", "MultiGeometry",
    "Curve", "Surface", "LinearRing",
}


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _positions(el) -> list[list[float]]:
    """Coordinate positions of a primitive GML element (Point/LineString/
    LinearRing/...): GML2 ``coordinates`` or GML3 ``pos``/``posList``.
    srsDimension is honored on the posList itself OR the geometry
    element (both placements are common in real files)."""
    el_dim = el.get("srsDimension")
    for ch in el:
        name = _local(ch.tag)
        if name == "coordinates":
            cs = ch.get("cs", ",")
            ts = ch.get("ts", " ")
            out = []
            text = (ch.text or "").strip()
            tuples = text.split(ts) if ts.strip() else text.split()
            for tup in tuples:
                tup = tup.strip()
                if tup:
                    out.append([float(v) for v in tup.split(cs)])
            return out
        if name == "posList":
            vals = [float(v) for v in (ch.text or "").split()]
            dim = int(ch.get("srsDimension") or el_dim or "2")
            return [vals[i:i + dim] for i in range(0, len(vals), dim)]
        if name == "pos":
            return [[float(v) for v in (ch.text or "").split()]]
    return []


def _find_children(el, *names):
    return [ch for ch in el if _local(ch.tag) in names]


def _ring(el) -> list[list[float]]:
    """exterior/interior/outerBoundaryIs/innerBoundaryIs -> positions of
    the contained LinearRing."""
    rings = _find_children(el, "LinearRing")
    return _positions(rings[0]) if rings else []


def gml_geometry_to_geojson(el) -> dict | None:
    """A GML geometry Element -> GeoJSON geometry dict."""
    t = _local(el.tag)
    if t == "Point":
        pos = _positions(el)
        return {"type": "Point", "coordinates": pos[0] if pos else []}
    if t in ("LineString", "LinearRing"):
        return {"type": "LineString", "coordinates": _positions(el)}
    if t == "Curve":
        # gml:Curve/segments/LineStringSegment* -> one merged LineString
        coords: list = []
        for seg_holder in _find_children(el, "segments"):
            for seg in seg_holder:
                sname = _local(seg.tag)
                if sname != "LineStringSegment":
                    # Arc/ArcString/Circle/... need tessellation — same
                    # honest boundary as the DXF/MIF curve entities;
                    # silently dropping the span would emit wrong geometry
                    raise NotImplementedError(
                        f"GML Curve segment {sname!r} (only "
                        "LineStringSegment decodes; curve segments need "
                        "tessellation)")
                pts = _positions(seg)
                if coords and pts and coords[-1] == pts[0]:
                    pts = pts[1:]
                coords.extend(pts)
        return {"type": "LineString", "coordinates": coords}
    if t in ("Polygon", "Surface", "PolygonPatch"):
        if t == "Surface":
            for holder in _find_children(el, "patches"):
                patches = _find_children(holder, "PolygonPatch")
                if patches:
                    return gml_geometry_to_geojson(patches[0])
            return {"type": "Polygon", "coordinates": []}
        rings = []
        for b in _find_children(el, "exterior", "outerBoundaryIs"):
            rings.append(_ring(b))
        for b in _find_children(el, "interior", "innerBoundaryIs"):
            rings.append(_ring(b))
        return {"type": "Polygon", "coordinates": rings}
    if t == "MultiPoint":
        pts = []
        for m in _find_children(el, "pointMember", "pointMembers"):
            for p in _find_children(m, "Point"):
                pos = _positions(p)
                if pos:
                    pts.append(pos[0])
        return {"type": "MultiPoint", "coordinates": pts}
    if t in ("MultiLineString", "MultiCurve"):
        lines = []
        for m in _find_children(el, "lineStringMember", "curveMember",
                                "curveMembers"):
            for sub in m:
                gj = gml_geometry_to_geojson(sub)
                if gj and gj["type"] == "LineString":
                    lines.append(gj["coordinates"])
        return {"type": "MultiLineString", "coordinates": lines}
    if t in ("MultiPolygon", "MultiSurface"):
        polys = []
        for m in _find_children(el, "polygonMember", "surfaceMember",
                                "surfaceMembers"):
            for sub in m:
                gj = gml_geometry_to_geojson(sub)
                if gj and gj["type"] == "Polygon":
                    polys.append(gj["coordinates"])
        return {"type": "MultiPolygon", "coordinates": polys}
    if t == "MultiGeometry":
        geoms = []
        for m in _find_children(el, "geometryMember", "geometryMembers"):
            for sub in m:
                gj = gml_geometry_to_geojson(sub)
                if gj is not None:
                    geoms.append(gj)
        return {"type": "GeometryCollection", "geometries": geoms}
    return None


def _subtree_geometry(el):
    """First GML geometry element inside ``el`` (el itself, or a child —
    covers the common <geometryProperty>/<ogr:geometryProperty> wrapper)."""
    if _local(el.tag) in _GEOM_TAGS:
        return el
    for ch in el:
        if _local(ch.tag) in _GEOM_TAGS:
            return ch
    return None


def read_gml(spark: SparkSession, path: str,
             geom: str = "geometry") -> DataFrame:
    """``.gml``/``.xml`` FeatureCollection -> DataFrame (WKB geometry +
    inferred-type attribute columns)."""
    root = ET.parse(path).getroot()
    members: list = []
    for el in root.iter():
        name = _local(el.tag)
        if name in ("featureMember", "member"):
            members.extend(list(el))
        elif name == "featureMembers":
            members.extend(list(el))
    if not members and _local(root.tag) == "FeatureCollection":
        members = [ch for ch in root if _local(ch.tag) != "boundedBy"]

    geoms: list = []
    attrs: list[dict] = []
    order: list[str] = []
    for feat in members:
        g = None
        a: dict = {}
        for ch in feat:
            sub = _subtree_geometry(ch)
            if sub is not None and g is None:
                g = gml_geometry_to_geojson(sub)
                continue
            name = _local(ch.tag)
            if name == "boundedBy":
                continue
            a[name] = None if ch.text is None else ch.text
            if name not in order:
                order.append(name)
        geoms.append(g)
        attrs.append(a)

    from .featuretable import features_to_df

    return features_to_df(spark, geoms, attrs, order, geom)


def _fmt_pos(p) -> str:
    return " ".join(repr(float(v)) for v in p)


def _gj_to_gml(g: dict | None) -> str:
    """GeoJSON geometry dict -> GML 3.1 markup (gml: prefix)."""
    if g is None:
        return ""
    t = g.get("type")
    c = g.get("coordinates")

    def dim_attr(positions):
        return (' srsDimension="3"'
                if any(len(p) > 2 for p in positions) else "")

    if t == "Point":
        return (f"<gml:Point><gml:pos{dim_attr([c])}>{_fmt_pos(c)}"
                "</gml:pos></gml:Point>")
    if t == "LineString":
        body = " ".join(_fmt_pos(p) for p in c)
        return (f"<gml:LineString><gml:posList{dim_attr(c)}>{body}"
                "</gml:posList></gml:LineString>")
    if t == "Polygon":
        parts = []
        for i, ring in enumerate(c):
            tag = "exterior" if i == 0 else "interior"
            body = " ".join(_fmt_pos(p) for p in ring)
            parts.append(
                f"<gml:{tag}><gml:LinearRing><gml:posList{dim_attr(ring)}>"
                f"{body}</gml:posList></gml:LinearRing></gml:{tag}>")
        return f"<gml:Polygon>{''.join(parts)}</gml:Polygon>"
    if t == "MultiPoint":
        ms = "".join(
            "<gml:pointMember>"
            + _gj_to_gml({"type": "Point", "coordinates": p})
            + "</gml:pointMember>" for p in c)
        return f"<gml:MultiPoint>{ms}</gml:MultiPoint>"
    if t == "MultiLineString":
        ms = "".join(
            "<gml:curveMember>"
            + _gj_to_gml({"type": "LineString", "coordinates": ln})
            + "</gml:curveMember>" for ln in c)
        return f"<gml:MultiCurve>{ms}</gml:MultiCurve>"
    if t == "MultiPolygon":
        ms = "".join(
            "<gml:surfaceMember>"
            + _gj_to_gml({"type": "Polygon", "coordinates": poly})
            + "</gml:surfaceMember>" for poly in c)
        return f"<gml:MultiSurface>{ms}</gml:MultiSurface>"
    if t == "GeometryCollection":
        ms = "".join(
            "<gml:geometryMember>" + _gj_to_gml(sub)
            + "</gml:geometryMember>" for sub in g.get("geometries", []))
        return f"<gml:MultiGeometry>{ms}</gml:MultiGeometry>"
    raise ValueError(f"unsupported GeoJSON type for GML: {t!r}")


def write_gml(df: DataFrame, path: str, geom: str = "geometry",
              layer: str = "features") -> None:
    """Single ``.gml`` document (to_file driver='GML'). Driver-side and
    row-capped like every single-file sink; geometry encoding runs on
    the executors (st_asgeojson)."""
    import re

    from .featuretable import collect_features

    props, geoms, rows = collect_features(df, geom, "write_gml")
    name_re = re.compile(r"^[A-Za-z_][A-Za-z0-9_.\-]*$")
    bad = [c for c in props if not name_re.match(c)] + (
        [layer] if not name_re.match(layer) else [])
    if bad:
        # column names become XML element tags verbatim; an invalid name
        # would write a document that only fails at read time
        raise ValueError(
            f"write_gml: column/layer names not valid XML names: {bad!r}")
    with open(path, "w") as f:
        f.write('<?xml version="1.0" encoding="utf-8"?>\n')
        f.write('<FeatureCollection xmlns:gml="%s">\n' % _GML_NS)
        for g, r in zip(geoms, rows):
            f.write("  <gml:featureMember>\n")
            f.write(f"    <{layer}>\n")
            if g is not None:
                f.write("      <geometryProperty>"
                        + _gj_to_gml(g) + "</geometryProperty>\n")
            for c in props:
                v = r[c]
                if v is not None:
                    f.write(f"      <{c}>{escape(str(v))}</{c}>\n")
            f.write(f"    </{layer}>\n")
            f.write("  </gml:featureMember>\n")
        f.write("</FeatureCollection>\n")
