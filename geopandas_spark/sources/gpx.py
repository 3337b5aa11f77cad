"""GPX driver — stdlib ``xml.etree``.

Reference: io/file.py:28-34 maps ``.gpx`` to the OGR ``GPX`` driver,
which exposes five layers; all five are readable here via ``layer=``:

==============  ========================================================
layer           contents
==============  ========================================================
waypoints       one Point per ``<wpt>`` (default layer, like OGR)
routes          one LineString per ``<rte>`` (from its ``<rtept>``)
tracks          one MultiLineString per ``<trk>`` (one part per trkseg)
route_points    one Point per ``<rtept>`` + route_fid/route_point_id
track_points    one Point per ``<trkpt>`` + track_fid/track_seg_id/
                track_seg_point_id
==============  ========================================================

``<ele>`` becomes both the point Z and an ``ele`` column (OGR's 2.5D
behavior). The writer emits waypoints for Point rows and tracks for
(Multi)LineString rows — the containers OGR itself writes.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape

from pyspark.sql import DataFrame, SparkSession

_WPT_FIELDS = ("name", "cmt", "desc", "sym", "type", "time")
_TRK_FIELDS = ("name", "cmt", "desc", "type")


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _children_named(el, name):
    return [ch for ch in el if _local(ch.tag) == name]


def _child_text(el, name):
    ch = _children_named(el, name)
    return ch[0].text if ch and ch[0].text is not None else None


def _pt_coord(el):
    lon = float(el.get("lon"))
    lat = float(el.get("lat"))
    ele = _child_text(el, "ele")
    return [lon, lat, float(ele)] if ele is not None else [lon, lat]


def _uniform_dim(pts: list[list[float]]) -> list[list[float]]:
    """Line parts must be all-2D or all-3D: if any point carries an
    elevation the line is 3D and missing ``<ele>`` become 0 (OGR's 2.5D
    behavior)."""
    if any(len(p) > 2 for p in pts) and not all(len(p) > 2 for p in pts):
        return [p if len(p) > 2 else [p[0], p[1], 0.0] for p in pts]
    return pts


def read_gpx(spark: SparkSession, path: str, layer: str = "waypoints",
             geom: str = "geometry") -> DataFrame:
    """One of the five OGR GPX layers -> DataFrame."""
    root = ET.parse(path).getroot()
    geoms: list = []
    attrs: list[dict] = []
    order: list[str] = []
    types: dict = {}

    def add(g, a):
        geoms.append(g)
        attrs.append(a)
        for k in a:
            if k not in order:
                order.append(k)

    if layer == "waypoints":
        for w in _children_named(root, "wpt"):
            a = {f: _child_text(w, f) for f in _WPT_FIELDS}
            a["ele"] = _child_text(w, "ele")
            add({"type": "Point", "coordinates": _pt_coord(w)}, a)
        types = {f: "string" for f in _WPT_FIELDS}
        types["ele"] = "double"
    elif layer == "routes":
        for r in _children_named(root, "rte"):
            pts = _uniform_dim(
                [_pt_coord(p) for p in _children_named(r, "rtept")])
            add({"type": "LineString", "coordinates": pts},
                {f: _child_text(r, f) for f in _TRK_FIELDS})
        types = {f: "string" for f in _TRK_FIELDS}
    elif layer == "tracks":
        for t in _children_named(root, "trk"):
            segs = [[_pt_coord(p) for p in _children_named(s, "trkpt")]
                    for s in _children_named(t, "trkseg")]
            if any(len(p) > 2 for seg in segs for p in seg):
                segs = [_uniform_dim([p if len(p) > 2 else
                                      [p[0], p[1], 0.0] for p in seg])
                        for seg in segs]
            add({"type": "MultiLineString", "coordinates": segs},
                {f: _child_text(t, f) for f in _TRK_FIELDS})
        types = {f: "string" for f in _TRK_FIELDS}
    elif layer == "route_points":
        for fid, r in enumerate(_children_named(root, "rte")):
            for pid, p in enumerate(_children_named(r, "rtept")):
                a = {"route_fid": fid, "route_point_id": pid}
                a.update({f: _child_text(p, f) for f in _WPT_FIELDS})
                a["ele"] = _child_text(p, "ele")
                add({"type": "Point", "coordinates": _pt_coord(p)}, a)
        types = {f: "string" for f in _WPT_FIELDS}
        types.update(route_fid="long", route_point_id="long", ele="double")
    elif layer == "track_points":
        for fid, t in enumerate(_children_named(root, "trk")):
            for sid, s in enumerate(_children_named(t, "trkseg")):
                for pid, p in enumerate(_children_named(s, "trkpt")):
                    a = {"track_fid": fid, "track_seg_id": sid,
                         "track_seg_point_id": pid,
                         "ele": _child_text(p, "ele"),
                         "time": _child_text(p, "time")}
                    add({"type": "Point", "coordinates": _pt_coord(p)}, a)
        types = {"track_fid": "long", "track_seg_id": "long",
                 "track_seg_point_id": "long", "ele": "double",
                 "time": "string"}
    else:
        raise ValueError(
            f"unknown GPX layer {layer!r}; one of waypoints/routes/tracks/"
            "route_points/track_points (OGR GPX layer set)")

    from .featuretable import features_to_df

    return features_to_df(spark, geoms, attrs, order, geom, types=types)


def _wpt_xml(tag: str, pos, fields: dict) -> str:
    lon, lat = pos[0], pos[1]
    body = ""
    if len(pos) > 2:
        body += f"<ele>{pos[2]!r}</ele>"
    for k, v in fields.items():
        if v is not None and k != "ele":
            body += f"<{k}>{escape(str(v))}</{k}>"
    if "ele" in fields and fields["ele"] is not None and len(pos) <= 2:
        body += f"<ele>{float(fields['ele'])!r}</ele>"
    return f'<{tag} lat="{lat!r}" lon="{lon!r}">{body}</{tag}>'


def write_gpx(df: DataFrame, path: str, geom: str = "geometry") -> None:
    """Single ``.gpx`` document: Point rows -> ``<wpt>``, (Multi)LineString
    rows -> ``<trk>`` (one ``<trkseg>`` per part). Row-capped single-file
    sink; geometry encoding runs on the executors."""
    from .featuretable import collect_features

    props, geoms, rows = collect_features(df, geom, "write_gpx")
    wpts: list[str] = []
    trks: list[str] = []
    for g, r in zip(geoms, rows):
        if g is None:
            continue
        fields = {c: r[c] for c in props}
        t = g["type"]
        if t == "Point":
            known = {k: fields.get(k) for k in _WPT_FIELDS + ("ele",)
                     if k in fields}
            wpts.append("  " + _wpt_xml("wpt", g["coordinates"], known))
        elif t in ("LineString", "MultiLineString"):
            segs = ([g["coordinates"]] if t == "LineString"
                    else g["coordinates"])
            body = ""
            for k in _TRK_FIELDS:
                if fields.get(k) is not None:
                    body += f"<{k}>{escape(str(fields[k]))}</{k}>"
            for seg in segs:
                body += ("<trkseg>"
                         + "".join(_wpt_xml("trkpt", p, {}) for p in seg)
                         + "</trkseg>")
            trks.append(f"  <trk>{body}</trk>")
        else:
            raise ValueError(
                f"GPX cannot store {t}; only Point and (Multi)LineString "
                "(OGR GPX writer contract)")
    with open(path, "w") as f:
        f.write('<?xml version="1.0" encoding="utf-8"?>\n')
        f.write('<gpx version="1.1" creator="geopandas_spark" '
                'xmlns="http://www.topografix.com/GPX/1/1">\n')
        for w in wpts:
            f.write(w + "\n")
        for t in trks:
            f.write(t + "\n")
        f.write("</gpx>\n")
