"""MapInfo MIF/MID driver — pure-text interchange format, stdlib parse.

Reference: io/file.py:28-34 maps ``.mif``/``.mid``/``.tab`` to the OGR
``MapInfo File`` driver. ``.tab`` is the *binary* MapInfo container and
stays unsupported; MIF/MID is the documented text interchange twin
(one ``.mif`` geometry+schema file, one ``.mid`` delimited attribute
file) and parses with the stdlib. Like the other single-document
drivers (sources/featuretable.py), the container parses driver-side and
geometry decode/encode runs distributed through the GeoJSON codecs.

Geometry records: NONE, POINT, LINE, PLINE [MULTIPLE], REGION, RECT
(-> Polygon, OGR behavior). ARC/TEXT/ELLIPSE/ROUNDRECT need curve
interpolation the engine does not model and raise naming the record
type. Styling clauses (PEN/BRUSH/SYMBOL/SMOOTH/CENTER) are skipped on
read and not written. REGION ring soup is assembled into polygons with
the same innermost-containing-outer rule as the shapefile reader
(sources/shapefile.py:89).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession

# MIF column type -> engine type (featuretable type tags)
_STYLE_WORDS = ("pen", "brush", "symbol", "smooth", "center", "font")


def _split_mid_line(line: str, delim: str) -> list[str]:
    """One MID row -> raw string fields (double-quote quoting, no
    embedded newlines — the format forbids them)."""
    out, cur, i, q = [], [], 0, False
    while i < len(line):
        ch = line[i]
        if q:
            if ch == '"':
                if i + 1 < len(line) and line[i + 1] == '"':
                    cur.append('"')
                    i += 1
                else:
                    q = False
            else:
                cur.append(ch)
        elif ch == '"':
            q = True
        elif ch == delim:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
        i += 1
    out.append("".join(cur))
    return out


def _parse_columns(header_lines: list[str]):
    """COLUMNS block -> (names, engine types, MIF type strings)."""
    names, types, mif_types = [], {}, {}
    for ln in header_lines:
        parts = ln.split()
        if len(parts) < 2:
            continue
        name, t = parts[0], " ".join(parts[1:])
        tl = t.lower()
        names.append(name)
        mif_types[name] = t
        if tl.startswith(("integer", "smallint")):
            types[name] = "long"
        elif tl.startswith(("float", "decimal")):
            types[name] = "double"
        elif tl.startswith("logical"):
            types[name] = "boolean"
        else:  # Char(n), Date, anything else -> string
            types[name] = "string"
    return names, types, mif_types


def _read_points(lines: list[str], pos: int, n: int):
    pts = []
    for _ in range(n):
        xy = lines[pos].split()
        pts.append([float(xy[0]), float(xy[1])])
        pos += 1
    return pts, pos


def _region_to_geojson(rings: list[list[list[float]]]) -> dict:
    """MIF REGION ring soup -> (Multi)Polygon.

    MIF rings carry no orientation convention (unlike shapefiles), so
    assembly is pure containment: a ring inside an even number of other
    rings is an exterior, odd is a hole of its deepest containing
    exterior (OGR's MapInfo reader behavior)."""
    from .shapefile import _point_in_ring

    closed = []
    for r in rings:
        if r and r[0] != r[-1]:
            r = r + [r[0]]
        closed.append(np.asarray(r, dtype=float))
    n = len(closed)
    depth = [sum(1 for j in range(n)
                 if j != i and _point_in_ring(closed[i][0], closed[j]))
             for i in range(n)]
    outers = [i for i in range(n) if depth[i] % 2 == 0]
    polys: dict = {o: [o] for o in outers}
    for i in range(n):
        if depth[i] % 2 == 1:
            parents = [o for o in outers
                       if _point_in_ring(closed[i][0], closed[o])]
            if parents:
                polys[max(parents, key=lambda o: depth[o])].append(i)
            else:  # orphan hole -> promoted to exterior (OGR tolerance)
                polys[i] = [i]
    coords = [[closed[r].tolist() for r in members]
              for members in polys.values()]
    if len(coords) == 1:
        return {"type": "Polygon", "coordinates": coords[0]}
    return {"type": "MultiPolygon", "coordinates": coords}


def _parse_geometry(lines: list[str], pos: int):
    """One geometry record starting at ``lines[pos]`` -> (GeoJSON dict or
    None, next pos). Trailing style clauses are consumed."""
    parts = lines[pos].split()
    kw = parts[0].lower()
    if kw == "none":
        g, pos = None, pos + 1
    elif kw == "point":
        g = {"type": "Point",
             "coordinates": [float(parts[1]), float(parts[2])]}
        pos += 1
    elif kw == "line":
        g = {"type": "LineString",
             "coordinates": [[float(parts[1]), float(parts[2])],
                             [float(parts[3]), float(parts[4])]]}
        pos += 1
    elif kw == "pline":
        if len(parts) >= 2 and parts[1].lower() == "multiple":
            nsec = int(parts[2])
            pos += 1
            secs = []
            for _ in range(nsec):
                n = int(lines[pos].split()[0])
                pts, pos = _read_points(lines, pos + 1, n)
                secs.append(pts)
            g = {"type": "MultiLineString", "coordinates": secs}
        else:
            # count on the PLINE line or alone on the next line
            if len(parts) >= 2:
                n = int(parts[1])
                pos += 1
            else:
                n = int(lines[pos + 1].split()[0])
                pos += 2
            pts, pos = _read_points(lines, pos, n)
            g = {"type": "LineString", "coordinates": pts}
    elif kw == "region":
        nring = int(parts[1])
        pos += 1
        rings = []
        for _ in range(nring):
            n = int(lines[pos].split()[0])
            pts, pos = _read_points(lines, pos + 1, n)
            rings.append(pts)
        g = _region_to_geojson(rings)
    elif kw == "rect":
        x1, y1, x2, y2 = (float(v) for v in parts[1:5])
        x1, x2 = min(x1, x2), max(x1, x2)
        y1, y2 = min(y1, y2), max(y1, y2)
        g = {"type": "Polygon",
             "coordinates": [[[x1, y1], [x2, y1], [x2, y2],
                              [x1, y2], [x1, y1]]]}
        pos += 1
    else:
        raise NotImplementedError(
            f"MIF record type {parts[0]!r} needs curve/text modelling the "
            "engine does not provide (ARC/TEXT/ELLIPSE/ROUNDRECT)")
    while pos < len(lines) and lines[pos].split()[0].lower() in _STYLE_WORDS:
        pos += 1
    return g, pos


def read_mif(spark: SparkSession, path: str,
             geom: str = "geometry") -> DataFrame:
    """``.mif``(+``.mid``) -> DataFrame (WKB geometry + typed attrs)."""
    import os

    with open(path) as f:
        raw = [ln.strip() for ln in f]
    lines = [ln for ln in raw if ln]

    delim = "\t"
    names: list[str] = []
    types: dict = {}
    pos = 0
    while pos < len(lines):
        parts = lines[pos].split()
        kw = parts[0].lower()
        if kw == "delimiter":
            delim = lines[pos].split('"')[1]
            pos += 1
        elif kw == "columns":
            ncols = int(parts[1])
            names, types, _ = _parse_columns(lines[pos + 1:pos + 1 + ncols])
            pos += 1 + ncols
        elif kw == "data":
            pos += 1
            break
        else:  # Version / Charset / CoordSys / Unique / Index / Transform
            pos += 1

    geoms: list = []
    while pos < len(lines):
        g, pos = _parse_geometry(lines, pos)
        geoms.append(g)

    attrs: list[dict] = []
    mid_path = os.path.splitext(path)[0] + ".mid"
    if names and os.path.isfile(mid_path):
        with open(mid_path) as f:
            for ln in f:
                ln = ln.rstrip("\r\n")
                if not ln:
                    continue
                vals = _split_mid_line(ln, delim)
                attrs.append({c: (v if v != "" else None)
                              for c, v in zip(names, vals)})
    attrs += [{} for _ in range(len(geoms) - len(attrs))]

    from .featuretable import features_to_df

    return features_to_df(spark, geoms, attrs[:len(geoms)], names, geom,
                          types=types)


def _fmt(v: float) -> str:
    return repr(float(v))


def _gj_to_mif(g: dict | None) -> str:
    """GeoJSON geometry dict -> MIF record text (no trailing newline)."""
    if g is None:
        return "NONE"
    t, c = g.get("type"), g.get("coordinates")
    if t == "Point":
        return f"POINT {_fmt(c[0])} {_fmt(c[1])}"
    if t == "LineString":
        body = "\n".join(f"{_fmt(p[0])} {_fmt(p[1])}" for p in c)
        return f"PLINE {len(c)}\n{body}"
    if t == "MultiLineString":
        out = [f"PLINE MULTIPLE {len(c)}"]
        for part in c:
            out.append(f"  {len(part)}")
            out.extend(f"{_fmt(p[0])} {_fmt(p[1])}" for p in part)
        return "\n".join(out)
    if t in ("Polygon", "MultiPolygon"):
        polys = [c] if t == "Polygon" else c
        rings = [r for poly in polys for r in poly]
        out = [f"REGION {len(rings)}"]
        for r in rings:
            out.append(f"  {len(r)}")
            out.extend(f"{_fmt(p[0])} {_fmt(p[1])}" for p in r)
        return "\n".join(out)
    if t == "MultiPoint":
        # MIF has no MultiPoint record; OGR writes one POINT per part is
        # lossy — refuse explicitly
        raise ValueError("MIF cannot store MultiPoint")
    raise ValueError(f"MIF cannot store {t}")


_MIF_TYPES = {"long": "Integer", "double": "Float",
              "boolean": "Logical", "string": "Char(254)"}


def write_mif(df: DataFrame, path: str, geom: str = "geometry",
              delimiter: str = ",") -> None:
    """MIF/MID pair (to_file driver='MapInfo File', text twin).
    Row-capped single-file sink; geometry encode runs on the executors."""
    import os

    from pyspark.sql import types as T

    from .featuretable import collect_features

    props, geoms, rows = collect_features(df, geom, "write_mif")
    spark_types = dict(df.dtypes)

    def mif_type(col):
        st = spark_types.get(col, "string")
        if st in ("bigint", "int", "smallint", "tinyint", "long"):
            return "Integer"
        if st in ("double", "float") or st.startswith("decimal"):
            # df.dtypes reports decimals as 'decimal(p,s)'
            return "Float"
        if st == "boolean":
            return "Logical"
        return "Char(254)"

    with open(path, "w") as f:
        f.write("Version 300\nCharset \"Neutral\"\n")
        f.write(f'Delimiter "{delimiter}"\n')
        f.write(f"Columns {len(props)}\n")
        for c in props:
            f.write(f"  {c} {mif_type(c)}\n")
        f.write("Data\n\n")
        for g in geoms:
            f.write(_gj_to_mif(g) + "\n")

    mid_path = os.path.splitext(path)[0] + ".mid"
    with open(mid_path, "w") as f:
        for r in rows:
            vals = []
            for c in props:
                v = r[c]
                if v is None:
                    vals.append('""' if mif_type(c) == "Char(254)" else "0")
                elif mif_type(c) == "Char(254)":
                    vals.append('"' + str(v).replace('"', '""') + '"')
                elif mif_type(c) == "Logical":
                    vals.append("T" if v else "F")
                else:
                    vals.append(str(v))
            f.write(delimiter.join(vals) + "\n")
