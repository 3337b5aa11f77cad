"""Atlas BNA driver — tiny delimited-text boundary format, stdlib parse.

Reference: io/file.py:28-34 maps ``.bna`` to the OGR ``BNA`` driver.
A BNA record is a header line of 2-4 quoted ID fields plus a signed
coordinate count, followed by that many ``x,y`` lines:

* count ``1``  -> Point
* count ``>2`` -> Polygon (ring closes itself; OGR emits the exterior
  and detects hole sub-rings by the retrace-to-start convention)
* count ``<0`` -> LineString of ``|count|`` points
* count ``2``  -> Ellipse (center + radii) — no polygon model for it
  here; raises naming the record type (same boundary OGR documents)

IDs become ``primary``/``secondary`` (+``third``/``fourth``) string
columns, matching OGR's BNA field names. Container parses driver-side;
geometry decode/encode runs distributed through the GeoJSON codecs
(sources/featuretable.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_ID_COLS = ("primary", "secondary", "third", "fourth")


def _split_header(line: str) -> list[str]:
    """BNA header line -> fields (quoted IDs + trailing numbers)."""
    out, cur, i, q = [], [], 0, False
    while i < len(line):
        ch = line[i]
        if q:
            if ch == '"':
                q = False
            else:
                cur.append(ch)
        elif ch == '"':
            q = True
        elif ch == ",":
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
        i += 1
    out.append("".join(cur))
    return [v.strip() for v in out]


def _split_rings(pts: list[list[float]]):
    """OGR hole convention: a polygon with holes retraces to the start
    point between rings — split on repeats of the first coordinate."""
    first = pts[0]
    rings, cur = [], [first]
    for p in pts[1:]:
        cur.append(p)
        if p == first and len(cur) > 2:
            rings.append(cur)
            cur = [first]
    if len(cur) > 1:
        if cur[-1] != first:
            cur.append(first)
        rings.append(cur)
    return rings


def read_bna(spark: SparkSession, path: str,
             geom: str = "geometry") -> DataFrame:
    """``.bna`` -> DataFrame (WKB geometry + ID string columns)."""
    with open(path) as f:
        lines = [ln.strip() for ln in f if ln.strip()]

    geoms: list = []
    attrs: list[dict] = []
    n_ids = 2
    pos = 0
    while pos < len(lines):
        fields = _split_header(lines[pos])
        count = int(float(fields[-1]))
        ids = fields[:-1]
        n_ids = max(n_ids, len(ids))
        pos += 1
        npts = abs(count) if count != 1 else 1
        pts = []
        for _ in range(npts):
            xy = lines[pos].split(",")
            pts.append([float(xy[0]), float(xy[1])])
            pos += 1
        if count == 1:
            g = {"type": "Point", "coordinates": pts[0]}
        elif count == 2:
            raise NotImplementedError(
                "BNA ellipse records (count=2) are not modelled")
        elif count < 0:
            g = {"type": "LineString", "coordinates": pts}
        else:
            if pts[0] != pts[-1]:
                pts.append(pts[0])
            g = {"type": "Polygon", "coordinates": _split_rings(pts)}
        geoms.append(g)
        attrs.append({c: (ids[i] if i < len(ids) else None)
                      for i, c in enumerate(_ID_COLS)})

    order = list(_ID_COLS[:n_ids])
    attrs = [{c: a.get(c) for c in order} for a in attrs]

    from .featuretable import features_to_df

    return features_to_df(spark, geoms, attrs, order, geom,
                          types={c: "string" for c in order})


def write_bna(df: DataFrame, path: str, geom: str = "geometry") -> None:
    """Single ``.bna`` file. Point/LineString/Polygon rows; the first two
    non-geometry string columns become the ID fields. Row-capped sink."""
    from .featuretable import collect_features

    props, geoms, rows = collect_features(df, geom, "write_bna")
    id_cols = props[:2]
    with open(path, "w") as f:
        for g, r in zip(geoms, rows):
            if g is None:
                continue
            ids = [str(r[c]) if r[c] is not None else "" for c in id_cols]
            while len(ids) < 2:
                ids.append("")
            idtxt = ",".join(f'"{v}"' for v in ids)
            t, c = g["type"], g.get("coordinates")
            if t == "Point":
                f.write(f"{idtxt},1\n{c[0]!r},{c[1]!r}\n")
            elif t == "LineString":
                f.write(f"{idtxt},{-len(c)}\n")
                for p in c:
                    f.write(f"{p[0]!r},{p[1]!r}\n")
            elif t == "Polygon":
                first = c[0][0]
                pts = list(c[0])
                for ring in c[1:]:  # holes: retrace-to-start convention
                    pts.extend(ring)
                    if ring[-1] != first:
                        pts.append(first)
                f.write(f"{idtxt},{len(pts)}\n")
                for p in pts:
                    f.write(f"{p[0]!r},{p[1]!r}\n")
            else:
                raise ValueError(f"BNA cannot store {t}")
