"""WKT codec: parse/format, parity with reference from_wkt/to_wkt
(/root/reference/geopandas/array.py:135-207; ``on_invalid`` policy in
{'raise','warn','ignore'}).

Parsing is per-row within an Arrow batch, but coordinate runs are bulk-read
with ``np.fromstring``-style splits, not float-at-a-time.
"""

from __future__ import annotations

import math
import re
import warnings

import numpy as np
import pandas as pd

from .ragged import (
    GEOMETRYCOLLECTION,
    LINESTRING,
    MISSING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    NAME_TO_TYPE,
    POINT,
    POLYGON,
    TYPE_NAMES,
    GeometryBatch,
    GeometryBatchBuilder,
)

_HEAD_RE = re.compile(
    r"^\s*(POINT|LINESTRING|POLYGON|MULTIPOINT|MULTILINESTRING|MULTIPOLYGON|"
    r"GEOMETRYCOLLECTION)\s*(Z|ZM|M)?\s*(EMPTY)?\s*",
    re.IGNORECASE,
)


class WKTParseError(ValueError):
    pass


def _parse_coords(body: str, ndim: int) -> np.ndarray:
    vals = np.array(body.replace(",", " ").split(), dtype=np.float64)
    if len(vals) % ndim:
        raise WKTParseError(f"coordinate count {len(vals)} not divisible by {ndim}")
    return vals.reshape(-1, ndim)


def _split_top(body: str) -> list[str]:
    """Split a parenthesized list at top level: '(a),(b)' -> ['a','b']."""
    out, depth, start = [], 0, None
    for i, ch in enumerate(body):
        if ch == "(":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                out.append(body[start:i])
    if depth != 0:
        raise WKTParseError("unbalanced parentheses")
    return out


def parse_wkt_one(s: str) -> tuple[int, list, list | None]:
    """-> (type_id, parts [(ptype, rings)], zparts or None)."""
    m = _HEAD_RE.match(s)
    if not m:
        raise WKTParseError(f"bad WKT: {s[:60]!r}")
    name = m.group(1).upper()
    zflag = (m.group(2) or "").upper()
    empty = m.group(3) is not None
    typ = NAME_TO_TYPE[
        {"POINT": "Point", "LINESTRING": "LineString", "POLYGON": "Polygon",
         "MULTIPOINT": "MultiPoint", "MULTILINESTRING": "MultiLineString",
         "MULTIPOLYGON": "MultiPolygon",
         "GEOMETRYCOLLECTION": "GeometryCollection"}[name]
    ]
    has_z = zflag in ("Z", "ZM")
    ndim = 3 if has_z else 2
    if "M" == zflag or zflag == "ZM":
        raise WKTParseError("M coordinates not supported")
    body = s[m.end():].strip()
    if empty:
        if typ in (POINT, LINESTRING, POLYGON):
            return typ, [(typ, [])], None
        return typ, [], None
    if not body.startswith("("):
        raise WKTParseError(f"bad WKT body: {s[:60]!r}")
    inner = body[1:-1].strip() if body.endswith(")") else None
    if inner is None:
        raise WKTParseError("unterminated WKT")

    def rings3(c: np.ndarray):
        return c[:, :2], (c[:, 2] if has_z else None)

    parts: list = []
    zparts: list = []
    if typ == POINT:
        c = _parse_coords(inner, ndim)
        parts = [(POINT, [c[:, :2]])]
        zparts = [[c[:, 2]]] if has_z else None
        return typ, parts, zparts
    if typ == LINESTRING:
        c = _parse_coords(inner, ndim)
        parts = [(LINESTRING, [c[:, :2]])]
        zparts = [[c[:, 2]]] if has_z else None
        return typ, parts, zparts
    if typ == POLYGON:
        rings, zr = [], []
        for chunk in _split_top(inner):
            c = _parse_coords(chunk, ndim)
            rings.append(c[:, :2])
            zr.append(c[:, 2] if has_z else None)
        return typ, [(POLYGON, rings)], ([zr] if has_z else None)
    if typ == MULTIPOINT:
        # both "MULTIPOINT (1 1, 2 2)" and "MULTIPOINT ((1 1), (2 2))"
        if "(" in inner:
            pts = [
                _parse_coords(chunk, ndim) for chunk in _split_top(inner)
            ]
        else:
            c = _parse_coords(inner, ndim)
            pts = [c[i : i + 1] for i in range(len(c))]
        for c in pts:
            parts.append((POINT, [c[:, :2]]))
            zparts.append([c[:, 2]] if has_z else None)
        return typ, parts, (zparts if has_z else None)
    if typ == MULTILINESTRING:
        for chunk in _split_top(inner):
            c = _parse_coords(chunk, ndim)
            parts.append((LINESTRING, [c[:, :2]]))
            zparts.append([c[:, 2]] if has_z else None)
        return typ, parts, (zparts if has_z else None)
    if typ == MULTIPOLYGON:
        for poly_chunk in _split_top(inner):
            rings, zr = [], []
            for ring_chunk in _split_top(poly_chunk):
                c = _parse_coords(ring_chunk, ndim)
                rings.append(c[:, :2])
                zr.append(c[:, 2] if has_z else None)
            parts.append((POLYGON, rings))
            zparts.append(zr if has_z else None)
        return typ, parts, (zparts if has_z else None)
    if typ == GEOMETRYCOLLECTION:
        # split top-level sub-geometries by scanning type names at depth 1
        subs: list[str] = []
        depth = 0
        start = None
        i = 0
        # inner is the text between the outermost parens
        token_re = re.compile(r"[A-Z]", re.IGNORECASE)
        idx = 0
        while idx < len(inner):
            ch = inner[idx]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif depth == 0 and token_re.match(ch) and start is None:
                start = idx
            elif depth == 0 and ch == "," and start is not None:
                subs.append(inner[start:idx])
                start = None
            idx += 1
        if start is not None:
            subs.append(inner[start:])
        any_z = False
        for sub in subs:
            styp, sparts, szparts, *_ = (*parse_wkt_one(sub),)
            if szparts is None:
                szparts = [None] * len(sparts)
            else:
                any_z = True
            parts.extend(sparts)
            zparts.extend(szparts)
        return typ, parts, (zparts if any_z else None)
    raise WKTParseError(f"unhandled type {name}")  # pragma: no cover


def _fill_z(parts, zparts):
    """Normalize zparts: None entries -> NaN arrays matching ring lengths."""
    out = []
    for (_pt, rings), z in zip(parts, zparts):
        if z is None:
            out.append([np.full(len(r), np.nan) for r in rings])
        else:
            out.append([np.asarray(zi, dtype=np.float64) if zi is not None
                        else np.full(len(r), np.nan)
                        for r, zi in zip(rings, z)])
    return out


def from_wkt(series, on_invalid: str = "raise") -> GeometryBatch:
    """Series/list of WKT strings (None allowed) -> GeometryBatch.

    on_invalid in {'raise','warn','ignore'} mirrors
    /root/reference/geopandas/array.py:137-147 (warn/ignore -> None rows).
    """
    if isinstance(series, pd.Series):
        vals = series.to_numpy(dtype=object)
    else:
        vals = np.asarray(series, dtype=object)
    b = GeometryBatchBuilder()
    for v in vals:
        if v is None or (isinstance(v, float) and np.isnan(v)):
            b.add_missing()
            continue
        try:
            typ, parts, zparts = parse_wkt_one(str(v))
        except WKTParseError as e:
            if on_invalid == "raise":
                raise
            if on_invalid == "warn":
                warnings.warn(str(e))
            b.add_missing()
            continue
        if zparts is not None:
            zparts = _fill_z(parts, zparts)
        b.add(typ, parts, zparts)
    return b.finish()


# ---------------------------------------------------------------------------
# format


def _fmt_num(v: float, rounding: int | None) -> str:
    if rounding is not None:
        v = round(v, rounding)
    if v == int(v) and abs(v) < 1e15:
        # preserve the IEEE sign of negative zero (printf '%g' parity):
        # dropping it makes to_wkt->from_wkt flip the WKB sign bit
        if v == 0 and math.copysign(1.0, v) < 0:
            return "-0"
        return str(int(v))
    return repr(float(v))


def _fmt_ring(ring: np.ndarray, rounding: int | None,
              z: np.ndarray | None = None) -> str:
    if z is not None:
        return ", ".join(
            f"{_fmt_num(x, rounding)} {_fmt_num(y, rounding)}"
            f" {_fmt_num(zz, rounding)}"
            for (x, y), zz in zip(ring, z))
    return ", ".join(
        f"{_fmt_num(x, rounding)} {_fmt_num(y, rounding)}" for x, y in ring
    )


def to_wkt(batch: GeometryBatch, rounding: int | None = None) -> np.ndarray:
    """GeometryBatch -> object ndarray of WKT strings (None for missing).
    Rows flagged 3-D emit the ``Z`` designator and three ordinates, so Z
    round-trips through WKT (reference to_wkt, array.py:190)."""
    n = len(batch)
    out = np.empty(n, dtype=object)
    ghz = batch.geom_has_z if batch.zs is not None else None

    for g in range(n):
        t = int(batch.types[g])
        if t == MISSING:
            out[g] = None
            continue
        hz = bool(ghz[g]) if ghz is not None else False
        ztag = "Z " if hz else ""

        def zr(p: int) -> list:
            """Per-ring z arrays of part p (None entries when 2-D)."""
            if not hz:
                r0, r1 = batch.part_ring_off[p], batch.part_ring_off[p + 1]
                return [None] * (r1 - r0)
            r0, r1 = batch.part_ring_off[p], batch.part_ring_off[p + 1]
            return [batch.zs[batch.ring_coord_off[r]:batch.ring_coord_off[r + 1]]
                    for r in range(r0, r1)]

        p0, p1 = batch.geom_part_off[g], batch.geom_part_off[g + 1]
        name = TYPE_NAMES[t].upper()
        c0, c1 = batch.geom_coord_off[g], batch.geom_coord_off[g + 1]
        if c1 == c0:
            out[g] = f"{name} {ztag}EMPTY" if hz else f"{name} EMPTY"
            continue
        if t == POINT:
            ring = batch.part_rings(p0)[0]
            out[g] = f"POINT {ztag}({_fmt_ring(ring, rounding, zr(p0)[0])})"
        elif t == LINESTRING:
            ring = batch.part_rings(p0)[0]
            out[g] = (f"LINESTRING {ztag}"
                      f"({_fmt_ring(ring, rounding, zr(p0)[0])})")
        elif t == POLYGON:
            rings = batch.part_rings(p0)
            zs_ = zr(p0)
            body = ", ".join(f"({_fmt_ring(r, rounding, z)})"
                             for r, z in zip(rings, zs_))
            out[g] = f"POLYGON {ztag}({body})"
        elif t == MULTIPOINT:
            body = ", ".join(
                f"({_fmt_ring(batch.part_rings(p)[0], rounding, zr(p)[0])})"
                for p in range(p0, p1))
            out[g] = f"MULTIPOINT {ztag}({body})"
        elif t == MULTILINESTRING:
            body = ", ".join(
                f"({_fmt_ring(batch.part_rings(p)[0], rounding, zr(p)[0])})"
                for p in range(p0, p1)
            )
            out[g] = f"MULTILINESTRING {ztag}({body})"
        elif t == MULTIPOLYGON:
            polys = []
            for p in range(p0, p1):
                rings = batch.part_rings(p)
                zs_ = zr(p)
                polys.append("(" + ", ".join(
                    f"({_fmt_ring(r, rounding, z)})"
                    for r, z in zip(rings, zs_)) + ")")
            out[g] = f"MULTIPOLYGON {ztag}({', '.join(polys)})"
        else:  # GEOMETRYCOLLECTION (flattened parts)
            subs = []
            for p in range(p0, p1):
                pt = int(batch.part_types[p])
                rings = batch.part_rings(p)
                zs_ = zr(p)
                if pt == POINT:
                    subs.append(
                        f"POINT {ztag}({_fmt_ring(rings[0], rounding, zs_[0])})"
                        if rings and len(rings[0]) else "POINT EMPTY")
                elif pt == LINESTRING:
                    subs.append(f"LINESTRING {ztag}"
                                f"({_fmt_ring(rings[0], rounding, zs_[0])})")
                else:
                    body = ", ".join(f"({_fmt_ring(r, rounding, z)})"
                                     for r, z in zip(rings, zs_))
                    subs.append(f"POLYGON {ztag}({body})")
            out[g] = f"GEOMETRYCOLLECTION {ztag}({', '.join(subs)})"
    return out
