"""Mixed-dimension binary ops — the rest of the type matrix.

The polygon engines (clipping.py fast paths, boolean.py sweep) cover
polygonal x polygonal; reference ``intersection``/``difference``/``union``/
``symmetric_difference`` (base.py:4192/:3852/:4078/:3963) accept every
geometry-type combination. This module adds:

* puntal x puntal / puntal x lineal (coordinate + on-segment tests)
* lineal x lineal (collinear-overlap pieces + crossing points)
* mixed-dimension difference / union / symmetric_difference
* GeometryCollection decomposition for intersection and difference
  (parts are processed independently — standard disjoint-parts
  assumption for valid collections)

GEOS parity notes: lineal results are emitted as maximal merged pieces
along the left operand (GEOS nodes unions at crossings; our lineal union
returns the non-noded collection a + (b - a), which is set-equal as a
point set but may differ in part structure).
"""

from __future__ import annotations

import numpy as np

from .ragged import (
    GEOMETRYCOLLECTION, LINESTRING, MISSING, MULTILINESTRING, MULTIPOINT,
    MULTIPOLYGON, POINT, POLYGON, TYPE_DIM, GeometryBatch,
    GeometryBatchBuilder)

_EPS = 1e-12


# ---------------------------------------------------------------------------
# extraction helpers

def puntal_coords(b: GeometryBatch, g: int) -> np.ndarray:
    c0, c1 = b.geom_coord_off[g], b.geom_coord_off[g + 1]
    return b.coords[c0:c1]


def line_chains(b: GeometryBatch, g: int) -> list:
    """Coordinate chains (>=2 points) of all lineal parts of g."""
    chains = []
    for p in range(b.geom_part_off[g], b.geom_part_off[g + 1]):
        if b.part_types[p] == LINESTRING:
            for r in b.part_rings(p):
                if len(r) >= 2:
                    chains.append(r)
    return chains


def _chain_segs(chains: list):
    if not chains:
        return np.empty((0, 2)), np.empty((0, 2))
    s0 = np.vstack([c[:-1] for c in chains])
    s1 = np.vstack([c[1:] for c in chains])
    return s0, s1


def _pts_on_segments(pts: np.ndarray, s0: np.ndarray, s1: np.ndarray,
                     tol: float = 0.0) -> np.ndarray:
    """bool[n]: point lies on any segment (distance <= tol)."""
    if len(pts) == 0 or len(s0) == 0:
        return np.zeros(len(pts), dtype=bool)
    from .kernels import point_segment_dist2

    d2 = point_segment_dist2(pts[:, 0], pts[:, 1], s0, s1)
    return d2.min(axis=1) <= tol * tol


def _pts_match(pts: np.ndarray, other: np.ndarray) -> np.ndarray:
    """bool[n]: point coordinate-equal to some point of other."""
    if len(pts) == 0 or len(other) == 0:
        return np.zeros(len(pts), dtype=bool)
    return ((pts[:, None, 0] == other[None, :, 0])
            & (pts[:, None, 1] == other[None, :, 1])).any(axis=1)


def _pts_in_polygon(pts: np.ndarray, b: GeometryBatch, g: int) -> np.ndarray:
    """bool[n]: point inside-or-on polygon geometry g."""
    if len(pts) == 0:
        return np.zeros(0, dtype=bool)
    from .kernels import points_in_geom

    return points_in_geom(pts[:, 0], pts[:, 1], b, g) != 0


def puntal_membership(pts: np.ndarray, b: GeometryBatch, g: int) -> np.ndarray:
    """bool[n]: point intersects geometry g of any type."""
    t = int(b.types[g])
    d = int(TYPE_DIM[t]) if t != MISSING else -1
    if d == 0:
        return _pts_match(pts, puntal_coords(b, g))
    if d == 1:
        s0, s1 = _chain_segs(line_chains(b, g))
        return _pts_on_segments(pts, s0, s1)
    if d == 2:
        return _pts_in_polygon(pts, b, g)
    return np.zeros(len(pts), dtype=bool)


# ---------------------------------------------------------------------------
# lineal x lineal core

def _collinear_intervals(a0i, a1i, u, La, b0, b1):
    """Intervals [lo, hi] (in arclength along segment i of a) covered by
    collinear segments of b, plus parameter values of point contacts from
    degenerate (touch-only) parallel overlaps."""
    da = a1i - a0i
    ivals, touch_ts = [], []
    for j in range(len(b0)):
        db = b1[j] - b0[j]
        cross = da[0] * db[1] - da[1] * db[0]
        if abs(cross) > _EPS * max(La, 1.0) * max(np.hypot(*db), 1.0):
            continue
        w = b0[j] - a0i
        if abs(da[0] * w[1] - da[1] * w[0]) > _EPS * max(La, 1.0):
            continue
        tb0 = float(np.dot(b0[j] - a0i, u))
        tb1 = float(np.dot(b1[j] - a0i, u))
        lo = max(0.0, min(tb0, tb1))
        hi = min(La, max(tb0, tb1))
        if hi - lo > _EPS * max(La, 1.0):
            ivals.append((lo, hi))
        elif hi >= lo - _EPS * max(La, 1.0):
            touch_ts.append((lo + hi) / 2.0)
    return _merge_intervals(ivals), touch_ts


def _merge_intervals(ivals: list) -> list:
    if not ivals:
        return []
    ivals.sort()
    out = [list(ivals[0])]
    for lo, hi in ivals[1:]:
        if lo <= out[-1][1] + _EPS:
            out[-1][1] = max(out[-1][1], hi)
        else:
            out.append([lo, hi])
    return out


def _crossing_points(a0, a1, b0, b1) -> list:
    """Proper/touching intersection points of non-parallel segment pairs."""
    pts = []
    for i in range(len(a0)):
        da = a1[i] - a0[i]
        for j in range(len(b0)):
            db = b1[j] - b0[j]
            denom = da[0] * db[1] - da[1] * db[0]
            scale = max(np.hypot(*da), 1.0) * max(np.hypot(*db), 1.0)
            if abs(denom) <= _EPS * scale:
                continue
            w = b0[j] - a0[i]
            t = (w[0] * db[1] - w[1] * db[0]) / denom
            s = (w[0] * da[1] - w[1] * da[0]) / denom
            if -_EPS <= t <= 1 + _EPS and -_EPS <= s <= 1 + _EPS:
                pts.append(a0[i] + np.clip(t, 0.0, 1.0) * da)
    return pts


def line_line_intersection(ca: list, cb: list):
    """-> (pieces: list[(k,2) arrays], points: (m,2) array).

    Pieces are the collinear overlaps (merged along each a-segment, then
    chained across adjacent segments); points are crossings / touches not
    interior to any piece.
    """
    a0, a1 = _chain_segs(ca)
    b0, b1 = _chain_segs(cb)
    pieces, pt_list = [], []
    for i in range(len(a0)):
        da = a1[i] - a0[i]
        La = float(np.hypot(*da))
        if La == 0.0:
            continue
        u = da / La
        ivals, touch_ts = _collinear_intervals(a0[i], a1[i], u, La, b0, b1)
        for lo, hi in ivals:
            pieces.append(np.vstack([a0[i] + lo * u, a0[i] + hi * u]))
        for t in touch_ts:
            pt_list.append(a0[i] + t * u)
    pt_list.extend(_crossing_points(a0, a1, b0, b1))
    pieces = _chain_pieces(pieces)
    pts = _dedupe_points(pt_list)
    if len(pts) and pieces:
        p0, p1 = _chain_segs(pieces)
        pts = pts[~_pts_on_segments(pts, p0, p1, tol=1e-9)]
    return pieces, pts


def _chain_pieces(pieces: list) -> list:
    """Merge pieces that share endpoints into maximal chains."""
    if len(pieces) <= 1:
        return pieces
    pieces = [p.copy() for p in pieces]
    merged = True
    while merged:
        merged = False
        for i in range(len(pieces)):
            if pieces[i] is None:
                continue
            for j in range(len(pieces)):
                if i == j or pieces[j] is None:
                    continue
                a, b = pieces[i], pieces[j]
                if np.allclose(a[-1], b[0], atol=1e-12):
                    pieces[i] = np.vstack([a, b[1:]])
                elif np.allclose(a[-1], b[-1], atol=1e-12):
                    pieces[i] = np.vstack([a, b[::-1][1:]])
                elif np.allclose(a[0], b[-1], atol=1e-12):
                    pieces[i] = np.vstack([b, a[1:]])
                elif np.allclose(a[0], b[0], atol=1e-12):
                    pieces[i] = np.vstack([b[::-1], a[1:]])
                else:
                    continue
                pieces[j] = None
                merged = True
                break
    return [p for p in pieces if p is not None]


def _dedupe_points(pt_list: list) -> np.ndarray:
    if not pt_list:
        return np.empty((0, 2))
    pts = np.array(pt_list, dtype=np.float64)
    return np.unique(np.round(pts, 12), axis=0)


def line_line_difference(ca: list, cb: list) -> list:
    """Pieces of a's linework NOT covered by collinear segments of b."""
    b0, b1 = _chain_segs(cb)
    out = []
    for chain in ca:
        for i in range(len(chain) - 1):
            p0, p1 = chain[i], chain[i + 1]
            da = p1 - p0
            La = float(np.hypot(*da))
            if La == 0.0:
                continue
            u = da / La
            ivals, _ = _collinear_intervals(p0, p1, u, La, b0, b1)
            pos = 0.0
            for lo, hi in ivals:
                if lo - pos > _EPS * max(La, 1.0):
                    out.append(np.vstack([p0 + pos * u, p0 + lo * u]))
                pos = max(pos, hi)
            if La - pos > _EPS * max(La, 1.0):
                out.append(np.vstack([p0 + pos * u, p0 + La * u]))
    return _chain_pieces(out)


# ---------------------------------------------------------------------------
# emission helpers

def emit_points(out: GeometryBatchBuilder, pts: np.ndarray) -> None:
    if len(pts) == 0:
        out.add(POINT, [(POINT, [])])
    elif len(pts) == 1:
        out.add(POINT, [(POINT, [pts[:1]])])
    else:
        out.add(MULTIPOINT, [(POINT, [pts[i:i + 1]]) for i in range(len(pts))])


def emit_lines(out: GeometryBatchBuilder, pieces: list) -> None:
    if not pieces:
        out.add(LINESTRING, [(LINESTRING, [])])
    elif len(pieces) == 1:
        out.add(LINESTRING, [(LINESTRING, pieces)])
    else:
        out.add(MULTILINESTRING, [(LINESTRING, [p]) for p in pieces])


def emit_mixed(out: GeometryBatchBuilder, pieces: list, pts: np.ndarray,
               polys: list | None = None) -> None:
    """Emit the simplest type covering the result parts."""
    polys = polys or []
    has = (bool(len(pts)), bool(pieces), bool(polys))
    if has == (True, False, False):
        emit_points(out, pts)
    elif has == (False, True, False):
        emit_lines(out, pieces)
    elif has == (False, False, True):
        from .clipping import _emit_polys

        _emit_polys(out, polys)
    elif not any(has):
        out.add(GEOMETRYCOLLECTION, [])
    else:
        parts = []
        parts.extend((POINT, [pts[i:i + 1]]) for i in range(len(pts)))
        parts.extend((LINESTRING, [p]) for p in pieces)
        parts.extend((POLYGON, rings) for rings in polys)
        out.add(GEOMETRYCOLLECTION, parts)


# ---------------------------------------------------------------------------
# single-part batches (GeometryCollection decomposition)

_PART_AS_GEOM = {POINT: POINT, LINESTRING: LINESTRING, POLYGON: POLYGON}


def decompose(b: GeometryBatch, g: int) -> list:
    """Single-geometry batches for each simple part of geometry g (a
    simple/multi geometry decomposes into its parts; ragged storage
    already flattens GeometryCollections into simple parts)."""
    subs = []
    for p in range(b.geom_part_off[g], b.geom_part_off[g + 1]):
        pt = int(b.part_types[p])
        bld = GeometryBatchBuilder()
        bld.add(_PART_AS_GEOM.get(pt, pt), [(pt, b.part_rings(p))])
        subs.append(bld.finish())
    return subs


def _result_parts(res: GeometryBatch):
    """(points list, line pieces list, polygon ring-lists list) of a
    1-row result batch, skipping empties/missing."""
    pts, lines, polys = [], [], []
    if int(res.types[0]) == MISSING:
        return pts, lines, polys
    cur_poly = None
    for p in range(res.geom_part_off[0], res.geom_part_off[1]):
        ptp = int(res.part_types[p])
        rings = [r for r in res.part_rings(p) if len(r)]
        if not rings:
            continue
        if ptp == POINT:
            pts.extend(rings)
        elif ptp == LINESTRING:
            lines.extend(rings)
        elif ptp == POLYGON:
            cur_poly = rings
            polys.append(cur_poly)
    return pts, lines, polys


def collection_intersection(lb: GeometryBatch, ga: int, rb: GeometryBatch,
                            gb: int, out: GeometryBatchBuilder) -> None:
    """Intersection where either side is (or contains) a collection:
    intersect every simple part pair, collect non-empty results.
    Assumes collection parts are disjoint (valid collections)."""
    from .clipping import pairwise_intersection

    pts_all, lines_all, polys_all = [], [], []
    for sa in decompose(lb, ga):
        for sb in decompose(rb, gb):
            res = pairwise_intersection(sa, sb)
            pts, lines, polys = _result_parts(res)
            pts_all.extend(pts)
            lines_all.extend(lines)
            polys_all.extend(polys)
    pts = _dedupe_points([p[0] for p in pts_all])
    emit_mixed(out, lines_all, pts, polys_all)


# ---------------------------------------------------------------------------
# mixed-dimension boolean (difference / union / symmetric_difference)

def mixed_boolean(lb: GeometryBatch, ga: int, rb: GeometryBatch, gb: int,
                  op: str, out: GeometryBatchBuilder) -> None:
    """difference/union/xor for any combination that is not polygonal x
    polygonal (the sweep handles that)."""
    lt, rt = int(lb.types[ga]), int(rb.types[gb])
    da, db = int(TYPE_DIM[lt]), int(TYPE_DIM[rt])
    if lt == GEOMETRYCOLLECTION and op == "difference":
        # part-wise: (part - b) for every part
        from .clipping import pairwise_boolean

        pts_all, lines_all, polys_all = [], [], []
        for sa in decompose(lb, ga):
            one = GeometryBatchBuilder()
            mixed_or_poly_boolean(sa, 0, rb, gb, op, one)
            pts, lines, polys = _result_parts(one.finish())
            pts_all.extend(pts)
            lines_all.extend(lines)
            polys_all.extend(polys)
        emit_mixed(out, lines_all, _dedupe_points([p[0] for p in pts_all]),
                   polys_all)
        return
    if lt == GEOMETRYCOLLECTION or rt == GEOMETRYCOLLECTION:
        raise NotImplementedError(
            f"{op} with GeometryCollection operands is supported only for "
            "difference with the collection on the left")

    if op == "difference":
        if da == 0:
            pts = puntal_coords(lb, ga)
            keep = pts[~puntal_membership(pts, rb, gb)]
            emit_points(out, keep)
            return
        if da == 1:
            ca = line_chains(lb, ga)
            if db == 0:
                emit_lines(out, ca)  # points don't reduce a line
                return
            if db == 1:
                emit_lines(out, line_line_difference(ca, line_chains(rb, gb)))
                return
            # line - polygon: outside pieces
            from .boolean import clip_line_rings
            from .clipping import _all_poly_rings

            rings = _all_poly_rings(rb, gb)[0]
            pieces = []
            for chain in ca:
                pieces.extend(clip_line_rings(chain, rings, False))
            emit_lines(out, _chain_pieces(pieces))
            return
        # polygon - lower-dim: identity
        _copy_geom(lb, ga, out)
        return

    # union / xor, mixed dims or non-polygonal same-dim
    if op == "union":
        if da == db == 0:
            pts = np.vstack([puntal_coords(lb, ga), puntal_coords(rb, gb)]) \
                if len(puntal_coords(rb, gb)) else puntal_coords(lb, ga)
            emit_points(out, np.unique(np.round(pts, 12), axis=0)
                        if len(pts) else pts)
            return
        if da == db == 1:
            ca = line_chains(lb, ga)
            rem = line_line_difference(line_chains(rb, gb), ca)
            emit_lines(out, ca + rem)
            return
        # mixed dims: higher + (lower - higher)
        hi_b, hi_g, lo_b, lo_g = (lb, ga, rb, gb) if da > db else (rb, gb, lb, ga)
        one = GeometryBatchBuilder()
        mixed_or_poly_boolean(lo_b, lo_g, hi_b, hi_g, "difference", one)
        pts, lines, _ = _result_parts(one.finish())
        hpts, hlines, hpolys = _result_parts(hi_b.geom_slice(hi_g))
        emit_mixed(out, hlines + lines,
                   _dedupe_points([p[0] for p in hpts + pts]), hpolys)
        return

    # xor = (a - b) + (b - a)
    one = GeometryBatchBuilder()
    mixed_or_poly_boolean(lb, ga, rb, gb, "difference", one)
    two = GeometryBatchBuilder()
    mixed_or_poly_boolean(rb, gb, lb, ga, "difference", two)
    p1, l1, g1 = _result_parts(one.finish())
    p2, l2, g2 = _result_parts(two.finish())
    if not (p1 or p2 or l1 or l2 or g1 or g2) and da == db:
        # GEOS emits a typed empty when both operands share a dimension
        if da == 0:
            emit_points(out, np.empty((0, 2)))
        elif da == 1:
            emit_lines(out, [])
        else:
            out.add(POLYGON, [(POLYGON, [])])
        return
    emit_mixed(out, l1 + l2, _dedupe_points([p[0] for p in p1 + p2]), g1 + g2)


def _copy_geom(b: GeometryBatch, g: int, out: GeometryBatchBuilder) -> None:
    t = int(b.types[g])
    if t == MISSING:
        out.add_missing()
        return
    parts = [(int(b.part_types[p]), b.part_rings(p))
             for p in range(b.geom_part_off[g], b.geom_part_off[g + 1])]
    out.add(t, parts)


def mixed_or_poly_boolean(lb: GeometryBatch, ga: int, rb: GeometryBatch,
                          gb: int, op: str, out: GeometryBatchBuilder) -> None:
    """Route one pair: polygonal x polygonal -> sweep, else mixed path."""
    lt, rt = int(lb.types[ga]), int(rb.types[gb])
    if TYPE_DIM[lt] == 2 and TYPE_DIM[rt] == 2 \
            and lt != GEOMETRYCOLLECTION and rt != GEOMETRYCOLLECTION:
        from .boolean import boolean_rings, group_rings
        from .clipping import _all_poly_rings, _emit_polys

        key = {"difference": "difference", "union": "union",
               "symmetric_difference": "xor"}[op]
        res = boolean_rings(_all_poly_rings(lb, ga)[0],
                            _all_poly_rings(rb, gb)[0], key)
        _emit_polys(out, group_rings(res))
        return
    mixed_boolean(lb, ga, rb, gb, op, out)
