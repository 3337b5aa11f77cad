"""Unary geometry kernels completing the SURVEY.md §2.2/§2.3 inventory.

Reference semantics (file:line cites are /root/reference/geopandas/):
``is_valid`` base.py:209, ``is_valid_reason`` :249, ``is_simple`` :453,
``is_ring`` :481, ``is_ccw`` :516, ``is_closed`` :557, ``has_z`` :591,
``get_geometry`` :672, ``exterior`` :1196, ``interiors`` :1310,
``extract_unique_points`` :1234, ``remove_repeated_points`` :1351,
``normalize`` :1608, ``segmentize`` :1711, ``force_3d`` :1824,
``line_merge`` :1887, ``minimum_rotated_rectangle`` :1156,
``minimum_bounding_circle`` :1509 / ``_radius`` :1542,
``minimum_clearance`` :1575, ``set_precision`` :1389, ``get_precision``
:622, ``interpolate`` :5240, ``project`` base.py:5141,
``get_coordinates`` :5550.

All kernels take/return GeometryBatch; loops are per-geometry (geometries
are small), math inside each geometry is numpy.
"""

from __future__ import annotations

import numpy as np

from .kernels import signed_ring_areas
from .ragged import (
    LINESTRING,
    MISSING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    TYPE_DIM,
    GeometryBatch,
    GeometryBatchBuilder,
)


def _geom_rings(b: GeometryBatch, g: int):
    """[(part_type, ring ndarray), ...] for geometry g."""
    out = []
    for p in range(b.geom_part_off[g], b.geom_part_off[g + 1]):
        pt = int(b.part_types[p])
        for r in range(b.part_ring_off[p], b.part_ring_off[p + 1]):
            out.append((pt, b.coords[b.ring_coord_off[r]:b.ring_coord_off[r + 1]]))
    return out


def _ring_self_intersects(ring: np.ndarray, closed: bool) -> bool:
    """Any non-adjacent segment pair of one ring properly intersects or
    overlaps (vectorized O(E^2) — rings are small)."""
    n = len(ring) - 1
    if n < 2:
        return False
    p0 = ring[:-1]
    p1 = ring[1:]
    i = np.arange(n)
    ii, jj = np.meshgrid(i, i, indexing="ij")
    sel = jj > ii + 1  # skip self + adjacent
    if closed:
        sel &= ~((ii == 0) & (jj == n - 1))  # closing adjacency
    if not sel.any():
        return False
    a0 = p0[ii[sel]]; a1 = p1[ii[sel]]
    b0 = p0[jj[sel]]; b1 = p1[jj[sel]]
    d1 = np.cross(a1 - a0, b0 - a0)
    d2 = np.cross(a1 - a0, b1 - a0)
    d3 = np.cross(b1 - b0, a0 - b0)
    d4 = np.cross(b1 - b0, a1 - b0)
    proper = ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0)) \
        & (d1 != 0) & (d2 != 0) & (d3 != 0) & (d4 != 0)
    if proper.any():
        return True

    def on(a, b, c):
        return (
            (np.minimum(a[:, 0], b[:, 0]) <= c[:, 0]) & (c[:, 0] <= np.maximum(a[:, 0], b[:, 0]))
            & (np.minimum(a[:, 1], b[:, 1]) <= c[:, 1]) & (c[:, 1] <= np.maximum(a[:, 1], b[:, 1]))
        )

    touch = (
        ((d1 == 0) & on(a0, a1, b0)) | ((d2 == 0) & on(a0, a1, b1))
        | ((d3 == 0) & on(b0, b1, a0)) | ((d4 == 0) & on(b0, b1, a1))
    )
    return bool(touch.any())


def is_closed(b: GeometryBatch) -> np.ndarray:
    """True for lineal geometries whose every ring closes (base.py:557);
    False for non-lineal (GEOS behavior)."""
    n = len(b)
    out = np.zeros(n, dtype=bool)
    for g in range(n):
        if TYPE_DIM[b.types[g]] != 1:
            continue
        rings = _geom_rings(b, g)
        ok = len(rings) > 0
        for _, r in rings:
            if len(r) < 2 or not (r[0] == r[-1]).all():
                ok = False
                break
        out[g] = ok
    return out


def is_simple(b: GeometryBatch) -> np.ndarray:
    """No self-intersecting linework (base.py:453). Points: True."""
    n = len(b)
    out = np.zeros(n, dtype=bool)
    for g in range(n):
        t = b.types[g]
        if t == MISSING:
            continue
        if TYPE_DIM[t] == 0:
            out[g] = True
            continue
        ok = True
        for _, r in _geom_rings(b, g):
            closed = len(r) >= 2 and (r[0] == r[-1]).all()
            if _ring_self_intersects(r, closed):
                ok = False
                break
        out[g] = ok
    return out


def is_ring(b: GeometryBatch) -> np.ndarray:
    """Closed + simple linestring (base.py:481)."""
    n = len(b)
    out = np.zeros(n, dtype=bool)
    closed = is_closed(b)
    simple = is_simple(b)
    for g in range(n):
        out[g] = bool(b.types[g] == LINESTRING and closed[g] and simple[g])
    return out


def is_ccw(b: GeometryBatch) -> np.ndarray:
    """First ring counterclockwise (base.py:516). Only closed lineal rings
    qualify; other types -> False (shapely behavior)."""
    n = len(b)
    out = np.zeros(n, dtype=bool)
    for g in range(n):
        if b.types[g] != LINESTRING:
            continue
        rings = _geom_rings(b, g)
        if not rings:
            continue
        r = rings[0][1]
        if len(r) < 4 or not (r[0] == r[-1]).all():
            continue
        area2 = np.cross(r[:-1], r[1:]).sum()
        out[g] = bool(area2 > 0)
    return out


def _rings_self_intersect_bulk(coords: np.ndarray, starts: np.ndarray,
                               lens: np.ndarray) -> np.ndarray:
    """Vectorized _ring_self_intersects over MANY closed rings at once
    (round 4): rings grouped by point count share one non-adjacent
    pair-index template, so the whole batch evaluates as (rings, pairs)
    numpy ops — the per-ring python loop cost ~0.3 ms/ring and dominated
    is_valid on clean inputs. Groups are chunked so the temporaries stay
    bounded on vertex-heavy rings."""
    out = np.zeros(len(starts), dtype=bool)
    for npts in np.unique(lens):
        idx = np.nonzero(lens == npts)[0]
        ns = int(npts) - 1
        if ns < 2:
            continue
        i = np.arange(ns)
        ii, jj = np.meshgrid(i, i, indexing="ij")
        sel = (jj > ii + 1) & ~((ii == 0) & (jj == ns - 1))
        if not sel.any():
            continue
        I, J = ii[sel], jj[sel]
        M = len(I)
        step = max(1, (1 << 22) // M)
        for c0 in range(0, len(idx), step):
            sub = idx[c0:c0 + step]
            pts = coords[starts[sub][:, None]
                         + np.arange(int(npts))[None, :]]
            a0, a1 = pts[:, I], pts[:, I + 1]
            b0, b1 = pts[:, J], pts[:, J + 1]
            d1 = np.cross(a1 - a0, b0 - a0)
            d2 = np.cross(a1 - a0, b1 - a0)
            d3 = np.cross(b1 - b0, a0 - b0)
            d4 = np.cross(b1 - b0, a1 - b0)
            proper = ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0)) \
                & (d1 != 0) & (d2 != 0) & (d3 != 0) & (d4 != 0)

            def on(a, b, c):
                return ((np.minimum(a[..., 0], b[..., 0]) <= c[..., 0])
                        & (c[..., 0] <= np.maximum(a[..., 0], b[..., 0]))
                        & (np.minimum(a[..., 1], b[..., 1]) <= c[..., 1])
                        & (c[..., 1] <= np.maximum(a[..., 1], b[..., 1])))

            touch = (((d1 == 0) & on(a0, a1, b0))
                     | ((d2 == 0) & on(a0, a1, b1))
                     | ((d3 == 0) & on(b0, b1, a0))
                     | ((d4 == 0) & on(b0, b1, a1)))
            out[sub] = (proper | touch).any(axis=1)
    return out


def is_valid(b: GeometryBatch, reason: bool = False):
    """Practical OGC validity (base.py:209/:249): rings closed with >= 4
    points, no ring self-intersection, holes inside the exterior. Returns
    bool array, or (bool array, reason str array) with ``reason``.

    Missing/puntal/lineal rows and single-part single-ring polygons (the
    overwhelmingly common shapes) evaluate fully vectorized; only
    geometries with holes or multiple parts take the per-geometry loop
    (hole containment / shell nesting need point-in-ring tests)."""
    from .kernels import points_in_ring

    n = len(b)
    ok = np.zeros(n, dtype=bool)
    msgs = np.empty(n, dtype=object)
    types = np.asarray(b.types)
    dims = TYPE_DIM[types]
    npartsg = np.diff(b.geom_part_off)
    nringsp = np.diff(b.part_ring_off)
    ring_lens = np.diff(b.ring_coord_off)

    miss = types == MISSING
    msgs[miss] = None

    nondim2 = ~miss & (dims != 2)
    if nondim2.any():
        ok[nondim2] = True
        msgs[nondim2] = "Valid Geometry"
        one_pt = np.nonzero(ring_lens == 1)[0]
        if len(one_pt):
            part_geom = np.repeat(np.arange(n), npartsg)
            ring_geom = part_geom[np.repeat(
                np.arange(len(nringsp)), nringsp)]
            bad_line = np.zeros(n, dtype=bool)
            bad_line[ring_geom[one_pt]] = True
            sel = nondim2 & (dims == 1) & bad_line
            ok[sel] = False
            msgs[sel] = "Too few points in geometry component"

    poly = ~miss & (dims == 2)
    simple = poly & (npartsg == 1)
    if simple.any():
        # first-part index is only meaningful where npartsg == 1; clip
        # keeps the gather in bounds for trailing empty geometries
        fp = np.minimum(b.geom_part_off[:-1],
                        max(len(nringsp) - 1, 0))
        simple &= nringsp[fp] == 1
    si = np.nonzero(simple)[0]
    if len(si):
        first_ring = b.part_ring_off[b.geom_part_off[si]]
        starts = b.ring_coord_off[first_ring]
        lens = ring_lens[first_ring]
        ok_s = np.ones(len(si), dtype=bool)
        msg_s = np.full(len(si), "Valid Geometry", dtype=object)
        few = (lens > 0) & (lens < 4)   # empty rings skip (valid)
        ok_s[few] = False
        msg_s[few] = "Too few points in geometry component"
        live = np.nonzero(lens >= 4)[0]
        if len(live):
            s0 = starts[live]
            closed = (b.coords[s0] == b.coords[s0 + lens[live] - 1]) \
                .all(axis=1)
            unc = live[~closed]
            ok_s[unc] = False
            msg_s[unc] = "Ring is not closed"
            cl = live[closed]
            if len(cl):
                hit = _rings_self_intersect_bulk(
                    b.coords, starts[cl], lens[cl])
                ok_s[cl[hit]] = False
                msg_s[cl[hit]] = "Self-intersection"
        ok[si] = ok_s
        msgs[si] = msg_s

    for g in np.nonzero(poly & ~simple)[0]:
        good, msg = True, "Valid Geometry"
        for p in range(b.geom_part_off[g], b.geom_part_off[g + 1]):
            rings = [b.coords[b.ring_coord_off[r]:b.ring_coord_off[r + 1]]
                     for r in range(b.part_ring_off[p], b.part_ring_off[p + 1])]
            for ri, r in enumerate(rings):
                if len(r) == 0:
                    continue
                if len(r) < 4:
                    good, msg = False, "Too few points in geometry component"
                    break
                if not (r[0] == r[-1]).all():
                    good, msg = False, "Ring is not closed"
                    break
                if _ring_self_intersects(r, True):
                    good, msg = False, "Self-intersection"
                    break
                if ri > 0 and len(rings[0]) >= 4:
                    st = points_in_ring(r[:-1, 0], r[:-1, 1], rings[0])
                    if (st == 0).any():  # OUTSIDE
                        good, msg = False, "Hole lies outside shell"
                        break
            if not good:
                break
        if good:
            # multi-part: shells must not nest/overlap (OGC multipolygon
            # rule). A strictly-interior vertex of another part's shell
            # catches nesting and crossing overlaps.
            from .kernels import INSIDE

            parts = []
            for p in range(b.geom_part_off[g], b.geom_part_off[g + 1]):
                rr = b.part_rings(p)
                if rr and len(rr[0]) >= 4:
                    parts.append(rr)
            for i in range(len(parts)):
                for j in range(len(parts)):
                    if i == j or not good:
                        continue
                    sj = parts[j][0]
                    st = points_in_ring(sj[:-1, 0], sj[:-1, 1], parts[i][0])
                    strictly_in = st == INSIDE
                    if not strictly_in.any():
                        continue
                    # a part fully inside another part's HOLE is legal
                    # (island-in-donut); only interior-of-i placement is
                    # a nesting violation
                    in_hole = np.zeros(len(sj) - 1, dtype=bool)
                    for hole in parts[i][1:]:
                        if len(hole) >= 4:
                            in_hole |= points_in_ring(
                                sj[:-1, 0], sj[:-1, 1], hole) != 0
                    if (strictly_in & ~in_hole).any():
                        good, msg = False, "Nested shells"
        ok[g] = good
        msgs[g] = msg
    if reason:
        return ok, msgs
    return ok

def has_z(b: GeometryBatch) -> np.ndarray:
    if b.geom_has_z is None:
        return np.zeros(len(b), dtype=bool)
    return b.geom_has_z.copy()


def get_z(b: GeometryBatch) -> np.ndarray:
    """Z of single points (geoseries.py:227); NaN elsewhere."""
    n = len(b)
    out = np.full(n, np.nan)
    if b.zs is None:
        return out
    off = b.geom_coord_off
    for g in range(n):
        if b.types[g] == POINT and off[g + 1] - off[g] == 1:
            out[g] = b.zs[off[g]]
    return out


def get_geometry(b: GeometryBatch, index: int) -> GeometryBatch:
    """n-th element of each geometry (base.py:672): multi -> part, simple
    -> itself at index 0 (or -1), else missing."""
    bld = GeometryBatchBuilder()
    simple_of = {MULTIPOINT: POINT, MULTILINESTRING: LINESTRING,
                 MULTIPOLYGON: POLYGON}
    for g in range(len(b)):
        t = int(b.types[g])
        if t == MISSING:
            bld.add_missing()
            continue
        nparts = int(b.geom_part_off[g + 1] - b.geom_part_off[g])
        if t in (POINT, LINESTRING, POLYGON):
            if index in (0, -1):
                rings = _geom_rings(b, g)
                bld.add(t, [(t, [r for _, r in rings])] if rings else [(t, [])])
            else:
                bld.add_missing()
            continue
        i = index if index >= 0 else nparts + index
        if 0 <= i < nparts:
            p = int(b.geom_part_off[g]) + i
            pt = int(b.part_types[p])
            rings = [b.coords[b.ring_coord_off[r]:b.ring_coord_off[r + 1]]
                     for r in range(b.part_ring_off[p], b.part_ring_off[p + 1])]
            bld.add(pt, [(pt, rings)])
        else:
            bld.add_missing()
    return bld.finish()


def exterior(b: GeometryBatch) -> GeometryBatch:
    """Exterior ring as LineString per polygon (base.py:1196)."""
    bld = GeometryBatchBuilder()
    for g in range(len(b)):
        t = int(b.types[g])
        if t == POLYGON:
            rings = _geom_rings(b, g)
            if rings:
                bld.add(LINESTRING, [(LINESTRING, [rings[0][1]])])
            else:
                bld.add(LINESTRING, [(LINESTRING, [])])
        elif t == MISSING:
            bld.add_missing()
        else:
            bld.add_missing()
    return bld.finish()


def interiors(b: GeometryBatch) -> list[list[np.ndarray]] :
    """Interior rings (coord arrays) per polygon (base.py:1310)."""
    out = []
    for g in range(len(b)):
        if int(b.types[g]) != POLYGON:
            out.append([])
            continue
        rings = _geom_rings(b, g)
        out.append([r for _, r in rings[1:]])
    return out


def extract_unique_points(b: GeometryBatch) -> GeometryBatch:
    """MultiPoint of first-occurrence-unique vertices (base.py:1234)."""
    bld = GeometryBatchBuilder()
    off = b.geom_coord_off
    for g in range(len(b)):
        if b.types[g] == MISSING:
            bld.add_missing()
            continue
        c = b.coords[off[g]:off[g + 1]]
        if len(c) == 0:
            bld.add(MULTIPOINT, [])
            continue
        _, first = np.unique(c, axis=0, return_index=True)
        keep = c[np.sort(first)]
        bld.add(MULTIPOINT, [(POINT, [keep[i:i + 1]]) for i in range(len(keep))])
    return bld.finish()


def remove_repeated_points(b: GeometryBatch, tolerance: float = 0.0) -> GeometryBatch:
    """Drop consecutive points within tolerance (base.py:1351); ring
    closure is preserved."""
    bld = GeometryBatchBuilder()
    for g in range(len(b)):
        t = int(b.types[g])
        if t == MISSING:
            bld.add_missing()
            continue
        parts = []
        for p in range(b.geom_part_off[g], b.geom_part_off[g + 1]):
            pt = int(b.part_types[p])
            rings = []
            for r in range(b.part_ring_off[p], b.part_ring_off[p + 1]):
                c = b.coords[b.ring_coord_off[r]:b.ring_coord_off[r + 1]]
                if len(c) <= 1 or pt == POINT:
                    rings.append(c)
                    continue
                closed = (c[0] == c[-1]).all()
                d = np.sqrt(((np.diff(c, axis=0)) ** 2).sum(axis=1))
                keep = np.concatenate([[True], d > tolerance])
                cc = c[keep]
                if closed and (len(cc) == 0 or not (cc[0] == cc[-1]).all()):
                    cc = np.vstack([cc, cc[:1]])
                rings.append(cc)
            parts.append((pt, rings))
        bld.add(t, parts)
    return bld.finish()


def normalize(b: GeometryBatch) -> GeometryBatch:
    """GEOS-style normal form (base.py:1608): polygon exterior rings CW,
    holes CCW (GEOS convention), every ring starts at its minimum vertex,
    linestrings oriented so the lesser endpoint comes first, multi-part
    elements sorted descending (GEOS order)."""
    bld = GeometryBatchBuilder()

    def canon_line(c: np.ndarray) -> np.ndarray:
        if len(c) < 2 or (c[0] == c[-1]).all():
            return c
        a, z = tuple(c[0]), tuple(c[-1])
        return c[::-1] if z < a else c

    def canon_ring(c: np.ndarray, want_ccw: bool) -> np.ndarray:
        if len(c) < 4:
            return c
        area2 = np.cross(c[:-1], c[1:]).sum()
        if (area2 > 0) != want_ccw and area2 != 0:
            c = c[::-1]
        body = c[:-1]
        k = np.lexsort((body[:, 1], body[:, 0]))[0]
        body = np.roll(body, -k, axis=0)
        return np.vstack([body, body[:1]])

    for g in range(len(b)):
        t = int(b.types[g])
        if t == MISSING:
            bld.add_missing()
            continue
        parts = []
        for p in range(b.geom_part_off[g], b.geom_part_off[g + 1]):
            pt = int(b.part_types[p])
            rings = [b.coords[b.ring_coord_off[r]:b.ring_coord_off[r + 1]]
                     for r in range(b.part_ring_off[p], b.part_ring_off[p + 1])]
            if pt == POLYGON:
                rings = [canon_ring(r, want_ccw=(i != 0))
                         for i, r in enumerate(rings)]
            elif pt == LINESTRING:
                rings = [canon_line(r) for r in rings]
            parts.append((pt, rings))
        if len(parts) > 1:
            def _key(pr):
                rings = pr[1]
                if rings and len(rings[0]):
                    return (-rings[0][0][0], -rings[0][0][1])
                return (float("inf"), float("inf"))

            parts.sort(key=_key)
        bld.add(t, parts)
    return bld.finish()


def segmentize(b: GeometryBatch, max_segment_length: float) -> GeometryBatch:
    """Insert vertices so no segment exceeds max length (base.py:1711)."""
    if max_segment_length <= 0:
        raise ValueError("max_segment_length must be positive")
    bld = GeometryBatchBuilder()
    for g in range(len(b)):
        t = int(b.types[g])
        if t == MISSING:
            bld.add_missing()
            continue
        parts = []
        for p in range(b.geom_part_off[g], b.geom_part_off[g + 1]):
            pt = int(b.part_types[p])
            rings = []
            for r in range(b.part_ring_off[p], b.part_ring_off[p + 1]):
                c = b.coords[b.ring_coord_off[r]:b.ring_coord_off[r + 1]]
                if len(c) < 2 or pt == POINT:
                    rings.append(c)
                    continue
                seg = np.diff(c, axis=0)
                lens = np.sqrt((seg ** 2).sum(axis=1))
                ndiv = np.maximum(np.ceil(lens / max_segment_length), 1).astype(np.int64)
                pieces = []
                for i in range(len(c) - 1):
                    ts = np.linspace(0, 1, ndiv[i] + 1)[:-1]
                    pieces.append(c[i] + ts[:, None] * seg[i])
                pieces.append(c[-1:])
                rings.append(np.vstack(pieces))
            parts.append((pt, rings))
        bld.add(t, parts)
    return bld.finish()


def line_merge(b: GeometryBatch, directed: bool = False) -> GeometryBatch:
    """Stitch connected linestrings of a (multi)linestring (base.py:1887).

    ``directed=True`` only merges lines whose directions agree (end of
    one == start of another); no line is reversed (GEOS directed
    LineMerger)."""
    bld = GeometryBatchBuilder()
    for g in range(len(b)):
        t = int(b.types[g])
        if t == MISSING:
            bld.add_missing()
            continue
        if t not in (LINESTRING, MULTILINESTRING):
            # GEOS returns GEOMETRYCOLLECTION EMPTY for non-lineal input
            from .ragged import GEOMETRYCOLLECTION

            bld.add(GEOMETRYCOLLECTION, [])
            continue
        lines = [r for _, r in _geom_rings(b, g) if len(r) >= 2]
        merged = _merge_lines(lines, directed=directed)
        if len(merged) == 1:
            bld.add(LINESTRING, [(LINESTRING, merged)])
        else:
            bld.add(MULTILINESTRING, [(LINESTRING, [m]) for m in merged])
    return bld.finish()


def _merge_lines(lines: list[np.ndarray],
                 directed: bool = False) -> list[np.ndarray]:
    """Greedy endpoint stitching (degree<=2 nodes merge, GEOS LineMerger).

    ``directed=True`` restricts stitching to direction-preserving
    connections (a's end meets c's start, or c's end meets a's start);
    no segment is ever reversed."""
    lines = [l.copy() for l in lines]
    changed = True
    while changed:
        changed = False
        for i in range(len(lines)):
            if lines[i] is None:
                continue
            for j in range(len(lines)):
                if i == j or lines[j] is None:
                    continue
                a, c = lines[i], lines[j]
                if (a[-1] == c[0]).all():
                    lines[i] = np.vstack([a, c[1:]])
                elif not directed and (a[-1] == c[-1]).all():
                    lines[i] = np.vstack([a, c[::-1][1:]])
                elif (a[0] == c[-1]).all():
                    lines[i] = np.vstack([c, a[1:]])
                elif not directed and (a[0] == c[0]).all():
                    lines[i] = np.vstack([c[::-1], a[1:]])
                else:
                    continue
                lines[j] = None
                changed = True
                break
    return [l for l in lines if l is not None]


def force_3d(b: GeometryBatch, z: float = 0.0) -> GeometryBatch:
    out = GeometryBatch(
        types=b.types.copy(), coords=b.coords.copy(),
        ring_coord_off=b.ring_coord_off.copy(),
        part_ring_off=b.part_ring_off.copy(),
        geom_part_off=b.geom_part_off.copy(),
        part_types=b.part_types.copy(),
        zs=(b.zs.copy() if b.zs is not None
            else np.full(len(b.coords), float(z))),
        geom_has_z=np.ones(len(b), dtype=bool),
    )
    if b.zs is not None:
        out.zs = np.where(np.isnan(out.zs), float(z), out.zs)
    return out


def minimum_rotated_rectangle(b: GeometryBatch) -> GeometryBatch:
    """Smallest-area oriented bbox via rotating calipers on the convex
    hull (base.py:1156)."""
    from .transforms import _hull_one

    bld = GeometryBatchBuilder()
    off = b.geom_coord_off
    for g in range(len(b)):
        if b.types[g] == MISSING:
            bld.add_missing()
            continue
        pts = b.coords[off[g]:off[g + 1]]
        if len(pts) == 0:
            bld.add(POLYGON, [(POLYGON, [])])
            continue
        uniq = np.unique(pts, axis=0)
        if len(uniq) == 1:
            bld.add(POINT, [(POINT, [uniq[:1]])])
            continue
        hull = _hull_one(pts)  # closed CCW ring
        hb = hull[:-1] if len(hull) > 1 and (hull[0] == hull[-1]).all() else hull
        if len(hb) == 2:
            bld.add(LINESTRING, [(LINESTRING, [hb])])
            continue
        edges = np.diff(np.vstack([hb, hb[:1]]), axis=0)
        ang = np.arctan2(edges[:, 1], edges[:, 0])
        best = None
        for a in np.unique(np.mod(ang, np.pi / 2)):
            ca, sa = np.cos(-a), np.sin(-a)
            rx = hb[:, 0] * ca - hb[:, 1] * sa
            ry = hb[:, 0] * sa + hb[:, 1] * ca
            w = rx.max() - rx.min()
            h = ry.max() - ry.min()
            area = w * h
            if best is None or area < best[0]:
                best = (area, a, rx.min(), ry.min(), rx.max(), ry.max())
        _, a, x0, y0, x1, y1 = best
        rect = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])
        ca, sa = np.cos(a), np.sin(a)
        world = np.column_stack([rect[:, 0] * ca - rect[:, 1] * sa,
                                 rect[:, 0] * sa + rect[:, 1] * ca])
        bld.add(POLYGON, [(POLYGON, [world])])
    return bld.finish()


def _welzl_circle(pts: np.ndarray) -> tuple[float, float, float]:
    """Exact minimum enclosing circle (iterative Welzl)."""
    def circle2(a, c):
        ctr = (a + c) / 2
        return ctr[0], ctr[1], float(np.linalg.norm(a - c) / 2)

    def circle3(a, c, d):
        ax, ay = a; bx, by = c; cx, cy = d
        dd = 2 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
        if dd == 0:
            return None
        ux = ((ax ** 2 + ay ** 2) * (by - cy) + (bx ** 2 + by ** 2) * (cy - ay)
              + (cx ** 2 + cy ** 2) * (ay - by)) / dd
        uy = ((ax ** 2 + ay ** 2) * (cx - bx) + (bx ** 2 + by ** 2) * (ax - cx)
              + (cx ** 2 + cy ** 2) * (bx - ax)) / dd
        r = float(np.hypot(ax - ux, ay - uy))
        return ux, uy, r

    def inside(circ, p, eps=1e-9):
        return np.hypot(p[0] - circ[0], p[1] - circ[1]) <= circ[2] * (1 + 1e-12) + eps

    pts = np.unique(pts, axis=0)
    rng = np.random.default_rng(7)
    pts = pts[rng.permutation(len(pts))]
    if len(pts) == 1:
        return float(pts[0, 0]), float(pts[0, 1]), 0.0
    c = circle2(pts[0], pts[1])
    for i in range(2, len(pts)):
        if inside(c, pts[i]):
            continue
        c = circle2(pts[i], pts[0])
        for j in range(1, i):
            if inside(c, pts[j]):
                continue
            c = circle2(pts[i], pts[j])
            for k in range(j):
                if inside(c, pts[k]):
                    continue
                c3 = circle3(pts[i], pts[j], pts[k])
                if c3 is not None:
                    c = c3
    return c


def minimum_bounding_radius(b: GeometryBatch) -> np.ndarray:
    """base.py:1542."""
    n = len(b)
    out = np.full(n, np.nan)
    off = b.geom_coord_off
    for g in range(n):
        if b.types[g] == MISSING:
            continue
        pts = b.coords[off[g]:off[g + 1]]
        if len(pts) == 0:
            out[g] = 0.0
            continue
        out[g] = _welzl_circle(pts)[2]
    return out


def minimum_bounding_circle(b: GeometryBatch, quad_segs: int = 32) -> GeometryBatch:
    """base.py:1509 — circle polygon around the min enclosing circle."""
    bld = GeometryBatchBuilder()
    off = b.geom_coord_off
    ang = np.linspace(0, 2 * np.pi, 4 * quad_segs + 1)
    for g in range(len(b)):
        if b.types[g] == MISSING:
            bld.add_missing()
            continue
        pts = b.coords[off[g]:off[g + 1]]
        if len(pts) == 0:
            bld.add(POLYGON, [(POLYGON, [])])
            continue
        cx, cy, r = _welzl_circle(pts)
        if r == 0.0:
            bld.add(POINT, [(POINT, [np.array([[cx, cy]])])])
            continue
        ring = np.column_stack([cx + r * np.cos(ang), cy + r * np.sin(ang)])
        ring[-1] = ring[0]
        bld.add(POLYGON, [(POLYGON, [ring])])
    return bld.finish()


def minimum_clearance(b: GeometryBatch) -> np.ndarray:
    """Smallest vertex move that changes/invalidates topology
    (base.py:1575): min distance from any vertex to any non-incident
    segment, and between distinct vertices. inf for < 3 points."""
    from .kernels import point_segment_dist2

    n = len(b)
    out = np.full(n, np.inf)
    for g in range(n):
        if b.types[g] == MISSING:
            out[g] = np.nan
            continue
        rings = [r for _, r in _geom_rings(b, g)]
        allpts = (np.vstack([r for r in rings if len(r)])
                  if any(len(r) for r in rings) else np.empty((0, 2)))
        uniq = np.unique(allpts, axis=0) if len(allpts) else allpts
        if len(uniq) < 3:
            continue
        best = np.inf
        # vertex-vertex
        d2 = ((uniq[:, None, :] - uniq[None, :, :]) ** 2).sum(axis=2)
        np.fill_diagonal(d2, np.inf)
        best = min(best, float(np.sqrt(d2.min())))
        # vertex vs non-incident segment
        segs0, segs1 = [], []
        for r in rings:
            if len(r) >= 2:
                segs0.append(r[:-1])
                segs1.append(r[1:])
        if segs0:
            s0 = np.vstack(segs0)
            s1 = np.vstack(segs1)
            d2m = point_segment_dist2(uniq[:, 0], uniq[:, 1], s0, s1)
            incident = (
                ((uniq[:, None, 0] == s0[None, :, 0]) & (uniq[:, None, 1] == s0[None, :, 1]))
                | ((uniq[:, None, 0] == s1[None, :, 0]) & (uniq[:, None, 1] == s1[None, :, 1]))
            )
            d2m = np.where(incident, np.inf, d2m)
            if np.isfinite(d2m).any():
                best = min(best, float(np.sqrt(np.nanmin(np.where(np.isinf(d2m), np.nan, d2m)))))
        out[g] = best
    return out


def set_precision(b: GeometryBatch, grid_size: float,
                  mode: str = "valid_output") -> GeometryBatch:
    """Snap coordinates to a grid (base.py:1389). Three reference modes:

    * ``pointwise`` — naive per-coordinate rounding; duplicates kept,
      output may be invalid.
    * ``valid_output`` (default) — duplicates removed; collapsed line AND
      polygon elements dropped (empty when nothing remains); polygonal
      rows repaired via make_valid (snap-induced self-intersections and
      zero-width spikes cover no area, so parity rebuilding removes them).
    * ``keep_collapsed`` — like valid_output, but a collapsed LINE element
      is kept as a 2-equal-point LINESTRING; collapsed polygons are still
      dropped.

    Z values pass through unmodified (pointwise/per-vertex dedupe keeps
    the matching z entries); make_valid output for repaired polygons is
    2-D (snapped 3-D polygons are an undefined-Z corner in GEOS too).
    """
    if grid_size <= 0:
        raise ValueError("grid_size must be positive")
    if mode not in ("valid_output", "pointwise", "keep_collapsed"):
        raise ValueError(f"unknown set_precision mode {mode!r}")
    c = np.round(b.coords / grid_size) * grid_size
    snapped = GeometryBatch(
        types=b.types.copy(), coords=c,
        ring_coord_off=b.ring_coord_off.copy(),
        part_ring_off=b.part_ring_off.copy(),
        geom_part_off=b.geom_part_off.copy(),
        part_types=b.part_types.copy(), zs=b.zs,
        geom_has_z=b.geom_has_z,
    )
    if mode == "pointwise":
        return snapped
    bld = GeometryBatchBuilder()
    any_poly = False
    for g in range(len(snapped)):
        t = int(snapped.types[g])
        if t == MISSING:
            bld.add_missing()
            continue
        has_z = (snapped.zs is not None and snapped.geom_has_z is not None
                 and bool(snapped.geom_has_z[g]))
        parts: list = []
        zparts: list = []
        for p in range(snapped.geom_part_off[g], snapped.geom_part_off[g + 1]):
            pt = int(snapped.part_types[p])
            rings: list = []
            zrings: list = []
            for r in range(snapped.part_ring_off[p],
                           snapped.part_ring_off[p + 1]):
                lo, hi = snapped.ring_coord_off[r], snapped.ring_coord_off[r + 1]
                cc = snapped.coords[lo:hi]
                zz = snapped.zs[lo:hi] if has_z else None
                if pt == POINT or len(cc) <= 1:
                    rings.append(cc)
                    zrings.append(zz if zz is not None else np.full(len(cc), np.nan))
                    continue
                keep = np.concatenate(
                    [[True], (np.diff(cc, axis=0) != 0).any(axis=1)])
                dd = cc[keep]
                dz = zz[keep] if zz is not None else None
                # ring closure is rebuilt for POLYGON rings only — a closed
                # LINE that collapses must stay collapsed, not re-close
                if pt == POLYGON and len(dd) > 1 and not (dd[0] == dd[-1]).all():
                    dd = np.vstack([dd, dd[:1]])
                    if dz is not None:
                        dz = np.concatenate([dz, dz[:1]])
                rings.append(dd)
                zrings.append(dz if dz is not None else np.full(len(dd), np.nan))
            if pt == POINT:
                parts.append((pt, rings))
                zparts.append(zrings)
            elif pt == LINESTRING:
                ln = rings[0]
                if len(ln) >= 2:
                    parts.append((pt, rings))
                    zparts.append(zrings)
                elif mode == "keep_collapsed" and len(ln) == 1:
                    parts.append((pt, [np.vstack([ln, ln])]))
                    zparts.append([np.concatenate([zrings[0], zrings[0]])])
                # else: collapsed line dropped (valid_output)
            else:  # POLYGON part: shell needs >= 3 distinct vertices
                if rings and len(rings[0]) >= 4:
                    good = [(rings[i], zrings[i]) for i in range(len(rings))
                            if i == 0 or len(rings[i]) >= 4]
                    parts.append((pt, [x[0] for x in good]))
                    zparts.append([x[1] for x in good])
                    any_poly = True
                # else: collapsed polygon dropped in BOTH non-pointwise modes
        if not parts:
            # empty geometry of the input type: one part with zero rings
            # (the codec's EMPTY encoding), collections go fully empty
            base = {MULTIPOINT: POINT, MULTILINESTRING: LINESTRING,
                    MULTIPOLYGON: POLYGON}.get(t, t)
            if t in (POINT, LINESTRING, POLYGON):
                bld.add(t, [(base, [])])
            else:
                bld.add(t, [])
            continue
        bld.add(t, parts, zparts if has_z else None)
    out = bld.finish()
    if any_poly:
        from .validity import make_valid

        out = make_valid(out)
    return out


def interpolate(b: GeometryBatch, distance, normalized: bool = False) -> GeometryBatch:
    """Point at distance along each line (base.py:5240)."""
    bld = GeometryBatchBuilder()
    dist = np.broadcast_to(np.asarray(distance, dtype=np.float64), (len(b),))
    for g in range(len(b)):
        t = int(b.types[g])
        if t not in (LINESTRING, MULTILINESTRING) or t == MISSING:
            bld.add_missing()
            continue
        lines = [r for _, r in _geom_rings(b, g) if len(r) >= 2]
        if not lines:
            bld.add_missing()
            continue
        c = np.vstack([lines[0]] + [l[1:] if (l[0] == prev[-1]).all() else l
                                    for prev, l in zip(lines, lines[1:])]) \
            if len(lines) > 1 else lines[0]
        seg = np.diff(c, axis=0)
        lens = np.sqrt((seg ** 2).sum(axis=1))
        total = lens.sum()
        d = dist[g] * total if normalized else dist[g]
        if d < 0:
            # GEOS: negative distances measure backward from the END
            d = total + d
        d = min(max(d, 0.0), total)
        cum = np.concatenate([[0.0], np.cumsum(lens)])
        i = int(np.searchsorted(cum, d, side="right") - 1)
        i = min(i, len(lens) - 1)
        frac = 0.0 if lens[i] == 0 else (d - cum[i]) / lens[i]
        p = c[i] + frac * seg[i]
        bld.add(POINT, [(POINT, [p.reshape(1, 2)])])
    return bld.finish()


def project(lines: GeometryBatch, points: GeometryBatch,
            normalized: bool = False) -> np.ndarray:
    """Distance along each line to the nearest point of the paired point
    (base.py:5141)."""
    n = len(lines)
    out = np.full(n, np.nan)
    poff = points.geom_coord_off
    for g in range(n):
        if lines.types[g] not in (LINESTRING, MULTILINESTRING):
            continue
        if poff[g + 1] - poff[g] < 1:
            continue
        p = points.coords[poff[g]]
        segs = [r for _, r in _geom_rings(lines, g) if len(r) >= 2]
        if not segs:
            continue
        c = segs[0] if len(segs) == 1 else np.vstack(
            [segs[0]] + [l[1:] for l in segs[1:]])
        seg = np.diff(c, axis=0)
        lens2 = (seg ** 2).sum(axis=1)
        ap = p[None, :] - c[:-1]
        t = np.clip(np.where(lens2 == 0, 0.0, (ap * seg).sum(axis=1) / np.where(lens2 == 0, 1, lens2)), 0, 1)
        proj = c[:-1] + t[:, None] * seg
        d2 = ((proj - p) ** 2).sum(axis=1)
        i = int(np.argmin(d2))
        lens = np.sqrt(lens2)
        d = lens[:i].sum() + t[i] * lens[i]
        out[g] = d / lens.sum() if (normalized and lens.sum() > 0) else d
    return out


def get_coordinates(b: GeometryBatch, include_z: bool = False):
    """(N,2) coords + geometry index per coord (base.py:5550).

    ``include_z`` returns (N,3); coordinates of 2-D rows get NaN z
    (reference base.py:5550-5622 semantics)."""
    off = b.geom_coord_off
    cnt = off[1:] - off[:-1]
    idx = np.repeat(np.arange(len(b)), cnt)
    if include_z:
        if b.zs is not None:
            z = b.zs.astype(np.float64, copy=True)
            if b.geom_has_z is not None:
                z = np.where(np.repeat(b.geom_has_z, cnt), z, np.nan)
        else:
            z = np.full(len(b.coords), np.nan)
        return np.column_stack([b.coords, z]), idx
    return b.coords.copy(), idx
