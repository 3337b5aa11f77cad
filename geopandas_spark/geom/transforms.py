"""Constructive geometry->geometry kernels (SURVEY.md §2.3) over batches.

Each mirrors a reference op (file:line under /root/reference/geopandas/).
Coordinate math is numpy-vectorized; structure loops run per ring/part
within the Arrow batch.
"""

from __future__ import annotations

import numpy as np

from .kernels import INSIDE, bounds, centroid, points_in_geom
from .ragged import (
    LINESTRING,
    MISSING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    GeometryBatch,
    GeometryBatchBuilder,
)


def _copy_structure_with_coords(batch: GeometryBatch, coords: np.ndarray) -> GeometryBatch:
    return GeometryBatch(
        types=batch.types.copy(),
        coords=coords,
        ring_coord_off=batch.ring_coord_off.copy(),
        part_ring_off=batch.part_ring_off.copy(),
        geom_part_off=batch.geom_part_off.copy(),
        part_types=batch.part_types.copy(),
        zs=batch.zs.copy() if batch.zs is not None else None,
        geom_has_z=batch.geom_has_z.copy() if batch.geom_has_z is not None else None,
    )


def affine_transform(batch: GeometryBatch, matrix) -> GeometryBatch:
    """[a b d e xoff yoff] as in shapely/geopandas (base.py:5284):
    x' = a*x + b*y + xoff ; y' = d*x + e*y + yoff. One matrix for the whole
    batch, or an (n,6) array of per-row matrices."""
    m = np.asarray(matrix, dtype=np.float64)
    c = batch.coords
    if m.ndim == 1:
        a, b, d, e, xo, yo = m
        nx = a * c[:, 0] + b * c[:, 1] + xo
        ny = d * c[:, 0] + e * c[:, 1] + yo
    else:
        # per-geometry matrices: expand to per-coordinate
        off = batch.geom_coord_off
        reps = (off[1:] - off[:-1]).astype(np.int64)
        M = np.repeat(m, reps, axis=0)
        nx = M[:, 0] * c[:, 0] + M[:, 1] * c[:, 1] + M[:, 4]
        ny = M[:, 2] * c[:, 0] + M[:, 3] * c[:, 1] + M[:, 5]
    return _copy_structure_with_coords(batch, np.column_stack([nx, ny]))


def transform_fn(batch: GeometryBatch, fn, include_z: bool = False) -> GeometryBatch:
    """base.py:1751 — apply a user coordinate function to every vertex.

    ``fn`` receives an (N, 2) float64 array (or (N, 3) with include_z when
    Z values exist) and must return an array of the same shape; geometry
    structure (rings/parts/types) is preserved. This is the user-UDF
    escape hatch: it runs inside the Arrow batch, so the function is
    applied to whole coordinate blocks, never per row.
    """
    if include_z and batch.zs is not None:
        c = np.column_stack([batch.coords, batch.zs])
    else:
        c = batch.coords.copy()
    new = np.asarray(fn(c), dtype=np.float64)
    if new.shape != c.shape:
        raise ValueError(
            f"transform function changed the coordinate shape "
            f"{c.shape} -> {new.shape}; it must be shape-preserving")
    out = _copy_structure_with_coords(batch, np.ascontiguousarray(new[:, :2]))
    if include_z and batch.zs is not None and new.shape[1] == 3:
        out.zs = np.ascontiguousarray(new[:, 2])
    return out


def translate(batch: GeometryBatch, xoff=0.0, yoff=0.0) -> GeometryBatch:
    """base.py:5326."""
    return affine_transform(batch, [1.0, 0.0, 0.0, 1.0, xoff, yoff])


def _origin_coords(batch: GeometryBatch, origin) -> np.ndarray:
    if origin == "center":  # bbox center per geometry
        b = bounds(batch)
        return np.column_stack([(b[:, 0] + b[:, 2]) / 2, (b[:, 1] + b[:, 3]) / 2])
    if origin == "centroid":
        return centroid(batch)
    ox, oy = origin
    return np.column_stack([np.full(len(batch), float(ox)), np.full(len(batch), float(oy))])


def rotate(batch: GeometryBatch, angle: float, origin="center",
           use_radians: bool = False) -> GeometryBatch:
    """base.py:5364."""
    th = angle if use_radians else np.deg2rad(angle)
    ca, sa = np.cos(th), np.sin(th)
    o = _origin_coords(batch, origin)
    m = np.column_stack([
        np.full(len(batch), ca), np.full(len(batch), -sa),
        np.full(len(batch), sa), np.full(len(batch), ca),
        o[:, 0] - ca * o[:, 0] + sa * o[:, 1],
        o[:, 1] - sa * o[:, 0] - ca * o[:, 1],
    ])
    return affine_transform(batch, m)


def scale(batch: GeometryBatch, xfact=1.0, yfact=1.0, origin="center") -> GeometryBatch:
    """base.py:5414."""
    o = _origin_coords(batch, origin)
    n = len(batch)
    m = np.column_stack([
        np.full(n, xfact), np.zeros(n), np.zeros(n), np.full(n, yfact),
        o[:, 0] * (1 - xfact), o[:, 1] * (1 - yfact),
    ])
    return affine_transform(batch, m)


def skew(batch: GeometryBatch, xs=0.0, ys=0.0, origin="center",
         use_radians: bool = False) -> GeometryBatch:
    """base.py:5462."""
    tx = np.tan(xs if use_radians else np.deg2rad(xs))
    ty = np.tan(ys if use_radians else np.deg2rad(ys))
    o = _origin_coords(batch, origin)
    n = len(batch)
    m = np.column_stack([
        np.ones(n), np.full(n, tx), np.full(n, ty), np.ones(n),
        -tx * o[:, 1], -ty * o[:, 0],
    ])
    return affine_transform(batch, m)


def envelope(batch: GeometryBatch) -> GeometryBatch:
    """base.py:1115 — bbox polygon (point/line degenerate cases -> point or
    2-point linestring like GEOS)."""
    b = bounds(batch)
    out = GeometryBatchBuilder()
    for g in range(len(batch)):
        if batch.types[g] == MISSING:
            out.add_missing()
            continue
        minx, miny, maxx, maxy = b[g]
        if np.isnan(minx):
            out.add(int(batch.types[g]), [(int(batch.types[g]) if batch.types[g] <= POLYGON else POLYGON, [])])
            continue
        if minx == maxx and miny == maxy:
            out.add(POINT, [(POINT, [np.array([[minx, miny]])])])
        elif minx == maxx or miny == maxy:
            out.add(LINESTRING, [(LINESTRING, [np.array([[minx, miny], [maxx, maxy]])])])
        else:
            ring = np.array([
                [minx, miny], [maxx, miny], [maxx, maxy], [minx, maxy], [minx, miny]
            ])
            out.add(POLYGON, [(POLYGON, [ring])])
    return out.finish()


def _hull_one(pts: np.ndarray) -> np.ndarray:
    """Andrew monotone chain; returns CCW hull vertices (unclosed)."""
    pts = np.unique(pts, axis=0)
    if len(pts) <= 2:
        return pts
    # lexicographic sort already done by np.unique
    def half(points):
        out = []
        for p in points:
            while len(out) >= 2 and np.cross(out[-1] - out[-2], p - out[-2]) <= 0:
                out.pop()
            out.append(p)
        return out
    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1])


def convex_hull(batch: GeometryBatch) -> GeometryBatch:
    """base.py:861 — per-geometry convex hull (point/segment degenerate)."""
    out = GeometryBatchBuilder()
    off = batch.geom_coord_off
    for g in range(len(batch)):
        t = int(batch.types[g])
        if t == MISSING:
            out.add_missing()
            continue
        pts = batch.coords[off[g] : off[g + 1]]
        if len(pts) == 0:
            out.add(t, [(min(t, POLYGON) if t <= POLYGON else POLYGON, [])])
            continue
        hull = _hull_one(pts)
        if len(hull) == 1:
            out.add(POINT, [(POINT, [hull])])
        elif len(hull) == 2:
            out.add(LINESTRING, [(LINESTRING, [hull])])
        else:
            ring = np.vstack([hull, hull[:1]])
            out.add(POLYGON, [(POLYGON, [ring])])
    return out.finish()


def buffer_points(batch: GeometryBatch, distance, quad_segs: int = 8) -> GeometryBatch:
    """base.py:4806 for puntal inputs: circle polygon approximation with
    4*quad_segs vertices (GEOS buffer convention). This is the puntal fast
    path only — st_buffer dispatches mixed/non-point batches to
    ``buffer_general`` (capsule union via the boolean sweep), so the raise
    below is an internal guard, not the public contract."""
    n = len(batch)
    dist = np.broadcast_to(np.asarray(distance, dtype=np.float64), (n,))
    pt_mask = np.isin(batch.types, (POINT, MULTIPOINT)) | (batch.types == MISSING)
    if not pt_mask.all():
        raise NotImplementedError(
            "buffer_points is the puntal fast path; route non-point rows "
            "through buffer_general (st_buffer does this automatically)"
        )
    k = max(int(quad_segs) * 4, 4)
    th = np.arange(k) * (2 * np.pi / k)
    ring_template = np.column_stack([np.cos(th), np.sin(th)])
    out = GeometryBatchBuilder()
    off = batch.geom_coord_off
    for g in range(n):
        if batch.types[g] == MISSING:
            out.add_missing()
            continue
        pts = batch.coords[off[g] : off[g + 1]]
        d = float(dist[g])
        if len(pts) == 0 or d <= 0:
            out.add(POLYGON, [(POLYGON, [])])
            continue
        parts = []
        for p in pts:
            ring = ring_template * d + p
            ring = np.vstack([ring, ring[:1]])
            parts.append((POLYGON, [ring]))
        if len(parts) == 1:
            out.add(POLYGON, parts)
        else:
            out.add(MULTIPOLYGON, parts)
    return out.finish()


def _dp_simplify(ring: np.ndarray, tol: float) -> np.ndarray:
    """Douglas-Peucker (iterative stack)."""
    n = len(ring)
    if n <= 2:
        return ring
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        lo, hi = stack.pop()
        if hi - lo < 2:
            continue
        seg = ring[hi] - ring[lo]
        L2 = seg @ seg
        mids = ring[lo + 1 : hi]
        w = mids - ring[lo]
        if L2 == 0:
            d2 = (w ** 2).sum(axis=1)
        else:
            t = np.clip((w @ seg) / L2, 0, 1)
            proj = ring[lo] + t[:, None] * seg
            d2 = ((mids - proj) ** 2).sum(axis=1)
        imax = int(np.argmax(d2))
        if d2[imax] > tol * tol:
            k = lo + 1 + imax
            keep[k] = True
            stack.append((lo, k))
            stack.append((k, hi))
    return ring[keep]


def _ring_simple(r: np.ndarray) -> bool:
    """Closed ring self-intersection check: non-adjacent segments must
    not cross or touch (used by preserve_topology simplification)."""
    from .kernels import segments_cross

    s0, s1 = r[:-1], r[1:]
    E = len(s0)
    if E < 4:
        return True
    hits = segments_cross(s0, s1, s0, s1)
    idx = np.arange(E)
    dd = np.abs(idx[:, None] - idx[None, :])
    adj = (dd <= 1) | (dd == E - 1)
    return not bool((hits & ~adj).any())


def simplify(batch: GeometryBatch, tolerance: float,
             preserve_topology: bool = True) -> GeometryBatch:
    """base.py:4874. ``preserve_topology=False`` is plain Douglas-Peucker
    (polygon rings that collapse below 4 points are dropped, like GEOS's
    degenerate output). ``preserve_topology=True`` (the reference
    default) keeps every polygon ring valid: a ring whose DP result
    collapses or self-intersects retries at halved tolerances and
    finally keeps its ORIGINAL vertices — per-ring preservation (the
    cross-RING guarantees of GEOS's TopologyPreservingSimplifier, e.g.
    a hole crossing its simplified shell, are out of scope and
    documented here)."""
    out = GeometryBatchBuilder()
    for g in range(len(batch)):
        t = int(batch.types[g])
        if t == MISSING:
            out.add_missing()
            continue
        parts = []
        for p in range(batch.geom_part_off[g], batch.geom_part_off[g + 1]):
            pt = int(batch.part_types[p])
            rings = batch.part_rings(p)
            if pt == POINT:
                parts.append((pt, rings))
                continue
            new_rings = []
            for r in rings:
                closed = len(r) >= 2 and (r[0] == r[-1]).all()
                s = _dp_simplify(r, tolerance)
                if pt == POLYGON and closed:
                    if preserve_topology:
                        t_cur = tolerance
                        for _ in range(20):
                            if len(s) >= 4 and _ring_simple(s):
                                break
                            t_cur /= 2.0
                            s = _dp_simplify(r, t_cur)
                        else:
                            s = r
                        if len(s) < 4 or not _ring_simple(s):
                            s = r
                    elif len(s) < 4:
                        # GEOS degenerate-output rule without topology
                        # preservation: the collapsed ring is dropped
                        continue
                # a closed or zero-length LINESTRING keeps its simplified
                # form — an unconditional drop silently emptied e.g.
                # LINESTRING (0 0, 0 0) (hypothesis finding)
                new_rings.append(s)
            if pt == POLYGON and not new_rings:
                continue
            parts.append((pt, new_rings))
        if not parts:
            parts = [(POLYGON if t in (POLYGON, MULTIPOLYGON) else LINESTRING, [])]
        out.add(t, parts)
    return out.finish()


def reverse(batch: GeometryBatch) -> GeometryBatch:
    """base.py:1679 — reverse coordinate order within each ring."""
    coords = batch.coords.copy()
    ro = batch.ring_coord_off
    for r in range(len(ro) - 1):
        coords[ro[r] : ro[r + 1]] = coords[ro[r] : ro[r + 1]][::-1]
    return _copy_structure_with_coords(batch, coords)


def force_2d(batch: GeometryBatch) -> GeometryBatch:
    """base.py:1791 — drop Z."""
    out = _copy_structure_with_coords(batch, batch.coords.copy())
    out.zs = None
    out.geom_has_z = None
    return out


def boundary(batch: GeometryBatch) -> GeometryBatch:
    """base.py:729 — polygons -> rings as (Multi)LineString; lines ->
    boundary points as MultiPoint; points -> GEOMETRYCOLLECTION EMPTY."""
    from .ragged import GEOMETRYCOLLECTION

    out = GeometryBatchBuilder()
    for g in range(len(batch)):
        t = int(batch.types[g])
        if t == MISSING:
            out.add_missing()
            continue
        if t in (POINT, MULTIPOINT):
            out.add(GEOMETRYCOLLECTION, [])
            continue
        if t in (LINESTRING, MULTILINESTRING):
            pts = []
            for p in range(batch.geom_part_off[g], batch.geom_part_off[g + 1]):
                for r in batch.part_rings(p):
                    if len(r) >= 2 and not (r[0] == r[-1]).all():
                        pts.append(r[:1])
                        pts.append(r[-1:])
            if not pts:
                out.add(MULTIPOINT, [])
            else:
                out.add(MULTIPOINT, [(POINT, [p]) for p in pts])
            continue
        rings = []
        for p in range(batch.geom_part_off[g], batch.geom_part_off[g + 1]):
            rings.extend(batch.part_rings(p))
        if len(rings) == 1:
            out.add(LINESTRING, [(LINESTRING, rings)])
        else:
            out.add(MULTILINESTRING, [(LINESTRING, [r]) for r in rings])
    return out.finish()


def get_parts(batch: GeometryBatch):
    """shapely.get_parts analogue for explode (geodataframe.py:1417):
    returns (parts_batch, geom_index, part_index) where each part of each
    input geometry becomes one output geometry."""
    out = GeometryBatchBuilder()
    gi, pi = [], []
    for g in range(len(batch)):
        t = int(batch.types[g])
        if t == MISSING:
            out.add_missing()
            gi.append(g)
            pi.append(0)
            continue
        p0, p1 = batch.geom_part_off[g], batch.geom_part_off[g + 1]
        if t in (POINT, LINESTRING, POLYGON) or p1 - p0 <= 1:
            # simple (or single-part multi counts as its one part)
            if p1 == p0:
                out.add(t if t <= POLYGON else POLYGON, [(t if t <= POLYGON else POLYGON, [])])
            else:
                pt = int(batch.part_types[p0])
                out.add(pt, [(pt, batch.part_rings(p0))])
            gi.append(g)
            pi.append(0)
            continue
        for k, p in enumerate(range(p0, p1)):
            pt = int(batch.part_types[p])
            out.add(pt, [(pt, batch.part_rings(p))])
            gi.append(g)
            pi.append(k)
    return out.finish(), np.array(gi, dtype=np.int64), np.array(pi, dtype=np.int64)


# ---------------------------------------------------------------------------
# rectangle clipping (clip_by_rect, base.py:4305 / tools/clip.py:40-43)


def _clip_ring_rect(ring: np.ndarray, minx, miny, maxx, maxy) -> np.ndarray:
    """Sutherland–Hodgman clip of a closed ring against an axis rect.
    Returns closed ring (or empty). Vectorized per half-plane."""
    poly = ring[:-1] if len(ring) >= 2 and (ring[0] == ring[-1]).all() else ring
    for axis, bound, keep_ge in ((0, minx, True), (0, maxx, False),
                                 (1, miny, True), (1, maxy, False)):
        if len(poly) == 0:
            return np.empty((0, 2))
        cur = poly
        nxt = np.roll(poly, -1, axis=0)
        if keep_ge:
            cin = cur[:, axis] >= bound
            nin = nxt[:, axis] >= bound
        else:
            cin = cur[:, axis] <= bound
            nin = nxt[:, axis] <= bound
        out_pts = []
        denom = nxt[:, axis] - cur[:, axis]
        with np.errstate(divide="ignore", invalid="ignore"):
            t = np.where(denom == 0, 0.0, (bound - cur[:, axis]) / denom)
        inter = cur + t[:, None] * (nxt - cur)
        inter[:, axis] = bound  # exact on the clip line
        for i in range(len(cur)):
            if cin[i]:
                out_pts.append(cur[i])
                if not nin[i]:
                    out_pts.append(inter[i])
            elif nin[i]:
                out_pts.append(inter[i])
        poly = np.array(out_pts) if out_pts else np.empty((0, 2))
    if len(poly) < 3:
        return np.empty((0, 2))
    return np.vstack([poly, poly[:1]])


def _clip_line_rect(line: np.ndarray, minx, miny, maxx, maxy) -> list[np.ndarray]:
    """Liang–Barsky per segment, stitched into maximal runs."""
    pieces: list[np.ndarray] = []
    run: list[np.ndarray] = []
    for i in range(len(line) - 1):
        p0, p1 = line[i], line[i + 1]
        d = p1 - p0
        t0, t1 = 0.0, 1.0
        ok = True
        for axis, lo, hi in ((0, minx, maxx), (1, miny, maxy)):
            if d[axis] == 0:
                if p0[axis] < lo or p0[axis] > hi:
                    ok = False
                    break
            else:
                ta = (lo - p0[axis]) / d[axis]
                tb = (hi - p0[axis]) / d[axis]
                ta, tb = min(ta, tb), max(ta, tb)
                t0, t1 = max(t0, ta), min(t1, tb)
                if t0 > t1:
                    ok = False
                    break
        if not ok:
            if len(run) >= 2:
                pieces.append(np.array(run))
            run = []
            continue
        a = p0 + t0 * d
        b = p0 + t1 * d
        if run and np.allclose(run[-1], a):
            run.append(b)
        else:
            if len(run) >= 2:
                pieces.append(np.array(run))
            run = [a, b]
        if t1 < 1.0:
            if len(run) >= 2:
                pieces.append(np.array(run))
            run = []
    if len(run) >= 2:
        pieces.append(np.array(run))
    return pieces


def clip_by_rect(batch: GeometryBatch, minx, miny, maxx, maxy) -> GeometryBatch:
    """base.py:4305 — fast rectangle clip. Points filtered; lines cut;
    polygon rings Sutherland–Hodgman-clipped (exterior and holes clipped
    independently — matches GEOS clip_by_rect's 'possibly invalid' note)."""
    out = GeometryBatchBuilder()
    for g in range(len(batch)):
        t = int(batch.types[g])
        if t == MISSING:
            out.add_missing()
            continue
        parts = []
        for p in range(batch.geom_part_off[g], batch.geom_part_off[g + 1]):
            pt = int(batch.part_types[p])
            rings = batch.part_rings(p)
            if pt == POINT:
                if rings and len(rings[0]):
                    x, y = rings[0][0]
                    if minx <= x <= maxx and miny <= y <= maxy:
                        parts.append((POINT, rings))
            elif pt == LINESTRING:
                for r in rings:
                    for piece in _clip_line_rect(r, minx, miny, maxx, maxy):
                        parts.append((LINESTRING, [piece]))
            else:
                new_rings = []
                for k, r in enumerate(rings):
                    cr = _clip_ring_rect(r, minx, miny, maxx, maxy)
                    if len(cr):
                        new_rings.append(cr)
                    elif k == 0:
                        new_rings = []
                        break  # exterior vanished -> whole polygon gone
                if new_rings:
                    parts.append((POLYGON, new_rings))
        if not parts:
            base = POLYGON if t in (POLYGON, MULTIPOLYGON) else (
                LINESTRING if t in (LINESTRING, MULTILINESTRING) else POINT)
            out.add(base, [(base, [])])
            continue
        ptypes = {pt for pt, _ in parts}
        if len(parts) == 1:
            out.add(parts[0][0], parts)
        elif len(ptypes) == 1:
            pt = parts[0][0]
            multi = {POINT: MULTIPOINT, LINESTRING: MULTILINESTRING, POLYGON: MULTIPOLYGON}[pt]
            out.add(multi, parts)
        else:
            from .ragged import GEOMETRYCOLLECTION
            out.add(GEOMETRYCOLLECTION, parts)
    return out.finish()


def representative_point(batch: GeometryBatch) -> np.ndarray:
    """base.py:1476 — a point guaranteed inside (n,2): centroid when inside,
    else a scanline probe at the bbox-midline."""
    c = centroid(batch)
    b = bounds(batch)
    out = c.copy()
    for g in range(len(batch)):
        t = int(batch.types[g])
        if t not in (POLYGON, MULTIPOLYGON) or np.isnan(c[g, 0]):
            continue
        st = points_in_geom(c[g : g + 1, 0], c[g : g + 1, 1], batch, g)
        if st[0] == INSIDE:
            continue
        # probe along the horizontal midline
        xs = np.linspace(b[g, 0], b[g, 2], 65)[1:-1]
        ys = np.full_like(xs, (b[g, 1] + b[g, 3]) / 2)
        stt = points_in_geom(xs, ys, batch, g)
        hit = np.nonzero(stt == INSIDE)[0]
        if len(hit):
            out[g] = [xs[hit[len(hit) // 2]], ys[0]]
    return out


def buffer_general(batch: GeometryBatch, distance: float,
                   quad_segs: int = 8, cap_style: str = "round",
                   join_style: str = "round",
                   mitre_limit: float = 5.0,
                   single_sided: bool = False) -> GeometryBatch:
    """Buffer for any geometry type (base.py:4806).

    Positive distance: the buffered region is the union of per-segment
    capsules (rectangle + per-vertex style patches) and, for polygonal
    inputs, the polygon itself — merged exactly with the Martinez-Rueda
    sweep. Negative distance erodes polygons by differencing the
    boundary capsules. Matches GEOS's discretized-arc semantics (same
    vertex count per quadrant for round joins/caps).

    ``cap_style`` ('round'|'flat'|'square') shapes open-line ENDPOINTS
    (and lone points: flat -> empty, square -> axis-aligned-to-nothing
    square of side 2d); ``join_style`` ('round'|'mitre'|'bevel') shapes
    every other vertex, with mitre spikes cropped at
    ``mitre_limit * d`` from the vertex (GEOS limited-mitre bevel).

    ``single_sided`` buffers lineal rows on ONE side only (left of the
    digitization direction for positive distance, right for negative;
    flat ends, GEOS convention) via one-sided segment rectangles plus
    outer-turn join patches — round joins use an arc WEDGE, not a full
    disc, so nothing spills across the line. Puntal/polygonal rows
    ignore the flag (GEOS parity)."""
    from .boolean import boolean_rings, group_rings
    from .clipping import _all_poly_rings
    from .unary import _geom_rings
    from .ragged import MULTIPOLYGON, TYPE_DIM

    if cap_style not in ("round", "flat", "square"):
        raise ValueError(f"cap_style must be round/flat/square, "
                         f"got {cap_style!r}")
    if join_style not in ("round", "mitre", "bevel"):
        raise ValueError(f"join_style must be round/mitre/bevel, "
                         f"got {join_style!r}")
    d = float(distance)
    r_abs = abs(d)
    n_arc = 4 * quad_segs
    # half-step rotation: no disc vertex falls exactly on a capsule corner
    # or axis (avoids degenerate vertex-on-vertex sweep cases)
    ang = np.linspace(0, 2 * np.pi, n_arc, endpoint=False) + np.pi / n_arc
    disc = np.column_stack([np.cos(ang), np.sin(ang)]) * r_abs

    def _disc_ring(v: np.ndarray) -> np.ndarray:
        c = v + disc
        return np.vstack([c, c[:1]])

    def _cap_patches(v: np.ndarray, d_out: np.ndarray) -> list[np.ndarray]:
        """End-cap at endpoint v; d_out = unit direction AWAY from line."""
        if cap_style == "round":
            return [_disc_ring(v)]
        if cap_style == "flat":
            return []
        n = np.array([-d_out[1], d_out[0]]) * r_abs
        u = d_out * r_abs
        return [np.array([v + n, v + n + u, v - n + u, v - n, v + n])]

    def _join_patches(v, d_prev, d_next) -> list[np.ndarray]:
        """Join patch at interior/ring vertex v; d_prev/d_next = unit
        directions of the incoming and outgoing segments."""
        if join_style == "round":
            return [_disc_ring(v)]
        turn = float(d_prev[0] * d_next[1] - d_prev[1] * d_next[0])
        if abs(turn) < 1e-12:
            # collinear or U-turn: nothing to fill on either side (the
            # U-turn outer gap is covered by cap semantics only for
            # round; GEOS bevels it to nothing as well)
            return []
        # outer side of the turn: right of travel for a left turn
        s = -1.0 if turn > 0 else 1.0
        n1 = np.array([-d_prev[1], d_prev[0]]) * (s * r_abs)
        n2 = np.array([-d_next[1], d_next[0]]) * (s * r_abs)
        c1 = v + n1
        c2 = v + n2
        if join_style == "bevel":
            return [np.array([v, c1, c2, v])]
        # mitre: intersection of the two offset support lines
        den = d_prev[0] * d_next[1] - d_prev[1] * d_next[0]
        t = ((c2[0] - c1[0]) * d_next[1] - (c2[1] - c1[1]) * d_next[0]) / den
        m = c1 + t * d_prev
        if np.hypot(*(m - v)) <= mitre_limit * r_abs:
            return [np.array([v, c1, m, c2, v])]
        # limited mitre: crop the spike with a cut perpendicular to the
        # mitre direction at distance mitre_limit*d from the vertex
        um = (m - v) / np.hypot(*(m - v))
        lim = mitre_limit * r_abs
        # intersect the cut line with each offset line
        def _cut(p, dv):
            # solve p + t*dv with dot(x - v, um) == lim
            den2 = float(dv @ um)
            if den2 == 0:
                return p
            t2 = (lim - float((p - v) @ um)) / den2
            return p + t2 * dv
        m1 = _cut(c1, d_prev)
        m2 = _cut(c2, d_next)
        return [np.array([v, c1, m1, m2, c2, v])]

    def _one_sided_ring_patches(r: np.ndarray) -> list[np.ndarray]:
        """One-sided rectangles + outer-turn join patches for line r;
        the offset side follows the SIGN of ``distance`` (left for +)."""
        out = []
        seg = np.diff(r, axis=0)
        L = np.hypot(seg[:, 0], seg[:, 1])
        live = np.nonzero(L > 0)[0]
        if not len(live):
            return out
        dirs = seg[live] / L[live, None]
        # perp-left scaled by the SIGNED distance: left side for d > 0
        norms = np.column_stack([-dirs[:, 1], dirs[:, 0]]) * d
        for k, i in enumerate(live):
            p0, p1 = r[i], r[i + 1]
            n = norms[k]
            out.append(np.array([p0, p1, p1 + n, p0 + n, p0]))
        closed = bool((r[0] == r[-1]).all())
        pairs = [(k, k + 1) for k in range(len(live) - 1)]
        if closed and len(live) > 1:
            pairs.append((len(live) - 1, 0))
        for ka, kb in pairs:
            v = r[live[kb]] if (ka, kb) == (len(live) - 1, 0) \
                else r[live[ka] + 1]
            d_prev, d_next = dirs[ka], dirs[kb]
            turn = float(d_prev[0] * d_next[1] - d_prev[1] * d_next[0])
            # the offset side is OUTER (a gap to fill) when the line
            # turns away from it: left offset (d>0) + right turn, or
            # right offset (d<0) + left turn
            if abs(turn) < 1e-12 or turn * d > 0:
                continue
            n1, n2 = norms[ka], norms[kb]
            c1, c2 = v + n1, v + n2
            if join_style == "bevel":
                out.append(np.array([v, c1, c2, v]))
            elif join_style == "mitre":
                den = d_prev[0] * d_next[1] - d_prev[1] * d_next[0]
                t = ((c2[0] - c1[0]) * d_next[1]
                     - (c2[1] - c1[1]) * d_next[0]) / den
                m = c1 + t * d_prev
                if np.hypot(*(m - v)) <= mitre_limit * r_abs:
                    out.append(np.array([v, c1, m, c2, v]))
                else:
                    um = (m - v) / np.hypot(*(m - v))
                    lim = mitre_limit * r_abs

                    def _cut(p, dv):
                        den2 = float(dv @ um)
                        if den2 == 0:
                            return p
                        t2 = (lim - float((p - v) @ um)) / den2
                        return p + t2 * dv
                    out.append(np.array([v, c1, _cut(c1, d_prev),
                                         _cut(c2, d_next), c2, v]))
            else:  # round: arc WEDGE between the two offset normals,
                # swept across the outer side (never crosses the line)
                a0 = float(np.arctan2(n1[1], n1[0]))
                a1 = float(np.arctan2(n2[1], n2[0]))
                sweep = a1 - a0
                # the normals rotate WITH the turn (CW for a right
                # turn, CCW for a left turn); the wedge sweeps that way
                if turn < 0:
                    while sweep > 0:
                        sweep -= 2 * np.pi
                else:
                    while sweep < 0:
                        sweep += 2 * np.pi
                nsteps = max(1, int(np.ceil(
                    abs(sweep) / (np.pi / 2) * quad_segs)))
                ang_w = a0 + sweep * np.arange(nsteps + 1) / nsteps
                arc = v + r_abs * np.column_stack(
                    [np.cos(ang_w), np.sin(ang_w)])
                out.append(np.vstack([[v], arc, [v]]))
        return out

    def capsules(g: int) -> list[np.ndarray]:
        rings_out = []
        is_poly = TYPE_DIM[int(batch.types[g])] == 2
        if single_sided and not is_poly and TYPE_DIM[int(batch.types[g])] == 1:
            for _, r in _geom_rings(batch, g):
                if len(r) >= 2:
                    rings_out.extend(_one_sided_ring_patches(r))
            return rings_out
        for _, r in _geom_rings(batch, g):
            if len(r) == 1:
                # lone point: cap semantics (flat -> empty)
                if cap_style == "round":
                    rings_out.append(_disc_ring(r[0]))
                elif cap_style == "square":
                    n = np.array([0.0, r_abs])
                    u = np.array([r_abs, 0.0])
                    v = r[0]
                    rings_out.append(np.array(
                        [v - u - n, v + u - n, v + u + n, v - u + n,
                         v - u - n]))
                continue
            # segment rectangles
            seg = np.diff(r, axis=0)
            L = np.hypot(seg[:, 0], seg[:, 1])
            for i in range(len(r) - 1):
                if L[i] == 0:
                    continue
                p0, p1 = r[i], r[i + 1]
                nrm = np.array([-seg[i, 1], seg[i, 0]]) / L[i] * r_abs
                rings_out.append(np.array(
                    [p0 + nrm, p1 + nrm, p1 - nrm, p0 - nrm, p0 + nrm]))
            # per-vertex patches: walk the non-degenerate segments
            live = np.nonzero(L > 0)[0]
            if not len(live):
                # degenerate linework: treat first vertex as a point
                if not is_poly:
                    rings_out.extend(
                        _cap_patches(r[0], np.array([1.0, 0.0]))
                        if cap_style != "flat" else [])
                continue
            dirs = seg[live] / L[live, None]
            closed = bool((r[0] == r[-1]).all()) or is_poly
            for k in range(len(live)):
                i = live[k]
                # vertex at the END of segment live[k] joins with the
                # START of segment live[k+1]
                if k + 1 < len(live):
                    rings_out.extend(
                        _join_patches(r[i + 1], dirs[k], dirs[k + 1]))
            if closed:
                rings_out.extend(
                    _join_patches(r[live[0]], dirs[-1], dirs[0]))
            else:
                rings_out.extend(_cap_patches(r[live[0]], -dirs[0]))
                rings_out.extend(_cap_patches(r[live[-1] + 1], dirs[-1]))
        return rings_out

    def union_fold(ring_sets: list[list[np.ndarray]]) -> list[np.ndarray]:
        sets = [r for r in ring_sets if r]
        while len(sets) > 1:
            nxt = []
            for i in range(0, len(sets), 2):
                if i + 1 < len(sets):
                    nxt.append(boolean_rings(sets[i], sets[i + 1], "union"))
                else:
                    nxt.append(sets[i])
            sets = nxt
        return sets[0] if sets else []

    out = GeometryBatchBuilder()
    for g in range(len(batch)):
        t = int(batch.types[g])
        if t == 0:
            out.add_missing()
            continue
        caps = capsules(g)
        if not caps:
            out.add(POLYGON, [(POLYGON, [])])
            continue
        if single_sided and TYPE_DIM[t] == 1:
            # one-sided line buffer: the SIGN of d picked the side in
            # the patch builder; the region is a plain union either way
            rings = union_fold([[c] for c in caps])
        elif d >= 0:
            sets = [[c] for c in caps]
            if TYPE_DIM[t] == 2:
                sets.append(_all_poly_rings(batch, g)[0])
            rings = union_fold(sets)
        else:
            if TYPE_DIM[t] != 2:
                out.add(POLYGON, [(POLYGON, [])])
                continue
            boundary_region = union_fold([[c] for c in caps])
            rings = boolean_rings(_all_poly_rings(batch, g)[0],
                                  boundary_region, "difference")
        polys = group_rings(rings)
        if not polys:
            out.add(POLYGON, [(POLYGON, [])])
        elif len(polys) == 1:
            out.add(POLYGON, [(POLYGON, polys[0])])
        else:
            out.add(MULTIPOLYGON, [(POLYGON, r) for r in polys])
    return out.finish()


def offset_curve(batch: GeometryBatch, distance: float,
                 quad_segs: int = 8, join_style: str = "round",
                 mitre_limit: float = 5.0) -> GeometryBatch:
    """Parallel offset of lineal geometries (base.py:1265): left side for
    positive distance, right for negative; ``join_style`` shapes convex
    turns — 'round' (quad_segs-per-quadrant arcs), 'mitre' (offset-line
    intersection, spikes cropped at ``mitre_limit*d``), 'bevel' (direct
    connect); always miter-trim at concave turns. Non-lineal rows ->
    missing."""
    from .ragged import LINESTRING, MULTILINESTRING, TYPE_DIM
    from .unary import _geom_rings

    if join_style not in ("round", "mitre", "bevel"):
        raise ValueError(f"join_style must be round/mitre/bevel, "
                         f"got {join_style!r}")
    d = float(distance)
    side = 1.0 if d >= 0 else -1.0
    r = abs(d)

    def offset_line(c: np.ndarray) -> np.ndarray | None:
        if len(c) < 2:
            return None
        seg = np.diff(c, axis=0)
        L = np.sqrt((seg ** 2).sum(axis=1))
        keep = L > 0
        if not keep.any():
            return None
        seg = seg[keep]
        L = L[keep]
        starts = c[:-1][keep]
        ends = starts + seg
        nrm = np.column_stack([-seg[:, 1], seg[:, 0]]) / L[:, None] * (side * r)
        pts = [starts[0] + nrm[0], ends[0] + nrm[0]]
        for i in range(1, len(seg)):
            turn = float(np.cross(seg[i - 1], seg[i]))
            v = ends[i - 1]  # original vertex
            if turn * side > 0:  # turning toward the offset side -> trim
                # turning toward the offset side: trim via intersection of
                # the two offset lines (fall back to direct connect)
                p0, d0 = starts[i - 1] + nrm[i - 1], seg[i - 1]
                p1, d1 = starts[i] + nrm[i], seg[i]
                den = d0[0] * d1[1] - d0[1] * d1[0]
                if den != 0:
                    t = ((p1[0] - p0[0]) * d1[1] - (p1[1] - p0[1]) * d1[0]) / den
                    pts[-1] = p0 + t * d0
                else:
                    pts.append(starts[i] + nrm[i])
            elif join_style == "round":
                # arc around the vertex from nrm[i-1] to nrm[i]
                a0 = np.arctan2(nrm[i - 1][1], nrm[i - 1][0])
                a1 = np.arctan2(nrm[i][1], nrm[i][0])
                sweep = (a1 - a0)
                if side > 0:
                    while sweep > 0:
                        sweep -= 2 * np.pi
                else:
                    while sweep < 0:
                        sweep += 2 * np.pi
                nsteps = max(1, int(np.ceil(abs(sweep) / (np.pi / 2) * quad_segs)))
                for k in range(1, nsteps + 1):
                    a = a0 + sweep * k / nsteps
                    pts.append(v + r * np.array([np.cos(a), np.sin(a)]))
            elif join_style == "mitre":
                # intersection of the two offset support lines; spikes
                # cropped at mitre_limit*r (GEOS limited-mitre)
                c1 = v + nrm[i - 1]
                c2 = v + nrm[i]
                d0, d1 = seg[i - 1] / L[i - 1], seg[i] / L[i]
                den = d0[0] * d1[1] - d0[1] * d1[0]
                if den != 0:
                    t = ((c2[0] - c1[0]) * d1[1]
                         - (c2[1] - c1[1]) * d1[0]) / den
                    m = c1 + t * d0
                    dist_m = float(np.hypot(*(m - v)))
                    if dist_m <= mitre_limit * r:
                        pts.append(m)
                    else:
                        um = (m - v) / dist_m
                        lim = mitre_limit * r
                        for p, dv in ((c1, d0), (c2, d1)):
                            den2 = float(dv @ um)
                            if den2 != 0:
                                t2 = (lim - float((p - v) @ um)) / den2
                                pts.append(p + t2 * dv)
            # 'bevel': no fill points — the polyline connects the two
            # offset segment ends directly
            pts.append(ends[i] + nrm[i])
        return np.array(pts)

    out = GeometryBatchBuilder()
    for g in range(len(batch)):
        t = int(batch.types[g])
        if t not in (LINESTRING, MULTILINESTRING):
            out.add_missing()
            continue
        lines = []
        for _, ring in _geom_rings(batch, g):
            o = offset_line(ring)
            if o is not None:
                lines.append(o)
        if not lines:
            out.add(LINESTRING, [(LINESTRING, [])])
        elif len(lines) == 1:
            out.add(LINESTRING, [(LINESTRING, lines)])
        else:
            out.add(MULTILINESTRING, [(LINESTRING, [l]) for l in lines])
    return out.finish()
