"""Pairwise (row-aligned) spatial predicates and distances over batches.

These are the *refine* kernels of the two-phase distributed spatial join
(SURVEY.md §2.4): after the coarse cell equi-join produces candidate pairs,
``pairwise_predicate`` evaluates the exact predicate for every pair inside
an Arrow batch. Semantics mirror GeoPandas/GEOS binary predicates
(/root/reference/geopandas/base.py:2043-3521 and sindex.py:6-8):

    intersects, contains, contains_properly, within, covers, covered_by,
    touches, crosses, overlaps, dwithin, equals

Vectorization strategy: candidate pairs are grouped by the side whose
geometry repeats (in an sjoin the polygon side repeats across many point
rows), then each group runs one vectorized kernel (points-vs-one-polygon
etc.). This is the distributed analogue of the reference preparing one tree
geometry and bulk-querying candidates against it (sindex.py:86-87).
"""

from __future__ import annotations

import numpy as np

from .kernels import (
    BOUNDARY,
    INSIDE,
    OUTSIDE,
    bounds,
    geom_points,
    geom_segments,
    point_segment_dist2,
    points_on_segments,
    points_in_geom,
    segments_cross,
)
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
    _expand_ranges,
)

PREDICATES = (
    "intersects", "contains", "contains_properly", "within", "covers",
    "covered_by", "touches", "crosses", "overlaps", "dwithin", "equals",
    "disjoint",
)


def _dim(t: np.ndarray) -> np.ndarray:
    return TYPE_DIM[t]


# ---------------------------------------------------------------------------
# per-group kernels: many "left" rows vs ONE right geometry


def _points_vs_geom_status(lb: GeometryBatch, lrows: np.ndarray,
                           rb: GeometryBatch, g: int):
    """Status of single-point left rows vs right geometry g.

    Returns (in_poly int8, on_lines bool, eq_point bool) per row.
    """
    off = lb.geom_coord_off
    px = np.full(len(lrows), np.nan)
    py = np.full(len(lrows), np.nan)
    has = off[lrows + 1] > off[lrows]
    px[has] = lb.coords[off[lrows][has], 0]
    py[has] = lb.coords[off[lrows][has], 1]
    rdim = int(_dim(rb.types[g : g + 1])[0])
    n = len(lrows)
    in_poly = np.zeros(n, dtype=np.int8)
    on_lines = np.zeros(n, dtype=bool)
    eq_point = np.zeros(n, dtype=bool)
    if rdim == 2:
        in_poly = points_in_geom(px, py, rb, g)
    elif rdim == 1:
        s0, s1 = geom_segments(rb, g)
        if len(s0):
            on_lines = points_on_segments(px, py, s0, s1).any(axis=1)
    else:
        rpts = geom_points(rb, g)
        if len(rpts):
            eq_point = (
                (px[:, None] == rpts[None, :, 0])
                & (py[:, None] == rpts[None, :, 1])
            ).any(axis=1)
    return in_poly, on_lines, eq_point


def _geom_vertices_status(sub: GeometryBatch, rb: GeometryBatch, g: int):
    """For each left geometry in `sub`, status of all its vertices vs right
    polygonal geometry g: (all_in, any_interior, any_out, any_boundary)."""
    n = len(sub)
    off = sub.geom_coord_off
    allc = sub.coords
    if len(allc) == 0:
        z = np.zeros(n, dtype=bool)
        return z, z.copy(), z.copy(), z.copy()
    st = points_in_geom(allc[:, 0], allc[:, 1], rb, g)
    cnt = (off[1:] - off[:-1]).astype(np.int64)
    grp = np.repeat(np.arange(n), cnt)
    any_int = np.zeros(n, dtype=bool)
    any_out = np.zeros(n, dtype=bool)
    any_bnd = np.zeros(n, dtype=bool)
    np.logical_or.at(any_int, grp, st == INSIDE)
    np.logical_or.at(any_out, grp, st == OUTSIDE)
    np.logical_or.at(any_bnd, grp, st == BOUNDARY)
    all_in = ~any_out & (cnt > 0)
    return all_in, any_int, any_out, any_bnd


def _edges_cross_group(sub: GeometryBatch, rb: GeometryBatch, g: int) -> np.ndarray:
    """Per left geometry: does any of its segments intersect any segment of
    right geometry g (touch counts)."""
    n = len(sub)
    out = np.zeros(n, dtype=bool)
    rs0, rs1 = geom_segments(rb, g)
    if not len(rs0):
        return out
    # build all left segments with a row map
    seg_rows, s0s, s1s = [], [], []
    for i in range(n):
        a0, a1 = geom_segments(sub, i)
        if len(a0):
            s0s.append(a0)
            s1s.append(a1)
            seg_rows.append(np.full(len(a0), i))
    if not s0s:
        return out
    A0 = np.concatenate(s0s)
    A1 = np.concatenate(s1s)
    rows = np.concatenate(seg_rows)
    # chunk to bound the (A,B) temporary
    max_cells = 4_000_000
    step = max(1, max_cells // max(len(rs0), 1))
    for lo in range(0, len(A0), step):
        hit = segments_cross(A0[lo : lo + step], A1[lo : lo + step], rs0, rs1).any(axis=1)
        np.logical_or.at(out, rows[lo : lo + step], hit)
    return out


def _min_dist2_group(sub: GeometryBatch, rb: GeometryBatch, g: int) -> np.ndarray:
    """Min squared distance of each left geometry to right geometry g,
    assuming no interior overlap (callers handle the intersecting case)."""
    n = len(sub)
    out = np.full(n, np.inf)
    rs0, rs1 = geom_segments(rb, g)
    rpts = geom_points(rb, g)
    for i in range(n):  # few uniques on this side by construction
        lpts = geom_points(sub, i)
        if len(lpts) == 0:
            continue
        best = np.inf
        if len(rs0):
            best = min(best, float(np.min(point_segment_dist2(lpts[:, 0], lpts[:, 1], rs0, rs1))))
        ls0, ls1 = geom_segments(sub, i)
        if len(ls0) and len(rpts):
            best = min(best, float(np.min(point_segment_dist2(rpts[:, 0], rpts[:, 1], ls0, ls1))))
        if not len(rs0) and len(rpts):
            dx = lpts[:, None, 0] - rpts[None, :, 0]
            dy = lpts[:, None, 1] - rpts[None, :, 1]
            best = min(best, float(np.min(dx * dx + dy * dy)))
        out[i] = best
    return out


# ---------------------------------------------------------------------------
# fully-vectorized fast path: single-point left vs polygonal right
#
# The sjoin refine hot path (point-in-polygon over millions of candidate
# pairs). Instead of grouping by repeated right geometry (Python overhead
# per group), evaluate ALL pairs in one numpy pass over the union of all
# right-polygon edges: even-odd crossing parity + boundary test, reduced
# per pair with bincount. Holes and multipolygon parts fall out of the
# even-odd rule.


def _pair_edges(b: GeometryBatch, idx: np.ndarray):
    """Edges of geometry ``idx[i]`` tagged with pair row i — no batch copy.

    Returns (x0, y0, x1, y1, e_pair). Ring-closing edges between distinct
    rings never appear (segments are generated per ring)."""
    gro = b.geom_ring_off
    rcnt = gro[idx + 1] - gro[idx]
    ring_idx = _expand_ranges(gro[idx], gro[idx + 1])
    ring_pair = np.repeat(np.arange(len(idx)), rcnt)
    rc0 = b.ring_coord_off[ring_idx]
    rc1 = b.ring_coord_off[ring_idx + 1]
    seg_cnt = np.maximum(rc1 - rc0 - 1, 0)
    seg_start = _expand_ranges(rc0, rc0 + seg_cnt)
    e_pair = np.repeat(ring_pair, seg_cnt)
    c = b.coords
    return (c[seg_start, 0], c[seg_start, 1],
            c[seg_start + 1, 0], c[seg_start + 1, 1], e_pair)


def _pair_points(b: GeometryBatch, idx: np.ndarray):
    """All vertices of geometry ``idx[i]`` tagged with pair row i."""
    off = b.geom_coord_off
    cnt = off[idx + 1] - off[idx]
    p_idx = _expand_ranges(off[idx], off[idx + 1])
    p_pair = np.repeat(np.arange(len(idx)), cnt)
    c = b.coords
    return c[p_idx, 0], c[p_idx, 1], p_pair, cnt


_COMBO_CHUNK = 2_000_000


def _points_status_vs_pairs(px, py, p_pair, pcnt, b: GeometryBatch,
                            idx: np.ndarray, n: int) -> np.ndarray:
    """int8 status of each tagged point vs the geometry of its pair.

    Polygonal target: INSIDE/BOUNDARY/OUTSIDE by crossing parity + on-edge.
    Lineal target: BOUNDARY when on an edge, else OUTSIDE. Puntal target:
    BOUNDARY when equal to a vertex, else OUTSIDE. Mixed targets are fine —
    parity only counts for polygonal rows."""
    P = len(px)
    parity_cnt = np.zeros(P, dtype=np.int64)
    on_cnt = np.zeros(P, dtype=np.int64)

    tdim = TYPE_DIM[b.types[idx]]
    x0, y0, x1, y1, e_pair = _pair_edges(b, idx)
    if len(e_pair):
        # combos: each edge vs every point of its pair
        pt_start = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(pcnt, out=pt_start[1:])
        e_pcnt = pcnt[e_pair]
        # chunk over edges so the combo arrays stay bounded
        E = len(e_pair)
        combo_per_edge = e_pcnt
        edge_hi = 0
        while edge_hi < E:
            edge_lo = edge_hi
            acc = 0
            while edge_hi < E and acc < _COMBO_CHUNK:
                acc += int(combo_per_edge[edge_hi])
                edge_hi += 1
            sl = slice(edge_lo, edge_hi)
            ep = e_pair[sl]
            reps = combo_per_edge[sl]
            ce = np.repeat(np.arange(edge_lo, edge_hi), reps)
            cp = _expand_ranges(pt_start[ep], pt_start[ep] + reps)
            ex0 = x0[ce]; ey0 = y0[ce]; ex1 = x1[ce]; ey1 = y1[ce]
            cx = px[cp]; cy = py[cp]
            dy = ey1 - ey0
            dx = ex1 - ex0
            cond = (ey0 <= cy) != (ey1 <= cy)
            with np.errstate(divide="ignore", invalid="ignore"):
                xint = ex0 + (cy - ey0) * dx / np.where(dy == 0, np.inf, dy)
            crossing = cond & (cx < xint)
            parity_cnt += np.bincount(cp[crossing], minlength=P)
            cross = (cx - ex0) * dy - (cy - ey0) * dx
            dot = (cx - ex0) * dx + (cy - ey0) * dy
            seg2 = dx * dx + dy * dy
            # zero-length edge (degenerate 2-point line): cross/dot/seg2
            # are all 0, which made EVERY point test on-edge (hypothesis
            # finding) — such an edge contains only its own point
            on = np.where(seg2 > 0,
                          (cross == 0) & (dot >= 0) & (dot <= seg2),
                          (cx == ex0) & (cy == ey0))
            on_cnt += np.bincount(cp[on], minlength=P)

    # puntal targets: equality against target vertices
    punt = np.nonzero(tdim == 0)[0]
    if len(punt):
        tx, ty, t_pair_local, tcnt = _pair_points(b, idx[punt])
        t_pair = punt[t_pair_local]
        pt_start = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(pcnt, out=pt_start[1:])
        reps = pcnt[t_pair]
        cp = _expand_ranges(pt_start[t_pair], pt_start[t_pair] + reps)
        ct = np.repeat(np.arange(len(tx)), reps)
        eq = (px[cp] == tx[ct]) & (py[cp] == ty[ct])
        on_cnt += np.bincount(cp[eq], minlength=P)

    pdim = tdim[p_pair]
    st = np.full(P, OUTSIDE, dtype=np.int8)
    inside = (pdim == 2) & (parity_cnt % 2 == 1)
    st[inside] = INSIDE
    st[on_cnt > 0] = BOUNDARY
    return st


def _any_by_pair(mask: np.ndarray, pair: np.ndarray, n: int) -> np.ndarray:
    if len(pair):
        return np.bincount(pair[mask], minlength=n) > 0
    return np.zeros(n, dtype=bool)


def _edges_cross_pairs(lb: GeometryBatch, rb: GeometryBatch,
                       idx: np.ndarray, n: int) -> np.ndarray:
    """bool per pair: any left edge intersects any right edge of the same
    pair (touching counts). Vectorized over (left-edge x right-edge) combos
    of each pair, chunked."""
    ax0, ay0, ax1, ay1, le_pair = _pair_edges(lb, idx)
    bx0, by0, bx1, by1, re_pair = _pair_edges(rb, idx)
    out = np.zeros(n, dtype=bool)
    if not len(le_pair) or not len(re_pair):
        return out
    recnt = np.bincount(re_pair, minlength=n)
    re_start = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(recnt, out=re_start[1:])
    combo_per_le = recnt[le_pair]
    E = len(le_pair)
    edge_hi = 0
    while edge_hi < E:
        edge_lo = edge_hi
        acc = 0
        while edge_hi < E and acc < _COMBO_CHUNK:
            acc += int(combo_per_le[edge_hi])
            edge_hi += 1
        sl = slice(edge_lo, edge_hi)
        lp = le_pair[sl]
        reps = combo_per_le[sl]
        cl = np.repeat(np.arange(edge_lo, edge_hi), reps)
        cr = _expand_ranges(re_start[lp], re_start[lp] + reps)
        p0x = ax0[cl]; p0y = ay0[cl]; p1x = ax1[cl]; p1y = ay1[cl]
        q0x = bx0[cr]; q0y = by0[cr]; q1x = bx1[cr]; q1y = by1[cr]
        # bbox reject
        bb = (
            (np.minimum(p0x, p1x) <= np.maximum(q0x, q1x))
            & (np.minimum(q0x, q1x) <= np.maximum(p0x, p1x))
            & (np.minimum(p0y, p1y) <= np.maximum(q0y, q1y))
            & (np.minimum(q0y, q1y) <= np.maximum(p0y, p1y))
        )
        d1 = (p1x - p0x) * (q0y - p0y) - (p1y - p0y) * (q0x - p0x)
        d2 = (p1x - p0x) * (q1y - p0y) - (p1y - p0y) * (q1x - p0x)
        d3 = (q1x - q0x) * (p0y - q0y) - (q1y - q0y) * (p0x - q0x)
        d4 = (q1x - q0x) * (p1y - q0y) - (q1y - q0y) * (p1x - q0x)
        proper = (
            ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0))
            & (d1 != 0) & (d2 != 0) & (d3 != 0) & (d4 != 0)
        )

        def _on(ax, ay, bx, by, cx, cy):
            # collinear c on segment a-b (caller guarantees collinearity)
            return (
                (np.minimum(ax, bx) <= cx) & (cx <= np.maximum(ax, bx))
                & (np.minimum(ay, by) <= cy) & (cy <= np.maximum(ay, by))
            )

        touch = (
            ((d1 == 0) & _on(p0x, p0y, p1x, p1y, q0x, q0y))
            | ((d2 == 0) & _on(p0x, p0y, p1x, p1y, q1x, q1y))
            | ((d3 == 0) & _on(q0x, q0y, q1x, q1y, p0x, p0y))
            | ((d4 == 0) & _on(q0x, q0y, q1x, q1y, p1x, p1y))
        )
        hit = bb & (proper | touch)
        if hit.any():
            out |= np.bincount(le_pair[cl[hit]], minlength=n) > 0
    return out


def _pip_pairs_status(lb: GeometryBatch, rb: GeometryBatch,
                      idx: np.ndarray) -> np.ndarray:
    """int8 status (OUTSIDE/BOUNDARY/INSIDE) of left point i in right
    polygon i for pair rows idx. Requires: left rows single points, right
    rows polygonal."""
    n = len(idx)
    loff = lb.geom_coord_off
    px = lb.coords[loff[idx], 0]
    py = lb.coords[loff[idx], 1]
    pcnt = np.ones(n, dtype=np.int64)
    p_pair = np.arange(n, dtype=np.int64)
    return _points_status_vs_pairs(px, py, p_pair, pcnt, rb, idx, n)


_POLYGONAL = (POLYGON, MULTIPOLYGON)

# predicate -> (which side must be the point, status rule)
_PIP_RULES = {
    "intersects": ("lr", "ne_out"),
    "covered_by": ("lr", "ne_out"),
    "within": ("lr", "inside"),
    "touches": ("lr", "boundary"),
    "contains": ("rl", "inside"),
    "contains_properly": ("rl", "inside"),
    "covers": ("rl", "ne_out"),
}


def _intersects_pairs(lb: GeometryBatch, rb: GeometryBatch,
                      idx: np.ndarray) -> np.ndarray:
    """Fully-vectorized pairwise ``intersects`` for any mix of point/line/
    polygon (incl. multi) rows: a pair intersects iff a left vertex is
    non-outside the right geometry, or a right vertex is non-outside the
    left, or any edges cross. Edge-cross (the quadratic term) only runs on
    pairs the two vertex passes left undecided."""
    n = len(idx)
    lpx, lpy, lp_pair, lcnt = _pair_points(lb, idx)
    st_l = _points_status_vs_pairs(lpx, lpy, lp_pair, lcnt, rb, idx, n)
    res = _any_by_pair(st_l != OUTSIDE, lp_pair, n)
    rem = np.nonzero(~res)[0]
    if len(rem):
        rpx, rpy, rp_pair, rcnt = _pair_points(rb, idx[rem])
        st_r = _points_status_vs_pairs(rpx, rpy, rp_pair, rcnt, lb,
                                       idx[rem], len(rem))
        res[rem] = _any_by_pair(st_r != OUTSIDE, rp_pair, len(rem))
        rem = rem[~res[rem]]
    if len(rem):
        res[rem] = _edges_cross_pairs(lb, rb, idx[rem], len(rem))
    return res


def _try_pip_fast_path(pred: str, lb: GeometryBatch, rb: GeometryBatch,
                       idx: np.ndarray):
    """bool[len(idx)] via the edge-parallel PIP kernel, or None when the
    batch isn't (single points) x (pure polygons)."""
    rule = _PIP_RULES.get(pred)
    if rule is None:
        return None
    orient, outcome = rule
    a, b = (lb, rb) if orient == "lr" else (rb, lb)
    npts = a.n_coords_per_geom()
    if not ((a.types[idx] == POINT) & (npts[idx] == 1)).all():
        return None
    if not np.isin(b.types[idx], _POLYGONAL).all():
        return None
    gp = b.geom_part_off
    from .ragged import _expand_ranges

    sel_parts = _expand_ranges(gp[idx], gp[idx + 1])
    if len(sel_parts) and not (b.part_types[sel_parts] == POLYGON).all():
        return None
    st = _pip_pairs_status(a, b, idx)
    if outcome == "ne_out":
        return st != OUTSIDE
    if outcome == "inside":
        return st == INSIDE
    return st == BOUNDARY


# ---------------------------------------------------------------------------
# generic pair evaluation


def _relate_group(pred: str, lb: GeometryBatch, lrows: np.ndarray,
                  rb: GeometryBatch, g: int, distance: float | None) -> np.ndarray:
    """Evaluate pred for left rows (a homogeneous work group) vs right g."""
    sub = lb.take(lrows)
    ldim = _dim(sub.types)
    rdim = int(_dim(rb.types[g : g + 1])[0])
    n = len(lrows)
    res = np.zeros(n, dtype=bool)

    single_point = (sub.types == POINT) & (sub.n_coords_per_geom() == 1)

    if pred == "dwithin":
        d = 0.0 if distance is None else float(distance)
        inter = _relate_group("intersects", lb, lrows, rb, g, None)
        d2 = _min_dist2_group(sub, rb, g)
        return inter | (d2 <= d * d)

    if pred == "equals":
        # geometric equality via symmetric coverage
        a = _relate_group("covers", lb, lrows, rb, g, None)
        b = _relate_group("covered_by", lb, lrows, rb, g, None)
        return a & b

    # --- puntal left fast path ------------------------------------------
    if single_point.all():
        in_poly, on_lines, eq_point = _points_vs_geom_status(lb, lrows, rb, g)
        if rdim == 2:
            if pred in ("intersects", "covered_by"):
                return in_poly != OUTSIDE
            if pred == "within":
                return in_poly == INSIDE
            if pred == "touches":
                return in_poly == BOUNDARY
            if pred in ("contains", "contains_properly", "covers", "overlaps", "crosses"):
                return res  # a point can never contain/cover/overlap a polygon
        elif rdim == 1:
            if pred in ("intersects", "covered_by"):
                return on_lines
            if pred == "within":
                # GEOS: point within line unless at a mod-2 boundary
                # endpoint (interior of the line excludes its boundary)
                from .relate import _boundary_points

                bp = _boundary_points(rb, g)
                if len(bp):
                    off = lb.geom_coord_off
                    px = lb.coords[off[lrows], 0]
                    py = lb.coords[off[lrows], 1]
                    at_bnd = ((px[:, None] == bp[None, :, 0])
                              & (py[:, None] == bp[None, :, 1])).any(axis=1)
                    return on_lines & ~at_bnd
                return on_lines
            if pred == "touches":
                return _points_touch_line(lb, lrows, rb, g, on_lines)
            return res
        else:
            if pred in ("intersects", "equals", "covered_by", "within", "covers", "contains"):
                if pred in ("intersects", "covered_by", "within"):
                    return eq_point
                # point contains/covers point: only if identical
                return eq_point
            return res

    # --- general path: vertex status + edge crossings --------------------
    if rdim == 2:
        all_in, any_int, any_out, any_bnd = _geom_vertices_status(sub, rb, g)
        edge_x = _edges_cross_group(sub, rb, g)
        # does any right vertex fall strictly inside a polygonal left row?
        r_in_l = np.zeros(n, dtype=bool)
        r_all_in_l = np.zeros(n, dtype=bool)
        rpts = geom_points(rb, g)
        for i in np.nonzero(ldim == 2)[0]:
            if len(rpts):
                st = points_in_geom(rpts[:, 0], rpts[:, 1], sub, i)
                r_in_l[i] = (st == INSIDE).any()
                r_all_in_l[i] = (st != OUTSIDE).all()
        inter = (~any_out & (sub.n_coords_per_geom() > 0)) | any_int | any_bnd | edge_x | r_in_l
        if pred == "intersects":
            return inter
        if pred == "covered_by":
            exits, amb = edge_cross_exits(sub, rb, g, edge_x, any_out)
            out = all_in & ~exits
            und = np.nonzero(all_in & amb)[0]
            if len(und):
                out = _matrix_rows(out, pred, sub, und, rb, g, ldim)
            return out
        if pred == "within":
            exits, amb = edge_cross_exits(sub, rb, g, edge_x, any_out)
            base = all_in & ~exits
            ok = _interior_touch(sub, rb, g, any_int)
            out = base & ok
            # covered rows whose interior contact the centroid probe
            # could not certify (extreme slivers: the float centroid can
            # read outside its own polygon), and rows whose escape probe
            # landed in the boundary noise band, decide via the exact
            # matrix
            und = np.nonzero((base & ~ok) | (all_in & amb))[0]
            if len(und):
                out = _matrix_rows(out, pred, sub, und, rb, g, ldim)
            return out
        if pred == "touches":
            # exact DE-9IM, but only for rows the cheap tests leave
            # undecided: non-intersecting rows are never touches, and
            # any strict-interior vertex contact decides False. The old
            # vectorized approximation missed interior entries that
            # happen between vertices (hypothesis findings: a line
            # through a polygon vertex, two inscribed triangles whose
            # chords cross away from every vertex).
            out = np.zeros(n, dtype=bool)
            cand = np.nonzero(inter & ~any_int & ~r_in_l)[0]
            if len(cand):
                out = _matrix_rows(out, pred, sub, cand, rb, g, ldim)
            return out
        if pred in ("contains", "covers", "contains_properly"):
            esc, amb = edge_x_escapes(sub, rb, g, edge_x)
            cov = r_all_in_l & ~esc
            if pred == "covers":
                out = cov
            elif pred == "contains_properly":
                out = cov & r_in_l
            else:
                out = cov & (r_in_l | _interior_overlap(sub, rb, g))
            und = np.nonzero(r_all_in_l & amb)[0]
            if len(und):
                out = _matrix_rows(out, pred, sub, und, rb, g, ldim)
            return out
        if pred == "overlaps":
            same_dim = ldim == rdim
            exits, amb_lr = edge_cross_exits(sub, rb, g, edge_x, any_out)
            esc, amb_rl = edge_x_escapes(sub, rb, g, edge_x)
            cov_lr = all_in & ~exits
            cov_rl = r_all_in_l & ~esc
            # sound cheap TRUE rules: a vertex strictly inside the other
            # polygon certifies II (and its boundary neighborhood IE/EI
            # given ~covered); rows that intersect without either
            # certificate — e.g. a CROSS overlap where every vertex of
            # each polygon is outside the other (fuzz finding, round 5)
            # — and boundary-only touches are decided exactly
            out = same_dim & any_int & any_out & ~cov_lr & ~cov_rl | (
                same_dim & any_int & r_in_l & ~cov_lr & ~cov_rl
            )
            maybe = same_dim & inter & ~cov_lr & ~cov_rl & ~out
            und = np.nonzero(maybe
                             | (same_dim
                                & ((all_in & amb_lr)
                                   | (r_all_in_l & amb_rl))))[0]
            if len(und):
                out = _matrix_rows(out, pred, sub, und, rb, g, ldim)
            return out
        if pred == "crosses":
            # lower-dim left crosses polygon: interior on both sides.
            # Exact via DE-9IM (vertex tests alone miss a line passing
            # straight through with all vertices outside)
            return _matrix_rows(res, pred, sub, np.nonzero(ldim <= 1)[0],
                                rb, g, ldim)
        return res

    if rdim == 1:
        edge_x = _edges_cross_group(sub, rb, g)
        # left polygonal: does the line enter left interior?
        r_in_l = np.zeros(n, dtype=bool)
        r_all_in_l = np.zeros(n, dtype=bool)
        r_any_bnd = np.zeros(n, dtype=bool)
        rpts = geom_points(rb, g)
        for i in np.nonzero(ldim == 2)[0]:
            st = points_in_geom(rpts[:, 0], rpts[:, 1], sub, i)
            r_in_l[i] = (st == INSIDE).any()
            r_all_in_l[i] = (st != OUTSIDE).all()
            r_any_bnd[i] = (st == BOUNDARY).any()
        # left lineal vs right line: vertex-on-line checks both directions
        l_on_r = np.zeros(n, dtype=bool)
        rs0, rs1 = geom_segments(rb, g)
        for i in np.nonzero(ldim <= 1)[0]:
            lpts = geom_points(sub, i)
            if len(lpts) and len(rs0):
                l_on_r[i] = bool(points_on_segments(
                    lpts[:, 0], lpts[:, 1], rs0, rs1).any())
        inter = edge_x | r_in_l | r_any_bnd | l_on_r
        if pred == "intersects":
            return inter
        # lineal-left rows need the exact DE-9IM path: the vectorized
        # vertex/edge tests don't model line-interior vs line-boundary
        # (session-2 fix — line x line crosses/overlaps/containment)
        # every remaining predicate implies a nonempty intersection, so
        # only intersecting lineal rows need the per-row exact matrix
        # (same prefilter argument as the touches branch below)
        lin = np.nonzero((ldim <= 1) & inter)[0]
        if pred in ("contains", "covers"):
            out = (ldim == 2) & r_all_in_l & (r_in_l if pred == "contains" else True)
            return _matrix_rows(out, pred, sub, lin, rb, g, ldim)
        if pred == "crosses":
            out = (ldim == 2) & r_in_l & _line_exits(sub, rb, g)
            return _matrix_rows(out, pred, sub, lin, rb, g, ldim)
        if pred == "touches":
            # exact DE-9IM, but only for candidate rows: non-intersecting
            # rows are never touches, and a right vertex strictly inside
            # a left polygon decides False (II nonempty). The remaining
            # rows can't be answered by the vertex approximation — a line
            # whose VERTICES only touch the polygon boundary can still
            # pass its interior chord through the polygon interior
            # (hypothesis finding; ADVICE r4 flagged the all-rows loop)
            cand = np.nonzero(inter & ~r_in_l)[0]
            if len(cand):
                res = _matrix_rows(res, pred, sub, cand, rb, g, ldim)
            return res
        if pred == "contains_properly":
            # polygon-left rows included (the old branch never handled
            # them); non-intersecting rows can never contain
            return _matrix_rows(res, pred, sub, np.nonzero(inter)[0],
                                rb, g, ldim)
        if pred in ("within", "covered_by", "overlaps"):
            # dim rules make these impossible for polygon-left; lineal
            # rows via the matrix
            return _matrix_rows(res, pred, sub, lin, rb, g, ldim)
        return res

    # right is puntal
    rpts = geom_points(rb, g)
    if not len(rpts):
        return res
    st_per_row = np.zeros(n, dtype=bool)
    any_int_r = np.zeros(n, dtype=bool)
    any_bnd_r = np.zeros(n, dtype=bool)
    all_cov = np.zeros(n, dtype=bool)
    l_all_cov = np.zeros(n, dtype=bool)
    for i in range(n):
        ld = int(ldim[i])
        if ld == 2:
            st = points_in_geom(rpts[:, 0], rpts[:, 1], sub, i)
            any_int_r[i] = (st == INSIDE).any()
            any_bnd_r[i] = (st == BOUNDARY).any()
            all_cov[i] = (st != OUTSIDE).all()
            st_per_row[i] = (st != OUTSIDE).any()
        elif ld == 1:
            ls0, ls1 = geom_segments(sub, i)
            if len(ls0):
                on = points_on_segments(
                    rpts[:, 0], rpts[:, 1], ls0, ls1).any(axis=1)
                st_per_row[i] = bool(on.any())
                all_cov[i] = bool(on.all())
                # points at a mod-2 endpoint are boundary contact, not
                # interior (contains/touches semantics)
                from .relate import _boundary_points

                bp = _boundary_points(sub, i)
                if len(bp):
                    at_bnd = ((rpts[:, None, 0] == bp[None, :, 0])
                              & (rpts[:, None, 1] == bp[None, :, 1])
                              ).any(axis=1)
                else:
                    at_bnd = np.zeros(len(rpts), dtype=bool)
                any_int_r[i] = bool((on & ~at_bnd).any())
                any_bnd_r[i] = bool((on & at_bnd).any())
        else:
            lpts = geom_points(sub, i)
            if len(lpts):
                eq = (rpts[:, None, 0] == lpts[None, :, 0]) & (rpts[:, None, 1] == lpts[None, :, 1])
                st_per_row[i] = bool(eq.any(axis=1).any())
                all_cov[i] = bool(eq.any(axis=1).all())
                l_all_cov[i] = bool(eq.any(axis=0).all())
                any_int_r[i] = st_per_row[i]
    if pred == "intersects":
        return st_per_row
    if pred == "covers":
        return all_cov
    if pred == "contains":
        return all_cov & any_int_r
    if pred == "contains_properly":
        return all_cov & any_int_r & ~any_bnd_r
    if pred == "touches":
        return any_bnd_r & ~any_int_r
    if pred == "overlaps":
        # dim-0 x dim-0 only: shared point + an exclusive point on EACH
        # side (GEOS: two multipoints with partial sharing overlap; the
        # old branch always answered False — fuzz follow-up, round 5)
        return (ldim == 0) & st_per_row & ~all_cov & ~l_all_cov
    return res


def _pred_from_matrix(m: str, pred: str, da: int, db: int) -> bool:
    """Evaluate a named predicate from a DE-9IM string (exact slow path
    for the lineal type combos the vectorized branches don't model —
    session-2 fix: line x line crosses/overlaps/containment and
    line-through-polygon crosses were wrong before)."""
    inter = any(m[k] != "F" for k in (0, 1, 3, 4))
    if pred == "intersects":
        return inter
    if pred == "touches":
        return inter and m[0] == "F"
    if pred == "within":
        return m[0] != "F" and m[2] == "F" and m[5] == "F"
    if pred == "contains":
        return m[0] != "F" and m[6] == "F" and m[7] == "F"
    if pred == "contains_properly":
        return (m[0] != "F" and m[6] == "F" and m[7] == "F"
                and m[3] == "F" and m[4] == "F")
    if pred == "covers":
        return inter and m[6] == "F" and m[7] == "F"
    if pred == "covered_by":
        return inter and m[2] == "F" and m[5] == "F"
    if pred == "equals":
        return (inter and m[2] == "F" and m[5] == "F"
                and m[6] == "F" and m[7] == "F")
    if pred == "crosses":
        if da < db:
            return m[0] != "F" and m[2] != "F"
        if da > db:
            return m[0] != "F" and m[6] != "F"
        return m[0] == "0"
    if pred == "overlaps":
        if da != db:
            return False
        ii_ok = m[0] == "1" if da == 1 else m[0] != "F"
        return ii_ok and m[2] != "F" and m[6] != "F"
    raise ValueError(pred)


def _matrix_rows(res, pred, sub, rows, rb, g, ldim):
    """Per-row DE-9IM evaluation for the given left rows."""
    from .relate import relate_pair

    rdim = int(TYPE_DIM[rb.types[g]])
    for i in rows:
        m = relate_pair(sub, i, rb, g)
        res[i] = _pred_from_matrix(m, pred, int(ldim[i]), rdim)
    return res


# -- helper refinements for polygon combinations ---------------------------


def _points_touch_line(lb, lrows, rb, g, on_lines):
    """Point touches line iff it coincides with a line *endpoint* (boundary
    of the lineal geometry)."""
    off = lb.geom_coord_off
    px = lb.coords[off[lrows], 0]
    py = lb.coords[off[lrows], 1]
    ends = []
    for p in range(rb.geom_part_off[g], rb.geom_part_off[g + 1]):
        rings = rb.part_rings(p)
        for r in rings:
            if len(r) >= 2 and not (r[0] == r[-1]).all():
                ends.append(r[0])
                ends.append(r[-1])
    if not ends:
        return np.zeros(len(lrows), dtype=bool)
    E = np.array(ends)
    at_end = ((px[:, None] == E[None, :, 0]) & (py[:, None] == E[None, :, 1])).any(axis=1)
    return on_lines & at_end


def _probe_escape(mx, my, pb, pg):
    """(escapes, ambiguous) for midpoint probes vs polygon pg.

    Two-band probe: a zero-eps status is trusted when it says non-OUTSIDE
    (no escape through that midpoint). Midpoints reading OUTSIDE at zero
    eps are re-probed with the wide 1e-9-relative band: still OUTSIDE ->
    genuinely outside (escape, certain); flipped to BOUNDARY -> the point
    is within the float-noise band of the boundary and the row must be
    decided by the exact DE-9IM matrix. The old code used the wide band
    directly, silently classifying genuinely-outside points within
    1e-9*|coord| of the boundary as BOUNDARY (covered_by/equals answered
    True for polygons differing by ~1e-9 relative — ADVICE r4)."""
    st0 = points_in_geom(mx, my, pb, pg)
    out0 = st0 == OUTSIDE
    if not out0.any():
        return False, False
    # ulp-scaled noise band (a float midpoint of an on-boundary edge
    # sits a few ulps off it); anything outside by more is genuine
    eps = 64.0 * float(np.spacing(max(1.0, float(np.abs(mx).max()),
                                      float(np.abs(my).max()))))
    st1 = points_in_geom(mx[out0], my[out0], pb, pg, eps=eps)
    if (st1 == OUTSIDE).any():
        return True, False
    return False, True


def edge_cross_exits(sub, rb, g, edge_x, any_out):
    """(exits, ambiguous) per left row: a left edge properly exits the
    right polygon. A vertex strictly outside certifies the exit; with
    all vertices covered, edge midpoints are probed — a midpoint
    genuinely outside certifies the exit, but a clean probe CANNOT
    certify coverage when the boundaries cross/touch (the escaping
    stretch can lie between midpoints — round-5 fuzz finding: a cross
    overlap with every vertex of each polygon inside the other read
    covered). Such rows are flagged ambiguous and the caller decides
    them with the exact DE-9IM matrix; rows with no boundary contact
    at all (edge_x False) are decided by the vertex statuses alone."""
    out = any_out.copy()
    amb = np.zeros(len(sub), dtype=bool)
    check = edge_x & ~any_out
    for i in np.nonzero(check)[0]:
        s0, s1 = geom_segments(sub, i)
        if not len(s0):
            continue
        mid = (s0 + s1) / 2.0
        esc, _ = _probe_escape(mid[:, 0], mid[:, 1], rb, g)
        if esc:
            out[i] = True
        else:
            amb[i] = True
    return out, amb


def edge_x_escapes(sub, rb, g, edge_x):
    """(escapes, ambiguous) per left row: a *right* edge escapes the left
    polygon row. Same certification rule as edge_cross_exits — the
    midpoint probe certifies escape only; rows whose boundaries
    cross/touch (edge_x, which is symmetric) without a certifying
    midpoint go to the exact matrix."""
    n = len(sub)
    out = np.zeros(n, dtype=bool)
    amb = np.zeros(n, dtype=bool)
    rs0, rs1 = geom_segments(rb, g)
    if not len(rs0):
        return out, amb
    mid = (rs0 + rs1) / 2.0
    for i in range(n):
        if TYPE_DIM[sub.types[i]] != 2:
            out[i] = True  # non-polygon can't cover a 1/2-dim right
            continue
        esc, _ = _probe_escape(mid[:, 0], mid[:, 1], sub, i)
        if esc:
            out[i] = True
        elif edge_x[i]:
            amb[i] = True
    return out, amb


def _interior_touch(sub, rb, g, any_int):
    """within = covered_by + interiors intersect. For rows with no strictly-
    interior vertex (all on boundary), probe edge midpoints / centroids."""
    n = len(sub)
    ok = any_int.copy()
    from .kernels import centroid as _centroid

    need = ~ok
    if need.any():
        c = _centroid(sub)
        for i in np.nonzero(need)[0]:
            if np.isnan(c[i, 0]):
                continue
            st = points_in_geom(c[i : i + 1, 0], c[i : i + 1, 1], rb, g)
            ok[i] = bool(st[0] == INSIDE)
    return ok


def _interior_overlap(sub, rb, g):
    """Polygon/polygon interiors intersect (used by contains when no right
    vertex is strictly inside): probe right edge midpoints + centroid."""
    n = len(sub)
    out = np.zeros(n, dtype=bool)
    rs0, rs1 = geom_segments(rb, g)
    from .kernels import centroid as _centroid

    for i in range(n):
        if TYPE_DIM[sub.types[i]] != 2:
            continue
        probes = []
        if len(rs0):
            probes.append((rs0 + rs1) / 2.0)
        rc = _centroid(rb.geom_slice(g))
        if not np.isnan(rc[0, 0]):
            probes.append(rc)
        if not probes:
            continue
        P = np.concatenate(probes)
        st = points_in_geom(P[:, 0], P[:, 1], sub, i)
        out[i] = bool((st == INSIDE).any())
    return out


def _line_exits(sub, rb, g):
    """Right line has a point outside left polygon row (for crosses)."""
    n = len(sub)
    out = np.zeros(n, dtype=bool)
    rpts = geom_points(rb, g)
    for i in range(n):
        if TYPE_DIM[sub.types[i]] != 2 or not len(rpts):
            continue
        st = points_in_geom(rpts[:, 0], rpts[:, 1], sub, i)
        out[i] = bool((st == OUTSIDE).any())
    return out


# ---------------------------------------------------------------------------
# public API


def pairwise_predicate(pred: str, lb: GeometryBatch, rb: GeometryBatch,
                       distance: float | None = None) -> np.ndarray:
    """Evaluate ``pred(lb[i], rb[i])`` for every i. bool[n].

    None/empty never match any predicate (sindex.py:159-166: "None/empty
    never match").
    """
    if pred not in PREDICATES:
        raise ValueError(f"unknown predicate {pred!r}; valid: {PREDICATES}")
    n = len(lb)
    if len(rb) != n:
        raise ValueError("pairwise_predicate needs equal-length batches")
    if pred == "disjoint":
        # base.py:2744 — complement of intersects on valid rows; missing/
        # empty rows stay False (the engine-wide "never match" convention,
        # sindex.py:159-166)
        inter = pairwise_predicate("intersects", lb, rb)
        valid_d = (~lb.is_missing() & ~lb.is_empty()
                   & ~rb.is_missing() & ~rb.is_empty())
        return valid_d & ~inter
    out = np.zeros(n, dtype=bool)
    valid = (~lb.is_missing() & ~lb.is_empty()
             & ~rb.is_missing() & ~rb.is_empty())
    if not valid.any():
        return out
    # bbox prefilter (expand by distance for dwithin)
    lbb = bounds(lb)
    rbb = bounds(rb)
    pad = float(distance) if (pred == "dwithin" and distance) else 0.0
    bbox_ok = (
        (lbb[:, 0] <= rbb[:, 2] + pad) & (rbb[:, 0] <= lbb[:, 2] + pad)
        & (lbb[:, 1] <= rbb[:, 3] + pad) & (rbb[:, 1] <= lbb[:, 3] + pad)
    )
    cand = valid & np.nan_to_num(bbox_ok, nan=False) if pred != "dwithin" else valid
    if pred == "dwithin":
        cand = valid & np.where(np.isnan(lbb[:, 0]) | np.isnan(rbb[:, 0]), False, bbox_ok)
    idx = np.nonzero(cand)[0]
    if not len(idx):
        return out
    # fully-vectorized point-in-polygon fast path (sjoin refine hot loop)
    fast = _try_pip_fast_path(pred, lb, rb, idx)
    if fast is not None:
        out[idx] = fast
        return out
    # fully-vectorized general intersects (overlay / polygon-polygon sjoin)
    if pred == "intersects":
        ldim_ok = TYPE_DIM[lb.types[idx]] >= 0
        rdim_ok = TYPE_DIM[rb.types[idx]] >= 0
        if ldim_ok.all() and rdim_ok.all():
            out[idx] = _intersects_pairs(lb, rb, idx)
            return out
    # group by identical right geometry (hot path: polygon side repeats)
    rw_key = _geom_group_keys(rb, idx)
    order = np.argsort(rw_key, kind="stable")
    idx_sorted = idx[order]
    keys_sorted = rw_key[order]
    boundaries = np.nonzero(np.diff(keys_sorted))[0] + 1
    groups = np.split(np.arange(len(idx_sorted)), boundaries)
    for grp in groups:
        rows = idx_sorted[grp]
        rep = int(rows[0])
        if len(rows) > 1:
            # exact-verify: rows whose right geometry isn't bit-identical to
            # the representative evaluate individually (hash collision)
            ok = np.array([_same_geom(rb, int(r), rep) for r in rows])
            for r in rows[~ok]:
                out[r] = _relate_group(pred, lb, np.array([r]), rb, int(r), distance)[0]
            rows = rows[ok]
        if len(rows):
            out[rows] = _relate_group(pred, lb, rows, rb, rep, distance)
    return out


def _geom_group_keys(b: GeometryBatch, idx: np.ndarray) -> np.ndarray:
    """Key per geometry row for grouping identical right geoms:
    (type, n_coords, first/last coord bits, coord checksum). Groups are
    exact-verified against their representative before the vectorized
    kernel runs (`_split_exact_groups`), so collisions cost speed, never
    correctness."""
    off = b.geom_coord_off
    # whole-batch per-geometry checksum (independent of idx selection)
    if len(b.coords):
        xy = b.coords[:, 0] + 1.000000321 * b.coords[:, 1]
        csum_all = _pg_reduce_sum(xy, off)
    else:
        csum_all = np.zeros(len(b), dtype=np.float64)
    n0 = off[idx]
    n1 = off[idx + 1]
    cnt = n1 - n0
    safe0 = np.minimum(n0, max(len(b.coords) - 1, 0))
    first_x = np.where(cnt > 0, b.coords[safe0, 0] if len(b.coords) else 0.0, np.nan)
    first_y = np.where(cnt > 0, b.coords[safe0, 1] if len(b.coords) else 0.0, np.nan)
    h = (
        b.types[idx].astype(np.int64) * 1000003
        ^ (cnt.astype(np.int64) * 8191)
        ^ np.nan_to_num(first_x * 1e6).astype(np.int64)
        ^ (np.nan_to_num(first_y * 1e6).astype(np.int64) << 13)
        ^ np.nan_to_num(csum_all[idx] * 1e3).astype(np.int64)
    )
    return h


def _pg_reduce_sum(values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    n = len(offsets) - 1
    out = np.zeros(n, dtype=np.float64)
    starts = offsets[:-1]
    nonempty = offsets[1:] > starts
    if nonempty.any() and len(values):
        out[nonempty] = np.add.reduceat(values, starts[nonempty])
    return out


def _same_geom(b: GeometryBatch, i: int, j: int) -> bool:
    """Bit-exact geometry equality of rows i and j (structure + coords)."""
    if b.types[i] != b.types[j]:
        return False
    ci0, ci1 = b.geom_coord_off[i], b.geom_coord_off[i + 1]
    cj0, cj1 = b.geom_coord_off[j], b.geom_coord_off[j + 1]
    if ci1 - ci0 != cj1 - cj0:
        return False
    return bool(np.array_equal(b.coords[ci0:ci1], b.coords[cj0:cj1]))


def pairwise_distance(lb: GeometryBatch, rb: GeometryBatch) -> np.ndarray:
    """Exact euclidean distance per pair (base.py:3521). 0 if intersecting;
    nan where either side missing/empty."""
    n = len(lb)
    out = np.full(n, np.nan)
    valid = (~lb.is_missing() & ~lb.is_empty()
             & ~rb.is_missing() & ~rb.is_empty())
    idx = np.nonzero(valid)[0]
    if not len(idx):
        return out
    # fast path: single points on both sides -> one vectorized hypot
    lp = (lb.types == POINT) & (lb.n_coords_per_geom() == 1)
    rp = (rb.types == POINT) & (rb.n_coords_per_geom() == 1)
    pp = lp[idx] & rp[idx]
    if pp.all():
        li = lb.geom_coord_off[idx]
        ri = rb.geom_coord_off[idx]
        dx = lb.coords[li, 0] - rb.coords[ri, 0]
        dy = lb.coords[li, 1] - rb.coords[ri, 1]
        # sqrt(dx^2+dy^2), NOT hypot: bit-parity with SQL oracles that
        # compute sqrt((x1-x2)^2 + (y1-y2)^2)
        out[idx] = np.sqrt(dx * dx + dy * dy)
        return out
    inter = pairwise_predicate("intersects", lb, rb)
    out[idx] = 0.0
    todo = idx[~inter[idx]]
    if len(todo):
        keys = _geom_group_keys(rb, todo)
        order = np.argsort(keys, kind="stable")
        ts = todo[order]
        ks = keys[order]
        bnd = np.nonzero(np.diff(ks))[0] + 1
        for grp in np.split(np.arange(len(ts)), bnd):
            rows = ts[grp]
            rep = int(rows[0])
            if len(rows) > 1:
                ok = np.array([_same_geom(rb, int(r), rep) for r in rows])
                for r in rows[~ok]:
                    d2 = _min_dist2_group(lb.take(np.array([r])), rb, int(r))
                    out[r] = np.sqrt(d2[0])
                rows = rows[ok]
            if len(rows):
                d2 = _min_dist2_group(lb.take(rows), rb, rep)
                out[rows] = np.sqrt(d2)
    return out
