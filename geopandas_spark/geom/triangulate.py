"""Delaunay triangulation, Voronoi diagram, concave hull.

Reference semantics (/root/reference/geopandas/base.py):
``delaunay_triangles(tolerance, only_edges)`` :908 — triangulation of the
geometry's vertices; ``voronoi_polygons(tolerance, extend_to, only_edges)``
:999 — Voronoi cells of the vertices, clipped to a (possibly extended)
envelope; ``concave_hull(ratio, allow_holes)`` :799 — chi-shape obtained
by eroding long border edges of the Delaunay triangulation (GEOS
ConcaveHull: edges longer than ``min + ratio*(max-min)`` are removed
while the boundary stays regular).

Algorithm: Bowyer–Watson incremental insertion with a super-triangle;
pure numpy per geometry (vertex counts are feature-sized).
"""

from __future__ import annotations

import numpy as np


def snap_points(points: np.ndarray, tolerance: float) -> np.ndarray:
    """GEOS-style robustness snapping (base.py:908/999 ``tolerance``):
    each point within ``tolerance`` of an earlier kept point collapses
    onto it; 0 disables. O(n*kept) — inputs are feature-sized."""
    pts = np.asarray(points, dtype=np.float64)
    if tolerance <= 0 or len(pts) == 0:
        return pts
    tol2 = float(tolerance) ** 2
    kept: list[np.ndarray] = []
    out = np.empty_like(pts)
    for i, p in enumerate(pts):
        hit = None
        for q in kept:
            if (p[0] - q[0]) ** 2 + (p[1] - q[1]) ** 2 <= tol2:
                hit = q
                break
        if hit is None:
            kept.append(p)
            out[i] = p
        else:
            out[i] = hit
    return out


def delaunay(points: np.ndarray, tolerance: float = 0.0):
    """Bowyer–Watson -> (list of vertex-index triangles (CCW), unique pts)."""
    pts = snap_points(np.asarray(points, dtype=np.float64), tolerance)
    pts = np.unique(pts, axis=0)
    n = len(pts)
    if n < 3:
        # uniform return shape — callers unpack (tris, pts); >=3 raw
        # coords can still collapse to <3 unique points (ADVICE fix)
        return [], pts
    # super-triangle
    cx, cy = pts[:, 0].mean(), pts[:, 1].mean()
    span = max(np.ptp(pts[:, 0]), np.ptp(pts[:, 1]), 1e-9) * 100
    sup = np.array([[cx - 2 * span, cy - span], [cx + 2 * span, cy - span],
                    [cx, cy + 2 * span]])
    vs = np.vstack([pts, sup])
    tris: list[tuple[int, int, int]] = [(n, n + 1, n + 2)]

    span2 = span * span

    def circum(tri):
        a, b, c = vs[tri[0]], vs[tri[1]], vs[tri[2]]
        d = 2 * (a[0] * (b[1] - c[1]) + b[0] * (c[1] - a[1]) + c[0] * (a[1] - b[1]))
        if d == 0:
            return None
        ux = ((a ** 2).sum() * (b[1] - c[1]) + (b ** 2).sum() * (c[1] - a[1])
              + (c ** 2).sum() * (a[1] - b[1])) / d
        uy = ((a ** 2).sum() * (c[0] - b[0]) + (b ** 2).sum() * (a[0] - c[0])
              + (c ** 2).sum() * (b[0] - a[0])) / d
        r2 = (a[0] - ux) ** 2 + (a[1] - uy) ** 2
        # |d| = 4*|signed area|: a sliver triangle's circumcenter is the
        # quotient of two nearly-cancelling terms, so the float in-circle
        # test below can carry arbitrarily large error — flag such
        # triangles for the exact (Fraction) in-circle path
        ill = abs(d) <= 1e-7 * span2
        return ux, uy, r2, ill

    def _incircle_exact(tri, p) -> bool:
        """Exact in-circumcircle via Fractions (floats are exact
        rationals): det > 0 <=> p strictly inside the CCW triangle's
        circumcircle; 0 (cocircular) counts inside, matching the float
        path's <= convention."""
        from fractions import Fraction as F

        a, b, c = vs[tri[0]], vs[tri[1]], vs[tri[2]]
        ax, ay = F(a[0]) - F(p[0]), F(a[1]) - F(p[1])
        bx, by = F(b[0]) - F(p[0]), F(b[1]) - F(p[1])
        cx_, cy_ = F(c[0]) - F(p[0]), F(c[1]) - F(p[1])
        det = ((ax * ax + ay * ay) * (bx * cy_ - by * cx_)
               - (bx * bx + by * by) * (ax * cy_ - ay * cx_)
               + (cx_ * cx_ + cy_ * cy_) * (ax * by - ay * bx))
        # orient the sign by the triangle's exact orientation
        orient = (bx - ax) * (cy_ - ay) - (by - ay) * (cx_ - ax)
        if orient < 0:
            det = -det
        return det >= 0

    def _orient_sign(u, v, p) -> int:
        """Exact-when-needed sign of cross(v-u, p-u)."""
        cr = (v[0] - u[0]) * (p[1] - u[1]) - (v[1] - u[1]) * (p[0] - u[0])
        if abs(cr) > 1e-7 * span2:
            return 1 if cr > 0 else -1
        from fractions import Fraction as F

        cr = ((F(v[0]) - F(u[0])) * (F(p[1]) - F(u[1]))
              - (F(v[1]) - F(u[1])) * (F(p[0]) - F(u[0])))
        return 1 if cr > 0 else (-1 if cr < 0 else 0)

    def _in_circle(t, p) -> bool:
        """In-circumcircle with the IDEAL-vertex convention: the three
        super vertices stand for points at infinity, so a triangle with
        ONE super vertex owns the open half-plane beyond its real edge
        (plus that edge). A finite super-triangle alone is not enough —
        a hull-adjacent sliver's circumcircle can exceed the supers'
        distance, making the metric test drop a REAL triangle from the
        output (hypothesis finding: 4 near-collinear points returned 1
        triangle instead of 2)."""
        n_ideal = (t[0] >= n) + (t[1] >= n) + (t[2] >= n)
        if n_ideal == 1:
            # real edge (u, v) in the triangle's CCW cyclic order
            if t[0] >= n:
                u, v = t[1], t[2]
            elif t[1] >= n:
                u, v = t[2], t[0]
            else:
                u, v = t[0], t[1]
            s = _orient_sign(vs[u], vs[v], p)
            if s != 0:
                return s > 0
            # collinear with the hull edge: inside iff ON the segment
            return bool(
                min(vs[u][0], vs[v][0]) <= p[0] <= max(vs[u][0], vs[v][0])
                and min(vs[u][1], vs[v][1]) <= p[1] <= max(vs[u][1], vs[v][1]))
        c = cc[tuple(t)]
        if c is None:
            return False
        if n_ideal >= 2:
            # both circle vertices at infinity: metric on the far supers
            # is adequate (decides only connectivity near the super rim)
            return (p[0] - c[0]) ** 2 + (p[1] - c[1]) ** 2 <= c[2] * (1 + 1e-12)
        if c[3]:  # ill-conditioned real sliver: exact test
            return _incircle_exact(t, p)
        dist2 = (p[0] - c[0]) ** 2 + (p[1] - c[1]) ** 2
        if abs(dist2 - c[2]) <= 1e-9 * max(c[2], span2):
            # near the circle: the float verdict is one rounding error
            # from flipping — decide exactly
            return _incircle_exact(t, p)
        return dist2 <= c[2]

    cc = {tuple(tris[0]): circum(tris[0])}
    for i in range(n):
        p = vs[i]
        bad = [t for t in tris if _in_circle(t, p)]
        if not bad:
            # p lies inside the super-triangle, so SOME triangle must
            # claim it. A point exactly collinear with a hull edge but
            # beyond its endpoints can slip between the 1-ideal
            # half-plane test (s==0, off-segment) and the 2-ideal
            # metric test (ADVICE r4) — instead of silently dropping
            # the point, claim the triangle(s) geometrically containing
            # it (exact-orientation >= 0 on all three CCW edges); a
            # legal, if locally non-Delaunay, insertion cavity.
            bad = [t for t in tris if all(
                _orient_sign(vs[t[k]], vs[t[(k + 1) % 3]], p) >= 0
                for k in range(3))]
        # boundary of the bad-triangle cavity
        edge_count: dict[tuple[int, int], int] = {}
        for t in bad:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                k = (min(e), max(e))
                edge_count[k] = edge_count.get(k, 0) + 1
        boundary = [e for e, cnt in edge_count.items() if cnt == 1]
        for t in bad:
            tris.remove(t)
            cc.pop(tuple(t), None)
        for (u, v) in boundary:
            # orient CCW (exact-when-needed: a float cross of a sliver
            # can mis-orient, which flips the ideal-edge half-plane)
            t = (u, v, i) if _orient_sign(vs[u], vs[v], p) > 0 else (v, u, i)
            tris.append(t)
            cc[tuple(t)] = circum(t)
    out = [t for t in tris if max(t) < n]
    return out, pts


def delaunay_edges(points: np.ndarray, tolerance: float = 0.0):
    tris, pts = delaunay(points, tolerance)
    edges = set()
    for t in tris:
        for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
            edges.add((min(e), max(e)))
    return sorted(edges), pts


def voronoi(points: np.ndarray, extent: tuple[float, float, float, float],
            tolerance: float = 0.0):
    """Voronoi cells of unique points, clipped to ``extent`` (bbox).

    Returns (cells, pts): cells[i] is a closed CCW ring for pts[i] (or
    None when degenerate). Built by half-plane clipping of the extent box
    against each neighbor — robust and exact for feature-sized inputs."""
    pts = snap_points(np.asarray(points, dtype=np.float64), tolerance)
    pts = np.unique(pts, axis=0)
    n = len(pts)
    minx, miny, maxx, maxy = extent
    box = np.array([[minx, miny], [maxx, miny], [maxx, maxy], [minx, maxy]])
    cells = []
    for i in range(n):
        cell = box.copy()
        for j in range(n):
            if i == j or len(cell) == 0:
                continue
            # half-plane: points closer to i than j
            mid = (pts[i] + pts[j]) / 2
            nrm = pts[j] - pts[i]
            # keep nrm . (x - mid) <= 0
            keep = []
            m = len(cell)
            d = (cell - mid) @ nrm
            for k in range(m):
                k2 = (k + 1) % m
                if d[k] <= 0:
                    keep.append(cell[k])
                if (d[k] <= 0) != (d[k2] <= 0):
                    t = d[k] / (d[k] - d[k2])
                    keep.append(cell[k] + t * (cell[k2] - cell[k]))
            cell = np.array(keep) if keep else np.empty((0, 2))
        if len(cell) >= 3:
            ring = np.vstack([cell, cell[:1]])
            cells.append(ring)
        else:
            cells.append(None)
    return cells, pts


def concave_hull(points: np.ndarray, ratio: float = 0.0,
                 allow_holes: bool = False):
    """Chi-shape concave hull (GEOS ConcaveHull semantics): start from the
    Delaunay triangulation, repeatedly remove border triangles whose
    border edge is longer than ``min_edge + ratio * (max_edge - min_edge)``
    while removal keeps the region regular (edge not shared, interior
    vertex stays connected). ratio=1 -> convex hull; ratio=0 -> most
    concave. Returns rings (list of closed ndarrays)."""
    tris, pts = delaunay(points)
    if not tris:
        u = np.unique(np.asarray(points, dtype=np.float64), axis=0)
        return [np.vstack([u, u[:1]])] if len(u) else []
    tris = set(tris)

    def elen(u, v):
        return float(np.hypot(*(pts[u] - pts[v])))

    all_edges = set()
    for t in tris:
        for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
            all_edges.add((min(e), max(e)))
    lens = [elen(u, v) for u, v in all_edges]
    lmin, lmax = min(lens), max(lens)
    target = lmin + float(ratio) * (lmax - lmin)

    def edge_tris(edges_map=None):
        m: dict[tuple[int, int], list] = {}
        for t in tris:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                m.setdefault((min(e), max(e)), []).append(t)
        return m

    changed = True
    while changed:
        changed = False
        em = edge_tris()
        border = [(elen(u, v), (u, v)) for (u, v), ts in em.items()
                  if len(ts) == 1]
        border.sort(reverse=True)
        for L, (u, v) in border:
            if L <= target:
                break
            em2 = edge_tris()
            ts = em2.get((u, v), [])
            if len(ts) != 1:
                continue
            t = ts[0]
            w = [x for x in t if x not in (u, v)][0]
            # regularity: the opposite vertex must not itself be on the
            # border already (removal would pinch the region)
            w_border = any(
                len(em2.get((min(w, z), max(w, z)), [])) == 1
                for z in (u, v))
            if w_border:
                continue
            tris.discard(t)
            changed = True
            break
    # boundary = edges used once
    em = edge_tris()
    border_edges = [e for e, ts in em.items() if len(ts) == 1]
    rings = _edges_to_rings(border_edges, pts)
    if not allow_holes and len(rings) > 1:
        areas = [abs(np.cross(r[:-1], r[1:]).sum()) / 2 for r in rings]
        rings = [rings[int(np.argmax(areas))]]
    return rings


def _edges_to_rings(edges, pts) -> list[np.ndarray]:
    adj: dict[int, list[int]] = {}
    for u, v in edges:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    used = set()
    rings = []
    for u, v in edges:
        if (u, v) in used or (v, u) in used:
            continue
        path = [u, v]
        used.add((u, v))
        cur, prev = v, u
        while True:
            nxts = [w for w in adj[cur]
                    if (cur, w) not in used and (w, cur) not in used]
            if not nxts:
                break
            nxt = nxts[0]
            used.add((cur, nxt))
            path.append(nxt)
            prev, cur = cur, nxt
            if cur == path[0]:
                break
        if len(path) >= 4 and path[0] == path[-1]:
            rings.append(pts[path])
    return rings
