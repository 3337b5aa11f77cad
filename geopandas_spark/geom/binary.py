"""Pairwise binary kernels completing SURVEY.md §2.7.

Reference semantics (/root/reference/geopandas/base.py):
``hausdorff_distance`` :3617 (GEOS discrete Hausdorff on vertices, with
optional densify), ``frechet_distance`` :3732 (discrete Frechet),
``geom_equals_exact`` :2569, ``shortest_line`` :4370, ``snap`` :4473,
``shared_paths`` :4574.
"""

from __future__ import annotations

import numpy as np

from .ragged import (
    LINESTRING,
    MISSING,
    MULTILINESTRING,
    GeometryBatch,
    GeometryBatchBuilder,
    POINT,
)
from .unary import _geom_rings


def _geom_vertices(b: GeometryBatch, g: int) -> np.ndarray:
    off = b.geom_coord_off
    return b.coords[off[g]:off[g + 1]]


def _geom_segs(b: GeometryBatch, g: int):
    s0, s1 = [], []
    for _, r in _geom_rings(b, g):
        if len(r) >= 2:
            s0.append(r[:-1])
            s1.append(r[1:])
    if s0:
        return np.vstack(s0), np.vstack(s1)
    return np.empty((0, 2)), np.empty((0, 2))


def _densify_vertices(b: GeometryBatch, g: int, densify: float | None) -> np.ndarray:
    """Vertices, optionally densified: each segment split into
    ceil(1/densify) equal pieces (GEOS densify fraction semantics)."""
    if densify is None:
        return _geom_vertices(b, g)
    k = int(np.ceil(1.0 / float(densify)))
    pts = [np.empty((0, 2))]
    for _, r in _geom_rings(b, g):
        if len(r) < 2:
            pts.append(r)
            continue
        seg = np.diff(r, axis=0)
        ts = np.linspace(0, 1, k + 1)[:-1]
        dense = (r[:-1][:, None, :] + ts[None, :, None] * seg[:, None, :]).reshape(-1, 2)
        pts.append(np.vstack([dense, r[-1:]]))
    return np.vstack(pts)


def _point_to_geom_dist(pts: np.ndarray, b: GeometryBatch, g: int) -> np.ndarray:
    """Min distance of each point to geometry g's segments/vertices."""
    from .kernels import point_segment_dist2

    s0, s1 = _geom_segs(b, g)
    if len(s0):
        d2 = point_segment_dist2(pts[:, 0], pts[:, 1], s0, s1)
        return np.sqrt(d2.min(axis=1))
    v = _geom_vertices(b, g)
    if len(v) == 0:
        return np.full(len(pts), np.nan)
    d2 = ((pts[:, None, :] - v[None, :, :]) ** 2).sum(axis=2)
    return np.sqrt(d2.min(axis=1))


def hausdorff_distance(lb: GeometryBatch, rb: GeometryBatch,
                       densify: float | None = None) -> np.ndarray:
    """Discrete (vertex-sampled, optionally densified) symmetric Hausdorff
    distance per pair — GEOS DiscreteHausdorffDistance semantics."""
    n = len(lb)
    out = np.full(n, np.nan)
    for g in range(n):
        if lb.types[g] == MISSING or rb.types[g] == MISSING:
            continue
        pa = _densify_vertices(lb, g, densify)
        pb = _densify_vertices(rb, g, densify)
        if len(pa) == 0 or len(pb) == 0:
            continue
        d_ab = _point_to_geom_dist(pa, rb, g).max()
        d_ba = _point_to_geom_dist(pb, lb, g).max()
        out[g] = max(d_ab, d_ba)
    return out


def frechet_distance(lb: GeometryBatch, rb: GeometryBatch,
                     densify: float | None = None) -> np.ndarray:
    """Discrete Frechet distance (coupled dog-walk) on vertex sequences."""
    n = len(lb)
    out = np.full(n, np.nan)
    for g in range(n):
        if lb.types[g] == MISSING or rb.types[g] == MISSING:
            continue
        P = _densify_vertices(lb, g, densify)
        Q = _densify_vertices(rb, g, densify)
        if len(P) == 0 or len(Q) == 0:
            continue
        D = np.sqrt(((P[:, None, :] - Q[None, :, :]) ** 2).sum(axis=2))
        ca = np.full_like(D, np.inf)
        ca[0, 0] = D[0, 0]
        for i in range(len(P)):
            for j in range(len(Q)):
                if i == 0 and j == 0:
                    continue
                prev = np.inf
                if i > 0:
                    prev = min(prev, ca[i - 1, j])
                if j > 0:
                    prev = min(prev, ca[i, j - 1])
                if i > 0 and j > 0:
                    prev = min(prev, ca[i - 1, j - 1])
                ca[i, j] = max(prev, D[i, j])
        out[g] = ca[-1, -1]
    return out


def geom_equals_exact(lb: GeometryBatch, rb: GeometryBatch,
                      tolerance: float = 0.0) -> np.ndarray:
    """Structural equality within tolerance (base.py:2569): same type,
    same structure, coordinates pairwise within tolerance."""
    n = len(lb)
    out = np.zeros(n, dtype=bool)
    for g in range(n):
        if lb.types[g] != rb.types[g]:
            continue
        if lb.types[g] == MISSING:
            continue
        ra = _geom_rings(lb, g)
        rb_ = _geom_rings(rb, g)
        if len(ra) != len(rb_):
            continue
        ok = True
        for (ta, ca), (tb, cb) in zip(ra, rb_):
            if ta != tb or len(ca) != len(cb):
                ok = False
                break
            if len(ca) and not (np.abs(ca - cb) <= tolerance).all():
                ok = False
                break
        out[g] = ok
    return out


def shortest_line(lb: GeometryBatch, rb: GeometryBatch) -> GeometryBatch:
    """LineString between the closest points of each pair (base.py:4370)."""
    from .kernels import point_segment_dist2
    from .predicates import pairwise_predicate

    bld = GeometryBatchBuilder()
    inter = pairwise_predicate("intersects", lb, rb)
    for g in range(len(lb)):
        if lb.types[g] == MISSING or rb.types[g] == MISSING:
            bld.add_missing()
            continue
        pa = _geom_vertices(lb, g)
        pb = _geom_vertices(rb, g)
        if len(pa) == 0 or len(pb) == 0:
            bld.add_missing()
            continue
        if inter[g]:
            # touching/overlapping: zero-length line at any shared locus —
            # use the point of a that is closest to b
            d = _point_to_geom_dist(pa, rb, g)
            i = int(np.argmin(d))
            p = pa[i]
            bld.add(LINESTRING, [(LINESTRING, [np.vstack([p, p])])])
            continue
        best = (np.inf, None, None)
        sb0, sb1 = _geom_segs(rb, g)
        if len(sb0):
            d2 = point_segment_dist2(pa[:, 0], pa[:, 1], sb0, sb1)
            i, j = np.unravel_index(np.argmin(d2), d2.shape)
            seg = sb1[j] - sb0[j]
            L2 = (seg ** 2).sum()
            t = 0.0 if L2 == 0 else float(np.clip(np.dot(pa[i] - sb0[j], seg) / L2, 0, 1))
            q = sb0[j] + t * seg
            best = (d2[i, j], pa[i], q)
        else:
            d2 = ((pa[:, None, :] - pb[None, :, :]) ** 2).sum(axis=2)
            i, j = np.unravel_index(np.argmin(d2), d2.shape)
            best = (d2[i, j], pa[i], pb[j])
        sa0, sa1 = _geom_segs(lb, g)
        if len(sa0) and len(pb):
            d2 = point_segment_dist2(pb[:, 0], pb[:, 1], sa0, sa1)
            i, j = np.unravel_index(np.argmin(d2), d2.shape)
            if d2[i, j] < best[0]:
                seg = sa1[j] - sa0[j]
                L2 = (seg ** 2).sum()
                t = 0.0 if L2 == 0 else float(np.clip(np.dot(pb[i] - sa0[j], seg) / L2, 0, 1))
                q = sa0[j] + t * seg
                best = (d2[i, j], q, pb[i])
        _, p, q = best
        bld.add(LINESTRING, [(LINESTRING, [np.vstack([p, q])])])
    return bld.finish()


def snap(lb: GeometryBatch, rb: GeometryBatch, tolerance: float) -> GeometryBatch:
    """Snap vertices of a to the nearest vertex of b within tolerance
    (base.py:4473; vertex-to-vertex GEOS snap rule)."""
    bld = GeometryBatchBuilder()
    for g in range(len(lb)):
        t = int(lb.types[g])
        if t == MISSING:
            bld.add_missing()
            continue
        vb = _geom_vertices(rb, g)
        parts = []
        for p in range(lb.geom_part_off[g], lb.geom_part_off[g + 1]):
            pt = int(lb.part_types[p])
            rings = []
            for r in range(lb.part_ring_off[p], lb.part_ring_off[p + 1]):
                c = lb.coords[lb.ring_coord_off[r]:lb.ring_coord_off[r + 1]].copy()
                if len(c) and len(vb):
                    d2 = ((c[:, None, :] - vb[None, :, :]) ** 2).sum(axis=2)
                    j = d2.argmin(axis=1)
                    hit = np.sqrt(d2[np.arange(len(c)), j]) <= tolerance
                    c[hit] = vb[j[hit]]
                rings.append(c)
            parts.append((pt, rings))
        bld.add(t, parts)
    return bld.finish()


def shared_paths(lb: GeometryBatch, rb: GeometryBatch) -> GeometryBatch:
    """Collinear overlapping segments of two lineal geometries
    (base.py:4574): MultiLineString of the shared pieces. GEOS wraps the
    same-direction and opposite-direction groups in a nested
    GeometryCollection, which this engine's flat ragged model cannot
    represent — instead, same-direction pieces come first oriented WITH
    the first line, then opposite-direction pieces oriented AGAINST it,
    so callers can recover the split from piece orientation."""
    bld = GeometryBatchBuilder()
    for g in range(len(lb)):
        if lb.types[g] not in (LINESTRING, MULTILINESTRING) or \
                rb.types[g] not in (LINESTRING, MULTILINESTRING):
            bld.add_missing()
            continue
        a0, a1 = _geom_segs(lb, g)
        b0, b1 = _geom_segs(rb, g)
        fwd: list = []
        bwd: list = []
        for i in range(len(a0)):
            da = a1[i] - a0[i]
            La = np.hypot(*da)
            if La == 0:
                continue
            u = da / La
            for j in range(len(b0)):
                db = b1[j] - b0[j]
                cross = da[0] * db[1] - da[1] * db[0]
                if cross != 0:
                    continue
                # collinear check: b0 on the line of a
                w = b0[j] - a0[i]
                if abs(da[0] * w[1] - da[1] * w[0]) > 1e-12 * max(La, 1):
                    continue
                ta0 = 0.0
                ta1 = La
                tb0 = float(np.dot(b0[j] - a0[i], u))
                tb1 = float(np.dot(b1[j] - a0[i], u))
                lo = max(ta0, min(tb0, tb1))
                hi = min(ta1, max(tb0, tb1))
                if hi > lo:
                    piece = np.vstack([a0[i] + lo * u, a0[i] + hi * u])
                    if float(np.dot(db, u)) > 0:
                        fwd.append(piece)
                    else:
                        bwd.append(piece[::-1])
        bld.add(MULTILINESTRING,
                [(LINESTRING, [p]) for p in fwd + bwd])
    return bld.finish()
