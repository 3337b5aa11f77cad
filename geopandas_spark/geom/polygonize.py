"""polygonize / build_area — assemble polygons from noded linework.

Reference semantics (/root/reference/geopandas/base.py:5763 ``polygonize``
(+``full=True`` -> (polygons, cut edges, dangles, invalid rings)) and
:5712 ``build_area``). Input linework must be *noded* (edges meet only at
endpoints) — the same contract GEOS Polygonizer has.

Algorithm: classic planar ring assembly — build the edge graph, at every
node sort incident half-edges by angle, walk each unused half-edge taking
the most-clockwise turn; CCW faces are polygon shells, the CW outer face
is discarded. Dangles = edges with a degree-1 endpoint; cut edges = edges
used by the same face twice.
"""

from __future__ import annotations

import math

import numpy as np


def _node_key(p, snap=1e-12):
    return (round(float(p[0]) / snap) * snap, round(float(p[1]) / snap) * snap)


def polygonize_segments(segments: list[tuple]) -> dict:
    """segments: [((x0,y0),(x1,y1)), ...] noded linework.

    -> {"polygons": [closed CCW ring ndarray], "dangles": [segment],
        "cuts": [segment]}"""
    # drop degenerate + dedupe undirected edges
    edges = []
    seen = set()
    for a, b in segments:
        a, b = _node_key(a), _node_key(b)
        if a == b:
            continue
        k = (a, b) if a <= b else (b, a)
        if k in seen:
            continue
        seen.add(k)
        edges.append((a, b))

    # dangle pruning (iterate: removing a dangle can expose another)
    while True:
        deg: dict = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        dangles = [(a, b) for a, b in edges if deg[a] == 1 or deg[b] == 1]
        if not dangles:
            break
        dset = set(dangles)
        edges = [e for e in edges if e not in dset]
    all_dangles = [e for e in seen if e not in set(
        tuple(sorted(x)) for x in edges)]

    # half-edge structure
    out_edges: dict = {}
    for a, b in edges:
        out_edges.setdefault(a, []).append(b)
        out_edges.setdefault(b, []).append(a)
    for n, nbrs in out_edges.items():
        nbrs.sort(key=lambda q: math.atan2(q[1] - n[1], q[0] - n[0]))

    used = set()
    faces = []
    for a, b in edges:
        for he in ((a, b), (b, a)):
            if he in used:
                continue
            face = [he[0]]
            cur = he
            while True:
                used.add(cur)
                face.append(cur[1])
                # at cur[1], incoming direction cur[0]->cur[1]; take the
                # next neighbor clockwise from the reverse direction
                nbrs = out_edges[cur[1]]
                back_ang = math.atan2(cur[0][1] - cur[1][1],
                                      cur[0][0] - cur[1][0])
                best = None
                best_d = None
                for q in nbrs:
                    ang = math.atan2(q[1] - cur[1][1], q[0] - cur[1][0])
                    d = (back_ang - ang) % (2 * math.pi)
                    if d == 0:
                        continue
                    if best_d is None or d < best_d:
                        best_d = d
                        best = q
                if best is None:
                    break
                cur = (cur[1], best)
                if cur == he:
                    break
                if cur in used:
                    break
            if len(face) >= 4 and face[0] == face[-1]:
                faces.append(np.array(face, dtype=np.float64))

    polygons = []
    cuts = []
    for f in faces:
        area2 = float(np.cross(f[:-1], f[1:]).sum())
        if area2 > 0:
            polygons.append(f)

    # hole assignment (JTS Polygonizer parity): a face of a DISCONNECTED
    # component strictly inside another face is an island — its boundary
    # is a hole of the smallest containing face. The island face itself
    # is still a face (polygonize outputs it; build_area drops odd-depth
    # faces).
    n = len(polygons)
    areas = [0.5 * abs(float(np.cross(p[:-1], p[1:]).sum()))
             for p in polygons]
    depth = [0] * n
    parent: list = [None] * n
    for i in range(n):
        conts = []
        for j in range(n):
            if j == i or areas[j] <= areas[i]:
                continue
            r = None
            for v in polygons[i][:-1]:
                r = _point_in_ring(float(v[0]), float(v[1]), polygons[j])
                if r is not None:
                    break
            if r:
                conts.append(j)
        depth[i] = len(conts)
        if conts:
            parent[i] = min(conts, key=lambda j: areas[j])
    face_rings = []
    for i in range(n):
        holes = [polygons[k][::-1] for k in range(n)
                 if parent[k] == i and depth[k] == depth[i] + 1]
        face_rings.append({"rings": [polygons[i]] + holes,
                           "depth": depth[i]})
    return {
        "polygons": polygons,
        "faces": face_rings,
        "dangles": [np.array(e, dtype=np.float64) for e in all_dangles],
        "cuts": cuts,
    }


def _point_in_ring(px: float, py: float, ring: np.ndarray):
    """Ray-crossing point-in-ring: True inside, False outside, None when
    the point lies on the boundary (caller tries another vertex)."""
    inside = False
    for k in range(len(ring) - 1):
        x1, y1 = float(ring[k][0]), float(ring[k][1])
        x2, y2 = float(ring[k + 1][0]), float(ring[k + 1][1])
        cross = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
        if (cross == 0 and min(x1, x2) <= px <= max(x1, x2)
                and min(y1, y2) <= py <= max(y1, y2)):
            return None
        if (y1 > py) != (y2 > py):
            xint = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
            if px < xint:
                inside = not inside
    return inside


def batch_segments(b, g: int) -> list[tuple]:
    """All segments of geometry g as coordinate-tuple pairs."""
    from .unary import _geom_rings

    segs = []
    for _, r in _geom_rings(b, g):
        for i in range(len(r) - 1):
            segs.append((tuple(r[i]), tuple(r[i + 1])))
    return segs
