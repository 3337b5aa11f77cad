"""make_valid — repair invalid polygonal geometry (base.py:1641).

GEOS 'linework' semantics: node the ring linework at every
self-intersection, rebuild minimal faces, and keep the regions covered an
odd number of times (even-odd rule). A bowtie splits into two triangles;
a self-overlapping shell loses the doubly-covered region; shell + hole
rings in separate components combine by XOR (hole subtracts).

Pipeline per geometry (feature-sized, pure numpy):

1. rings -> segments -> pairwise noding (split at crossings and collinear
   overlap endpoints) — O(S^2) per feature.
2. connected components of the noded graph (union-find on snapped nodes).
3. per component: polygonize minimal faces (geom/polygonize.py), keep a
   face iff its representative point has odd crossing parity against the
   component's own linework.
4. components fold together with the Martinez-Rueda XOR (geom/boolean.py)
   — the cross-component even-odd rule.

Puntal/lineal/missing/already-valid rows pass through unchanged (the
reference returns non-polygonal inputs as-is).
"""

from __future__ import annotations

import numpy as np

from .ragged import (
    MISSING, MULTIPOLYGON, POLYGON, TYPE_DIM, GeometryBatch,
    GeometryBatchBuilder)

_SNAP = 1e-12


def _key(p) -> tuple:
    return (round(float(p[0]) / _SNAP) * _SNAP,
            round(float(p[1]) / _SNAP) * _SNAP)


def _node_segments(segs: list) -> list:
    """Split every segment at its intersections with every other segment
    (crossings, touches, collinear overlap endpoints)."""
    n = len(segs)
    cuts = [[] for _ in range(n)]
    for i in range(n):
        p0, p1 = segs[i]
        d = p1 - p0
        L2 = float(d @ d)
        if L2 == 0.0:
            continue
        for j in range(i + 1, n):
            q0, q1 = segs[j]
            e = q1 - q0
            denom = d[0] * e[1] - d[1] * e[0]
            w = q0 - p0
            if abs(denom) > 1e-14 * max(np.hypot(*d), 1) * max(np.hypot(*e), 1):
                t = (w[0] * e[1] - w[1] * e[0]) / denom
                s = (w[0] * d[1] - w[1] * d[0]) / denom
                if -1e-12 <= t <= 1 + 1e-12 and -1e-12 <= s <= 1 + 1e-12:
                    cuts[i].append(float(np.clip(t, 0, 1)))
                    cuts[j].append(float(np.clip(s, 0, 1)))
            else:
                # parallel: collinear overlap -> cut at projected endpoints
                if abs(d[0] * w[1] - d[1] * w[0]) > 1e-12 * max(L2, 1.0):
                    continue
                for q in (q0, q1):
                    t = float((q - p0) @ d) / L2
                    if 1e-12 < t < 1 - 1e-12:
                        cuts[i].append(t)
                e2 = float(e @ e)
                if e2 > 0:
                    for p in (p0, p1):
                        s = float((p - q0) @ e) / e2
                        if 1e-12 < s < 1 - 1e-12:
                            cuts[j].append(s)
    out = []
    for i in range(n):
        p0, p1 = segs[i]
        d = p1 - p0
        ts = sorted({0.0, 1.0, *cuts[i]})
        for a, b in zip(ts[:-1], ts[1:]):
            if b - a > 1e-12:
                out.append((p0 + a * d, p0 + b * d))
    return out


def _components(noded: list) -> list:
    """Union-find on snapped endpoints -> list of segment-index lists."""
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    for p0, p1 in noded:
        for p in (p0, p1):
            parent.setdefault(_key(p), _key(p))
        union(_key(p0), _key(p1))
    groups: dict = {}
    for i, (p0, p1) in enumerate(noded):
        groups.setdefault(find(_key(p0)), []).append(i)
    return list(groups.values())


def _parity_inside(pt: np.ndarray, segs: list) -> bool:
    """Even-odd crossing parity of a rightward ray from pt."""
    x, y = float(pt[0]), float(pt[1])
    cnt = 0
    for p0, p1 in segs:
        y0, y1 = float(p0[1]), float(p1[1])
        if (y0 > y) == (y1 > y):
            continue
        xs = float(p0[0]) + (y - y0) / (y1 - y0) * (float(p1[0]) - float(p0[0]))
        if xs > x:
            cnt += 1
    return cnt % 2 == 1


def _face_rep_point(ring: np.ndarray) -> np.ndarray:
    """Interior point of a simple ring via the engine's representative-
    point kernel (guaranteed inside)."""
    from .transforms import representative_point

    bld = GeometryBatchBuilder()
    closed = ring if (ring[0] == ring[-1]).all() else np.vstack([ring, ring[:1]])
    bld.add(POLYGON, [(POLYGON, [closed])])
    return representative_point(bld.finish())[0]


def make_valid_rings(rings: list) -> list:
    """Repaired ring set (group_rings-compatible flat ring list)."""
    from .boolean import boolean_rings
    from .polygonize import polygonize_segments

    segs = []
    for r in rings:
        rr = r if (len(r) and (r[0] == r[-1]).all()) else (
            np.vstack([r, r[:1]]) if len(r) else r)
        for i in range(len(rr) - 1):
            if not (rr[i] == rr[i + 1]).all():
                segs.append((rr[i].astype(np.float64),
                             rr[i + 1].astype(np.float64)))
    if not segs:
        return []
    noded = _node_segments(segs)
    comp_rings: list = []  # one ring-list per component
    for idxs in _components(noded):
        comp_segs = [noded[i] for i in idxs]
        faces = polygonize_segments(
            [((s[0][0], s[0][1]), (s[1][0], s[1][1])) for s in comp_segs]
        )["polygons"]
        kept = []
        for face in faces:
            rp = _face_rep_point(face)
            if np.isnan(rp[0]):
                continue
            if _parity_inside(rp, comp_segs):
                kept.append(np.asarray(face, dtype=np.float64))
        if kept:
            comp_rings.append(kept)
    if not comp_rings:
        return []
    acc = comp_rings[0]
    for nxt in comp_rings[1:]:
        acc = boolean_rings(acc, nxt, "xor")
    return acc


def make_valid(batch: GeometryBatch) -> GeometryBatch:
    """base.py:1641 — repaired batch; non-polygonal rows pass through."""
    from .clipping import _all_poly_rings, _emit_polys
    from .boolean import group_rings
    from .unary import is_valid

    valid = is_valid(batch)
    types = np.asarray(batch.types)
    passthrough = (types == MISSING) | (TYPE_DIM[types] != 2) \
        | np.asarray(valid, dtype=bool)
    if passthrough.all():
        # nothing to repair: hand back the batch itself (byte-identical
        # by construction). The per-geometry _copy rebuild below is a
        # Python-level loop — ~0.5 ms/row, and it used to run even for
        # fully-valid inputs (measured 10 s on 20k clean rects at sf0.1,
        # dominating overlay's make_valid=True pre-pass).
        return batch
    out = GeometryBatchBuilder()
    for g in range(len(batch)):
        t = int(batch.types[g])
        if t == MISSING or TYPE_DIM[t] != 2 or valid[g]:
            _copy(batch, g, out)
            continue
        repaired = make_valid_rings(_all_poly_rings(batch, g)[0])
        _emit_polys(out, group_rings(repaired))
    return out.finish()


def _copy(b: GeometryBatch, g: int, out: GeometryBatchBuilder) -> None:
    """Lossless pass-through of one geometry: coordinates AND Z carried
    verbatim, so rows make_valid does not repair come out byte-identical
    (ADVICE r2: set_precision was stripping Z from untouched rows)."""
    t = int(b.types[g])
    if t == MISSING:
        out.add_missing()
        return
    has_z = b.zs is not None and (
        b.geom_has_z[g] if b.geom_has_z is not None
        else not np.all(np.isnan(
            b.zs[b.geom_coord_off[g]:b.geom_coord_off[g + 1]])))
    parts = []
    zparts: list | None = [] if has_z else None
    for p in range(b.geom_part_off[g], b.geom_part_off[g + 1]):
        parts.append((int(b.part_types[p]), b.part_rings(p)))
        if has_z:
            r0, r1 = b.part_ring_off[p], b.part_ring_off[p + 1]
            zparts.append([
                b.zs[b.ring_coord_off[r]:b.ring_coord_off[r + 1]]
                for r in range(r0, r1)])
    out.add(t, parts, zparts)
