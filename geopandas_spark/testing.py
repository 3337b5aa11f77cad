"""Geometry equality oracle for tests — re-implements the reference's
normalize-then-compare rules (/root/reference/geopandas/testing.py:18-139):
empty == missing, normalized ring rotation/orientation, optional
less-precise comparison (geom_equals_exact @ 0.5e-6, testing.py:139).
"""

from __future__ import annotations

import numpy as np

from .geom.ragged import GeometryBatch, MISSING, POINT
from .geom.wkb import from_wkb


def _norm_ring(ring: np.ndarray, precision: float | None) -> tuple:
    r = ring[:-1] if len(ring) >= 2 and (ring[0] == ring[-1]).all() else ring
    if precision:
        r = np.round(r / precision) * precision
    if len(r) == 0:
        return ()
    # canonical orientation: CCW
    area2 = np.sum(r[:, 0] * np.roll(r[:, 1], -1) - np.roll(r[:, 0], -1) * r[:, 1])
    if area2 < 0:
        r = r[::-1]
    # canonical rotation: start at lexicographically smallest vertex
    start = np.lexsort((r[:, 1], r[:, 0]))[0]
    r = np.roll(r, -start, axis=0)
    return tuple(map(tuple, r))


def normalize_geom(batch: GeometryBatch, g: int, precision: float | None = None):
    """Hashable canonical form of geometry g (None for missing/empty —
    empty == missing per the reference oracle)."""
    if batch.types[g] == MISSING:
        return None
    c0, c1 = batch.geom_coord_off[g], batch.geom_coord_off[g + 1]
    if c1 == c0:
        return None
    parts = []
    for p in range(batch.geom_part_off[g], batch.geom_part_off[g + 1]):
        rings = batch.part_rings(p)
        ptype = int(batch.part_types[p])
        if ptype == POINT:
            pt = rings[0][0] if rings and len(rings[0]) else None
            if pt is None:
                continue
            if precision:
                pt = np.round(pt / precision) * precision
            parts.append((POINT, (tuple(pt),)))
        else:
            parts.append((ptype, tuple(_norm_ring(r, precision) for r in rings)))
    return tuple(sorted(parts))


def geoms_equal(wkb_a, wkb_b, precision: float | None = None) -> bool:
    """Normalized equality of two WKB values (None/empty interchangeable)."""
    ba = from_wkb([wkb_a])
    bb = from_wkb([wkb_b])
    return normalize_geom(ba, 0, precision) == normalize_geom(bb, 0, precision)


def geom_set(wkbs, precision: float | None = None) -> set:
    """Multiset (as sorted tuple set with counts) of normalized geometries
    for order-insensitive frame comparison."""
    from collections import Counter

    batch = from_wkb(list(wkbs))
    return Counter(normalize_geom(batch, g, precision) for g in range(len(batch)))
