"""Ragged (GeoArrow-style) geometry batch representation.

The engine's interchange format on the wire is WKB bytes inside ordinary
Spark ``BinaryType`` columns. Inside an Arrow/pandas-UDF batch we decode a
whole column of WKB into *one* columnar structure — ``GeometryBatch`` —
four flat numpy arrays plus offset arrays, so every kernel in
``geopandas_spark.geom.kernels`` is a vectorized numpy computation over the
batch (no per-row Python in the hot loops; see BASELINE.json input_hint).

Layout (three-level ragged):

    coords          float64[(T, 2)]   all vertices of the whole batch
    zs              float64[T] | None optional Z values (parsed, mostly inert)
    ring_coord_off  int64[R+1]        ring r -> coords[ring_off[r]:ring_off[r+1]]
    part_ring_off   int64[P+1]        part p -> rings  [.. : ..]
    geom_part_off   int64[n+1]        geom g -> parts  [.. : ..]
    part_types      int8[P]           1=Point 2=LineString 3=Polygon (per part)
    types           int8[n]           0=missing, 1..7 = WKB geometry type

Conventions
-----------
* ``Point``       -> 1 part, 1 ring, 1 coordinate (POINT EMPTY -> 0 coords).
* ``LineString``  -> 1 part, 1 ring, k coordinates.
* ``Polygon``     -> 1 part, r rings; ring 0 is the exterior; rings are
  closed (first vertex repeated last, as in WKB).
* ``Multi*``      -> k parts with the element conventions above.
* ``GeometryCollection`` -> parts carry their own ``part_types``; nested
  Multi*/collections are flattened into simple parts (re-encoding a GC
  yields the flattened-but-equivalent collection).
* Missing geometry (``None``/null WKB) -> ``types == 0``, 0 parts.
* Empty geometry keeps its type with 0 coordinate rings (distinct from
  missing — mirrors geopandas ``is_empty`` vs ``isna``; the reference
  treats them as distinct values but equal under the testing oracle,
  /root/reference/geopandas/testing.py:18-46).

This mirrors how the reference stores geometry as one flat object-array
(`GeometryArray._data`, /root/reference/geopandas/array.py:256-277) and
dispatches vectorized ops over the whole array at once — but columnar, so
numpy ufuncs + ``np.*.reduceat`` replace GEOS.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

# WKB type ids (2-D base types; Z/M variants normalized onto these).
MISSING = 0
POINT = 1
LINESTRING = 2
POLYGON = 3
MULTIPOINT = 4
MULTILINESTRING = 5
MULTIPOLYGON = 6
GEOMETRYCOLLECTION = 7

TYPE_NAMES = {
    MISSING: None,
    POINT: "Point",
    LINESTRING: "LineString",
    POLYGON: "Polygon",
    MULTIPOINT: "MultiPoint",
    MULTILINESTRING: "MultiLineString",
    MULTIPOLYGON: "MultiPolygon",
    GEOMETRYCOLLECTION: "GeometryCollection",
}
NAME_TO_TYPE = {v: k for k, v in TYPE_NAMES.items() if v}

# dimension of each type: 0=puntal, 1=lineal, 2=polygonal
TYPE_DIM = np.array([-1, 0, 1, 2, 0, 1, 2, -1], dtype=np.int8)


@dataclass
class GeometryBatch:
    types: np.ndarray  # int8[n]
    coords: np.ndarray  # float64[(T,2)]
    ring_coord_off: np.ndarray  # int64[R+1]
    part_ring_off: np.ndarray  # int64[P+1]
    geom_part_off: np.ndarray  # int64[n+1]
    part_types: np.ndarray  # int8[P]
    zs: np.ndarray | None = None  # float64[T] or None
    geom_has_z: np.ndarray | None = None  # bool[n] or None (all 2-D)
    _geom_coord_off: np.ndarray | None = field(default=None, repr=False)
    _geom_ring_off: np.ndarray | None = field(default=None, repr=False)

    # ------------------------------------------------------------------
    def __len__(self) -> int:
        return len(self.types)

    @property
    def n_parts(self) -> int:
        return len(self.part_types)

    @property
    def geom_ring_off(self) -> np.ndarray:
        """int64[n+1]: ring range per geometry."""
        if self._geom_ring_off is None:
            self._geom_ring_off = self.part_ring_off[self.geom_part_off]
        return self._geom_ring_off

    @property
    def geom_coord_off(self) -> np.ndarray:
        """int64[n+1]: coordinate range per geometry."""
        if self._geom_coord_off is None:
            self._geom_coord_off = self.ring_coord_off[self.geom_ring_off]
        return self._geom_coord_off

    @property
    def part_coord_off(self) -> np.ndarray:
        """int64[P+1]: coordinate range per part."""
        return self.ring_coord_off[self.part_ring_off]

    def is_missing(self) -> np.ndarray:
        return self.types == MISSING

    def is_empty(self) -> np.ndarray:
        """Empty (has type, zero coordinates). Missing rows are False
        (mirrors geopandas: `is_empty` is False for None,
        /root/reference/geopandas/base.py:289)."""
        off = self.geom_coord_off
        return (off[1:] == off[:-1]) & (self.types != MISSING)

    def n_coords_per_geom(self) -> np.ndarray:
        off = self.geom_coord_off
        return off[1:] - off[:-1]

    def n_parts_per_geom(self) -> np.ndarray:
        return self.geom_part_off[1:] - self.geom_part_off[:-1]

    # ------------------------------------------------------------------
    def geom_slice(self, g: int) -> "GeometryBatch":
        """Single-geometry view (cheap; used by per-geometry fallbacks)."""
        return self.take(np.array([g], dtype=np.int64))

    def part_rings(self, p: int) -> list[np.ndarray]:
        """Coordinate arrays of each ring of part p."""
        r0, r1 = self.part_ring_off[p], self.part_ring_off[p + 1]
        return [
            self.coords[self.ring_coord_off[r] : self.ring_coord_off[r + 1]]
            for r in range(r0, r1)
        ]

    def take(self, idx: np.ndarray) -> "GeometryBatch":
        """Gather a new batch from geometry indices (like pandas take)."""
        idx = np.asarray(idx, dtype=np.int64)
        gp0, gp1 = self.geom_part_off[idx], self.geom_part_off[idx + 1]
        new_geom_part = np.zeros(len(idx) + 1, dtype=np.int64)
        np.cumsum(gp1 - gp0, out=new_geom_part[1:])
        part_idx = _expand_ranges(gp0, gp1)
        pr0 = self.part_ring_off[part_idx]
        pr1 = self.part_ring_off[part_idx + 1]
        new_part_ring = np.zeros(len(part_idx) + 1, dtype=np.int64)
        np.cumsum(pr1 - pr0, out=new_part_ring[1:])
        ring_idx = _expand_ranges(pr0, pr1)
        rc0 = self.ring_coord_off[ring_idx]
        rc1 = self.ring_coord_off[ring_idx + 1]
        new_ring_coord = np.zeros(len(ring_idx) + 1, dtype=np.int64)
        np.cumsum(rc1 - rc0, out=new_ring_coord[1:])
        coord_idx = _expand_ranges(rc0, rc1)
        return GeometryBatch(
            types=self.types[idx],
            coords=self.coords[coord_idx],
            ring_coord_off=new_ring_coord,
            part_ring_off=new_part_ring,
            geom_part_off=new_geom_part,
            part_types=self.part_types[part_idx],
            zs=self.zs[coord_idx] if self.zs is not None else None,
            geom_has_z=(self.geom_has_z[idx]
                        if self.geom_has_z is not None else None),
        )


def _expand_ranges(starts: np.ndarray, stops: np.ndarray) -> np.ndarray:
    """Concatenate arange(starts[i], stops[i]) — fully vectorized."""
    lens = stops - starts
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    ends = np.cumsum(lens)
    reps = np.repeat(starts, lens)
    within = np.arange(total, dtype=np.int64) - np.repeat(ends - lens, lens)
    return reps + within


class GeometryBatchBuilder:
    """Accumulates geometries one at a time (decode path) into flat arrays."""

    __slots__ = ("types", "coords", "zlist", "ring_lens", "part_ring_counts",
                 "geom_part_counts", "part_types", "has_z", "geom_has_z")

    def __init__(self) -> None:
        self.types: list[int] = []
        self.coords: list[np.ndarray] = []
        self.zlist: list[np.ndarray] = []
        self.ring_lens: list[int] = []
        self.part_ring_counts: list[int] = []
        self.geom_part_counts: list[int] = []
        self.part_types: list[int] = []
        self.has_z = False
        self.geom_has_z: list[bool] = []

    def add_missing(self) -> None:
        self.types.append(MISSING)
        self.geom_part_counts.append(0)
        self.geom_has_z.append(False)

    def add(self, type_id: int, parts: list[tuple[int, list[np.ndarray]]],
            zparts: list[list[np.ndarray]] | None = None) -> None:
        """parts: [(part_type, [ring_coords(k,2), ...]), ...]

        zparts: per-part list of per-ring z arrays (or None when the
        geometry is 2-D). Mixed-dimensionality batches NaN-fill.
        """
        self.types.append(type_id)
        self.geom_part_counts.append(len(parts))
        self.geom_has_z.append(zparts is not None)
        if zparts is not None:
            self.has_z = True
        for pi, (ptype, rings) in enumerate(parts):
            self.part_types.append(ptype)
            self.part_ring_counts.append(len(rings))
            for ri, ring in enumerate(rings):
                self.ring_lens.append(len(ring))
                if len(ring):
                    self.coords.append(ring)
                    if zparts is not None:
                        self.zlist.append(np.asarray(zparts[pi][ri], dtype=np.float64))
                    else:
                        self.zlist.append(np.full(len(ring), np.nan))

    def finish(self) -> GeometryBatch:
        n = len(self.types)
        coords = (np.concatenate(self.coords, axis=0)
                  if self.coords else np.empty((0, 2), dtype=np.float64))
        zs = None
        if self.has_z and self.zlist:
            zs = np.concatenate(self.zlist)
        ring_coord_off = np.zeros(len(self.ring_lens) + 1, dtype=np.int64)
        np.cumsum(self.ring_lens, out=ring_coord_off[1:])
        part_ring_off = np.zeros(len(self.part_ring_counts) + 1, dtype=np.int64)
        np.cumsum(self.part_ring_counts, out=part_ring_off[1:])
        geom_part_off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(self.geom_part_counts, out=geom_part_off[1:])
        return GeometryBatch(
            types=np.array(self.types, dtype=np.int8),
            coords=np.ascontiguousarray(coords, dtype=np.float64),
            ring_coord_off=ring_coord_off,
            part_ring_off=part_ring_off,
            geom_part_off=geom_part_off,
            part_types=np.array(self.part_types, dtype=np.int8),
            zs=zs,
            geom_has_z=np.array(self.geom_has_z, dtype=bool) if self.has_z else None,
        )


def points_batch(x: np.ndarray, y: np.ndarray,
                 mask_missing: np.ndarray | None = None) -> GeometryBatch:
    """Fully-vectorized constructor for an all-POINT batch (the fast path
    mirroring geopandas.points_from_xy, /root/reference/geopandas/array.py:228)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = len(x)
    if mask_missing is None:
        mask_missing = np.zeros(n, dtype=bool)
    present = ~mask_missing
    np_present = int(present.sum())
    coords = np.column_stack([x[present], y[present]])
    types = np.where(mask_missing, MISSING, POINT).astype(np.int8)
    geom_part_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(present.astype(np.int64), out=geom_part_off[1:])
    ar = np.arange(np_present + 1, dtype=np.int64)
    return GeometryBatch(
        types=types,
        coords=coords,
        ring_coord_off=ar.copy(),
        part_ring_off=ar.copy(),
        geom_part_off=geom_part_off,
        part_types=np.full(np_present, POINT, dtype=np.int8),
    )
