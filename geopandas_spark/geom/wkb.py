"""WKB codec: pandas Series[bytes] <-> GeometryBatch.

Interchange parity with the reference's ``from_wkb/to_wkb``
(/root/reference/geopandas/array.py:118-207): ISO WKB, little-endian output,
Z-aware input (Z flagged either ISO style, type+1000, or EWKB style,
0x80000000 bit). Decode has a fully-vectorized fast path for all-POINT
batches (the dominant case for the interleaved-documents corpus); general
geometries parse per-row *within* the Arrow batch with numpy bulk coordinate
reads — coordinates are never touched one float at a time.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

from .ragged import (
    GEOMETRYCOLLECTION,
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    GeometryBatch,
    GeometryBatchBuilder,
)

_EWKB_Z = 0x80000000
_EWKB_M = 0x40000000
_EWKB_SRID = 0x20000000

_POINT_WKB_LEN_2D = 21  # 1 + 4 + 16


class WKBDecodeError(ValueError):
    pass


def _norm_type(raw: int) -> tuple[int, bool]:
    """Normalize ISO/EWKB type codes -> (base_type, has_z)."""
    has_z = False
    if raw & (_EWKB_Z | _EWKB_M | _EWKB_SRID):
        has_z = bool(raw & _EWKB_Z)
        raw &= 0xFF
    if raw >= 3000:
        raw -= 3000
        has_z = True
    elif raw >= 2000:
        raw -= 2000
    elif raw >= 1000:
        raw -= 1000
        has_z = True
    return raw, has_z


def _parse_simple(buf: bytes, pos: int) -> tuple[int, list[np.ndarray], list[np.ndarray], int, int]:
    """Parse one simple geometry (point/linestring/polygon) at pos.

    Returns (part_type, rings, zrings, new_pos, has_z).
    """
    bo = "<" if buf[pos] == 1 else ">"
    raw = struct.unpack_from(bo + "I", buf, pos + 1)[0]
    typ, has_z = _norm_type(raw)
    if raw & _EWKB_SRID:
        pos += 4  # skip srid
    pos += 5
    ndim = 3 if has_z else 2
    dt = np.dtype(bo + "f8")
    if typ == POINT:
        vals = np.frombuffer(buf, dtype=dt, count=ndim, offset=pos).astype(np.float64)
        pos += 8 * ndim
        if np.isnan(vals[:2]).all():  # POINT EMPTY encodes as NaN NaN
            return POINT, [], [], pos, has_z
        return POINT, [vals[:2].reshape(1, 2)], [vals[2:3]] if has_z else [np.empty(0)], pos, has_z
    if typ == LINESTRING:
        (k,) = struct.unpack_from(bo + "I", buf, pos)
        pos += 4
        vals = np.frombuffer(buf, dtype=dt, count=k * ndim, offset=pos).astype(np.float64)
        pos += 8 * k * ndim
        vals = vals.reshape(k, ndim)
        return LINESTRING, ([vals[:, :2]] if k else []), ([vals[:, 2]] if has_z else [np.empty(0)]), pos, has_z
    if typ == POLYGON:
        (nr,) = struct.unpack_from(bo + "I", buf, pos)
        pos += 4
        rings, zrings = [], []
        for _ in range(nr):
            (k,) = struct.unpack_from(bo + "I", buf, pos)
            pos += 4
            vals = np.frombuffer(buf, dtype=dt, count=k * ndim, offset=pos).astype(np.float64)
            pos += 8 * k * ndim
            vals = vals.reshape(k, ndim)
            rings.append(vals[:, :2])
            zrings.append(vals[:, 2] if has_z else np.zeros(k))
        return POLYGON, rings, zrings, pos, has_z
    raise WKBDecodeError(f"unexpected nested type {typ}")


def _parse_geometry(buf: bytes, pos: int) -> tuple[int, list, list, int]:
    """Parse any geometry -> (type_id, parts, zparts, new_pos)."""
    bo = "<" if buf[pos] == 1 else ">"
    raw = struct.unpack_from(bo + "I", buf, pos + 1)[0]
    typ, has_z = _norm_type(raw)
    if typ in (POINT, LINESTRING, POLYGON):
        ptype, rings, zrings, pos, hz = _parse_simple(buf, pos)
        # empty simple geometry -> one part with zero rings so type survives
        return typ, [(ptype, rings)], ([zrings] if hz else None), pos
    pos += 5
    if raw & _EWKB_SRID:
        pos += 4
    (n,) = struct.unpack_from(bo + "I", buf, pos)
    pos += 4
    parts: list = []
    zparts: list = []
    any_z = False
    if typ in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON):
        for _ in range(n):
            ptype, rings, zrings, pos, hz = _parse_simple(buf, pos)
            parts.append((ptype, rings))
            zparts.append(zrings if hz else [np.full(len(r), np.nan) for r in rings])
            any_z = any_z or hz
        return typ, parts, (zparts if any_z else None), pos
    if typ == GEOMETRYCOLLECTION:
        for _ in range(n):
            _styp, sparts, szparts, pos = _parse_geometry(buf, pos)
            if szparts is None:
                szparts = [[np.full(len(r), np.nan) for r in rings]
                           for (_pt, rings) in sparts]
            else:
                any_z = True
            parts.extend(sparts)  # flatten (nested multis become parts)
            zparts.extend(szparts)
        return GEOMETRYCOLLECTION, parts, (zparts if any_z else None), pos
    raise WKBDecodeError(f"unsupported WKB type {raw}")


def from_wkb(series) -> GeometryBatch:
    """Decode a pandas Series / ndarray / list of WKB bytes (None allowed)."""
    if isinstance(series, pd.Series):
        vals = series.to_numpy(dtype=object)
    else:
        vals = np.asarray(series, dtype=object)
    n = len(vals)
    # ---- fast path: every row a little-endian 2-D point -----------------
    nulls = np.array([v is None for v in vals], dtype=bool)
    if not nulls.any() and n:
        lens = np.array([len(v) for v in vals], dtype=np.int64)
        if (lens == _POINT_WKB_LEN_2D).all():
            blob = b"".join(vals)
            raw = np.frombuffer(blob, dtype=np.uint8).reshape(n, _POINT_WKB_LEN_2D)
            if (raw[:, 0] == 1).all():
                tcodes = raw[:, 1:5].copy().view(np.uint32).ravel()
                if (tcodes == POINT).all():
                    xy = raw[:, 5:21].copy().view(np.float64).reshape(n, 2)
                    from .ragged import points_batch

                    missing = np.isnan(xy).all(axis=1)
                    # NaN,NaN = POINT EMPTY, not missing: build generically then
                    if not missing.any():
                        return points_batch(xy[:, 0], xy[:, 1])
    # ---- general path ----------------------------------------------------
    b = GeometryBatchBuilder()
    for v in vals:
        if v is None or (isinstance(v, float) and np.isnan(v)):
            b.add_missing()
            continue
        typ, parts, zparts, _ = _parse_geometry(bytes(v), 0)
        b.add(typ, parts, zparts)
    batch = b.finish()
    return batch


# ---------------------------------------------------------------------------
# encode


def _enc_simple(ptype: int, rings: list[np.ndarray], out: list[bytes]) -> None:
    if ptype == POINT:
        if not rings or len(rings[0]) == 0:
            out.append(b"\x01" + struct.pack("<I", POINT) + struct.pack("<dd", float("nan"), float("nan")))
        else:
            x, y = rings[0][0]
            out.append(b"\x01" + struct.pack("<I", POINT) + struct.pack("<dd", x, y))
    elif ptype == LINESTRING:
        k = len(rings[0]) if rings else 0
        out.append(b"\x01" + struct.pack("<II", LINESTRING, k))
        if k:
            out.append(np.ascontiguousarray(rings[0], dtype="<f8").tobytes())
    elif ptype == POLYGON:
        out.append(b"\x01" + struct.pack("<II", POLYGON, len(rings)))
        for ring in rings:
            out.append(struct.pack("<I", len(ring)))
            out.append(np.ascontiguousarray(ring, dtype="<f8").tobytes())
    else:  # pragma: no cover
        raise WKBDecodeError(f"cannot encode part type {ptype}")


def to_wkb(batch: GeometryBatch) -> np.ndarray:
    """Encode a GeometryBatch -> object ndarray of bytes (None for missing).

    Output is always little-endian ISO 2-D WKB (Z is dropped on encode for
    now; force_2d semantics, /root/reference/geopandas/base.py:1791).
    """
    n = len(batch)
    out = np.empty(n, dtype=object)
    # fast path: all simple points present
    if (batch.types == POINT).all() and (batch.n_coords_per_geom() == 1).all():
        xy = batch.coords
        hdr = np.frombuffer(b"\x01" + struct.pack("<I", POINT), dtype=np.uint8)
        buf = np.empty((n, _POINT_WKB_LEN_2D), dtype=np.uint8)
        buf[:, :5] = hdr
        buf[:, 5:] = np.ascontiguousarray(xy, dtype="<f8").view(np.uint8).reshape(n, 16)
        rows = buf.tobytes()
        for i in range(n):
            out[i] = rows[i * _POINT_WKB_LEN_2D : (i + 1) * _POINT_WKB_LEN_2D]
        return out
    for g in range(n):
        t = int(batch.types[g])
        if t == 0:
            out[g] = None
            continue
        p0, p1 = batch.geom_part_off[g], batch.geom_part_off[g + 1]
        chunks: list[bytes] = []
        if t in (POINT, LINESTRING, POLYGON):
            if p1 == p0:  # empty simple geometry
                if t == POINT:
                    _enc_simple(POINT, [], chunks)
                else:
                    chunks.append(b"\x01" + struct.pack("<II", t, 0))
            else:
                _enc_simple(t, batch.part_rings(p0), chunks)
        else:
            chunks.append(b"\x01" + struct.pack("<II", t, p1 - p0))
            for p in range(p0, p1):
                sub: list[bytes] = []
                _enc_simple(int(batch.part_types[p]), batch.part_rings(p), sub)
                chunks.extend(sub)
        out[g] = b"".join(chunks)
    return out


def wkb_series(batch: GeometryBatch) -> pd.Series:
    return pd.Series(to_wkb(batch))
