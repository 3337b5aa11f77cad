"""Pure-numpy ESRI Shapefile driver (.shp / .shx / .dbf).

Reference surface: ``read_file`` / ``to_file`` with the ``'ESRI Shapefile'``
OGR driver (io/file.py:50-252, extension map io/file.py:28-34) — the
single most-used geopandas entry point. This container has no GDAL, so
the format is parsed directly: the .shp record structure and .dbf
fixed-width attribute records are simple enough that numpy
``frombuffer`` does the heavy lifting.

Scale shape
-----------
* ``read_shapefile`` is DISTRIBUTED: the driver reads only the two tiny
  fixed-size headers (.shp 100 B, .dbf ~32 B + field descriptors), splits
  the record index into ranges, and every range is parsed on an executor
  via ``mapInPandas`` (one sequential byte-range read of .shp + one
  fixed-width slab of .dbf per task). The path must be visible to the
  executors (shared storage), like the Feather/GeoArrow dataset readers.
* ``write_shapefile`` is a SINGLE-FILE sink (the format itself is a
  single non-splittable file, 2 GB hard limit) — driver-side and
  row-capped like ``write_geojson_file``; datasets should use
  GeoParquet / GeoJSONSeq.

Semantics parity notes (matching OGR behavior):
* null shape records -> missing geometry; EMPTY geometries are written
  as null shapes (shapefile cannot represent them).
* polygon rings: outer rings clockwise, holes counter-clockwise; on read
  holes are assigned to the innermost containing outer ring; on write
  ring orientation is normalized.
* one geometry dimension per file (puntal / lineal / polygonal); Z
  variants (11/13/15/18) round-trip Z; M is not modeled.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pandas as pd

from ..geom.ragged import (
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    GeometryBatchBuilder,
)

SHP_NULL = 0
SHP_POINT = 1
SHP_POLYLINE = 3
SHP_POLYGON = 5
SHP_MULTIPOINT = 8
SHP_POINTZ = 11
SHP_POLYLINEZ = 13
SHP_POLYGONZ = 15
SHP_MULTIPOINTZ = 18
SHP_POINTM = 21
SHP_POLYLINEM = 23
SHP_POLYGONM = 25
SHP_MULTIPOINTM = 28

_HAS_Z = {SHP_POINTZ, SHP_POLYLINEZ, SHP_POLYGONZ, SHP_MULTIPOINTZ}
_HAS_M = _HAS_Z | {SHP_POINTM, SHP_POLYLINEM, SHP_POLYGONM, SHP_MULTIPOINTM}


# ---------------------------------------------------------------------------
# low-level parsing helpers
# ---------------------------------------------------------------------------

def _ring_signed_area(ring: np.ndarray) -> float:
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))


def _point_in_ring(pt: np.ndarray, ring: np.ndarray) -> bool:
    """Even-odd ray cast (vectorized over the ring's edges)."""
    x, y = pt
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    cond = (y0 <= y) != (y1 <= y)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x0 + (y - y0) * (x1 - x0) / (y1 - y0)
    return bool(np.count_nonzero(cond & (x < xint)) % 2)


def _assemble_polygon(rings: list[np.ndarray]):
    """Shapefile ring soup -> [(exterior_ring_idx, [hole_ring_idx, ...])].

    Outer rings are CW (negative shoelace); holes CCW. Each hole attaches
    to the innermost (smallest-area) containing outer; an orphan hole is
    promoted to an outer ring (OGR's tolerance for bad winding).
    """
    areas = [_ring_signed_area(r) for r in rings]
    outer = [i for i, a in enumerate(areas) if a <= 0]
    holes = [i for i, a in enumerate(areas) if a > 0]
    if not outer:
        outer, holes = holes, []
    if len(outer) == 1:
        return [(outer[0], holes)]
    polys = [(o, []) for o in outer]
    abs_area = {o: abs(areas[o]) for o in outer}
    for h in holes:
        pt = rings[h][0]
        containing = [o for o in outer if _point_in_ring(pt, rings[o])]
        if not containing:
            polys.append((h, []))
            continue
        best = min(containing, key=lambda o: abs_area[o])
        next(p for p in polys if p[0] == best)[1].append(h)
    return polys


def _parse_records(buf: bytes, n: int, bbox=None,
                   zs_wanted: bool = True):
    """Walk ``n`` sequential .shp records in ``buf``; returns
    (GeometryBatch, keep_mask ndarray[bool])."""
    bld = GeometryBatchBuilder()
    keep = np.ones(n, dtype=bool)
    pos = 0
    for i in range(n):
        # record header: number (BE), content length in 16-bit words (BE)
        clen = struct.unpack(">i", buf[pos + 4:pos + 8])[0] * 2
        body = buf[pos + 8:pos + 8 + clen]
        pos += 8 + clen
        st = struct.unpack("<i", body[:4])[0]
        if st == SHP_NULL:
            bld.add_missing()
            continue
        if st in (SHP_POINT, SHP_POINTZ, SHP_POINTM):
            xy = np.frombuffer(body, "<f8", count=2, offset=4)
            if bbox is not None and not (
                    bbox[0] <= xy[0] <= bbox[2] and bbox[1] <= xy[1] <= bbox[3]):
                keep[i] = False
                bld.add_missing()
                continue
            if st == SHP_POINTZ and len(body) >= 28 and zs_wanted:
                z = np.frombuffer(body, "<f8", count=1, offset=20)
                bld.add(POINT, [(POINT, [xy.reshape(1, 2).copy()])],
                        [[z.copy()]])
            else:
                bld.add(POINT, [(POINT, [xy.reshape(1, 2).copy()])])
            continue
        # all remaining types begin with a 4-double box
        box = np.frombuffer(body, "<f8", count=4, offset=4)
        if bbox is not None and (box[0] > bbox[2] or box[2] < bbox[0]
                                 or box[1] > bbox[3] or box[3] < bbox[1]):
            keep[i] = False
            bld.add_missing()
            continue
        if st in (SHP_MULTIPOINT, SHP_MULTIPOINTZ, SHP_MULTIPOINTM):
            npts = struct.unpack("<i", body[36:40])[0]
            pts = np.frombuffer(body, "<f8", count=2 * npts,
                                offset=40).reshape(npts, 2)
            zoff = 40 + 16 * npts + 16  # after points + zmin/zmax
            parts = [(POINT, [pts[j:j + 1].copy()]) for j in range(npts)]
            if (st == SHP_MULTIPOINTZ and zs_wanted
                    and len(body) >= zoff + 8 * npts):
                z = np.frombuffer(body, "<f8", count=npts, offset=zoff)
                bld.add(MULTIPOINT, parts,
                        [[z[j:j + 1].copy()] for j in range(npts)])
            else:
                bld.add(MULTIPOINT, parts)
            continue
        # PolyLine / Polygon family
        nparts, npts = struct.unpack("<ii", body[36:44])
        part_off = np.frombuffer(body, "<i4", count=nparts, offset=44)
        coords_at = 44 + 4 * nparts
        pts = np.frombuffer(body, "<f8", count=2 * npts,
                            offset=coords_at).reshape(npts, 2)
        zoff = coords_at + 16 * npts + 16
        zvals = None
        if (st in (SHP_POLYLINEZ, SHP_POLYGONZ) and zs_wanted
                and len(body) >= zoff + 8 * npts):
            zvals = np.frombuffer(body, "<f8", count=npts, offset=zoff)
        bounds = np.append(part_off, npts)
        rings = [pts[bounds[j]:bounds[j + 1]].copy() for j in range(nparts)]
        zrings = (None if zvals is None else
                  [zvals[bounds[j]:bounds[j + 1]].copy()
                   for j in range(nparts)])
        if st in (SHP_POLYLINE, SHP_POLYLINEZ, SHP_POLYLINEM):
            parts = [(LINESTRING, [r]) for r in rings]
            t = LINESTRING if nparts == 1 else MULTILINESTRING
            if zrings is not None:
                bld.add(t, parts, [[z] for z in zrings])
            else:
                bld.add(t, parts)
        else:  # polygon: assemble ring soup
            polys = _assemble_polygon(rings)
            parts = [(POLYGON, [rings[o]] + [rings[h] for h in hs])
                     for o, hs in polys]
            t = POLYGON if len(polys) == 1 else MULTIPOLYGON
            if zrings is not None:
                bld.add(t, parts,
                        [[zrings[o]] + [zrings[h] for h in hs]
                         for o, hs in polys])
            else:
                bld.add(t, parts)
    return bld.finish(), keep


# ---------------------------------------------------------------------------
# DBF
# ---------------------------------------------------------------------------

def _dbf_header(path: str):
    """-> (n_records, header_len, record_len, fields) with fields =
    [(name, type_char, length, decimals)]."""
    with open(path, "rb") as f:
        head = f.read(32)
        n_rec, hlen, rlen = struct.unpack("<IHH", head[4:12])
        fields = []
        while True:
            fd = f.read(32)
            if not fd or fd[0:1] == b"\x0d":
                break
            name = fd[:11].split(b"\x00", 1)[0].decode("ascii",
                                                       errors="replace")
            ftype = chr(fd[11])
            flen = fd[16]
            fdec = fd[17]
            fields.append((name, ftype, flen, fdec))
            if 32 + 32 * len(fields) >= hlen:
                break
    return n_rec, hlen, rlen, fields


def _dbf_encoding(shp_path: str) -> str:
    cpg = os.path.splitext(shp_path)[0] + ".cpg"
    if os.path.isfile(cpg):
        with open(cpg) as f:
            name = f.read().strip()
        try:
            b"x".decode(name)
            return name
        except LookupError:
            pass
    return "utf-8"


def _parse_dbf_slab(buf: bytes, n: int, rlen: int, fields,
                    encoding: str) -> dict[str, np.ndarray | pd.Series]:
    """Fixed-width records -> per-column arrays, fully vectorized via a
    numpy structured dtype over the whole slab."""
    dt = np.dtype([("_del", "S1")] + [
        (f"f{i}", f"S{flen}") for i, (_n, _t, flen, _d) in enumerate(fields)])
    assert dt.itemsize == rlen, (dt.itemsize, rlen)
    if dt.itemsize != rlen:
        raise ValueError(
            f"dbf record length {rlen} != field widths {dt.itemsize}")
    arr = np.frombuffer(buf, dtype=dt, count=n)
    out: dict[str, object] = {}
    for i, (name, ftype, _flen, fdec) in enumerate(fields):
        raw = arr[f"f{i}"]
        s = pd.Series(raw).str.decode(encoding, errors="replace").str.strip()
        if ftype == "C":
            out[name] = s.where(s != "", None)
        elif ftype in ("N", "F"):
            num = pd.to_numeric(s.replace("", None), errors="coerce")
            if ftype == "N" and fdec == 0:
                out[name] = num.astype("Int64")
            else:
                out[name] = num.astype("float64")
        elif ftype == "L":
            up = s.str.upper()
            out[name] = up.map({"T": True, "Y": True, "F": False,
                                "N": False}).astype("object")
        elif ftype == "D":
            out[name] = pd.to_datetime(
                s.replace("", None), format="%Y%m%d", errors="coerce").dt.date
        else:  # unknown type: surface the raw text
            out[name] = s.where(s != "", None)
    return out


def _spark_field_type(ftype: str, fdec: int) -> str:
    if ftype == "C":
        return "string"
    if ftype in ("N", "F"):
        return "bigint" if (ftype == "N" and fdec == 0) else "double"
    if ftype == "L":
        return "boolean"
    if ftype == "D":
        return "date"
    return "string"


# ---------------------------------------------------------------------------
# read
# ---------------------------------------------------------------------------

def read_shapefile(spark, path: str, bbox=None, columns=None, rows=None,
                   geom: str = "geometry", num_partitions: int | None = None):
    """Distributed shapefile read -> DataFrame(geometry WKB + attributes).

    ``bbox=(minx,miny,maxx,maxy)`` keeps features whose envelope
    intersects it (the reference's read_file bbox contract,
    io/file.py:62-69); ``columns`` subsets attribute fields;
    ``rows`` is an int (first n) or a slice, like io/file.py:81-85.
    Only the headers are read on the driver — record ranges are parsed
    on the executors.
    """
    base = os.path.splitext(path)[0]
    shp, dbf = base + ".shp", base + ".dbf"
    with open(shp, "rb") as f:
        head = f.read(100)
    if struct.unpack(">i", head[:4])[0] != 9994:
        raise ValueError(f"{shp}: not a shapefile (bad magic)")
    shx = base + ".shx"
    if os.path.isfile(shx):
        with open(shx, "rb") as f:
            shx_buf = f.read()
        offs = np.frombuffer(shx_buf, ">i4", offset=100)[::2] * 2
        lens = np.frombuffer(shx_buf, ">i4", offset=100)[1::2] * 2
        n_total = len(offs)
    else:  # no index: walk the record headers once on the driver
        flen = struct.unpack(">i", head[24:28])[0] * 2
        offs_l, lens_l = [], []
        with open(shp, "rb") as f:
            pos = 100
            while pos < flen:
                f.seek(pos + 4)
                clen = struct.unpack(">i", f.read(4))[0] * 2
                offs_l.append(pos)
                lens_l.append(clen)
                pos += 8 + clen
        offs = np.asarray(offs_l, dtype=np.int64)
        lens = np.asarray(lens_l, dtype=np.int64)
        n_total = len(offs)

    have_dbf = os.path.isfile(dbf)
    if have_dbf:
        dbf_n, dbf_hlen, dbf_rlen, fields = _dbf_header(dbf)
        encoding = _dbf_encoding(path)
    else:
        dbf_hlen = dbf_rlen = 0
        fields, encoding = [], "utf-8"
    if columns is not None:
        missing = set(columns) - {f[0] for f in fields}
        if missing:
            raise ValueError(f"columns not in {dbf}: {sorted(missing)}")
        fields_out = [f for f in fields if f[0] in set(columns)]
    else:
        fields_out = fields

    idx = np.arange(n_total)
    if rows is not None:
        idx = idx[:rows] if isinstance(rows, int) else idx[rows]
    if len(idx) == 0:
        schema = ", ".join(
            [f"`{geom}` binary"] + [
                f"`{n}` {_spark_field_type(t, d)}"
                for n, t, _l, d in fields_out])
        return spark.createDataFrame([], schema)

    par = num_partitions or spark.sparkContext.defaultParallelism
    # contiguous runs of selected records -> byte ranges (a sliced `rows`
    # with step>1 degrades to one run per record, still parsed remotely)
    breaks = np.nonzero(np.diff(idx) != 1)[0] + 1
    runs = np.split(idx, breaks)
    chunks = []
    for run in runs:
        tgt = max(1, int(np.ceil(len(run) / max(1, par // max(1, len(runs))))))
        for s in range(0, len(run), tgt):
            sub = run[s:s + tgt]
            chunks.append((int(sub[0]), int(len(sub))))
    rng = pd.DataFrame(chunks, columns=["start", "n"])
    schema = ", ".join(
        [f"`{geom}` binary"] + [
            f"`{n}` {_spark_field_type(t, d)}" for n, t, _l, d in fields_out])
    out_names = [f[0] for f in fields_out]
    bbox_t = tuple(map(float, bbox)) if bbox is not None else None

    def _read(it):
        from ..geom.wkb import to_wkb

        for pdf in it:
            for start, n in zip(pdf["start"], pdf["n"]):
                start, n = int(start), int(n)
                b0 = int(offs[start])
                b1 = int(offs[start + n - 1] + 8 + lens[start + n - 1])
                with open(shp, "rb") as f:
                    f.seek(b0)
                    buf = f.read(b1 - b0)
                batch, keep = _parse_records(buf, n, bbox=bbox_t)
                wkb = to_wkb(batch)
                cols = {geom: pd.Series(list(wkb))}
                if have_dbf and fields:
                    with open(dbf, "rb") as f:
                        f.seek(dbf_hlen + start * dbf_rlen)
                        slab = f.read(n * dbf_rlen)
                    parsed = _parse_dbf_slab(slab, n, dbf_rlen, fields,
                                             encoding)
                    for name in out_names:
                        cols[name] = pd.Series(parsed[name])
                res = pd.DataFrame(cols)
                if not keep.all():
                    res = res[keep].reset_index(drop=True)
                yield res

    rdf = spark.createDataFrame(rng).repartition(min(len(chunks), par),
                                                 "start")
    return rdf.mapInPandas(_read, schema)


# ---------------------------------------------------------------------------
# write
# ---------------------------------------------------------------------------

def _shape_type_for(batch) -> int:
    from ..geom.ragged import TYPE_DIM

    dims = {int(TYPE_DIM[t]) for t in np.unique(batch.types)
            if t not in (0,)}
    dims.discard(-1)
    if len(dims) > 1:
        raise ValueError(
            "shapefile stores one geometry dimension per file; input mixes "
            f"dims {sorted(dims)} — split by geom_type first (OGR errors "
            "the same way)")
    has_z = batch.zs is not None and batch.geom_has_z is not None \
        and bool(batch.geom_has_z.any())
    if not dims:
        return SHP_NULL
    d = dims.pop()
    if d == 0:
        multi = bool(np.isin(batch.types, (MULTIPOINT,)).any())
        if multi:
            return SHP_MULTIPOINTZ if has_z else SHP_MULTIPOINT
        return SHP_POINTZ if has_z else SHP_POINT
    if d == 1:
        return SHP_POLYLINEZ if has_z else SHP_POLYLINE
    return SHP_POLYGONZ if has_z else SHP_POLYGON


def _record_body(batch, g: int, st: int) -> bytes:
    """Geometry g -> .shp record content (without the 8-byte header)."""
    t = int(batch.types[g])
    if t == 0:
        return struct.pack("<i", SHP_NULL)
    p0, p1 = batch.geom_part_off[g], batch.geom_part_off[g + 1]
    rings: list[np.ndarray] = []
    zrings: list[np.ndarray] = []
    want_z = st in _HAS_Z
    for p in range(p0, p1):
        r0, r1 = batch.part_ring_off[p], batch.part_ring_off[p + 1]
        for ri, r in enumerate(range(r0, r1)):
            c0, c1 = batch.ring_coord_off[r], batch.ring_coord_off[r + 1]
            ring = batch.coords[c0:c1]
            z = (batch.zs[c0:c1] if batch.zs is not None
                 else np.zeros(c1 - c0))
            if st in (SHP_POLYGON, SHP_POLYGONZ):
                order = np.arange(len(ring))
                a = _ring_signed_area(ring)
                want_cw = ri == 0
                if (a > 0) == want_cw:
                    order = order[::-1]
                ring, z = ring[order], z[order]
            rings.append(np.asarray(ring, dtype=np.float64))
            zrings.append(np.nan_to_num(np.asarray(z, dtype=np.float64)))
    if not rings or sum(len(r) for r in rings) == 0:
        return struct.pack("<i", SHP_NULL)  # EMPTY -> null shape (OGR)
    pts = np.concatenate(rings, axis=0)
    zall = np.concatenate(zrings)
    box = (pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max(), pts[:, 1].max())
    if st in (SHP_POINT, SHP_POINTZ):
        body = struct.pack("<i", st) + struct.pack("<2d", *pts[0])
        if st == SHP_POINTZ:
            body += struct.pack("<2d", float(zall[0]), 0.0)
        return body
    body = struct.pack("<i", st) + struct.pack("<4d", *box)
    if st in (SHP_MULTIPOINT, SHP_MULTIPOINTZ):
        body += struct.pack("<i", len(pts)) + pts.astype("<f8").tobytes()
        if st == SHP_MULTIPOINTZ:
            body += struct.pack("<2d", float(zall.min()), float(zall.max()))
            body += zall.astype("<f8").tobytes()
            body += struct.pack("<2d", 0.0, 0.0)
            body += np.zeros(len(pts), "<f8").tobytes()
        return body
    # polyline / polygon
    part_off = np.cumsum([0] + [len(r) for r in rings[:-1]]).astype("<i4")
    body += struct.pack("<ii", len(rings), len(pts))
    body += part_off.tobytes() + pts.astype("<f8").tobytes()
    if st in (SHP_POLYLINEZ, SHP_POLYGONZ):
        body += struct.pack("<2d", float(zall.min()), float(zall.max()))
        body += zall.astype("<f8").tobytes()
        body += struct.pack("<2d", 0.0, 0.0)
        body += np.zeros(len(pts), "<f8").tobytes()
    return body


def _dbf_field_spec(name: str, s: pd.Series):
    """pandas column -> (dbf_name<=10, type, length, decimals, formatter)."""
    dbf_name = name[:10]
    kind = s.dtype.kind
    if kind in ("i", "u") or str(s.dtype) == "Int64":
        return (dbf_name, "N", 18, 0,
                lambda v: "" if pd.isna(v) else str(int(v)))
    if kind == "f":
        def fmt(v):
            return "" if pd.isna(v) else f"{v:.15g}"
        return (dbf_name, "N", 30, 15, fmt)
    if kind == "b" or (kind == "O" and s.dropna().map(
            lambda v: isinstance(v, bool)).all() and len(s.dropna())):
        return (dbf_name, "L", 1, 0,
                lambda v: "?" if pd.isna(v) else ("T" if v else "F"))
    if kind == "M":
        return (dbf_name, "D", 8, 0,
                lambda v: "" if pd.isna(v) else v.strftime("%Y%m%d"))
    import datetime as _dt

    if kind == "O" and len(s.dropna()) and s.dropna().map(
            lambda v: isinstance(v, _dt.date)).all():
        return (dbf_name, "D", 8, 0,
                lambda v: "" if pd.isna(v) else v.strftime("%Y%m%d"))
    width = int(min(254, max(
        1, s.dropna().map(lambda v: len(str(v).encode("utf-8"))).max()
        if len(s.dropna()) else 1)))
    return (dbf_name, "C", width, 0,
            lambda v: "" if pd.isna(v) else str(v))


def write_shapefile(df, path: str, geom: str = "geometry",
                    crs_wkt: str | None = None) -> None:
    """Single-file .shp/.shx/.dbf sink (driver-side, row-capped — the
    format is one non-splittable file; use GeoParquet/GeoJSONSeq for
    datasets). ``crs_wkt`` is written verbatim to .prj when given."""
    from ..geom.wkb import from_wkb
    from .feather import _guard_single_file

    _guard_single_file(df, "write_shapefile", "write_geoparquet/geojsonseq")
    pdf = df.toPandas()
    batch = from_wkb(pdf[geom])
    st = _shape_type_for(batch)
    base = os.path.splitext(path)[0]

    bodies = [_record_body(batch, g, st) for g in range(len(batch))]
    reclens = np.array([len(b) for b in bodies], dtype=np.int64)
    offsets = 100 + np.concatenate([[0], np.cumsum(reclens[:-1] + 8)])
    total_words = (100 + int((reclens + 8).sum())) // 2

    fin = np.isfinite(batch.coords).all(axis=1)
    if fin.any():
        cs = batch.coords[fin]
        gbox = (cs[:, 0].min(), cs[:, 1].min(), cs[:, 0].max(), cs[:, 1].max())
    else:
        gbox = (0.0, 0.0, 0.0, 0.0)
    if batch.zs is not None and np.isfinite(batch.zs).any():
        zf = batch.zs[np.isfinite(batch.zs)]
        zr = (float(zf.min()), float(zf.max()))
    else:
        zr = (0.0, 0.0)

    def shp_header(file_words: int) -> bytes:
        return (struct.pack(">i", 9994) + b"\x00" * 20
                + struct.pack(">i", file_words)
                + struct.pack("<ii", 1000, st)
                + struct.pack("<4d", *gbox)
                + struct.pack("<4d", zr[0], zr[1], 0.0, 0.0))

    with open(base + ".shp", "wb") as f:
        f.write(shp_header(total_words))
        for i, b in enumerate(bodies):
            f.write(struct.pack(">ii", i + 1, len(b) // 2))
            f.write(b)
    with open(base + ".shx", "wb") as f:
        f.write(shp_header((100 + 8 * len(bodies)) // 2))
        for off, ln in zip(offsets, reclens):
            f.write(struct.pack(">ii", int(off) // 2, int(ln) // 2))

    attr_cols = [c for c in pdf.columns if c != geom]
    specs = [_dbf_field_spec(c, pdf[c]) for c in attr_cols]
    seen: set[str] = set()
    for i, sp in enumerate(specs):
        nm = sp[0]
        while nm in seen:
            nm = (nm[:8] + f"_{i}")[:10]
        seen.add(nm)
        specs[i] = (nm, *sp[1:])
    rlen = 1 + sum(sp[2] for sp in specs)
    import datetime as _dt

    now = _dt.date(2000, 1, 1)  # fixed stamp: byte-deterministic output
    with open(base + ".dbf", "wb") as f:
        f.write(struct.pack("<B3B", 0x03, now.year - 1900, now.month,
                            now.day))
        f.write(struct.pack("<IHH", len(pdf), 33 + 32 * len(specs), rlen))
        f.write(b"\x00" * 20)
        for nm, ftype, flen, fdec, _fmt in specs:
            f.write(nm.encode("ascii", errors="replace")[:11].ljust(11, b"\x00"))
            f.write(ftype.encode())
            f.write(b"\x00" * 4)
            f.write(struct.pack("<BB", flen, fdec))
            f.write(b"\x00" * 14)
        f.write(b"\x0d")
        for ridx in range(len(pdf)):
            f.write(b" ")
            for (nm, ftype, flen, fdec, fmt), col in zip(specs, attr_cols):
                txt = fmt(pdf[col].iloc[ridx])
                raw = txt.encode("utf-8", errors="replace")[:flen]
                if ftype in ("N", "F"):
                    f.write(raw.rjust(flen, b" "))
                else:
                    f.write(raw.ljust(flen, b" "))
        f.write(b"\x1a")
    with open(base + ".cpg", "w") as f:
        f.write("UTF-8")
    if crs_wkt:
        with open(base + ".prj", "w") as f:
            f.write(crs_wkt)
