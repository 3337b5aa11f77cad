"""GeoPackage (.gpkg) driver over the stdlib ``sqlite3`` module.

Reference surface: ``read_file`` / ``to_file`` with the OGR ``'GPKG'``
driver (io/file.py:28-34, 50-252) and ``list_layers`` (io/file.py:268).
GeoPackage is a SQLite database following the OGC GPKG spec: feature
tables carry geometry as a GeoPackageBinary blob = 8-byte header
(magic ``GP``, version, flags, srs_id) + optional envelope + standard
WKB — so the engine's existing WKB column format plugs straight in.

Scale shape
-----------
* ``read_gpkg`` is DISTRIBUTED: the driver opens the file only for the
  catalog tables (gpkg_contents / gpkg_geometry_columns, a few rows) and
  min/max rowid; feature rows are read on the executors — each task
  opens the file read-only/immutable and scans its own rowid range (the
  same byte-range discipline as the shapefile/Feather dataset readers;
  the path must be on shared storage).
* ``write_gpkg`` is a SINGLE-FILE sink (SQLite has one writer) —
  driver-side and row-capped; use GeoParquet for datasets.
"""

from __future__ import annotations

import os
import sqlite3
import struct

import numpy as np
import pandas as pd


# ---------------------------------------------------------------------------
# GeoPackageBinary blob <-> WKB
# ---------------------------------------------------------------------------

_ENV_SIZE = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}


def gpb_to_wkb(blob: bytes | None) -> bytes | None:
    """GeoPackageBinary -> ISO WKB (strip the GP header + envelope)."""
    if blob is None:
        return None
    if blob[:2] != b"GP":
        raise ValueError("not a GeoPackageBinary blob (bad magic)")
    flags = blob[3]
    if flags & 0b00100000:
        raise ValueError("extended GeoPackageBinary is not supported")
    if (flags >> 4) & 1:  # empty-geometry flag: WKB body still present
        pass
    env = _ENV_SIZE[(flags >> 1) & 0b111]
    return bytes(blob[8 + env:])


def wkb_to_gpb(wkb: bytes | None, srs_id: int = 0,
               envelope: tuple | None = None) -> bytes | None:
    """ISO WKB -> GeoPackageBinary. ``envelope=(minx,maxx,miny,maxy)``
    (GPKG header order) adds the 32-byte XY envelope."""
    if wkb is None:
        return None
    flags = 0b00000001  # little-endian header
    env = b""
    if envelope is not None and np.isfinite(envelope).all():
        flags |= 0b00000010  # envelope indicator 1 (xy)
        env = struct.pack("<4d", *envelope)
    return b"GP\x00" + bytes([flags]) + struct.pack("<i", srs_id) + env + wkb


def _gpb_series_to_wkb(s: pd.Series) -> pd.Series:
    return s.map(gpb_to_wkb)


# ---------------------------------------------------------------------------
# read
# ---------------------------------------------------------------------------

def _ro_connect(path: str) -> sqlite3.Connection:
    return sqlite3.connect(f"file:{path}?mode=ro&immutable=1", uri=True)


def gpkg_layers(path: str) -> list[tuple[str, str]]:
    """[(layer_name, geometry_type_name)] — ``list_layers`` parity for
    .gpkg containers (io/file.py:268)."""
    with _ro_connect(path) as con:
        rows = con.execute(
            "SELECT c.table_name, g.geometry_type_name "
            "FROM gpkg_contents c JOIN gpkg_geometry_columns g "
            "ON c.table_name = g.table_name "
            "WHERE c.data_type = 'features' ORDER BY c.table_name"
        ).fetchall()
    return [(t, n) for t, n in rows]


def _sqlite_to_spark_type(decl: str) -> str:
    d = (decl or "").upper()
    if d.startswith(("INT", "BIGINT", "MEDIUMINT", "SMALLINT", "TINYINT")):
        return "bigint"
    if d.startswith(("REAL", "FLOAT", "DOUBLE", "NUM", "DEC")):
        return "double"
    if d.startswith("BOOL"):
        return "boolean"
    if d.startswith(("BLOB", "GEOMETRY", "POINT", "LINESTRING", "POLYGON",
                     "MULTI", "GEOMETRYCOLLECTION")):
        return "binary"
    if d.startswith("DATETIME"):
        return "string"
    if d.startswith("DATE"):
        return "date"
    return "string"


def read_gpkg(spark, path: str, layer: str | None = None, bbox=None,
              columns=None, rows=None, geom: str = "geometry",
              num_partitions: int | None = None):
    """Distributed GeoPackage read -> DataFrame(WKB geometry + attrs).

    ``layer`` defaults to the single features layer (error when the file
    has several — same as pyogrio). ``bbox`` keeps features whose
    envelope intersects it; ``columns`` subsets attribute columns;
    ``rows`` is an int (first n) or a slice (io/file.py:81-85).
    """
    layers = gpkg_layers(path)
    if not layers:
        raise ValueError(f"{path}: no feature layers")
    if layer is None:
        if len(layers) > 1:
            raise ValueError(
                f"{path} has {len(layers)} layers "
                f"({[t for t, _ in layers]}); pass layer=")
        layer = layers[0][0]
    elif layer not in {t for t, _ in layers}:
        raise ValueError(f"layer {layer!r} not in {[t for t, _ in layers]}")

    with _ro_connect(path) as con:
        gcol, srs_id = con.execute(
            "SELECT column_name, srs_id FROM gpkg_geometry_columns "
            "WHERE table_name = ?", (layer,)).fetchone()
        info = con.execute(f'PRAGMA table_info("{layer}")').fetchall()
        lo_hi = con.execute(
            f'SELECT min(rowid), max(rowid), count(*) FROM "{layer}"'
        ).fetchone()
    attr_cols = [(name, _sqlite_to_spark_type(decl))
                 for _cid, name, decl, _nn, _dflt, pk in info
                 if name != gcol and not pk]
    if columns is not None:
        missing = set(columns) - {n for n, _ in attr_cols}
        if missing:
            raise ValueError(f"columns not in {layer}: {sorted(missing)}")
        attr_cols = [(n, t) for n, t in attr_cols if n in set(columns)]
    schema = ", ".join([f"`{geom}` binary"]
                       + [f"`{n}` {t}" for n, t in attr_cols])
    lo, hi, total = lo_hi
    if total == 0 or lo is None:
        return spark.createDataFrame([], schema)

    limit = None
    offset0 = 0
    if rows is not None:
        if isinstance(rows, int):
            limit = rows
        else:
            offset0 = rows.start or 0
            limit = None if rows.stop is None else max(
                0, rows.stop - offset0)
            if rows.step not in (None, 1):
                raise ValueError("rows slice step must be 1 for GPKG")

    par = num_partitions or spark.sparkContext.defaultParallelism
    n_chunks = min(par, max(1, int(total)))
    edges = np.linspace(lo, hi + 1, n_chunks + 1).astype(np.int64)
    ranges = pd.DataFrame({"lo": edges[:-1], "hi": edges[1:]})
    sel_names = [n for n, _ in attr_cols]
    sel_sql = ", ".join([f'"{gcol}"'] + [f'"{n}"' for n in sel_names])
    bbox_t = tuple(map(float, bbox)) if bbox is not None else None
    date_cols = [n for n, t in attr_cols if t == "date"]
    bool_cols = [n for n, t in attr_cols if t == "boolean"]

    def _read(it):
        for pdf in it:
            for a, b in zip(pdf["lo"], pdf["hi"]):
                with _ro_connect(path) as con:
                    cur = con.execute(
                        f'SELECT {sel_sql} FROM "{layer}" '
                        "WHERE rowid >= ? AND rowid < ? ORDER BY rowid",
                        (int(a), int(b)))
                    data = cur.fetchall()
                out = pd.DataFrame(data, columns=[geom] + sel_names)
                out[geom] = _gpb_series_to_wkb(out[geom])
                for c in date_cols:
                    out[c] = pd.to_datetime(out[c],
                                            errors="coerce").dt.date
                for c in bool_cols:
                    out[c] = out[c].map(
                        lambda v: None if v is None else bool(v))
                if bbox_t is not None and len(out):
                    from ..geom.kernels import bounds as _bounds
                    from ..geom.wkb import from_wkb as _fw

                    bb = _bounds(_fw(out[geom]))
                    keepm = ~((bb[:, 0] > bbox_t[2]) | (bb[:, 2] < bbox_t[0])
                              | (bb[:, 1] > bbox_t[3])
                              | (bb[:, 3] < bbox_t[1]))
                    keepm &= np.isfinite(bb).all(axis=1)
                    out = out[keepm].reset_index(drop=True)
                yield out

    rdf = spark.createDataFrame(ranges).repartition(
        min(n_chunks, par), "lo")
    res = rdf.mapInPandas(_read, schema)
    if limit is not None or offset0:
        # rows-slice semantics are positional over the file order: pull
        # via a driver-side limit (dev path, like the reference's fiona
        # list-slice, io/file.py:136-143)
        if limit is not None:
            pdf = res.limit(offset0 + limit).toPandas()
            pdf = pdf.iloc[offset0:offset0 + limit]
        else:  # open-ended slice: bounded by the table's row count
            from .feather import _guard_single_file

            _guard_single_file(res, "read_gpkg(rows=slice(n, None))",
                               "rows=slice(a, b) with a bound")
            pdf = res.toPandas().iloc[offset0:]
        return spark.createDataFrame(pdf.reset_index(drop=True),
                                     schema=res.schema)
    return res


# ---------------------------------------------------------------------------
# write
# ---------------------------------------------------------------------------

_SPARK_TO_SQLITE = {
    "bigint": "INTEGER", "int": "MEDIUMINT", "smallint": "SMALLINT",
    "tinyint": "TINYINT", "double": "DOUBLE", "float": "FLOAT",
    "string": "TEXT", "boolean": "BOOLEAN", "date": "DATE",
    "timestamp": "DATETIME", "binary": "BLOB",
}


def write_gpkg(df, path: str, layer: str = "layer",
               geom: str = "geometry", srs_id: int = 0,
               mode: str = "overwrite", crs_wkt: str | None = None) -> None:
    """Single-file GeoPackage sink (driver-side, row-capped — SQLite has
    exactly one writer; use GeoParquet for datasets). ``mode='append'``
    adds a layer to an existing file. Writes the spec's catalog tables
    (gpkg_spatial_ref_sys / gpkg_contents / gpkg_geometry_columns), the
    XY envelope per feature, and the layer extent in gpkg_contents.
    """
    from ..geom.kernels import bounds as _bounds
    from ..geom.ragged import TYPE_NAMES
    from ..geom.wkb import from_wkb
    from .feather import _guard_single_file

    _guard_single_file(df, "write_gpkg", "write_geoparquet")
    if mode == "overwrite" and os.path.exists(path):
        os.remove(path)
    pdf = df.toPandas()
    batch = from_wkb(pdf[geom])
    bb = _bounds(batch)
    tnames = sorted({TYPE_NAMES[int(t)] for t in np.unique(batch.types)
                     if int(t) != 0})
    gtype = tnames[0].upper() if len(tnames) == 1 else "GEOMETRY"
    has_z = 1 if (batch.geom_has_z is not None
                  and bool(batch.geom_has_z.any())) else 0

    attr = [(f.name, _SPARK_TO_SQLITE.get(f.dataType.simpleString(), "TEXT"))
            for f in df.schema.fields if f.name != geom]
    con = sqlite3.connect(path)
    try:
        con.execute("PRAGMA application_id = 0x47504B47")
        con.execute("PRAGMA user_version = 10300")
        con.execute(
            "CREATE TABLE IF NOT EXISTS gpkg_spatial_ref_sys ("
            "srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY, "
            "organization TEXT NOT NULL, organization_coordsys_id INTEGER "
            "NOT NULL, definition TEXT NOT NULL, description TEXT)")
        for sid, name, org, oid, definition in [
                (-1, "Undefined cartesian SRS", "NONE", -1, "undefined"),
                (0, "Undefined geographic SRS", "NONE", 0, "undefined"),
                (4326, "WGS 84 geodetic", "EPSG", 4326,
                 'GEOGCS["WGS 84",DATUM["WGS_1984",'
                 'SPHEROID["WGS 84",6378137,298.257223563]],'
                 'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]]')]:
            con.execute(
                "INSERT OR IGNORE INTO gpkg_spatial_ref_sys VALUES "
                "(?,?,?,?,?,NULL)", (name, sid, org, oid, definition))
        if crs_wkt and srs_id not in (-1, 0, 4326):
            con.execute(
                "INSERT OR IGNORE INTO gpkg_spatial_ref_sys VALUES "
                "(?,?,?,?,?,NULL)",
                (f"SRS {srs_id}", srs_id, "CUSTOM", srs_id, crs_wkt))
        con.execute(
            "CREATE TABLE IF NOT EXISTS gpkg_contents ("
            "table_name TEXT NOT NULL PRIMARY KEY, data_type TEXT NOT NULL, "
            "identifier TEXT UNIQUE, description TEXT DEFAULT '', "
            "last_change DATETIME NOT NULL DEFAULT "
            "(strftime('%Y-%m-%dT%H:%M:%fZ','now')), "
            "min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE, "
            "srs_id INTEGER)")
        con.execute(
            "CREATE TABLE IF NOT EXISTS gpkg_geometry_columns ("
            "table_name TEXT NOT NULL, column_name TEXT NOT NULL, "
            "geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL, "
            "z TINYINT NOT NULL, m TINYINT NOT NULL, "
            "CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name))")
        cols_sql = ", ".join(
            [f'"{geom}" {gtype}'] + [f'"{n}" {t}' for n, t in attr])
        con.execute(f'DROP TABLE IF EXISTS "{layer}"')
        con.execute(
            f'CREATE TABLE "{layer}" '
            f"(fid INTEGER PRIMARY KEY AUTOINCREMENT, {cols_sql})")
        fin = np.isfinite(bb).all(axis=1)
        ext = (tuple(np.nanmin(bb[fin, :2], axis=0))
               + tuple(np.nanmax(bb[fin, 2:], axis=0))) if fin.any() \
            else (None, None, None, None)
        con.execute(
            "INSERT OR REPLACE INTO gpkg_contents (table_name, data_type, "
            "identifier, min_x, min_y, max_x, max_y, srs_id) "
            "VALUES (?,?,?,?,?,?,?,?)",
            (layer, "features", layer, *ext, srs_id))
        con.execute(
            "INSERT OR REPLACE INTO gpkg_geometry_columns VALUES "
            "(?,?,?,?,?,0)", (layer, geom, gtype, srs_id, has_z))

        def to_blob(i, wkb):
            if wkb is None:
                return None
            env = (float(bb[i, 0]), float(bb[i, 2]),
                   float(bb[i, 1]), float(bb[i, 3]))
            if not np.isfinite(env).all():
                env = None
            return wkb_to_gpb(bytes(wkb), srs_id, env)

        ins = (f'INSERT INTO "{layer}" ("{geom}"'
               + "".join(f', "{n}"' for n, _ in attr) + ") VALUES ("
               + ",".join("?" * (1 + len(attr))) + ")")
        rows = []
        for i in range(len(pdf)):
            vals = [to_blob(i, pdf[geom].iloc[i])]
            for n, t in attr:
                v = pdf[n].iloc[i]
                if pd.isna(v) if not isinstance(v, (bytes, bytearray,
                                                    np.ndarray)) else False:
                    vals.append(None)
                elif t == "DATE":
                    vals.append(v.isoformat())
                elif t == "BOOLEAN":
                    vals.append(int(bool(v)))
                elif isinstance(v, (np.integer,)):
                    vals.append(int(v))
                elif isinstance(v, (np.floating,)):
                    vals.append(float(v))
                elif isinstance(v, (bytearray, np.ndarray)):
                    vals.append(bytes(v))
                else:
                    vals.append(v)
            rows.append(tuple(vals))
        con.executemany(ins, rows)
        con.commit()
    finally:
        con.close()
