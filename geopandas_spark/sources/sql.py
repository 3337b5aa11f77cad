"""Spatial database I/O over DB-API connections (read_postgis / to_postgis).

Reference surface: ``geopandas.read_postgis`` / ``GeoDataFrame.to_postgis``
(io/sql.py:78-200, 242) — pandas ``read_sql`` plus WKB/EWKB geometry
decoding and SRID->CRS pickup. The reference funnels every row through
one SQLAlchemy connection on one machine; here the same surface is
re-expressed the way Spark's own JDBC source works:

* ``read_postgis(spark, sql, conn_factory, partition_col=...)`` splits
  the query into ``num_partitions`` range predicates on an integer
  partition column (driver runs ONE ``SELECT min, max`` to size the
  ranges) and each executor task opens its OWN connection via the
  picklable ``conn_factory`` and pulls only its slice — so a
  1000-executor cluster reads a big table through 1000 parallel
  cursors instead of one driver-side firehose. Without
  ``partition_col`` the read degrades to a single task (fine for dim
  tables; the docstring says so).
* ``to_postgis(df, name, conn_factory)`` writes from the executors with
  ``foreachPartition`` — one connection + batched ``executemany`` per
  partition. Single-writer engines (SQLite) must pass
  ``max_parallel_writers=1``, which funnels through ``coalesce(1)``
  but still streams partition iterators (no driver collect).

Geometry travels as (E)WKB: the read path accepts PostGIS EWKB (hex or
raw bytes; SRID/Z flags handled by ``geom.wkb``) and canonicalizes to
the engine's ISO WKB column; the write path emits EWKB hex with the
requested SRID, matching ``_convert_to_ewkb`` (io/sql.py:195-197).

No database server ships in this environment, so the tested backend is
the stdlib ``sqlite3`` (same DB-API 2.0 shape as psycopg2); the module
never imports a driver itself — the user's ``conn_factory`` does.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

_EWKB_SRID = 0x20000000
_EWKB_Z = 0x80000000
_EWKB_M = 0x40000000


# ---------------------------------------------------------------------------
# EWKB helpers
# ---------------------------------------------------------------------------

def ewkb_srid(blob: bytes | None) -> int | None:
    """SRID from an EWKB blob header, or None when the flag is absent."""
    if blob is None or len(blob) < 9:
        return None
    little = blob[0] == 1
    fmt = "<I" if little else ">I"
    raw = struct.unpack_from(fmt, blob, 1)[0]
    if raw & _EWKB_SRID:
        return struct.unpack_from(fmt, blob, 5)[0]
    return None


def wkb_to_ewkb_hex(wkb: bytes | None, srid: int = 0) -> str | None:
    """ISO WKB -> EWKB hex string (io/sql.py:195-197 parity: hex=True,
    srid stamped). Z/M stay encoded ISO-style in the body; the EWKB
    dimension flags are set so PostGIS recognizes them either way.

    ISO type ranges 1000-1999 (Z), 2000-2999 (M) and 3000-3999 (ZM)
    map to the EWKB 0x80000000 / 0x40000000 flags; EWKB-flagged inputs
    (including the M flag) pass their flags through."""
    if wkb is None:
        return None
    little = wkb[0] == 1
    fmt = "<I" if little else ">I"
    raw = struct.unpack_from(fmt, wkb, 1)[0]
    has_z = has_m = False
    base = raw
    if raw & (_EWKB_Z | _EWKB_M | _EWKB_SRID):
        has_z = bool(raw & _EWKB_Z)
        has_m = bool(raw & _EWKB_M)
        base = raw & 0xFF
        body_off = 9 if raw & _EWKB_SRID else 5
    else:
        body_off = 5
        if raw >= 1000:
            iso_dim = raw // 1000  # 1=Z, 2=M, 3=ZM
            has_z = iso_dim in (1, 3)
            has_m = iso_dim in (2, 3)
            base = raw % 1000
    code = (base | _EWKB_SRID | (_EWKB_Z if has_z else 0)
            | (_EWKB_M if has_m else 0))
    head = wkb[:1] + struct.pack(fmt, code) + struct.pack(
        "<i" if little else ">i", int(srid))
    return (head + wkb[body_off:]).hex()


def _canon_wkb(s: pd.Series) -> pd.Series:
    """(hex-)EWKB/WKB series -> canonical ISO WKB bytes (one vectorized
    decode/encode through the engine codec so downstream byte-hash ops
    see the same canonical form every other source emits). Hex vs raw
    bytes is detected PER VALUE (a driver-side sample can be all-NULL
    while later rows are hex strings — reference decodes per-value via
    shapely.wkb.loads(hex=True), io/sql.py:62)."""
    from ..geom import wkb as B

    s = s.map(lambda v: None if v is None
              else bytes.fromhex(v) if isinstance(v, str) else bytes(v))
    return pd.Series(B.to_wkb(B.from_wkb(s)), index=s.index)


# ---------------------------------------------------------------------------
# read
# ---------------------------------------------------------------------------

def _infer_schema(cols, sample_rows, geom_col, coerce_float=True):
    """Spark DDL from a driver-side sample (DB-API type codes are not
    portable across drivers, so infer from values; pass ``schema=`` to
    override). With ``coerce_float`` (pandas read_sql parity) SQL
    DECIMAL columns land as double."""
    import decimal

    types = {}
    for j, c in enumerate(cols):
        t = None
        for row in sample_rows:
            v = row[j]
            if v is None:
                continue
            if isinstance(v, bool):
                t = "boolean"
            elif isinstance(v, int):
                t = "bigint"
            elif isinstance(v, float):
                t = "double"
            elif isinstance(v, decimal.Decimal):
                t = "double" if coerce_float else "string"
            elif isinstance(v, (bytes, memoryview)):
                t = "binary"
            else:
                t = "string"
            break
        types[c] = t or "string"
    types[geom_col] = "binary"
    return ", ".join(f"`{c}` {types[c]}" for c in cols)


def read_postgis(spark: SparkSession, sql: str, conn_factory,
                 geom_col: str = "geom", crs=None, params=None,
                 partition_col: str | None = None,
                 lower_bound: int | None = None,
                 upper_bound: int | None = None,
                 num_partitions: int | None = None,
                 schema: str | None = None,
                 coerce_float: bool = True):
    """Distributed ``read_postgis`` (io/sql.py:78-145 parity).

    ``sql`` is a query or a bare table name. ``conn_factory`` is a
    zero-arg picklable callable returning a DB-API connection — it runs
    on every executor task, so put credentials/DSN inside it, not a
    live connection (connections don't pickle; same rule as Spark's
    ``foreachPartition`` examples).

    With ``partition_col`` (an integer/serial column) the driver issues
    one ``SELECT min(c), max(c)`` (or uses the given bounds) and each
    task reads ``WHERE c >= lo AND c < hi`` through its own connection.
    Without it the whole result streams through one task — only do that
    for dimension-sized queries.

    Returns a DataFrame whose ``geom_col`` holds canonical ISO WKB.
    ``crs`` defaults to the first geometry's EWKB SRID (EPSG:{srid}),
    matching the reference's ST_SRID pickup (io/sql.py:69-74).
    """
    if not isinstance(sql, str):
        raise ValueError("sql must be a string (query or table name)")
    query = sql if sql.lstrip().upper().startswith(("SELECT", "WITH")) \
        else f'SELECT * FROM "{sql}"'
    if params:
        raise NotImplementedError(
            "params: inline literals into the query string; per-task "
            "range predicates are appended server-side")

    con = conn_factory()
    try:
        cur = con.cursor()
        cur.execute(f"SELECT * FROM ({query}) AS _q LIMIT 100")
        cols = [d[0] for d in cur.description]
        sample = cur.fetchall()
        if geom_col not in cols:
            raise ValueError(f"Column {geom_col} not found in query result")
        bounds = None
        if partition_col is not None:
            if partition_col not in cols:
                raise ValueError(
                    f"partition_col {partition_col!r} not in query result")
            if lower_bound is None or upper_bound is None:
                cur.execute(
                    f"SELECT min({partition_col}), max({partition_col}) "
                    f"FROM ({query}) AS _q")
                lo, hi = cur.fetchone()
                lower_bound = lo if lower_bound is None else lower_bound
                upper_bound = hi if upper_bound is None else upper_bound
            bounds = (lower_bound, upper_bound)
    finally:
        con.close()

    gi = cols.index(geom_col)
    srid = None
    for r in sample:
        v = r[gi]
        if v is not None:
            b = bytes.fromhex(v) if isinstance(v, str) else bytes(v)
            srid = ewkb_srid(b)
            break
    if crs is None and srid:
        crs = f"EPSG:{srid}"

    ddl = schema or _infer_schema(cols, sample, geom_col, coerce_float)

    if bounds is None or bounds[0] is None:
        ranges = [(None, None)]
        npart = 1
    else:
        # Bounds are STRIDE-ONLY (Spark JDBC semantics): the first range
        # is unbounded below (plus IS NULL) and the last unbounded above,
        # so user-supplied bounds narrower than the data never drop rows
        # — matching reference read_postgis, which returns every row.
        npart = num_partitions or spark.sparkContext.defaultParallelism
        edges = np.linspace(bounds[0], bounds[1] + 1, npart + 1)
        edges = np.unique(edges.astype(np.int64))
        ranges = [(int(a), int(b)) for a, b in zip(edges[:-1], edges[1:])]
        if ranges:
            ranges[0] = (None, ranges[0][1])
            ranges[-1] = (ranges[-1][0], None)
        npart = len(ranges)

    rdf = spark.createDataFrame(
        ranges, "lo bigint, hi bigint").repartition(npart)
    pc, cf, qc, gc_, co = partition_col, conn_factory, query, geom_col, cols
    cfl = bool(coerce_float)

    def _read(it):
        import decimal

        for pdf in it:
            for lo, hi in zip(pdf["lo"], pdf["hi"]):
                con = cf()
                try:
                    cur = con.cursor()
                    if pc is None:
                        cur.execute(f"SELECT * FROM ({qc}) AS _q")
                    else:
                        preds = []
                        if not pd.isna(lo):
                            preds.append(f"{pc} >= {int(lo)}")
                        if not pd.isna(hi):
                            preds.append(f"{pc} < {int(hi)}")
                        else:
                            pass  # last stride: unbounded above
                        if pd.isna(lo):
                            # first stride also picks up NULL keys so no
                            # row is silently dropped (Spark JDBC rule)
                            cond = (f"({' AND '.join(preds)}) OR {pc} IS NULL"
                                    if preds else "1=1")
                        else:
                            cond = " AND ".join(preds) or "1=1"
                        cur.execute(f"SELECT * FROM ({qc}) AS _q WHERE {cond}")
                    while True:
                        chunk = cur.fetchmany(50_000)
                        if not chunk:
                            break
                        out = pd.DataFrame(chunk, columns=co)
                        out[gc_] = _canon_wkb(out[gc_])
                        if cfl:
                            # pandas read_sql coerce_float parity: SQL
                            # DECIMAL comes back as decimal.Decimal —
                            # convert to float64 for numeric columns
                            for c in co:
                                if c != gc_ and out[c].dtype == object and \
                                        out[c].map(
                                            lambda v: v is None or
                                            isinstance(v, decimal.Decimal)
                                        ).all() and out[c].notna().any():
                                    out[c] = out[c].astype(float)
                        yield out
                finally:
                    con.close()

    out = rdf.mapInPandas(_read, schema=ddl)
    out._gps_crs = crs  # advisory; GeoFrame picks it up
    return out


def read_sql(spark, sql, conn_factory, **kw):
    """Alias: the reference routes non-spatial reads through pandas
    read_sql inside read_postgis; same entry point here."""
    return read_postgis(spark, sql, conn_factory, **kw)


# ---------------------------------------------------------------------------
# write
# ---------------------------------------------------------------------------

_SPARK_TO_SQL = {
    "bigint": "BIGINT", "int": "INTEGER", "double": "DOUBLE PRECISION",
    "float": "REAL", "string": "VARCHAR", "boolean": "BOOLEAN",
    "binary": "BYTEA", "date": "DATE", "timestamp": "TIMESTAMP",
}


def to_postgis(df: DataFrame, name: str, conn_factory,
               geom_col: str = "geometry", srid: int = 0,
               if_exists: str = "fail", chunksize: int = 1000,
               max_parallel_writers: int | None = None,
               geom_sql_type: str | None = None,
               paramstyle: str = "qmark"):
    """Distributed ``to_postgis`` (io/sql.py:242 parity).

    DDL (CREATE/DROP per ``if_exists``: fail|replace|append) runs once
    on the driver; rows INSERT from the executors via
    ``foreachPartition`` — one connection and ``executemany`` batches of
    ``chunksize`` per partition. Geometry is written as EWKB hex with
    ``srid`` stamped (io/sql.py:195-197) — the format PostGIS's
    ``geometry`` type accepts directly as text input.

    ``max_parallel_writers`` caps concurrent writer tasks; pass 1 for
    single-writer engines (SQLite). ``paramstyle`` is the DB-API
    placeholder style of the target driver: 'qmark' (?, sqlite3) or
    'format' (%s, psycopg2). ``geom_sql_type`` defaults by backend:
    ``geometry`` under paramstyle='format' (an actual PostGIS server,
    where EWKB hex inserts via the geometry text-input cast) and
    ``BLOB``-as-TEXT storage under 'qmark' (sqlite3, dynamic typing —
    the hex string round-trips through read_postgis's per-value hex
    detection either way).
    """
    if if_exists not in ("fail", "replace", "append"):
        raise ValueError("if_exists must be fail|replace|append")
    if paramstyle not in ("qmark", "format"):
        raise ValueError("paramstyle must be qmark|format")
    if geom_sql_type is None:
        geom_sql_type = "geometry" if paramstyle == "format" else "BLOB"
    fields = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
    if geom_col not in {n for n, _ in fields}:
        raise ValueError(f"Column {geom_col} not found in DataFrame")

    col_defs = ", ".join(
        f'"{n}" {geom_sql_type if n == geom_col else _SPARK_TO_SQL.get(t, "VARCHAR")}'
        for n, t in fields)
    con = conn_factory()
    try:
        cur = con.cursor()
        try:
            cur.execute(f'SELECT 1 FROM "{name}" LIMIT 1')
            cur.fetchall()
            exists = True
        except Exception:
            if hasattr(con, "rollback"):
                con.rollback()
            exists = False
        cur = con.cursor()
        if exists and if_exists == "fail":
            raise ValueError(f"Table {name!r} already exists")
        if exists and if_exists == "replace":
            cur.execute(f'DROP TABLE "{name}"')
            exists = False
        if not exists:
            cur.execute(f'CREATE TABLE "{name}" ({col_defs})')
        con.commit()
    finally:
        con.close()

    names = [n for n, _ in fields]
    ph = ", ".join(["?" if paramstyle == "qmark" else "%s"] * len(names))
    ins = (f'INSERT INTO "{name}" (' +
           ", ".join(f'"{n}"' for n in names) + f") VALUES ({ph})")
    cf, gc_, sr, cs = conn_factory, geom_col, int(srid), int(chunksize)

    if max_parallel_writers is not None:
        df = df.coalesce(int(max_parallel_writers))

    def _write(rows):
        con = cf()
        try:
            cur = con.cursor()
            batch = []
            for row in rows:
                d = row.asDict()
                vals = []
                for n in names:
                    v = d[n]
                    if n == gc_:
                        v = wkb_to_ewkb_hex(
                            bytes(v) if v is not None else None, sr)
                    elif isinstance(v, bytearray):
                        v = bytes(v)
                    vals.append(v)
                batch.append(tuple(vals))
                if len(batch) >= cs:
                    cur.executemany(ins, batch)
                    batch = []
            if batch:
                cur.executemany(ins, batch)
            con.commit()
        finally:
            con.close()

    df.foreachPartition(_write)
