"""SQL database I/O (read_postgis / to_postgis over DB-API, io/sql.py
parity) — tested against the stdlib sqlite3 backend."""

import sqlite3

import numpy as np
import pytest

from geopandas_spark.geom.ragged import points_batch
from geopandas_spark.geom.wkb import from_wkb, to_wkb
from geopandas_spark.sources.sql import (
    ewkb_srid, read_postgis, to_postgis, wkb_to_ewkb_hex)


def _factory(path):
    # nested def (not functools.partial over a module function): test
    # modules aren't importable on the workers, so the factory must
    # pickle by value — exactly the contract read_postgis documents.
    def connect(_path=path):
        import sqlite3
        return sqlite3.connect(_path)
    return connect


def _seed_table(path, n=200, srid=4326, hex_geom=True):
    b = points_batch(np.arange(n) * 0.01, np.arange(n) * 0.02)
    wkbs = to_wkb(b)
    con = sqlite3.connect(path)
    con.execute("CREATE TABLE roads (gid INTEGER PRIMARY KEY, "
                "name TEXT, speed REAL, geom)")
    rows = []
    for i, w in enumerate(wkbs):
        g = wkb_to_ewkb_hex(bytes(w), srid)
        if not hex_geom:
            g = sqlite3.Binary(bytes.fromhex(g))
        rows.append((i + 1, f"road-{i}", float(i) * 1.5, g))
    con.executemany("INSERT INTO roads VALUES (?,?,?,?)", rows)
    con.commit()
    con.close()


def test_ewkb_hex_roundtrip():
    w = bytes(to_wkb(points_batch(np.array([3.5]), np.array([-1.25])))[0])
    h = wkb_to_ewkb_hex(w, srid=3857)
    blob = bytes.fromhex(h)
    assert ewkb_srid(blob) == 3857
    back = from_wkb([blob])
    assert back.coords[0][0] == pytest.approx(3.5)
    assert back.coords[0][1] == pytest.approx(-1.25)


def test_read_postgis_partitioned(spark, tmp_path):
    db = str(tmp_path / "t.db")
    _seed_table(db, n=200)
    df = read_postgis(spark, "roads", _factory(db), geom_col="geom",
                      partition_col="gid", num_partitions=4)
    assert df.rdd.getNumPartitions() == 4
    pdf = df.toPandas().sort_values("gid").reset_index(drop=True)
    assert len(pdf) == 200
    assert pdf["name"].iloc[5] == "road-5"
    b = from_wkb(pdf["geom"])
    assert b.coords[7][0] == pytest.approx(0.07)
    # SRID pickup -> crs (io/sql.py:69-74)
    assert df._gps_crs == "EPSG:4326"


def test_read_postgis_query_and_raw_bytes(spark, tmp_path):
    db = str(tmp_path / "t.db")
    _seed_table(db, n=50, srid=0, hex_geom=False)
    df = read_postgis(
        spark,
        "SELECT gid, geom FROM roads WHERE gid <= 10",
        _factory(db), geom_col="geom")
    pdf = df.toPandas()
    assert len(pdf) == 10
    assert from_wkb(pdf["geom"]).types.min() > 0


def test_to_postgis_roundtrip(spark, tmp_path):
    db = str(tmp_path / "w.db")
    n = 80
    b = points_batch(np.arange(n) * 1.0, np.arange(n) * -1.0)
    wkbs = [bytes(w) for w in to_wkb(b)]
    sdf = spark.createDataFrame(
        [(i, wkbs[i], f"n{i}") for i in range(n)],
        "id bigint, geometry binary, name string")
    to_postgis(sdf, "pts", _factory(db), srid=2154,
               max_parallel_writers=1)
    con = sqlite3.connect(db)
    rows = con.execute("SELECT id, geometry, name FROM pts "
                       "ORDER BY id").fetchall()
    con.close()
    assert len(rows) == n
    blob = bytes.fromhex(rows[3][1])
    assert ewkb_srid(blob) == 2154
    back = from_wkb([blob])
    assert back.coords[0][0] == pytest.approx(3.0)

    # if_exists semantics (io/sql.py:252-258)
    with pytest.raises(ValueError, match="already exists"):
        to_postgis(sdf, "pts", _factory(db), max_parallel_writers=1)
    to_postgis(sdf.limit(5), "pts", _factory(db), if_exists="replace",
               max_parallel_writers=1)
    con = sqlite3.connect(db)
    assert con.execute("SELECT count(*) FROM pts").fetchone()[0] == 5
    to_postgis(sdf.limit(5), "pts", _factory(db), if_exists="append",
               max_parallel_writers=1)
    assert con.execute("SELECT count(*) FROM pts").fetchone()[0] == 10
    con.close()


def test_read_postgis_stride_only_bounds_and_nulls(spark, tmp_path):
    """Spark-JDBC bounds semantics (ADVICE r3): explicit bounds narrower
    than the data only size the stride — the first range is unbounded
    below (and picks up NULL partition keys), the last unbounded above,
    so no row is ever dropped."""
    db = str(tmp_path / "sb.db")
    _seed_table(db, n=100)
    con = sqlite3.connect(db)
    # a row with a NULL partition key and rows outside [20, 60)
    w = wkb_to_ewkb_hex(
        bytes(to_wkb(points_batch(np.array([9.0]), np.array([9.0])))[0]), 4326)
    con.execute("INSERT INTO roads VALUES (NULL, 'null-key', 0.0, ?)", (w,))
    con.commit()
    con.close()
    df = read_postgis(spark, "SELECT rowid AS rk, * FROM roads",
                      _factory(db), geom_col="geom", partition_col="gid",
                      lower_bound=20, upper_bound=60, num_partitions=4)
    assert df.count() == 101  # every row, incl. NULL key and out-of-bounds


def test_read_postgis_hex_detected_per_value(spark, tmp_path):
    """Hex vs bytes decided per value (ADVICE r3): an all-NULL sample
    prefix must not poison later hex rows."""
    db = str(tmp_path / "hx.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE g (gid INTEGER PRIMARY KEY, geom)")
    rows = [(i + 1, None) for i in range(150)]  # sample window all NULL
    w = wkb_to_ewkb_hex(
        bytes(to_wkb(points_batch(np.array([1.0]), np.array([2.0])))[0]), 0)
    rows.append((151, w))  # hex string after the 100-row sample
    con.executemany("INSERT INTO g VALUES (?,?)", rows)
    con.commit()
    con.close()
    pdf = read_postgis(spark, "g", _factory(db), geom_col="geom").toPandas()
    assert len(pdf) == 151
    got = pdf.loc[pdf["gid"] == 151, "geom"].iloc[0]
    assert from_wkb([bytes(got)]).coords[0][0] == pytest.approx(1.0)


def test_read_postgis_coerce_float_decimal(spark, tmp_path):
    """pandas read_sql coerce_float parity: DECIMAL-ish Decimal values
    land as double when coerce_float=True (default)."""
    import decimal

    db = str(tmp_path / "cf.db")
    sqlite3.register_adapter(decimal.Decimal, str)
    con = sqlite3.connect(db, detect_types=sqlite3.PARSE_DECLTYPES)
    sqlite3.register_converter("DECTYPE", lambda b: decimal.Decimal(b.decode()))
    con.execute("CREATE TABLE m (gid INTEGER PRIMARY KEY, amt DECTYPE, geom)")
    w = wkb_to_ewkb_hex(
        bytes(to_wkb(points_batch(np.array([0.0]), np.array([0.0])))[0]), 0)
    con.executemany("INSERT INTO m VALUES (?,?,?)",
                    [(i + 1, decimal.Decimal("1.25") * i, w) for i in range(9)])
    con.commit()
    con.close()

    def connect(_path=db):
        import decimal
        import sqlite3
        sqlite3.register_converter(
            "DECTYPE", lambda b: decimal.Decimal(b.decode()))
        return sqlite3.connect(_path, detect_types=sqlite3.PARSE_DECLTYPES)

    df = read_postgis(spark, "m", connect, geom_col="geom")
    assert dict(df.dtypes)["amt"] == "double"
    got = sorted(r["amt"] for r in df.collect())
    assert got[2] == pytest.approx(2.5)


def test_ewkb_hex_preserves_m_flag():
    """ISO M (2001-2999) / ZM (3001+) ranges and the EWKB 0x40000000 M
    flag survive wkb_to_ewkb_hex (ADVICE r3): the emitted header must
    agree with the per-vertex value count in the body."""
    import struct

    # hand-built ISO POINT M (code 2001): x, y, m
    iso_m = (b"\x01" + struct.pack("<I", 2001)
             + struct.pack("<3d", 1.0, 2.0, 7.0))
    h = wkb_to_ewkb_hex(iso_m, srid=4326)
    blob = bytes.fromhex(h)
    code = struct.unpack_from("<I", blob, 1)[0]
    assert code & 0x40000000  # M flag kept
    assert not code & 0x80000000  # no phantom Z
    assert ewkb_srid(blob) == 4326
    # EWKB M-flag input passes through
    ewkb_m = (b"\x01" + struct.pack("<I", 1 | 0x40000000)
              + struct.pack("<3d", 1.0, 2.0, 7.0))
    code2 = struct.unpack_from("<I", bytes.fromhex(
        wkb_to_ewkb_hex(ewkb_m, srid=0)), 1)[0]
    assert code2 & 0x40000000 and (code2 & 0xFF) == 1
    # ISO ZM (3001): both flags
    iso_zm = (b"\x01" + struct.pack("<I", 3001)
              + struct.pack("<4d", 1.0, 2.0, 3.0, 7.0))
    code3 = struct.unpack_from("<I", bytes.fromhex(
        wkb_to_ewkb_hex(iso_zm, srid=0)), 1)[0]
    assert code3 & 0x40000000 and code3 & 0x80000000


def test_sql_roundtrip_matches_geoparquet_path(spark, tmp_path):
    """DB write -> DB read reproduces the exact canonical WKB bytes the
    engine's other sources emit (hash-identical column)."""
    db = str(tmp_path / "rt.db")
    n = 30
    b = points_batch(np.linspace(0, 1, n), np.linspace(1, 0, n))
    wkbs = [bytes(w) for w in to_wkb(b)]
    sdf = spark.createDataFrame(
        [(i, wkbs[i]) for i in range(n)], "id bigint, geometry binary")
    to_postgis(sdf, "g", _factory(db), srid=4326, max_parallel_writers=1)
    back = read_postgis(spark, "g", _factory(db), geom_col="geometry",
                        partition_col="id")
    got = {r["id"]: bytes(r["geometry"]) for r in back.collect()}
    assert got == {i: wkbs[i] for i in range(n)}
