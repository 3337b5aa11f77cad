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
