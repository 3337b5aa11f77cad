"""FlatGeobuf driver round-trips — reference io/file.py:28-34
('FlatGeobuf' OGR row); format per the public spec (flatgeobuf.org):
magic, FlatBuffers Header, packed R-tree index, size-prefixed Features.

Covers: geometry-type matrix, attribute types, Z, missing geometry,
bbox/columns/rows pushdown, indexed (leaf-offset) vs no-index
(prefix-walk) reads, header metadata, CRS code."""

import numpy as np
import pandas as pd
import pytest

from geopandas_spark.functions.st import st_astext, st_geomfromtext
from geopandas_spark.sources.file import read_file, to_file
from geopandas_spark.sources.flatgeobuf import (_leaf_offsets, _read_header,
                                                _walk_offsets,
                                                read_flatgeobuf,
                                                write_flatgeobuf)

WKTS = [
    "POINT (1 2)",
    "LINESTRING (0 0, 3 4, 5 0)",
    "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
    "POLYGON ((0 0, 8 0, 8 8, 0 8, 0 0), (2 2, 3 2, 3 3, 2 3, 2 2))",
    "MULTIPOINT (1 1, 2 2)",
    "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3, 4 4))",
    "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), "
    "((2 2, 3 2, 3 3, 2 3, 2 2), (2.2 2.2, 2.8 2.2, 2.8 2.8, 2.2 2.8, 2.2 2.2)))",
    "GEOMETRYCOLLECTION (POINT (5 5), LINESTRING (0 0, 1 1))",
    "POINT (10 20)",
]


def _mk(spark, wkts=WKTS, with_null=False):
    import pyspark.sql.functions as F

    rows = [(i, w, f"n{i}", float(i) * 1.5, i % 2 == 0)
            for i, w in enumerate(wkts)]
    if with_null:
        rows.append((len(rows), None, "nullgeom", -1.0, False))
    df = spark.createDataFrame(
        rows, "id bigint, wkt string, nm string, val double, flag boolean")
    return df.withColumn(
        "geometry",
        F.when(F.col("wkt").isNotNull(), st_geomfromtext(F.col("wkt")))
    ).drop("wkt")


def _cmp(df, back):
    import pyspark.sql.functions as F

    a = (df.withColumn("w", st_astext(F.col("geometry")))
         .select("id", "nm", "val", "flag", "w").toPandas()
         .sort_values("id").reset_index(drop=True))
    b = (back.withColumn("w", st_astext(F.col("geometry")))
         .select("id", "nm", "val", "flag", "w").toPandas()
         .sort_values("id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


class TestRoundTrip:
    def test_type_matrix_and_attrs(self, spark, tmp_path):
        df = _mk(spark)
        p = str(tmp_path / "m.fgb")
        to_file(df, p)
        back = read_file(spark, p)
        assert back.schema["geometry"].dataType.simpleString() == "binary"
        _cmp(df, back)

    def test_missing_geometry_row(self, spark, tmp_path):
        df = _mk(spark, with_null=True)
        p = str(tmp_path / "n.fgb")
        to_file(df, p)
        back = read_file(spark, p)
        _cmp(df, back)
        nulls = back.filter("geometry IS NULL").collect()
        assert len(nulls) == 1 and nulls[0]["nm"] == "nullgeom"

    def test_z_roundtrip(self, spark, tmp_path):
        wkts = ["POINT Z (1 2 3)", "LINESTRING Z (0 0 1, 1 1 2)",
                "POLYGON Z ((0 0 5, 1 0 5, 1 1 5, 0 0 5))"]
        df = _mk(spark, wkts=wkts)
        p = str(tmp_path / "z.fgb")
        to_file(df, p)
        got = sorted(r["w"] for r in read_file(spark, p).select(
            st_astext("geometry").alias("w")).collect())
        assert got == sorted(wkts)

    def test_no_index_prefix_walk(self, spark, tmp_path):
        df = _mk(spark)
        p = str(tmp_path / "ni.fgb")
        to_file(df, p, index_node_size=0)
        hdr = _read_header(p)
        assert hdr["index_node_size"] == 0 and hdr["index_size"] == 0
        assert _leaf_offsets(p, hdr) is None  # forces the walk path
        _cmp(df, read_file(spark, p))


class TestIndex:
    def test_leaf_offsets_match_walk(self, spark, tmp_path):
        # enough rows for a 2-level tree at node_size=16
        wkts = [f"POINT ({i} {i % 7})" for i in range(60)]
        df = _mk(spark, wkts=wkts)
        p = str(tmp_path / "idx.fgb")
        to_file(df, p)
        hdr = _read_header(p)
        assert hdr["index_node_size"] == 16
        lo = _leaf_offsets(p, hdr)
        assert lo is not None, "index leaf offsets must be recoverable"
        np.testing.assert_array_equal(lo, _walk_offsets(p, hdr))
        _cmp(df, read_file(spark, p))

    def test_header_metadata(self, spark, tmp_path):
        df = _mk(spark, wkts=["POINT (1 1)", "POINT (2 2)"])
        p = str(tmp_path / "h.fgb")
        write_flatgeobuf(df, p, crs_code=4326, name="pts")
        hdr = _read_header(p)
        assert hdr["features_count"] == 2
        assert hdr["crs_code"] == 4326
        assert hdr["geometry_type"] == 1  # uniform Point
        assert set(c[0] for c in hdr["columns"]) == {"id", "nm", "val",
                                                     "flag"}
        out = read_flatgeobuf(spark, p)
        assert out._gps_crs == "EPSG:4326"


class TestPushdown:
    def test_bbox_columns_rows(self, spark, tmp_path):
        df = _mk(spark)
        p = str(tmp_path / "pd.fgb")
        to_file(df, p)
        sub = read_file(spark, p, bbox=(9, 19, 11, 21), columns=["id"])
        assert sub.columns == ["geometry", "id"]
        assert [r["id"] for r in sub.collect()] == [8]
        assert read_file(spark, p, rows=3).count() == 3
        assert read_file(spark, p, rows=slice(2, 5)).count() == 3
        with pytest.raises(ValueError, match="columns not in"):
            read_file(spark, p, columns=["nope"])

    def test_mask_filter(self, spark, tmp_path):
        df = _mk(spark)
        p = str(tmp_path / "mk.fgb")
        to_file(df, p)
        got = read_file(spark, p,
                        mask="POLYGON ((9 19, 11 19, 11 21, 9 21, 9 19))")
        assert [r["id"] for r in got.collect()] == [8]

    def test_distributed_range_read(self, spark, tmp_path):
        # more rows than partitions: every task reads a byte sub-range
        wkts = [f"POINT ({i} {i})" for i in range(200)]
        df = _mk(spark, wkts=wkts)
        p = str(tmp_path / "big.fgb")
        to_file(df, p)
        back = read_file(spark, p)
        assert back.rdd.getNumPartitions() > 1
        assert back.count() == 200
        _cmp(df, back)


class TestErrors:
    def test_bad_magic(self, spark, tmp_path):
        p = tmp_path / "bad.fgb"
        p.write_bytes(b"not a fgb file at all")
        with pytest.raises(ValueError, match="bad magic"):
            read_file(spark, str(p))

    def test_row_cap_names_alternative(self, spark, tmp_path, monkeypatch):
        import geopandas_spark.sources.flatgeobuf as fgb

        monkeypatch.setattr(fgb, "_MAX_SINGLE_FILE_ROWS", 2)
        df = _mk(spark)
        with pytest.raises(ValueError, match="GeoParquet"):
            fgb.write_flatgeobuf(df, str(tmp_path / "cap.fgb"))

    def test_unsupported_column_type(self, spark, tmp_path):
        import pyspark.sql.functions as F

        df = _mk(spark, wkts=["POINT (0 0)"]).withColumn(
            "arr", F.array(F.lit(1)))
        with pytest.raises(ValueError, match="no FlatGeobuf type"):
            to_file(df, str(tmp_path / "u.fgb"))
