"""GeoFrame — the GeoDataFrame-shaped API over a Spark DataFrame.

A thin, stateless wrapper holding (DataFrame, active geometry column,
crs) so that reference users can keep their call shapes
(/root/reference/geopandas/geodataframe.py:48,263: one *active* geometry
column + crs; every method either returns a new GeoFrame or a plain
DataFrame of scalars). All computation delegates to the st_* function
library and the distributed operators; nothing here adds plan nodes
beyond the wrapped calls.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .functions import st


class GeoFrame:
    """DataFrame + active geometry column (+ optional crs string)."""

    def __init__(self, df: DataFrame, geometry: str = "geometry",
                 crs: str | None = None):
        if geometry not in df.columns:
            raise ValueError(f"geometry column {geometry!r} not in DataFrame")
        self.df = df
        self.geometry = geometry
        self.crs = crs

    # -- plumbing ----------------------------------------------------------
    def _wrap(self, df: DataFrame, geometry: str | None = None,
              crs: str | None = None) -> "GeoFrame":
        return GeoFrame(df, geometry or self.geometry, crs or self.crs)

    def _with_geom(self, col: Column) -> "GeoFrame":
        return self._wrap(self.df.withColumn(self.geometry, col))

    def _scalar(self, name: str, col: Column) -> DataFrame:
        return self.df.withColumn(name, col)

    def set_geometry(self, column: str) -> "GeoFrame":
        """geodataframe.py:158."""
        return GeoFrame(self.df, column, self.crs)

    def set_crs(self, crs: str) -> "GeoFrame":
        """geoseries.py:800 — metadata only."""
        return GeoFrame(self.df, self.geometry, crs)

    # -- scalar accessors (base.py §2.2) ------------------------------------
    @property
    def area(self) -> DataFrame:
        return self._scalar("area", st.st_area(self.geometry))

    @property
    def length(self) -> DataFrame:
        return self._scalar("length", st.st_length(self.geometry))

    @property
    def bounds(self) -> DataFrame:
        b = st.st_bounds(self.geometry)
        return self.df.select(
            "*", b.getField("minx").alias("minx"),
            b.getField("miny").alias("miny"),
            b.getField("maxx").alias("maxx"),
            b.getField("maxy").alias("maxy"))

    def total_bounds(self) -> tuple:
        """base.py:4703 — plain agg, no UDF beyond bounds."""
        b = self.df.select(st.st_bounds(self.geometry).alias("b"))
        r = b.agg(F.min("b.minx"), F.min("b.miny"),
                  F.max("b.maxx"), F.max("b.maxy")).collect()[0]
        return tuple(r)

    @property
    def geom_type(self) -> DataFrame:
        return self._scalar("geom_type", st.st_geometry_type(self.geometry))

    @property
    def is_valid(self) -> DataFrame:
        return self._scalar("is_valid", st.st_is_valid(self.geometry))

    @property
    def is_empty(self) -> DataFrame:
        return self._scalar("is_empty", st.st_is_empty(self.geometry))

    # -- constructive (base.py §2.3): return a new GeoFrame ----------------
    def buffer(self, distance: float, quad_segs: int = 8,
               cap_style: str = "round", join_style: str = "round",
               mitre_limit: float = 5.0,
               resolution: int | None = None,
               single_sided: bool = False) -> "GeoFrame":
        return self._with_geom(st.st_buffer(
            self.geometry, distance, quad_segs, cap_style=cap_style,
            join_style=join_style, mitre_limit=mitre_limit,
            resolution=resolution, single_sided=single_sided))

    def simplify(self, tolerance: float,
                 preserve_topology: bool = True) -> "GeoFrame":
        return self._with_geom(st.st_simplify(
            self.geometry, tolerance, preserve_topology=preserve_topology))

    def centroid(self) -> "GeoFrame":
        return self._with_geom(st.st_centroid(self.geometry))

    def convex_hull(self) -> "GeoFrame":
        return self._with_geom(st.st_convex_hull(self.geometry))

    def concave_hull(self, ratio: float = 0.0, allow_holes: bool = False) -> "GeoFrame":
        return self._with_geom(st.st_concave_hull(self.geometry, ratio, allow_holes))

    def envelope(self) -> "GeoFrame":
        return self._with_geom(st.st_envelope(self.geometry))

    def boundary(self) -> "GeoFrame":
        return self._with_geom(st.st_boundary(self.geometry))

    def normalize(self) -> "GeoFrame":
        return self._with_geom(st.st_normalize(self.geometry))

    def segmentize(self, max_segment_length: float) -> "GeoFrame":
        return self._with_geom(st.st_segmentize(self.geometry, max_segment_length))

    def offset_curve(self, distance: float, quad_segs: int = 8,
                     join_style: str = "round",
                     mitre_limit: float = 5.0) -> "GeoFrame":
        return self._with_geom(st.st_offset_curve(
            self.geometry, distance, quad_segs, join_style=join_style,
            mitre_limit=mitre_limit))

    def affine_transform(self, matrix) -> "GeoFrame":
        return self._with_geom(st.st_affine(self.geometry, matrix))

    def translate(self, xoff: float = 0.0, yoff: float = 0.0) -> "GeoFrame":
        return self._with_geom(st.st_translate(self.geometry, xoff, yoff))

    def rotate(self, angle: float, origin="center", use_radians: bool = False) -> "GeoFrame":
        return self._with_geom(st.st_rotate(self.geometry, angle, origin, use_radians))

    def scale(self, xfact: float = 1.0, yfact: float = 1.0, origin="center") -> "GeoFrame":
        return self._with_geom(st.st_scale(self.geometry, xfact, yfact, origin))

    def make_valid(self) -> "GeoFrame":
        """base.py:1641 — repair invalid polygonal rows (geom/validity)."""
        return self._with_geom(st.st_make_valid(self.geometry))

    def skew(self, xs: float = 0.0, ys: float = 0.0, origin="center",
             use_radians: bool = False) -> "GeoFrame":
        return self._with_geom(
            st.st_skew(self.geometry, xs, ys, origin, use_radians))

    def transform(self, fn, include_z: bool = False) -> "GeoFrame":
        """base.py:1751 — arbitrary coordinate function (Arrow-blockwise)."""
        return self._with_geom(
            st.st_transform_fn(self.geometry, fn, include_z))

    def to_crs(self, crs) -> "GeoFrame":
        """geoseries.py:878 — requires a crs set via set_crs/__init__."""
        if self.crs is None:
            raise ValueError("GeoFrame has no crs; call set_crs first")
        out = self._with_geom(st.st_transform(self.geometry, self.crs, crs))
        out.crs = str(crs)
        return out

    def estimate_utm_crs(self) -> str:
        """array.py:456 — UTM EPSG of the frame's total-bounds center
        (pyproj-free zone math; one tiny agg job)."""
        from .geom.crs import estimate_utm_crs as _est

        minx, miny, maxx, maxy = self.total_bounds()
        return f"EPSG:{_est(minx, miny, maxx, maxy, self.crs or 4326)}"

    def sample_points(self, size: int, seed: int = 0, row_key=None) -> "GeoFrame":
        return self._with_geom(st.st_sample_points(self.geometry, size, seed, row_key))

    # -- joins / set operators ----------------------------------------------
    def sjoin(self, other: "GeoFrame", how: str = "inner",
              predicate: str = "intersects", **kw) -> "GeoFrame":
        from .operators.sjoin import sjoin as _sjoin

        out = _sjoin(self.df, other.df, how=how, predicate=predicate,
                     left_geom=self.geometry, right_geom=other.geometry, **kw)
        geom = self.geometry if how in ("inner", "left") else other.geometry
        return GeoFrame(out, geom, self.crs)

    def sjoin_nearest(self, other: "GeoFrame", **kw) -> "GeoFrame":
        from .operators.nearest import sjoin_nearest as _nearest

        out = _nearest(self.df, other.df, left_geom=self.geometry,
                       right_geom=other.geometry, **kw)
        return GeoFrame(out, self.geometry, self.crs)

    def overlay(self, other: "GeoFrame", how: str = "intersection", **kw) -> "GeoFrame":
        from .operators.overlay import overlay as _overlay

        if other.geometry != self.geometry:
            other = GeoFrame(
                other.df.withColumnRenamed(other.geometry, self.geometry),
                self.geometry, other.crs)
        out = _overlay(self.df, other.df, how=how, geom=self.geometry, **kw)
        return GeoFrame(out, self.geometry, self.crs)

    def clip(self, mask, **kw) -> "GeoFrame":
        from .operators.clip import clip as _clip

        return self._wrap(_clip(self.df, mask, geom=self.geometry, **kw))

    @property
    def cx(self) -> "_CxIndexer":
        """Coordinate-slice indexer (base.py:5513-5548):
        ``gf.cx[xmin:xmax, ymin:ymax]`` keeps rows whose bbox intersects
        the window. Open sides (``:``) are unbounded. Pure-SQL pushdown
        when a covering ``bbox`` struct column exists (operators/clip.py).
        """
        return _CxIndexer(self)

    def dissolve(self, by=None, aggfunc="first", **kw) -> "GeoFrame":
        from .operators.dissolve import dissolve as _dissolve

        return self._wrap(_dissolve(self.df, by=by, aggfunc=aggfunc,
                                    geom=self.geometry, **kw))

    def explode(self, **kw) -> "GeoFrame":
        from .operators.explode import explode as _explode

        return self._wrap(_explode(self.df, geom=self.geometry, **kw))

    def to_tiles(self, zoom: int, **kw) -> "GeoFrame":
        from .operators.tiles import to_tiles as _tiles

        return self._wrap(_tiles(self.df, zoom, geom=self.geometry, **kw))

    def get_coordinates(self, id_cols=None) -> DataFrame:
        return st.st_get_coordinates_exploded(self.df, self.geometry, id_cols)

    def representative_point(self) -> "GeoFrame":
        return self._with_geom(st.st_representative_point(self.geometry))

    def union_all(self, method: str = "unary"):
        """geoseries.py:684 — one WKB scalar: the union of every row."""
        from .operators.dissolve import union_all as _ua

        return _ua(self.df, geom=self.geometry, method=method)

    def distance(self, other) -> DataFrame:
        """base.py:2920 — row-wise distance to a column/expression."""
        return self._scalar("distance",
                            st.st_distance(self.geometry, other))

    @property
    def to_wkt(self) -> DataFrame:
        """geoseries.py:1161 — non-geometry columns + WKT text column."""
        rest = [c for c in self.df.columns if c != self.geometry]
        return self.df.select(
            *rest, st.st_astext(self.geometry).alias(self.geometry))

    # -- I/O -----------------------------------------------------------------
    def to_feather(self, path: str, **kw) -> dict:
        from .sources.feather import write_feather

        return write_feather(self.df, path, geom=self.geometry,
                             crs=self.crs, **kw)

    def to_geoparquet(self, path: str, **kw) -> dict:
        from .sources.geoparquet import write_geoparquet

        return write_geoparquet(self.df, path, geom=self.geometry,
                                crs=self.crs, **kw)

    def to_geoparquet_partitioned(self, path: str, cell_res: int = 4,
                                  **kw) -> dict:
        from .sources.geoparquet import write_geoparquet_partitioned

        return write_geoparquet_partitioned(
            self.df, path, geom=self.geometry, crs=self.crs,
            cell_res=cell_res, **kw)

    def to_arrow(self, geometry_encoding: str = "WKB"):
        """geodataframe.py:786 — pyarrow Table with GeoArrow metadata."""
        from .sources.geoarrow import to_arrow as _to_arrow

        return _to_arrow(self.df, self.geometry, geometry_encoding, self.crs)

    @classmethod
    def from_arrow(cls, spark, table) -> "GeoFrame":
        """geodataframe.py:540 — build from a GeoArrow-tagged table."""
        from .sources.geoarrow import from_arrow as _from_arrow

        df, geom, crs = _from_arrow(spark, table)
        return cls(df, geom or "geometry", crs)

    def to_features(self) -> DataFrame:
        from .sources.geojson import to_features

        return to_features(self.df, self.geometry)

    def to_file(self, path: str, **kw) -> None:
        """geodataframe.py:1215 / io/file.py:159 — format by extension
        (.shp/.gpkg/.geojson/.geojsonl/.csv/.parquet/.feather)."""
        from .sources.file import to_file as _to_file

        _to_file(self.df, path, geom=self.geometry, **kw)

    def to_postgis(self, name: str, conn_factory, **kw) -> None:
        """geodataframe.py to_postgis / io/sql.py:242 — executor-side
        batched DB-API inserts; see sources/sql.py for the scale shape."""
        from .sources.sql import to_postgis as _to_pg

        _to_pg(self.df, name, conn_factory, geom_col=self.geometry, **kw)

    def plot(self, column: str | None = None, **kw):
        """geodataframe plot (plotting.py:207) — distributed pixel
        render -> PNG bytes; see operators/render.py."""
        from .operators.render import plot as _plot

        return _plot(self.df, column, geom=self.geometry, **kw)

    def explore(self, path: str, column: str | None = None, **kw) -> str:
        """geodataframe explore (explore.py:15) — self-contained HTML
        pan/zoom viewer over the distributed render."""
        from .operators.render import explore as _explore

        return _explore(self.df, path, column, geom=self.geometry, **kw)

    # -- passthrough ----------------------------------------------------------
    def filter(self, cond) -> "GeoFrame":
        return self._wrap(self.df.filter(cond))

    def select(self, *cols) -> DataFrame:
        return self.df.select(*cols)

    def count(self) -> int:
        return self.df.count()

    @property
    def columns(self):
        return self.df.columns


def read_geoparquet(spark, path: str) -> GeoFrame:
    from .sources.geoparquet import read_geoparquet as _read

    df, meta = _read(spark, path)
    geom = (meta or {}).get("primary_column", "geometry")
    crs = None
    if meta:
        crs = meta.get("columns", {}).get(geom, {}).get("crs")
    return GeoFrame(df, geom, crs)


def read_file(spark, path: str, **kw) -> GeoFrame:
    """geopandas.read_file (io/file.py:50) — format by extension, incl.
    zipped shapefiles; returns a GeoFrame over the WKB geometry."""
    from .sources.file import read_file as _read

    return GeoFrame(_read(spark, path, **kw), kw.get("geom", "geometry"))


def read_postgis(spark, sql: str, conn_factory, geom_col: str = "geom",
                 **kw) -> GeoFrame:
    """geopandas.read_postgis (io/sql.py:78) — distributed partitioned
    DB read; geometry lands as canonical ISO WKB, CRS from EWKB SRID."""
    from .sources.sql import read_postgis as _read_pg

    df = _read_pg(spark, sql, conn_factory, geom_col=geom_col, **kw)
    return GeoFrame(df, geom_col, getattr(df, "_gps_crs", None))


class _CxIndexer:
    """``gf.cx[xmin:xmax, ymin:ymax]`` — reference _CoordinateIndexer
    (base.py:5845-5866). Slices only; steps are rejected."""

    def __init__(self, gf: GeoFrame):
        self._gf = gf

    def __getitem__(self, key) -> GeoFrame:
        from .operators.clip import cx_filter

        if not (isinstance(key, tuple) and len(key) == 2
                and all(isinstance(s, slice) for s in key)):
            raise TypeError("cx expects [xmin:xmax, ymin:ymax] slices")
        xs, ys = key
        if xs.step is not None or ys.step is not None:
            raise TypeError("cx slices do not support a step")
        gf = self._gf
        return gf._wrap(cx_filter(
            gf.df, (xs.start, ys.start, xs.stop, ys.stop), geom=gf.geometry))
