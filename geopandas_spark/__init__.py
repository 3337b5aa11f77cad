"""geopandas_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch re-expression of GeoPandas' query semantics
(reference: test-save-commit0/geopandas at /root/reference) on Spark:
geometry travels as WKB in BinaryType columns, kernels are numpy over
Arrow batches (geom/), the global spatial index is a quadtree cell cover
(index/), and joins/aggregations are DataFrame plans (operators/).
"""

from .conf import setup_malloc_env

setup_malloc_env()

__all__ = ["GeoFrame", "read_geoparquet", "read_file", "read_postgis",
           "sjoin", "sjoin_nearest", "overlay", "dissolve", "clip",
           "register_crs", "register_crs_proj", "register_sql_functions"]


def __getattr__(name):  # lazy: keep bare import light
    if name in ("GeoFrame", "read_geoparquet", "read_file", "read_postgis"):
        from . import frame

        return getattr(frame, name)
    if name == "to_postgis":
        from .sources.sql import to_postgis

        return to_postgis
    if name == "register_crs":
        from .geom.crs import register_crs

        return register_crs
    if name == "register_crs_proj":
        from .geom.crs import register_crs_proj

        return register_crs_proj
    if name == "register_sql_functions":
        from .functions.sql_registry import register_sql_functions

        return register_sql_functions
    if name == "sjoin":
        from .operators.sjoin import sjoin

        return sjoin
    if name == "sjoin_nearest":
        from .operators.nearest import sjoin_nearest

        return sjoin_nearest
    if name == "overlay":
        from .operators.overlay import overlay

        return overlay
    if name == "dissolve":
        from .operators.dissolve import dissolve

        return dissolve
    if name == "clip":
        from .operators.clip import clip

        return clip
    raise AttributeError(name)

__version__ = "0.1.0"
