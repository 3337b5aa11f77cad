"""geopandas_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch re-expression of GeoPandas' query semantics
(reference: test-save-commit0/geopandas at /root/reference) on Spark:
geometry travels as WKB in BinaryType columns, kernels are numpy over
Arrow batches (geom/), the global spatial index is a quadtree cell cover
(index/), and joins/aggregations are DataFrame plans (operators/).
"""

from .conf import setup_malloc_env

setup_malloc_env()

__version__ = "0.1.0"
