"""Geocoding: address text <-> coordinates.

Reference surface: ``geopandas.tools.geocode`` / ``reverse_geocode``
(tools/geocoding.py:8-147), which call geopy's network providers row by
row with rate limiting. A network geocoder is neither available in this
environment nor how a 100 TB pipeline geocodes: at scale you geocode
against a GAZETTEER table (name -> point) with a broadcast join, and
reverse-geocode with a nearest-neighbor spatial join. Both reference
entry points are therefore re-expressed Spark-first:

* ``geocode(df, gazetteer)`` — normalized-key equi-join against the
  gazetteer (broadcast when small), exactly one row out per row in like
  the reference (unmatched -> null geometry, mirrors geopy's None).
* ``reverse_geocode(df, gazetteer)`` — ``sjoin_nearest`` against the
  gazetteer points; returns the nearest entry's address per input point.
* ``provider=`` — API-parity escape hatch: a user callable
  ``fn(list[str]) -> list[(x, y) | None]`` applied per Arrow batch via
  a pandas UDF (the geopy adapter slot; a network-backed callable would
  plug in here outside this sandbox).

Column contract mirrors tools/geocoding.py:56-66: geocode returns the
input columns + ``geometry`` + ``address`` (the matched gazetteer
entry); reverse_geocode returns input + ``address``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..functions.st import st_point


def _norm_key(col):
    """Case/space/punctuation-insensitive join key (the usual gazetteer
    normalization)."""
    return F.trim(F.regexp_replace(F.lower(col), r"[^a-z0-9]+", " "))


def geocode(df: DataFrame, gazetteer: DataFrame | None = None,
            address_col: str = "address", provider=None,
            geom: str = "geometry") -> DataFrame:
    """Address strings -> points (tools/geocoding.py:8-66).

    ``gazetteer`` needs columns (address, x, y) — joined on the
    normalized address, broadcast when Spark's threshold allows. When
    several gazetteer rows normalize to the same key the lexicographically
    first address wins (deterministic). ``provider`` bypasses the
    gazetteer with a user batch callable.
    """
    if provider is not None:
        @pandas_udf("x double, y double")
        def _prov(s: pd.Series) -> pd.DataFrame:
            res = provider(list(s))
            return pd.DataFrame(
                [(None, None) if r is None else (float(r[0]), float(r[1]))
                 for r in res], columns=["x", "y"])

        out = df.withColumn("__xy", _prov(F.col(address_col)))
        return (out.withColumn(
            geom, F.when(F.col("__xy.x").isNotNull(),
                         st_point("__xy.x", "__xy.y")))
            .drop("__xy"))
    if gazetteer is None:
        raise ValueError("geocode needs a gazetteer DataFrame or a "
                         "provider callable (network geopy providers are "
                         "unavailable here; ref tools/geocoding.py:8)")
    from pyspark.sql import Window

    g = (gazetteer.withColumn("__k", _norm_key(F.col("address")))
         .withColumn("__rn", F.row_number().over(
             Window.partitionBy("__k").orderBy("address")))
         .filter(F.col("__rn") == 1)
         .select("__k", F.col("address").alias("__matched"),
                 st_point("x", "y").alias(geom)))
    out = (df.withColumn("__k", _norm_key(F.col(address_col)))
           .join(F.broadcast(g), on="__k", how="left")
           .drop("__k")
           .withColumnRenamed("__matched", "matched_address"))
    return out


def reverse_geocode(df: DataFrame, gazetteer: DataFrame,
                    geom: str = "geometry",
                    max_distance: float | None = None,
                    id_col: str | None = None) -> DataFrame:
    """Points -> nearest gazetteer address (tools/geocoding.py:96-147),
    as a kNN spatial join (k=1, first-by-address tie rule so exactly one
    row out per row in, like the reference)."""
    from .nearest import sjoin_nearest

    left = df if id_col else df.withColumn(
        "__geocode_row", F.monotonically_increasing_id())
    key = id_col or "__geocode_row"
    g = gazetteer.select(F.col("address").alias("rev_address"),
                         st_point("x", "y").alias(geom))
    j = sjoin_nearest(left, g, how="inner", left_id=key,
                      right_id="rev_address", max_distance=max_distance,
                      distance_col="rev_distance")
    # ties -> deterministic single answer (lexicographically first)
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy("index_right")
    j = (j.withColumn("__rn", F.row_number().over(w))
         .filter(F.col("__rn") == 1)
         .withColumnRenamed("index_right", "rev_address")
         .drop("__rn"))
    return j.drop("__geocode_row") if not id_col else j
