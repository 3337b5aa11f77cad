"""Ad-hoc kNN phase profiler (not part of the graded surface).

Times the sjoin_nearest sub-phases at a given parallelism on the
scaling-bench synthetic input so stage-level regressions are visible
without the Spark UI.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_POINTS = int(os.environ.get("SCALING_N_POINTS", "1000000"))
N_RECTS = int(os.environ.get("SCALING_N_RECTS", "100000"))
CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 32


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("knn-profile")
        .config("spark.sql.shuffle.partitions", str(max(2 * CPUS, 16)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from tools.scaling_bench import _build_inputs
    from geopandas_spark.functions.st import st_point

    pts, rects = _build_inputs(spark, N_POINTS, N_RECTS)
    centers = rects.select(
        "rid", st_point(F.col("minx") + F.col("side") / 2,
                        F.col("miny") + F.col("side") / 2).alias("geometry"))
    pts = pts.persist(); pts.count()
    centers = centers.persist(); centers.count()

    from pyspark.sql.functions import pandas_udf
    from geopandas_spark.operators import nearest as NN
    from geopandas_spark.operators.sjoin import _prep_side
    from geopandas_spark.functions.st import st_cells_from_bbox
    from geopandas_spark.index.cells import DOMAIN_UNIT, MAX_RES, cell_size

    domain = DOMAIN_UNIT
    t0 = time.time()
    left, lid = _prep_side(pts, "geometry", "pid", "l")
    right, rid = _prep_side(centers, "geometry", "rid", "r")
    n_right = right.count()
    resolution = int(np.clip(int(np.ceil(np.log2(max(n_right / 8.0, 1)) / 2)), 1, MAX_RES))
    min_cell = min(cell_size(resolution, domain))
    print(f"prep: {time.time()-t0:.1f}s res={resolution} min_cell={min_cell:.5f}", flush=True)

    rcells = st_cells_from_bbox("__bb.minx", "__bb.miny", "__bb.maxx", "__bb.maxy", resolution, domain=domain)

    @pandas_udf("long")
    def _mid_cell(minx: pd.Series, miny: pd.Series, maxx: pd.Series, maxy: pd.Series) -> pd.Series:
        from geopandas_spark.index import cells as C
        mx = (minx.to_numpy(np.float64) + maxx.to_numpy(np.float64)) / 2
        my = (miny.to_numpy(np.float64) + maxy.to_numpy(np.float64)) / 2
        miss = np.isnan(mx)
        ids = C.point_cell(np.nan_to_num(mx), np.nan_to_num(my), resolution, domain)
        return pd.Series(np.where(miss, None, ids))

    lbase = left.select(
        F.col(lid).alias("__xlid"), F.col("geometry").alias("__lgeom"),
        _mid_cell("__bb.minx", "__bb.miny", "__bb.maxx", "__bb.maxy").alias("__cell0"),
        (F.greatest(F.col("__bb.maxx") - F.col("__bb.minx"),
                    F.col("__bb.maxy") - F.col("__bb.miny")) / 2).alias("__lrad"),
    ).filter(F.col("__cell0").isNotNull())

    rrep = right.select(
        F.col(rid).alias("__rid"), F.col("geometry").alias("__geom"),
        F.explode(NN._cover_disk_udf()(rcells)).alias("__cell"),
    ).withColumn("__side", F.lit(0))
    ltag = lbase.select(
        F.col("__xlid").alias("__lid"), F.col("__lgeom").alias("__geom"),
        F.col("__cell0").alias("__cell"), "__lrad",
    ).withColumn("__side", F.lit(1))

    t0 = time.time()
    n_rrep = rrep.count()
    print(f"rrep rows: {n_rrep} in {time.time()-t0:.1f}s", flush=True)

    n_parts = max(spark.sparkContext.defaultParallelism * 2, 16)
    tagged = ltag.unionByName(
        rrep.select(F.col("__rid"), "__geom", "__cell", "__side"),
        allowMissingColumns=True,
    ).repartition(n_parts, "__cell").sortWithinPartitions("__cell")
    p1 = tagged.mapInPandas(
        NN._knn_cell_pass(min_cell, None, False),
        schema=("__xlid long, __xrid long, __d double, __ok boolean,"
                " __tgeom binary, __tcell long, __trad double"),
    ).localCheckpoint(eager=False)

    t0 = time.time()
    agg = p1.agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.when(F.col("__ok"), 1).otherwise(0)).alias("nok")).collect()[0]
    print(f"phase1: {time.time()-t0:.1f}s rows={agg['n']} certified={agg['nok']}", flush=True)

    t0 = time.time()
    out = NN.sjoin_nearest(pts, centers, how="inner", left_id="pid", right_id="rid")
    n = out.count()
    print(f"full sjoin_nearest: {time.time()-t0:.1f}s rows={n}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
