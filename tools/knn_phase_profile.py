"""Phase-split profile of the broadcast kNN scaling job.

Times (a) the eager driver-side portion of sjoin_nearest (stats agg job +
Arrow collect + index build + broadcast) and (b) the probe execution
(mapInPandas + count), at one parallelism level.  Run:

    python tools/knn_phase_profile.py <cpus> [n_points]
"""
import os
import sys
import time

os.environ.setdefault("MALLOC_MMAP_MAX_", "0")
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "-1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 8
N_PTS = int(sys.argv[2]) if len(sys.argv) > 2 else 16_000_000
N_RECTS = 200_000

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName(f"knn-phase-{CPUS}")
    .config("spark.sql.shuffle.partitions", str(max(2 * CPUS, 16)))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
    .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
from scaling_bench import _build_inputs  # noqa: E402

from geopandas_spark.functions.st import st_point  # noqa: E402
import geopandas_spark.operators.nearest as NN  # noqa: E402

pts, rects = _build_inputs(spark, N_PTS, N_RECTS)
pts = pts.persist()
centers = rects.select(
    "rid", st_point(F.col("minx") + F.col("side") / 2,
                    F.col("miny") + F.col("side") / 2).alias("geometry")
).persist()
pts.count()
centers.count()

PH = {}
_orig_collect = NN._collect_knn_build


def timed_collect(*a, **k):
    t0 = time.time()
    r = _orig_collect(*a, **k)
    PH["collect_build"] = time.time() - t0
    return r


NN._collect_knn_build = timed_collect


def run():
    PH.clear()
    t0 = time.time()
    j = NN.sjoin_nearest(pts, centers, how="inner", left_id="pid",
                         right_id="rid")
    t1 = time.time()
    n = j.count()
    t2 = time.time()
    return {"rows": n, "driver_side": round(t1 - t0, 3),
            "collect_build": round(PH.get("collect_build", 0.0), 3),
            "stats_plus_plan": round(t1 - t0 - PH.get("collect_build", 0), 3),
            "probe_count": round(t2 - t1, 3), "total": round(t2 - t0, 3)}


print("warmup:", run(), flush=True)
for i in range(2):
    print(f"pass{i}:", run(), flush=True)
spark.stop()
