"""Benchmark harness — prints ONE JSON line with per-query seconds.

Runs the headline engine queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default 32).

Headline metric (BASELINE.json): spatial-join rows/sec of the flagship
sjoin (points x rects, intersects, cell join + exact refine). The north
rule's two-cluster-size scaling evidence lives in BENCH/BASELINE.md
(same job at local[8] vs local[32]); run `python bench.py --cpus 8` to
reproduce one side.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if "--cpus" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--cpus") + 1])
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("geopandas-spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(2 * cpus, 16)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    qs = E.queries()
    headline = [
        "sjoin_points_in_rects",
        "sjoin_count_by_rect",
        "sjoin_nearest_center",
        "dissolve_nation_bounds",
        "overlay_rect_intersection",
        "tile_assignment",
        "clip_window_area",
        "morton_cells",
        "hilbert_keys",
        "exact_dedup_docs",
        "minhash_near_dups",
        "cosine_topk",
    ]
    # warm the JVM + python workers once (tiny query, not timed)
    qs["morton_cells"](spark, sf_dir).count()

    times: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in headline:
        t0 = time.time()
        n = qs[name](spark, sf_dir).count()
        times[name] = round(time.time() - t0, 3)
        rows[name] = n

    flagship_rows = rows["sjoin_points_in_rects"]
    flagship_sec = max(times["sjoin_points_in_rects"], 1e-9)
    total = round(sum(times.values()), 3)
    out = {
        "metric": "sjoin_rows_per_sec",
        "value": round(flagship_rows / flagship_sec, 1),
        "unit": "rows/sec",
        "total_sec": total,
        "cpus": cpus,
        "queries": times,
        "rows": rows,
        "sf": sf,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
