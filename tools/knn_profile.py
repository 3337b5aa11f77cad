"""Per-stage attribution of the sjoin_nearest serial residue (VERDICT r3
item 1): run the scaling-bench kNN job once with the Spark event log on,
then decompose wall-clock into

  * per-stage EXECUTOR time (runTime, shuffle read/write block time, GC)
  * per-job DRIVER gaps (time between job end and next job start —
    plan compilation, localCheckpoint RDD materialization setup,
    driver-side collects, Python driver work)

The north-rule miss is a ratio (2->8 = 0.35), so anything that shows up
here as a constant independent of core count is the target list.

Usage:
  python tools/knn_profile.py --cpus 8 [--n-points 4000000 --n-rects 200000]
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("MALLOC_MMAP_MAX_", "0")
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "-1")
os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "system")

_M32 = 4294967296
_HA, _HB = 2654435761, 2246822519


def build(spark, n_points, n_rects):
    from pyspark.sql import functions as F

    from geopandas_spark.functions.st import st_point

    ids = spark.range(n_points).withColumnRenamed("id", "pid")
    pts = (
        ids.withColumn("x", (F.col("pid") + 1) * _HA % F.lit(_M32) / F.lit(float(_M32)))
        .withColumn("y", (F.col("pid") + 1) * _HB % F.lit(_M32) / F.lit(float(_M32)))
        .withColumn("geometry", st_point("x", "y"))
        .select("pid", "geometry")
    )
    rids = spark.range(n_rects).withColumnRenamed("id", "rid")
    centers = (
        rids.withColumn("minx", (F.col("rid") + 1) * _HA % F.lit(_M32) / F.lit(float(_M32)) * 0.98)
        .withColumn("miny", (F.col("rid") + 1) * _HB % F.lit(_M32) / F.lit(float(_M32)) * 0.98)
        .withColumn("side", F.lit(0.004) + (F.col("rid") % 16) * F.lit(0.0008))
        .select("rid", st_point(F.col("minx") + F.col("side") / 2,
                                F.col("miny") + F.col("side") / 2).alias("geometry"))
    )
    return pts.persist(), centers.persist()


def _eventlog_lines(path):
    # Spark 4 writes a rolling dir (eventlog_v2_<app>/events_*), zstd-
    # compressed by default; older layouts write a single file
    files = (sorted(glob.glob(os.path.join(path, "events*")))
             if os.path.isdir(path) else [path])
    for p in files:
        if p.endswith(".zstd"):
            import subprocess

            out = subprocess.run(["zstd", "-d", "-c", p],
                                 capture_output=True).stdout
            yield from out.decode().splitlines()
        else:
            opener = gzip.open if p.endswith(".gz") else open
            with opener(p, "rt") as f:
                yield from f


def parse_eventlog(path):
    jobs = {}       # jobId -> dict
    stages = {}     # stageId -> dict
    if True:
        for line in _eventlog_lines(path):
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            ev = e.get("Event")
            if ev == "SparkListenerJobStart":
                jobs[e["Job ID"]] = {
                    "start": e["Submission Time"],
                    "stages": [s["Stage ID"] for s in e.get("Stage Infos", [])],
                    "desc": (e.get("Properties") or {}).get(
                        "spark.job.description", ""),
                }
            elif ev == "SparkListenerJobEnd":
                if e["Job ID"] in jobs:
                    jobs[e["Job ID"]]["end"] = e["Completion Time"]
            elif ev == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                s = stages.setdefault(si["Stage ID"], {
                    "run_ms": 0, "gc_ms": 0, "shuf_w_ms": 0,
                    "fetch_wait_ms": 0, "ser_ms": 0, "deser_ms": 0})
                # merge: TaskEnd events for this stage already accumulated
                s["name"] = si["Stage Name"].split("\n")[0]
                s["tasks"] = si["Number of Tasks"]
                s["start"] = si.get("Submission Time")
                s["end"] = si.get("Completion Time")
            elif ev == "SparkListenerTaskEnd":
                sid = e["Stage ID"]
                m = e.get("Task Metrics") or {}
                if sid not in stages:
                    stages[sid] = {"name": "?", "tasks": 0, "start": None,
                                   "end": None, "run_ms": 0, "gc_ms": 0,
                                   "shuf_w_ms": 0, "fetch_wait_ms": 0,
                                   "ser_ms": 0, "deser_ms": 0}
                s = stages[sid]
                s["run_ms"] += m.get("Executor Run Time", 0)
                s["gc_ms"] += m.get("JVM GC Time", 0)
                s["ser_ms"] += m.get("Result Serialization Time", 0)
                s["deser_ms"] += m.get("Executor Deserialize Time", 0)
                sw = m.get("Shuffle Write Metrics") or {}
                s["shuf_w_ms"] += sw.get("Shuffle Write Time", 0) / 1e6  # ns
                s["w_rec"] = s.get("w_rec", 0) + sw.get("Shuffle Records Written", 0)
                s["w_b"] = s.get("w_b", 0) + sw.get("Shuffle Bytes Written", 0)
                sr = m.get("Shuffle Read Metrics") or {}
                s["fetch_wait_ms"] += sr.get("Fetch Wait Time", 0)
                s["r_rec"] = s.get("r_rec", 0) + sr.get("Total Records Read", 0)
    return jobs, stages


def report(jobs, stages, cpus, window):
    t0, t1 = window
    print(f"\n=== measured window {t1 - t0:.2f}s at local[{cpus}] ===")
    jlist = sorted((j for j in jobs.values()
                    if j.get("end") and j["start"] >= t0 * 1000
                    and j["end"] <= t1 * 1000 + 500),
                   key=lambda j: j["start"])
    if not jlist:
        print("no jobs in window")
        return
    # driver gaps: time not covered by any job
    covered = 0.0
    prev_end = None
    gaps = []
    for j in jlist:
        if prev_end is not None and j["start"] > prev_end:
            gaps.append((prev_end, j["start"]))
        prev_end = max(prev_end or 0, j["end"])
        covered += (j["end"] - j["start"]) / 1000
    head_gap = (jlist[0]["start"] - t0 * 1000) / 1000
    tail_gap = (t1 * 1000 - jlist[-1]["end"]) / 1000
    gap_total = sum((b - a) for a, b in gaps) / 1000 + max(head_gap, 0) + max(tail_gap, 0)
    print(f"jobs: {len(jlist)}  job-covered: {covered:.2f}s  "
          f"driver gaps (incl. head/tail): {gap_total:.2f}s")
    for j in jlist:
        jd = (j["end"] - j["start"]) / 1000
        names = []
        for sid in j["stages"]:
            if sid in stages and stages[sid].get("end"):
                names.append(sid)
        print(f"  job {jd:7.2f}s  stages={names}  desc={j['desc'][:60]!r}")
    print(f"  head gap {head_gap:.2f}s, tail gap {tail_gap:.2f}s, "
          f"inter-job gaps: {[(round((b-a)/1000,2)) for a,b in gaps]}")
    print("\nper-stage executor attribution (stages completed in window):")
    print("  sid  wall_s  tasks  runT_s  gc_s  shufW_s  fetchW_s  deser_s  "
          "wRec  rRec  wMB  name")
    for sid in sorted(stages):
        s = stages[sid]
        if not s.get("end") or not s.get("start"):
            continue
        if s["end"] < t0 * 1000 or s["start"] > t1 * 1000 + 500:
            continue
        wall = (s["end"] - s["start"]) / 1000
        print(f"  {sid:4d} {wall:7.2f} {s['tasks']:6d} {s['run_ms']/1000:7.1f} "
              f"{s['gc_ms']/1000:5.1f} {s['shuf_w_ms']/1000:8.2f} "
              f"{s['fetch_wait_ms']/1000:8.2f} {s['deser_ms']/1000:8.2f} "
              f"{s.get('w_rec',0):9d} {s.get('r_rec',0):9d} "
              f"{s.get('w_b',0)/1e6:7.1f}  {s['name']}")


def main():
    cpus = 8
    n_points, n_rects = 4_000_000, 200_000
    if "--cpus" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--cpus") + 1])
    if "--n-points" in sys.argv:
        n_points = int(sys.argv[sys.argv.index("--n-points") + 1])
    if "--n-rects" in sys.argv:
        n_rects = int(sys.argv[sys.argv.index("--n-rects") + 1])

    evdir = f"/tmp/spark-events-{cpus}-{os.getpid()}"
    os.makedirs(evdir, exist_ok=True)
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"knn-profile-{cpus}")
        .config("spark.sql.shuffle.partitions", str(max(2 * cpus, 16)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", evdir)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from geopandas_spark.operators.nearest import sjoin_nearest

    pts, centers = build(spark, n_points, n_rects)
    pts.count()
    centers.count()

    def run():
        return sjoin_nearest(pts, centers, how="inner", left_id="pid",
                             right_id="rid").count()

    run()  # warmup (page faults, JIT)
    t0 = time.time()
    n = run()
    t1 = time.time()
    print(f"timed pass: {t1 - t0:.2f}s rows={n}")
    spark.stop()
    time.sleep(1)
    logs = sorted(glob.glob(f"{evdir}/*"), key=os.path.getmtime)
    jobs, stages = parse_eventlog(logs[-1])
    report(jobs, stages, cpus, (t0, t1))
    if "--keep" not in sys.argv:
        shutil.rmtree(evdir, ignore_errors=True)
    else:
        print(f"event log kept at {evdir}")


if __name__ == "__main__":
    main()
