"""Checkpointed pipeline with per-partition lineage (north rule:
"resumable from checkpoint with per-partition lineage + metrics").

Each stage writes its output as parquet under ``workdir/<stage>/data``
plus a ``meta.json`` carrying the stage *fingerprint* — a content hash of
(stage name, params, input fingerprints). Re-running a pipeline skips any
stage whose fingerprint matches what's on disk (idempotent resume: a
killed run re-executes only unfinished stages). Lineage rows — one per
output file/partition with row counts and wall time — append to
``workdir/_lineage`` so every byte of output traces to (stage, fingerprint,
partition).

This is the parquet-backed analogue of the Iceberg snapshot + metadata
design in SURVEY.md §3 EP3 (no Iceberg runtime in this environment; the
layout keeps the same idempotence contract: content-addressed stage
outputs keyed by input fingerprints).
"""

from __future__ import annotations

import hashlib
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _fingerprint(*parts: str) -> str:
    h = hashlib.sha256()
    for p in parts:
        h.update(p.encode())
        h.update(b"\x00")
    return h.hexdigest()[:24]


class Pipeline:
    def __init__(self, spark: SparkSession, workdir: str, name: str = "pipeline"):
        self.spark = spark
        self.workdir = workdir
        self.name = name
        self._fps: dict[str, str] = {}
        os.makedirs(workdir, exist_ok=True)

    # ------------------------------------------------------------------
    def _stage_dir(self, stage: str) -> str:
        return os.path.join(self.workdir, stage)

    def _meta_path(self, stage: str) -> str:
        return os.path.join(self._stage_dir(stage), "meta.json")

    def stage(
        self,
        stage: str,
        fn,
        inputs: list[str] | None = None,
        params: dict | None = None,
        partition_by: list[str] | None = None,
    ) -> DataFrame:
        """Run (or resume) one stage.

        fn(spark, {input_stage: DataFrame}) -> DataFrame. ``inputs`` name
        previously-run stages; their fingerprints feed this stage's.
        """
        inputs = inputs or []
        params = params or {}
        fp = _fingerprint(
            self.name, stage, json.dumps(params, sort_keys=True, default=str),
            # the output layout is part of the stage identity: a resume
            # must not return an unpartitioned parquet when the caller
            # now asks for partition_by (round-4 review fix)
            json.dumps(partition_by or []),
            *[self._fps[i] for i in inputs],
        )
        sdir = self._stage_dir(stage)
        data_dir = os.path.join(sdir, "data")
        meta_path = self._meta_path(stage)
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            if meta.get("fingerprint") == fp and os.path.exists(
                os.path.join(data_dir, "_SUCCESS")
            ):
                self._fps[stage] = fp
                return self.spark.read.parquet(data_dir)
        # (re)run. Invalidate the old meta FIRST: the data write below
        # overwrites data_dir, and a crash between that write and the
        # new meta write must not leave the previous fingerprint paired
        # with the new data (a later resume under the old params would
        # silently return the wrong stage output — round-4 review fix).
        if os.path.exists(meta_path):
            os.remove(meta_path)
        t0 = time.time()
        in_dfs = {i: self.spark.read.parquet(os.path.join(self._stage_dir(i), "data"))
                  for i in inputs}
        df = fn(self.spark, in_dfs)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(data_dir)
        wall = time.time() - t0
        # lineage: per-output-file row counts (the parquet file is the
        # partition unit a resume would re-read)
        out = self.spark.read.parquet(data_dir)
        lineage = (
            out.groupBy(F.input_file_name().alias("file"))
            .count()
            .withColumn("stage", F.lit(stage))
            .withColumn("pipeline", F.lit(self.name))
            .withColumn("fingerprint", F.lit(fp))
            .withColumn("wall_sec", F.lit(float(wall)))
            .withColumn("ts", F.current_timestamp())
        )
        lin_rows = lineage.collect()
        self.spark.createDataFrame(lin_rows, lineage.schema).write.mode(
            "append").parquet(os.path.join(self.workdir, "_lineage"))
        # row total from the already-collected lineage rows: out.count()
        # here would re-scan the full stage output a second time
        with open(meta_path, "w") as f:
            json.dump(
                {"fingerprint": fp, "stage": stage, "inputs": inputs,
                 "params": params, "wall_sec": wall,
                 "rows": int(sum(r["count"] for r in lin_rows))},
                f, indent=2,
            )
        self._fps[stage] = fp
        return out

    def lineage(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.workdir, "_lineage"))
