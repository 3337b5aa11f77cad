"""Interleaved text+media documents: synthesizer + geometry extraction.

BASELINE.json input_hint — the engine's primary input table:

    doc_id : string
    spans  : array<struct<kind:string, text:string,
                          media_ref:string, offset:int>>

``kind`` in {'text','media'}; text spans may carry WKT geometry literals;
media spans reference tiles/images by ref. Per-row invariant (north rule):
every pipeline output that carries ``spans`` must preserve span-sequence
equality (kind, text, media_ref, order) — the engine NEVER disassembles
the spans column; derived geometry/cells columns ride alongside
(SURVEY.md §1.4).

The synthesizer is fully deterministic (seeded per doc_id), generated
distributed via mapInPandas over spark.range — no driver-side data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

SPAN_SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)

_PROSE = [
    "the quick brown fox", "lorem ipsum dolor sit amet", "data at scale",
    "a tale of two tables", "shuffle less, prune more", "vectorize the batch",
]


def _gen_rows(df_iter, seed: int):
    for pdf in df_iter:
        out_docs = []
        out_spans = []
        for doc_idx in pdf["id"].to_numpy():
            rng = np.random.default_rng(seed * 1_000_003 + int(doc_idx))
            n_spans = int(rng.integers(1, 9))
            has_geom = rng.random() < 0.6
            spans = []
            geom_slot = int(rng.integers(0, n_spans)) if has_geom else -1
            for k in range(n_spans):
                kind = "media" if rng.random() < 0.25 and k != geom_slot else "text"
                if kind == "media":
                    z = int(rng.integers(0, 8))
                    xt = int(rng.integers(0, 1 << z))
                    yt = int(rng.integers(0, 1 << z))
                    spans.append(
                        {"kind": "media", "text": None,
                         "media_ref": f"tile://{z}/{xt}/{yt}", "offset": k}
                    )
                    continue
                if k == geom_slot:
                    r = rng.random()
                    if r < 0.7:
                        x, y = rng.random(), rng.random()
                        wkt = f"POINT ({x:.9f} {y:.9f})"
                    elif r < 0.9:
                        cx, cy = rng.random() * 0.9, rng.random() * 0.9
                        s = rng.random() * 0.05 + 0.005
                        wkt = (f"POLYGON (({cx:.9f} {cy:.9f}, {cx+s:.9f} {cy:.9f}, "
                               f"{cx+s:.9f} {cy+s:.9f}, {cx:.9f} {cy+s:.9f}, "
                               f"{cx:.9f} {cy:.9f}))")
                    else:
                        x0, y0 = rng.random() * 0.9, rng.random() * 0.9
                        x1, y1 = x0 + rng.random() * 0.1, y0 + rng.random() * 0.1
                        wkt = f"LINESTRING ({x0:.9f} {y0:.9f}, {x1:.9f} {y1:.9f})"
                    spans.append({"kind": "text", "text": wkt,
                                  "media_ref": None, "offset": k})
                else:
                    spans.append({
                        "kind": "text",
                        "text": _PROSE[int(rng.integers(0, len(_PROSE)))],
                        "media_ref": None, "offset": k,
                    })
            out_docs.append(f"doc-{int(doc_idx):012d}")
            out_spans.append(spans)
        yield pd.DataFrame({"doc_id": out_docs, "spans": out_spans})


def synthesize_documents(spark: SparkSession, n_docs: int, seed: int = 42,
                         partitions: int | None = None) -> DataFrame:
    """Deterministic interleaved-documents table, generated distributed."""
    base = spark.range(0, n_docs, 1, partitions or max(4, n_docs // 50_000))
    return base.mapInPandas(lambda it: _gen_rows(it, seed), schema=SPAN_SCHEMA)


_WKT_HEAD = ("POINT", "LINESTRING", "POLYGON", "MULTIPOINT",
             "MULTILINESTRING", "MULTIPOLYGON", "GEOMETRYCOLLECTION")


def with_geometry(docs: DataFrame, geom_col: str = "geometry") -> DataFrame:
    """Derive a WKB geometry column from the first WKT text span — the
    spans column itself is untouched (span-sequence invariant)."""

    @pandas_udf("binary")
    def _extract(spans: pd.Series) -> pd.Series:
        from ..geom.wkb import to_wkb
        from ..geom.wkt import from_wkt

        texts = []
        for arr in spans:
            wkt = None
            if arr is not None:
                for sp in arr:
                    t = sp["text"]
                    if (sp["kind"] == "text" and t
                            and t.lstrip().upper().startswith(_WKT_HEAD)):
                        wkt = t
                        break
            texts.append(wkt)
        return pd.Series(list(to_wkb(from_wkt(texts, on_invalid="ignore"))))

    return docs.withColumn(geom_col, _extract(F.col("spans")))


def explode_geometries(docs: DataFrame, geom_col: str = "geometry") -> DataFrame:
    """One row per geometry-bearing span: (doc_id, span_pos, geometry WKB).
    Spans stay intact on the source table; this is a derived view."""
    posed = docs.select(
        "doc_id", F.posexplode("spans").alias("span_pos", "span")
    ).filter(
        (F.col("span.kind") == "text")
        & F.col("span.text").rlike(r"^\s*(POINT|LINESTRING|POLYGON|MULTI|GEOMETRYCOLLECTION)")
    )
    from ..functions.st import st_geomfromtext

    return posed.select(
        "doc_id", "span_pos",
        st_geomfromtext(F.col("span.text"), on_invalid="ignore").alias(geom_col),
    ).filter(F.col(geom_col).isNotNull())


def span_serial_fingerprint(spans_col: str = "spans"):
    """Column: md5 of the canonical span serialization — '|'-joined
    'kind#text#media_ref#offset' with nulls coalesced to ''. Unlike
    ``span_fingerprint`` (xxhash64 over to_json, Spark-only), this form
    is mirrorable in plain SQL (md5 + concat exist in any engine), so it
    is the invariant column the driver oracle checks. Single source of
    truth for the gate query, the scaling bench, and the streaming
    parity test."""
    return F.md5(F.concat_ws("|", F.transform(spans_col, lambda s: F.concat_ws(
        "#", s["kind"], F.coalesce(s["text"], F.lit("")),
        F.coalesce(s["media_ref"], F.lit("")), s["offset"].cast("string")))))


def span_fingerprint(docs: DataFrame, out_col: str = "span_fp") -> DataFrame:
    """Order-sensitive fingerprint of (kind, text, media_ref, offset) per
    row — the per-row invariant check column (north rule). Pure Catalyst
    (to_json preserves array order), no UDF."""
    return docs.withColumn(
        out_col,
        F.xxhash64(F.to_json(F.struct(F.col("spans")))),
    )


def assert_spans_preserved(input_docs: DataFrame, output_docs: DataFrame,
                           key: str = "doc_id") -> int:
    """Joins output to input on `key` and counts rows whose span sequence
    changed; returns that count (0 == invariant holds)."""
    a = span_fingerprint(input_docs).select(key, F.col("span_fp").alias("__fp_in"))
    b = span_fingerprint(output_docs).select(key, F.col("span_fp").alias("__fp_out"))
    return (
        a.join(b, on=key, how="inner")
        .filter(F.col("__fp_in") != F.col("__fp_out"))
        .count()
    )
