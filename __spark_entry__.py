"""Driver contract for the spark-graft builder (PySpark target).

Every ``queries()`` entry runs a real engine code path (operators/
functions of geopandas_spark) over the TPC-H-ish tables in
``/root/testdata``; geometry is synthesized deterministically from numeric
columns (FIXTURES.md mapping) so each spatial query has a plain-SQL DuckDB
oracle in ``oracle_sql()``. Column names are aliased identically on both
sides (the driver's compare hashes values after sorting columns by name).

Derivations (identical arithmetic in Spark and DuckDB — integer Knuth
hashing then one IEEE division, so doubles match bit-for-bit):

    point(c):  x = (c_custkey*2654435761 % 2^32) / 2^32
               y = (c_custkey*2246822519 % 2^32) / 2^32
    rect(p):   minx = 0.9 * ((p_partkey*2654435761 % 2^32) / 2^32)
               miny = 0.9 * ((p_partkey*2246822519 % 2^32) / 2^32)
               side = 0.02 + (p_partkey % 10) * 0.005
"""

from __future__ import annotations

import os

# must be set before Spark's python-worker daemon forks (see
# geopandas_spark.conf.setup_malloc_env: lazily-provisioned VM memory makes
# fresh mmap pages ~100x slower than reused heap pages)
os.environ.setdefault("MALLOC_MMAP_MAX_", "0")
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "-1")
os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "system")

from collections.abc import Callable

import pandas  # noqa: F401 — pandas_udf type hints resolve in module scope
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_M32 = 4294967296
_HA, _HB = 2654435761, 2246822519

# ---------------------------------------------------------------------------
# shared derivations


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _x_expr(key: str):
    return (F.col(key) * _HA % F.lit(_M32)) / F.lit(float(_M32))


def _y_expr(key: str):
    return (F.col(key) * _HB % F.lit(_M32)) / F.lit(float(_M32))


def _customer_points(spark, sf_dir) -> DataFrame:
    from geopandas_spark.functions.st import st_point

    c = _load(spark, sf_dir, "customer")
    return (
        c.withColumn("x", _x_expr("c_custkey"))
        .withColumn("y", _y_expr("c_custkey"))
        .withColumn("geometry", st_point("x", "y"))
    )


def _part_rects(spark, sf_dir) -> DataFrame:
    from geopandas_spark.functions.st import st_geomfromtext

    p = _load(spark, sf_dir, "part")
    p = (
        p.withColumn("minx", _x_expr("p_partkey") * 0.9)
        .withColumn("miny", _y_expr("p_partkey") * 0.9)
        .withColumn("side", F.lit(0.02) + (F.col("p_partkey") % 10) * F.lit(0.005))
        .withColumn("maxx", F.col("minx") + F.col("side"))
        .withColumn("maxy", F.col("miny") + F.col("side"))
    )
    wkt = F.concat(
        F.lit("POLYGON (("),
        F.col("minx"), F.lit(" "), F.col("miny"), F.lit(", "),
        F.col("maxx"), F.lit(" "), F.col("miny"), F.lit(", "),
        F.col("maxx"), F.lit(" "), F.col("maxy"), F.lit(", "),
        F.col("minx"), F.lit(" "), F.col("maxy"), F.lit(", "),
        F.col("minx"), F.lit(" "), F.col("miny"), F.lit("))"),
    )
    return p.withColumn("geometry", st_geomfromtext(wkt))


_PT_SQL_X = f"(c_custkey * {_HA} % {_M32}) / {_M32}.0"
_PT_SQL_Y = f"(c_custkey * {_HB} % {_M32}) / {_M32}.0"
_RECT_SQL = f"""
    SELECT p_partkey,
           0.9 * ((p_partkey * {_HA} % {_M32}) / {_M32}.0) AS minx,
           0.9 * ((p_partkey * {_HB} % {_M32}) / {_M32}.0) AS miny,
           0.9 * ((p_partkey * {_HA} % {_M32}) / {_M32}.0)
             + (0.02 + (p_partkey % 10) * 0.005) AS maxx,
           0.9 * ((p_partkey * {_HB} % {_M32}) / {_M32}.0)
             + (0.02 + (p_partkey % 10) * 0.005) AS maxy
    FROM part
"""
_PTS_SQL = f"SELECT c_custkey, {_PT_SQL_X} AS x, {_PT_SQL_Y} AS y FROM customer"


def _star_bbox_sql() -> str:
    """Closed-form SQL for the star polygons' bounding boxes: the radius
    pattern in ``_star_polys`` is fixed across rows, so vertex k sits at
    center + (half * R_k) * (cos_k, sin_k) with R_k, cos_k, sin_k
    compile-time constants. The expressions below replicate the engine's
    float op ORDER (cx + (half*R)*C, left-associative) so the bounds are
    bit-identical, making the bbox-overlap predicate and envelope areas
    exactly reproducible."""
    import math

    xt, yt = [], []
    for k in range(12):
        a = 2 * math.pi * k / 12
        r = 0.7 + 0.3 * ((k * 2654435761 % 7) / 7.0)
        xt.append(f"(c_x + ((h * {r!r}) * ({math.cos(a)!r})))")
        yt.append(f"(c_y + ((h * {r!r}) * ({math.sin(a)!r})))")
    return f"""
        SELECT p_partkey,
               least({', '.join(xt)}) AS bminx,
               greatest({', '.join(xt)}) AS bmaxx,
               least({', '.join(yt)}) AS bminy,
               greatest({', '.join(yt)}) AS bmaxy
        FROM (SELECT p_partkey, (minx + maxx) / 2 AS c_x,
                     (miny + maxy) / 2 AS c_y, (maxx - minx) / 2 AS h
              FROM r)
    """


def _simhash_sql() -> str:
    """Closed-form simhash oracle (generated, like the hilbert bit SQL):
    md5-based 64-bit token hash -> per-bit weighted vote -> signature ->
    brute-force hamming<=3 pairs. Mirrors operators/dedup.py
    simhash_signatures(hash_fn='md5') bit for bit."""
    hv = "CAST(concat('0x', substr(md5(t), 1, 16)) AS UBIGINT)"
    votes = ", ".join(
        f"SUM(CASE WHEN (hv >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(64))
    sig = " | ".join(
        f"(CASE WHEN v{b} > 0 THEN CAST({1 << b} AS UBIGINT) "
        f"ELSE CAST(0 AS UBIGINT) END)"
        for b in range(64))
    return f"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(string_split_regex(lower(trim(text)), '\\s+')) AS t
            FROM documents
            WHERE text IS NOT NULL AND trim(text) <> ''
        ), h AS (
            SELECT doc_id, {hv} AS hv FROM toks WHERE t <> ''
        ), votes AS (
            SELECT doc_id, {votes} FROM h GROUP BY doc_id
        ), sig AS (
            SELECT doc_id, {sig} AS s FROM votes
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(xor(a.s, b.s)) AS BIGINT) AS hamming
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.s, b.s)) <= 3
    """


def _morton_sql(xcol: str, ycol: str, res: int) -> str:
    """Bit-interleave SQL (generated): cell id = (res<<56) | morton(i,j)."""
    n = 1 << res
    i = f"CAST(floor(least({xcol}, 0.9999999999) * {n}) AS BIGINT)"
    j = f"CAST(floor(least({ycol}, 0.9999999999) * {n}) AS BIGINT)"
    bits_i = " | ".join(f"((({i} >> {b}) & 1) << {2 * b})" for b in range(res))
    bits_j = " | ".join(f"((({j} >> {b}) & 1) << {2 * b + 1})" for b in range(res))
    return f"((CAST({res} AS BIGINT) << 56) | ({bits_i}) | ({bits_j}))"


def _hilbert_sql(xcol: str, ycol: str, level: int) -> str:
    """Unrolled Hilbert xy->d (generated SQL) mirroring index/hilbert.py
    (reference tools/hilbert_curve.py:98-108): discretize to a
    (2^level - 1) grid, then `level` rotate-and-accumulate steps, each a
    pure bit/CASE expression DuckDB evaluates exactly in int64."""
    n = (1 << level) - 1
    sql = (f"SELECT c_custkey, "
           f"CAST(floor({xcol} * {n}) AS BIGINT) AS hx, "
           f"CAST(floor({ycol} * {n}) AS BIGINT) AS hy, "
           f"CAST(0 AS BIGINT) AS hd FROM pts")
    for step in range(level):
        s = 1 << (level - 1 - step)
        rxy = (f"CASE WHEN (hy & {s}) > 0 THEN "
               f"(CASE WHEN (hx & {s}) > 0 THEN 2 ELSE 1 END) "
               f"ELSE (CASE WHEN (hx & {s}) > 0 THEN 3 ELSE 0 END) END")
        nx = (f"CASE WHEN (hy & {s}) > 0 THEN hx "
              f"WHEN (hx & {s}) > 0 THEN {s - 1} - hy ELSE hy END")
        ny = (f"CASE WHEN (hy & {s}) > 0 THEN hy "
              f"WHEN (hx & {s}) > 0 THEN {s - 1} - hx ELSE hx END")
        sql = (f"SELECT c_custkey, {nx} AS hx, {ny} AS hy, "
               f"hd + {s * s} * ({rxy}) AS hd FROM ({sql})")
    return sql


# ---------------------------------------------------------------------------
# queries


def q_sjoin_points_in_rects(spark, sf_dir) -> DataFrame:
    """Flagship: points-in-rectangles spatial join (cell cover + refine)."""
    from geopandas_spark.operators.sjoin import sjoin

    pts = _customer_points(spark, sf_dir).select("c_custkey", "geometry")
    rects = _part_rects(spark, sf_dir).select("p_partkey", "geometry")
    out = sjoin(pts, rects, how="inner", predicate="intersects",
                left_id="c_custkey", right_id="p_partkey", resolution=6)
    return out.select("c_custkey", F.col("index_right").alias("p_partkey"))


def q_sjoin_count_by_rect(spark, sf_dir) -> DataFrame:
    from geopandas_spark.operators.sjoin import sjoin

    pts = _customer_points(spark, sf_dir).select("c_custkey", "geometry")
    rects = _part_rects(spark, sf_dir).select("p_partkey", "geometry")
    out = sjoin(pts, rects, how="inner", predicate="intersects",
                left_id="c_custkey", right_id="p_partkey", resolution=6)
    return (
        out.groupBy(F.col("index_right").alias("p_partkey"))
        .agg(F.count("*").alias("n_points"))
    )


def q_bbox_filter_cx(spark, sf_dir) -> DataFrame:
    """cx indexer (base.py:5513): bbox window filter, exact refine."""
    from geopandas_spark.operators.clip import clip

    pts = _customer_points(spark, sf_dir).select("c_custkey", "x", "y", "geometry")
    # bounds=(x, y): the window predicate is pure SQL on the point columns
    # and runs BEFORE any WKB decode (round-2 pushdown)
    return clip(pts, (0.2, 0.2, 0.6, 0.7),
                bounds=("x", "y")).select("c_custkey", "x", "y")


def q_dissolve_nation_bounds(spark, sf_dir) -> DataFrame:
    """dissolve by nation key: per-group union bounds + count."""
    from geopandas_spark.functions.st import st_bounds
    from geopandas_spark.operators.dissolve import dissolve

    pts = _customer_points(spark, sf_dir).select(
        "c_nationkey", F.lit(1).alias("one"), "geometry")
    d = dissolve(pts, by="c_nationkey", aggfunc={"one": "count"}, method="coverage")
    return d.withColumn("bb", st_bounds("geometry")).select(
        "c_nationkey",
        F.col("one").alias("n_points"),
        F.col("bb.minx").alias("minx"), F.col("bb.miny").alias("miny"),
        F.col("bb.maxx").alias("maxx"), F.col("bb.maxy").alias("maxy"),
    )


def q_sjoin_nearest_center(spark, sf_dir) -> DataFrame:
    """kNN (k=1, ties kept) from customer points to part rect centers."""
    from geopandas_spark.functions.st import st_point
    from geopandas_spark.operators.nearest import sjoin_nearest

    pts = _customer_points(spark, sf_dir).select("c_custkey", "geometry")
    centers = _part_rects(spark, sf_dir).select(
        "p_partkey",
        st_point((F.col("minx") + F.col("maxx")) / 2,
                 (F.col("miny") + F.col("maxy")) / 2).alias("geometry"),
    )
    out = sjoin_nearest(pts, centers, how="inner", distance_col="dist",
                        left_id="c_custkey", right_id="p_partkey")
    return out.select(
        "c_custkey", F.col("index_right").alias("p_partkey"),
        F.round("dist", 9).alias("dist_r"),
    )


def q_morton_cells(spark, sf_dir) -> DataFrame:
    """Spatial clustering key: quadtree cell id at res 8 per point."""
    from geopandas_spark.functions.st import st_cell_point

    pts = _customer_points(spark, sf_dir)
    return pts.select("c_custkey", st_cell_point("geometry", 8).alias("cell"))


def q_cell_cover_counts(spark, sf_dir) -> DataFrame:
    """Cover cardinality at res 6 per rect (index planning quantity)."""
    from geopandas_spark.functions.st import st_cells

    rects = _part_rects(spark, sf_dir)
    return rects.select(
        "p_partkey", F.size(st_cells("geometry", 6)).alias("n_cells"))


def q_tile_assignment(spark, sf_dir) -> DataFrame:
    """to_tiles zoom-4 tile ids per point (SURVEY.md §2.8)."""
    from geopandas_spark.operators.tiles import to_tiles

    pts = _customer_points(spark, sf_dir).select("c_custkey", "geometry")
    t = to_tiles(pts, zoom=4, clip=False)
    return t.select("c_custkey", F.col("tile_id").alias("tile"))


def q_clip_window_area(spark, sf_dir) -> DataFrame:
    """clip_by_rect + area (base.py:4305 fast path), rounded for the hash."""
    from geopandas_spark.functions.st import st_area
    from geopandas_spark.operators.clip import clip

    rects = _part_rects(spark, sf_dir).select(
        "p_partkey", "minx", "miny", "maxx", "maxy", "geometry")
    out = clip(rects, (0.25, 0.25, 0.75, 0.75),
               bounds=("minx", "miny", "maxx", "maxy"))
    return out.select(
        "p_partkey", F.round(st_area("geometry"), 9).alias("clip_area"))


def q_hilbert_rank_partitioning(spark, sf_dir) -> DataFrame:
    """hilbert_distance keys (base.py:5624) — emitted for range
    partitioning; oracle checks the exact key values via rows-only? No:
    morton at res 8 is the SQL-checkable sibling; hilbert is checked by
    count of distinct keys per res-4 block (locality invariant)."""
    from geopandas_spark.functions.st import st_hilbert

    pts = _customer_points(spark, sf_dir)
    out = pts.select(
        "c_custkey", st_hilbert("geometry", (0.0, 0.0, 1.0, 1.0), 8).alias("hkey"))
    return out


def q_exact_dedup_docs(spark, sf_dir) -> DataFrame:
    from geopandas_spark.operators.dedup import exact_dedup

    docs = _load(spark, sf_dir, "documents")
    d = exact_dedup(docs, "text", "doc_id")
    return d.select(F.count("*").alias("n_unique"),
                    F.sum("dup_count").alias("n_docs"))


def q_token_stats(spark, sf_dir) -> DataFrame:
    from geopandas_spark.operators.textstats import token_count

    docs = _load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        F.length("text").alias("n_chars_len"),
    )


def q_quality_ratios(spark, sf_dir) -> DataFrame:
    from geopandas_spark.operators.textstats import quality_columns

    docs = _load(spark, sf_dir, "documents")
    q = quality_columns(docs)
    return q.select(
        "doc_id",
        F.round("alpha_ratio", 9).alias("alpha_r"),
        F.round("punct_ratio", 9).alias("punct_r"),
        "n_tokens",
    )


def q_repetition_stats(spark, sf_dir) -> DataFrame:
    """Gopher-style repetition filters (operators/textstats.
    repetition_stats): duplicate-word fraction + most-frequent-bigram
    count per document, pure Catalyst (the top-gram count is a linear
    run-length scan over the sorted gram array — no explode/shuffle);
    the oracle recomputes it with an unnest + group-by."""
    from geopandas_spark.operators.textstats import repetition_stats

    docs = _load(spark, sf_dir, "documents")
    r = repetition_stats(docs, n=2)
    return r.select(
        "doc_id", "n_words", "n_distinct_words",
        F.col("top_2gram_n"),
        F.round("dup_word_frac", 9).alias("dup_word_frac"),
    )


def q_fingerprint(spark, sf_dir) -> DataFrame:
    docs = _load(spark, sf_dir, "documents")
    norm = F.lower(F.regexp_replace(F.col("text"), r"\s+", " "))
    return docs.select("doc_id", F.md5(F.encode(norm, "UTF-8")).alias("fp"))


def q_lang_id(spark, sf_dir) -> DataFrame:
    from geopandas_spark.operators.textstats import lang_id

    docs = _load(spark, sf_dir, "documents")
    return lang_id(docs).groupBy("lang_pred").agg(F.count("*").alias("n"))


def q_cosine_topk(spark, sf_dir) -> DataFrame:
    from geopandas_spark.operators.similarity import cosine_topk

    emb = _load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    out = cosine_topk(emb, queries, k=3)
    return out.select("query_id", "corpus_id", F.col("rank").alias("rnk"))


def q_minhash_near_dups(spark, sf_dir) -> DataFrame:
    """MinHash-LSH near-dup pairs, hash-checked against a brute-force
    exact-Jaccard oracle: the corpus's true near-dups sit at J >= 0.9
    where the 32-perm/8-band LSH has per-pair recall ~1-3e-6, and the
    seeded hashing makes the outcome deterministic — so the candidate
    set equals the exact-threshold truth on this data (round-3; was a
    rows-only check)."""
    from geopandas_spark.operators.dedup import minhash_lsh

    docs = _load(spark, sf_dir, "documents")
    out = minhash_lsh(docs, "text", "doc_id", num_perm=32, bands=8,
                      threshold=0.5)
    return out.select("id_a", "id_b",
                      F.round("jaccard", 9).alias("jaccard"))


def q_simhash_near_dups(spark, sf_dir) -> DataFrame:
    """SimHash hamming<=3 pairs. hash_fn='md5' so the whole pipeline —
    token hash, bit voting, chunk banding (exact by pigeonhole at
    hamming<=3 over 4 chunks), hamming filter — has a closed-form SQL
    oracle; max_bucket is lifted so the hot-bucket star-cap cannot drop
    pairs at oracle scale."""
    from geopandas_spark.operators.dedup import simhash_near_dups

    docs = _load(spark, sf_dir, "documents")
    return simhash_near_dups(docs, "text", "doc_id", max_hamming=3,
                             max_bucket=1_000_000, hash_fn="md5")


def q_events_topk_window(spark, sf_dir) -> DataFrame:
    """Window/top-k machinery over the events stream table."""
    from pyspark.sql import Window

    ev = _load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("user_id", "event_id", "rnk")
    )


def q_overlay_rect_intersection(spark, sf_dir) -> DataFrame:
    """overlay(intersection) on two derived rect layers; areas rounded."""
    from geopandas_spark.functions.st import st_area
    from geopandas_spark.operators.overlay import overlay

    rects = _part_rects(spark, sf_dir)
    a = rects.filter(F.col("p_partkey") % 2 == 0).select("p_partkey", "geometry")
    b = (
        rects.filter(F.col("p_partkey") % 2 == 1)
        .select(F.col("p_partkey").alias("q_partkey"), "geometry")
    )
    out = overlay(a, b, how="intersection")  # adaptive resolution
    return out.select(
        "p_partkey", "q_partkey",
        F.round(st_area("geometry"), 9).alias("int_area"),
    )


def q_transform_webmercator(spark, sf_dir) -> DataFrame:
    """to_crs 4326->3857 (geoseries.py:878) on customer points (x,y taken
    as lon/lat degrees); oracle = the spherical-Mercator formulas in SQL."""
    from geopandas_spark.functions.st import st_transform, st_x, st_y

    pts = _customer_points(spark, sf_dir)
    t = pts.withColumn("g3857", st_transform("geometry", 4326, 3857))
    return t.select(
        "c_custkey",
        (F.round(st_x("g3857"), 3) + F.lit(0.0)).alias("mx"),  # +0.0 kills -0.0
        (F.round(st_y("g3857"), 3) + F.lit(0.0)).alias("my"),
    )


def q_buffer_point_area(spark, sf_dir) -> DataFrame:
    """buffer (base.py:4806) on points: area of the 32-gon ring; oracle =
    the regular-polygon closed form (n/2)*sin(2pi/n)*r^2."""
    from geopandas_spark.functions.st import st_area, st_buffer

    pts = _customer_points(spark, sf_dir)
    buf = pts.withColumn("bg", st_buffer("geometry", 0.013, quad_segs=8))
    return buf.select("c_custkey", F.round(st_area("bg"), 9).alias("barea"))


def q_buffer_styles(spark, sf_dir) -> DataFrame:
    """buffer cap_style/join_style/mitre_limit (base.py:4806 parameters):
    an L-shaped integer polyline per part row. At integer coordinates
    with d=2 every style is arc-free and exact — flat+mitre area is
    2d(L1+L2), flat+bevel loses d^2/2 at the corner, square caps add
    2d^2 per end — so the oracle is closed-form SQL."""
    from geopandas_spark.functions.st import (st_area, st_buffer,
                                              st_geomfromtext)

    part = _load(spark, sf_dir, "part")
    df = part.select(
        "p_partkey",
        (F.col("p_partkey") * _HA % 16 + 5).cast("long").alias("l1"),
        (F.col("p_partkey") * _HB % 16 + 3).cast("long").alias("l2"),
        (F.col("p_partkey") % 100).cast("long").alias("x0"),
    )
    wkt = F.concat_ws(
        "", F.lit("LINESTRING ("), F.col("x0"), F.lit(" 0, "),
        F.col("x0") + F.col("l1"), F.lit(" 0, "),
        F.col("x0") + F.col("l1"), F.lit(" "), F.col("l2"), F.lit(")"))
    g = df.withColumn("g", st_geomfromtext(wkt))
    return g.select(
        "p_partkey",
        F.round(st_area(st_buffer(
            "g", 2.0, cap_style="flat", join_style="mitre")), 9)
        .alias("a_mitre"),
        F.round(st_area(st_buffer(
            "g", 2.0, cap_style="flat", join_style="bevel")), 9)
        .alias("a_bevel"),
        F.round(st_area(st_buffer(
            "g", 2.0, cap_style="square", join_style="mitre")), 9)
        .alias("a_square"),
        # single-sided (GEOS: left for +d, right for -d, flat ends):
        # the L turns left, so the left strip loses d^2 at the inner
        # corner and the right strip gains the d^2 mitre square
        F.round(st_area(st_buffer(
            "g", 2.0, join_style="mitre", single_sided=True)), 9)
        .alias("a_ss_left"),
        F.round(st_area(st_buffer(
            "g", -2.0, join_style="mitre", single_sided=True)), 9)
        .alias("a_ss_right"),
    )


def q_union_rect_area(spark, sf_dir) -> DataFrame:
    """pairwise union (base.py:4078, Martinez-Rueda/rectilinear kernel) of
    consecutive part rects; oracle = inclusion-exclusion in SQL."""
    from geopandas_spark.functions.st import st_area, st_union

    r = _part_rects(spark, sf_dir)
    a = r.filter(F.col("p_partkey") % 2 == 0).select(
        (F.col("p_partkey") / 2).cast("long").alias("k"),
        F.col("geometry").alias("ga"))
    b = r.filter(F.col("p_partkey") % 2 == 1).select(
        ((F.col("p_partkey") - 1) / 2).cast("long").alias("k"),
        F.col("geometry").alias("gb"))
    j = a.join(b, on="k")
    return j.select(
        "k", F.round(st_area(st_union("ga", "gb")), 9).alias("u_area"))


def q_segmentize_counts(spark, sf_dir) -> DataFrame:
    """segmentize (base.py:1711) on part rects; oracle = 4*ceil(side/d)+1
    ring points in SQL."""
    from geopandas_spark.functions.st import st_num_coordinates, st_segmentize

    r = _part_rects(spark, sf_dir)
    out = r.withColumn("sg", st_segmentize("geometry", 0.0097))
    return out.select(
        "p_partkey", st_num_coordinates("sg").alias("n_pts"))


def q_min_bounding_radius(spark, sf_dir) -> DataFrame:
    """minimum_bounding_radius (base.py:1542) of rects; oracle =
    side*sqrt(2)/2."""
    from geopandas_spark.functions.st import st_minimum_bounding_radius

    r = _part_rects(spark, sf_dir)
    return r.select(
        "p_partkey",
        F.round(st_minimum_bounding_radius("geometry"), 9).alias("mbr"))


def q_hausdorff_center(spark, sf_dir) -> DataFrame:
    """hausdorff_distance (base.py:3617) rect vs its center point; oracle
    = half-diagonal."""
    from geopandas_spark.functions.st import st_hausdorff_distance, st_point

    r = _part_rects(spark, sf_dir)
    c = r.withColumn("ctr", st_point(
        (F.col("minx") + F.col("maxx")) / 2, (F.col("miny") + F.col("maxy")) / 2))
    return c.select(
        "p_partkey",
        F.round(st_hausdorff_distance("geometry", "ctr"), 9).alias("hd"))


def q_geojson_roundtrip(spark, sf_dir) -> DataFrame:
    """GeoJSON out/in (geoseries.py:475, geodataframe.py:416): coordinates
    survive exactly; oracle = the original x/y."""
    from geopandas_spark.functions.st import st_x, st_y
    from geopandas_spark.sources.geojson import st_asgeojson, st_geomfromgeojson

    pts = _customer_points(spark, sf_dir)
    rt = pts.withColumn("g2", st_geomfromgeojson(st_asgeojson("geometry")))
    return rt.select("c_custkey", st_x("g2").alias("x"), st_y("g2").alias("y"))


def q_gpkg_roundtrip(spark, sf_dir) -> DataFrame:
    """GeoPackage out/in through the stdlib-sqlite3 GPKG driver
    (io/file.py:28-34 'GPKG'; sources/gpkg.py): write customer points to
    a .gpkg, read back distributed (rowid-range tasks); coordinates and
    keys survive exactly. Oracle = the original x/y."""
    import os
    import tempfile

    from geopandas_spark.functions.st import st_x, st_y
    from geopandas_spark.sources.file import read_file, to_file

    pts = _customer_points(spark, sf_dir).select("c_custkey", "geometry")
    path = os.path.join(tempfile.mkdtemp(prefix="gs_gpkg_"), "pts.gpkg")
    to_file(pts, path, layer="pts")
    back = read_file(spark, path)
    return back.select("c_custkey", st_x("geometry").alias("x"),
                       st_y("geometry").alias("y"))



def q_fgb_roundtrip(spark, sf_dir) -> DataFrame:
    """FlatGeobuf out/in through the GDAL-free .fgb driver
    (io/file.py:28-34 'FlatGeobuf'; sources/flatgeobuf.py): write customer
    points to one .fgb with the packed R-tree index, read back distributed
    (index leaf offsets -> per-task byte ranges); coordinates and keys
    survive exactly. Oracle = the original x/y."""
    import os
    import tempfile

    from geopandas_spark.functions.st import st_x, st_y
    from geopandas_spark.sources.file import read_file, to_file

    pts = _customer_points(spark, sf_dir).select("c_custkey", "geometry")
    path = os.path.join(tempfile.mkdtemp(prefix="gs_fgb_"), "pts.fgb")
    to_file(pts, path)
    back = read_file(spark, path)
    return back.select("c_custkey", st_x("geometry").alias("x"),
                       st_y("geometry").alias("y"))


def q_gml_mif_roundtrip(spark, sf_dir) -> DataFrame:
    """Chained round-trip through two text OGR drivers (io/file.py:28-34
    'GML' and 'MapInfo File'; sources/gml.py, sources/mapinfo.py): write
    customer points to .gml, read back, write that to .mif/.mid, read
    back; coordinates (repr round-trip) and the integer key survive both
    containers exactly. Oracle = the original x/y."""
    import os
    import tempfile

    from geopandas_spark.functions.st import st_x, st_y
    from geopandas_spark.sources.file import read_file, to_file

    pts = _customer_points(spark, sf_dir).select("geometry", "c_custkey")
    d = tempfile.mkdtemp(prefix="gs_txt_")
    gml = os.path.join(d, "pts.gml")
    to_file(pts, gml)
    mif = os.path.join(d, "pts.mif")
    to_file(read_file(spark, gml), mif)
    back = read_file(spark, mif)
    return back.select("c_custkey", st_x("geometry").alias("x"),
                       st_y("geometry").alias("y"))


def q_media_image_stats(spark, sf_dir) -> DataFrame:
    """Hash-checked end-to-end run of the REAL image codecs (round 4;
    the multimodal family was pytest-only before): closed-form patterned
    pixels -> encode_png (even keys) / encode_bmp (odd keys) in one UDF
    stage -> opaque binary column -> full decode (zlib inflate + PNG
    unfilter / BMP row parse) + exact pixel stats in another. The oracle
    recomputes min/max/mean per key from the pattern alone — a SQL
    engine with no codec states the exact expected decode output
    (operators/multimodal.py, operators/codecs.py)."""
    from geopandas_spark.operators.multimodal import (image_stats,
                                                      synthesize_patterned_media)

    c = _load(spark, sf_dir, "customer").select("c_custkey")
    df = synthesize_patterned_media(c, "c_custkey", kind="image")
    df = image_stats(df)
    return df.select(
        "c_custkey", F.col("img_stat.width").alias("w"),
        F.col("img_stat.height").alias("h"),
        F.col("img_stat.min_px").alias("min_px"),
        F.col("img_stat.max_px").alias("max_px"),
        F.round(F.col("img_stat.mean_px"), 9).alias("mean_px"))


def q_media_audio_stats(spark, sf_dir) -> DataFrame:
    """Hash-checked PCM-16 WAV encode->decode (operators/codecs.py)
    plus exact audio stats: peak/zero-crossings are integer-exact and
    rms is dyadic-rational-exact in float64, so the SQL oracle
    reproduces the decoded values bit-for-bit from the sample pattern."""
    from geopandas_spark.operators.multimodal import (audio_stats,
                                                      synthesize_patterned_media)

    c = _load(spark, sf_dir, "customer").select("c_custkey")
    df = synthesize_patterned_media(c, "c_custkey", kind="audio")
    df = audio_stats(df)
    return df.select(
        "c_custkey", F.col("aud_stat.n_samples").alias("n_samples"),
        F.col("aud_stat.peak").alias("peak"),
        F.col("aud_stat.n_zc").alias("n_zc"),
        F.round(F.col("aud_stat.rms"), 9).alias("rms"))


def q_media_video_frames(spark, sf_dir) -> DataFrame:
    """Hash-checked MJPEG-AVI container path (operators/avicodec.py,
    jpegcodec.py): patterned frames -> encode_avi -> extract every 2nd
    frame ('00dc' chunks lifted verbatim) -> JPEG SOF dims of the first
    frame. Counts and dimensions are closed-form; pixel content is not
    asserted here (JPEG is lossy — codec fidelity is pinned in pytest)."""
    from geopandas_spark.operators.codecs import jpeg_info
    from geopandas_spark.operators.multimodal import (
        extract_frames, synthesize_patterned_media)
    from pyspark.sql.functions import pandas_udf

    c = _load(spark, sf_dir, "customer").select("c_custkey")
    df = synthesize_patterned_media(c, "c_custkey", kind="video")
    df = extract_frames(df, every_n=2)

    @pandas_udf("w int, h int")
    def _sof(first: pd.Series) -> pd.DataFrame:
        rows = []
        for b in first:
            if b is None:
                rows.append((None, None))
            else:
                w, h, _c = jpeg_info(bytes(b))
                rows.append((w, h))
        return pd.DataFrame(rows, columns=["w", "h"])

    df = df.withColumn("__sof", _sof(F.element_at("frames", 1)))
    return df.select(
        "c_custkey", F.size("frames").alias("n_sampled"),
        F.col("__sof.w").alias("w"), F.col("__sof.h").alias("h"))


def q_decontaminate_docs(spark, sf_dir) -> DataFrame:
    """Benchmark-decontamination stage (operators/dedup.decontaminate):
    every 37th document doubles as the 'eval set'; per-doc distinct
    5-gram overlap counts against the broadcast benchmark gram set,
    flagged at >= 2 hits. Pure Catalyst both sides, so the SQL oracle
    mirrors the plan exactly."""
    from geopandas_spark.operators.dedup import decontaminate

    docs = _load(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 37 == 0)
    out = decontaminate(docs, bench, n=5, min_overlap=2)
    return out.select("doc_id", "n_overlap",
                      F.col("contaminated").cast("int").alias("contaminated"))


def _interleaved_docs(spark, sf_dir) -> DataFrame:
    """North-rule input table (BASELINE.json input_hint): doc_id +
    spans array<struct<kind,text,media_ref,offset>>, built with pure
    Catalyst expressions from orders so every derived quantity has a
    closed-form DuckDB mirror. Span 0 is prose, span 1 carries a WKT
    point with integer coordinates (string-exact across engines), span
    2 is a media tile ref. (The numpy-RNG synthesizer in
    sources/documents.py stays the pytest fixture path; this builder is
    the SQL-oracle-able twin of the same shape.)"""
    o = _load(spark, sf_dir, "orders")
    o = o.withColumn(
        "px", (F.col("o_orderkey") * _HA % F.lit(_M32) % 997).cast("long")
    ).withColumn(
        "py", (F.col("o_orderkey") * _HB % F.lit(_M32) % 983).cast("long")
    )
    wkt = F.concat(F.lit("POINT ("), F.col("px").cast("string"), F.lit(" "),
                   F.col("py").cast("string"), F.lit(")"))
    media = F.concat(F.lit("tile://7/"), (F.col("px") % 128).cast("string"),
                     F.lit("/"), (F.col("py") % 128).cast("string"))
    nul = F.lit(None).cast("string")
    spans = F.array(
        F.struct(F.lit("text").alias("kind"),
                 F.col("o_orderpriority").alias("text"),
                 nul.alias("media_ref"), F.lit(0).alias("offset")),
        F.struct(F.lit("text").alias("kind"), wkt.alias("text"),
                 nul.alias("media_ref"), F.lit(1).alias("offset")),
        F.struct(F.lit("media").alias("kind"), nul.alias("text"),
                 media.alias("media_ref"), F.lit(2).alias("offset")),
    )
    return o.select(
        F.concat(F.lit("doc-"),
                 F.lpad(F.col("o_orderkey").cast("string"), 12, "0")
                 ).alias("doc_id"),
        spans.alias("spans"))


def q_spans_pipeline(spark, sf_dir) -> DataFrame:
    """End-to-end north-rule pipeline over the input_hint table shape:
    WKT extraction from text spans (sources/documents.with_geometry),
    zoom-4 tile assignment (operators/tiles.to_tiles) over the integer
    domain, media tile-ref parse, and the span-sequence invariant as a
    checkable md5 fingerprint computed on the OUTPUT spans column — the
    oracle rebuilds the serialization from the base table, so any span
    mutation, drop, or reorder inside the pipeline hash-mismatches."""
    from geopandas_spark.operators.tiles import to_tiles
    from geopandas_spark.sources.documents import (
        span_serial_fingerprint, with_geometry)

    docs = _interleaved_docs(spark, sf_dir)
    t = to_tiles(with_geometry(docs), zoom=4,
                 domain=(0.0, 0.0, 997.0, 983.0), clip=False)
    m = F.element_at(
        F.filter("spans", lambda s: s["kind"] == F.lit("media")), 1
    )["media_ref"]
    media_re = r"^tile://7/(\d+)/(\d+)$"
    return t.select(
        "doc_id",
        F.col("tile_id").alias("tile"),
        F.regexp_extract(m, media_re, 1).cast("long").alias("m_tx"),
        F.regexp_extract(m, media_re, 2).cast("long").alias("m_ty"),
        span_serial_fingerprint("spans").alias("span_fp"),
    )


def q_shapefile_roundtrip(spark, sf_dir) -> DataFrame:
    """Shapefile out/in through the pure-numpy .shp/.shx/.dbf driver
    (io/file.py:28-34 'ESRI Shapefile'; sources/shapefile.py): part
    rectangles + integer key; ring orientation is normalized on write so
    the check is key + area. Oracle = closed-form side^2."""
    import os
    import tempfile

    from geopandas_spark.functions.st import st_area
    from geopandas_spark.sources.file import read_file, to_file

    rects = _part_rects(spark, sf_dir).select("p_partkey", "geometry")
    path = os.path.join(tempfile.mkdtemp(prefix="gs_shp_"), "rects.shp")
    to_file(rects, path)
    back = read_file(spark, path)
    return back.select("p_partkey",
                       F.round(st_area("geometry"), 9).alias("area"))


def q_geocode_nations(spark, sf_dir) -> DataFrame:
    """Gazetteer geocode (tools/geocoding.py:8-66 re-expressed as a
    normalized-key broadcast join): customers carry a noisy rendering of
    their nation's name; the gazetteer maps nation names to points.
    Oracle = the plain customer x nation equi-join."""
    from geopandas_spark.functions.st import st_x, st_y
    from geopandas_spark.operators.geocode import geocode

    nat = _load(spark, sf_dir, "nation")
    gaz = nat.select(F.col("n_name").alias("address"),
                     _x_expr("n_nationkey").alias("x"),
                     _y_expr("n_nationkey").alias("y"))
    cust = _load(spark, sf_dir, "customer").join(
        nat, F.col("c_nationkey") == F.col("n_nationkey")).select(
        "c_custkey",
        F.concat(F.lit("  "), F.initcap("n_name"), F.lit(".")).alias(
            "address"))
    out = geocode(cust, gaz)
    return out.select("c_custkey", "matched_address",
                      F.round(st_x("geometry"), 9).alias("gx"),
                      F.round(st_y("geometry"), 9).alias("gy"))


def q_render_density(spark, sf_dir) -> DataFrame:
    """Render sink's distributed half (operators/render.py, plot parity):
    64x64 pixel-coverage counts of the customer points; oracle = plain
    floor-bucket GROUP BY."""
    from geopandas_spark.operators.render import render_counts

    pts = _customer_points(spark, sf_dir).select("c_custkey", "geometry")
    return render_counts(pts, 64, 64, bbox=(0.0, 0.0, 1.0, 1.0))


def q_sql_roundtrip(spark, sf_dir) -> DataFrame:
    """PostGIS-surface DB I/O (io/sql.py:78,242; sources/sql.py): write
    customer points into a SQLite table via executor-side batched
    inserts (EWKB hex), read back with partition-column range tasks —
    keys and coordinates survive exactly. Oracle = the original x/y."""
    import os
    import tempfile

    from geopandas_spark.functions.st import st_x, st_y
    from geopandas_spark.sources.sql import read_postgis, to_postgis

    db = os.path.join(tempfile.mkdtemp(prefix="gs_sql_"), "rt.db")

    def factory(_p=db):
        import sqlite3
        return sqlite3.connect(_p)

    pts = _customer_points(spark, sf_dir).select("c_custkey", "geometry")
    to_postgis(pts, "pts", factory, geom_col="geometry", srid=4326,
               max_parallel_writers=1)
    back = read_postgis(spark, "pts", factory, geom_col="geometry",
                        partition_col="c_custkey", num_partitions=4)
    return back.select("c_custkey", st_x("geometry").alias("x"),
                       st_y("geometry").alias("y"))


def q_render_choropleth(spark, sf_dir) -> DataFrame:
    """plot(column=) choropleth's distributed half (render_values,
    plotting.py:252 color-by-value): 64x64 per-pixel mean of customer
    account balance; oracle = floor-bucket GROUP BY avg."""
    from geopandas_spark.operators.render import render_values

    pts = _customer_points(spark, sf_dir).select("c_acctbal", "geometry")
    out = render_values(pts, "c_acctbal", 64, 64,
                        bbox=(0.0, 0.0, 1.0, 1.0))
    return out.select("pixel", F.round("v", 9).alias("v"))


def q_ngram_jaccard_pairs(spark, sf_dir) -> DataFrame:
    """Word-trigram Jaccard near-dup pairs — pure-Catalyst dedup op with a
    full SQL oracle (operators/dedup.ngram_jaccard)."""
    from geopandas_spark.operators.dedup import ngram_jaccard

    docs = _load(spark, sf_dir, "documents")
    out = ngram_jaccard(docs, "text", "doc_id", n=3, threshold=0.2,
                        max_df=None)
    return out.select("id_a", "id_b", F.round("jaccard", 9).alias("jaccard"))


def q_pii_scrub(spark, sf_dir) -> DataFrame:
    """pii_scrub (operators/textstats.py): dialect-portable regex
    redaction — PII injected deterministically per doc, counts + the
    scrubbed text's md5 reproduced by the DuckDB oracle (Java regex and
    RE2 agree on these patterns by construction)."""
    from geopandas_spark.operators.textstats import pii_scrub

    docs = _load(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.lit(" contact w"), F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-"),
            F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" ip 10."), (F.col("doc_id") % 256).cast("string"),
            F.lit(".0."), (F.col("doc_id") % 200).cast("string"),
            F.lit(" ssn 123-45-6789 end")).alias("text"))
    out = pii_scrub(aug)
    return out.select(
        "doc_id", "n_email", "n_ssn", "n_phone", "n_ipv4",
        F.md5(F.encode("text_scrubbed", "UTF-8")).alias("fp"))


def q_hash_split(spark, sf_dir) -> DataFrame:
    """hash_split (operators/dedup.py): deterministic md5-bucket
    train/val/test assignment — the full per-document assignment is
    hash-checked against the same bucketing computed in SQL."""
    from geopandas_spark.operators.dedup import hash_split

    docs = _load(spark, sf_dir, "documents")
    out = hash_split(docs, "doc_id",
                     {"train": 0.8, "val": 0.1, "test": 0.1}, salt="r5")
    return out.select("doc_id", "split")


def q_disjoint_window(spark, sf_dir) -> DataFrame:
    """st_disjoint predicate (base.py:2744) vs a fixed window polygon."""
    from geopandas_spark.functions.st import st_disjoint, st_geomfromtext

    pts = _customer_points(spark, sf_dir)
    win = st_geomfromtext(F.lit(
        "POLYGON ((0.2 0.2, 0.6 0.2, 0.6 0.7, 0.2 0.7, 0.2 0.2))"))
    return pts.filter(st_disjoint("geometry", win)).select(
        "c_custkey", F.round("x", 9).alias("x"), F.round("y", 9).alias("y"))


def q_make_valid_bowtie_area(spark, sf_dir) -> DataFrame:
    """st_make_valid (base.py:1641): bowtie rings built from the part
    rects repair to two triangles of total area side^2/2."""
    from geopandas_spark.functions.st import (
        st_area, st_geomfromtext, st_make_valid)

    r = _part_rects(spark, sf_dir)
    bow = F.concat(
        F.lit("POLYGON (("),
        F.col("minx"), F.lit(" "), F.col("miny"), F.lit(", "),
        F.col("maxx"), F.lit(" "), F.col("maxy"), F.lit(", "),
        F.col("maxx"), F.lit(" "), F.col("miny"), F.lit(", "),
        F.col("minx"), F.lit(" "), F.col("maxy"), F.lit(", "),
        F.col("minx"), F.lit(" "), F.col("miny"), F.lit("))"),
    )
    fixed = st_make_valid(st_geomfromtext(bow))
    return r.select("p_partkey",
                    F.round(st_area(fixed), 9).alias("fixed_area"))


def q_skew_transform_points(spark, sf_dir) -> DataFrame:
    """st_skew + st_transform_fn closed forms on points: skew 30deg about
    the origin gives x' = x + tan(30deg) * y; the user transform doubles x."""
    from geopandas_spark.functions.st import (
        st_skew, st_transform_fn, st_x, st_y)

    pts = _customer_points(spark, sf_dir)
    sk = st_skew("geometry", xs=30.0, origin=(0, 0))
    tf = st_transform_fn(
        "geometry",
        lambda c: __import__("numpy").column_stack([c[:, 0] * 2, c[:, 1]]))
    return pts.select(
        "c_custkey",
        F.round(st_x(sk), 9).alias("skx"),
        F.round(st_y(sk), 9).alias("sky"),
        F.round(st_x(tf), 9).alias("tfx"),
    )


def q_lsh_topk_embeddings(spark, sf_dir) -> DataFrame:
    """ANN top-k via multi-probe hyperplane LSH (rows-only: bucketing is
    not SQL-expressible; recall vs brute force pinned in pytest)."""
    from geopandas_spark.operators.similarity import lsh_topk

    emb = _load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    out = lsh_topk(emb, queries, k=3)
    return out.select("query_id", "corpus_id", F.col("rank").alias("rnk"))


def q_lsh_topk_recall(spark, sf_dir) -> DataFrame:
    """Driver-gated recall floor for the multi-probe LSH ANN path
    (VERDICT r4 item 5 — lsh_topk itself stays rows-only because the
    bucketing is not SQL-expressible): per-query recall@11 of lsh_topk
    vs the exact brute-force top-k, bucketed at the >=0.8 floor. The
    LSH is fully seeded so the booleans are deterministic (measured
    min recall 0.818 across sf0.001/sf0.01); the exact reference side
    is itself oracle-checked by the cosine_topk query."""
    from geopandas_spark.operators.similarity import cosine_topk, lsh_topk

    emb = _load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    exact = cosine_topk(emb, q, k=11).select("query_id", "corpus_id")
    approx = lsh_topk(emb, q, k=11).select("query_id", "corpus_id")
    hit = exact.join(approx, ["query_id", "corpus_id"], "left_semi")
    nk = exact.groupBy("query_id").agg(F.count("*").alias("nk"))
    nh = hit.groupBy("query_id").agg(F.count("*").alias("nh"))
    return (
        nk.join(nh, "query_id", "left")
        .select("query_id",
                (F.coalesce(F.col("nh"), F.lit(0)) / F.col("nk")
                 >= 0.8).alias("recall_ge_08")))


def q_embedding_near_dups(spark, sf_dir) -> DataFrame:
    """embedding_near_dups (hyperplane-LSH banding + exact cosine
    rerank): every vector is unioned with a deterministically perturbed
    twin (+0.001 on component 0 -> cosine ~0.9999), while the corpus's
    own max cross-pair cosine is 0.51 — so at threshold 0.9 the TRUE
    pair set is exactly {(i, i+10000)} and the seeded LSH's per-pair
    miss probability is ~1e-13. The oracle enumerates that closed-form
    pair set; the SQL side never needs the LSH."""
    from geopandas_spark.operators.similarity import embedding_near_dups

    emb = _load(spark, sf_dir, "embeddings")
    pert = emb.select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: (x + F.when(i == F.lit(0), F.lit(0.001))
                          .otherwise(F.lit(0.0))).cast("float")
        ).alias("embedding"))
    allv = emb.select("vec_id", "embedding").unionByName(pert)
    out = embedding_near_dups(allv, threshold=0.9)
    return out.select("id_a", "id_b")


def q_ivf_topk_embeddings(spark, sf_dir) -> DataFrame:
    """ANN top-k via an IVF index (spherical k-means quantizer + probe
    join + exact rerank). Probing ALL cells makes the result exact, so
    the full machinery (train -> assign -> probe -> rerank) gets a real
    SQL oracle; the pruned-probe recall bar is pinned in pytest."""
    from geopandas_spark.operators.similarity import ivf_topk

    emb = _load(spark, sf_dir, "embeddings")
    queries = emb.filter((F.col("vec_id") >= 5) & (F.col("vec_id") < 10))
    out = ivf_topk(emb, queries, k=3, n_centroids=16, n_probe=16, iters=2)
    return out.select("query_id", "corpus_id", F.col("rank").alias("rnk"))


def _star_polys(spark, sf_dir):
    """Irregular 12-gon stars centered on the part-rect centers — the
    general (non-rectilinear, non-convex) polygon fixture that drives the
    batched Greiner-Hormann path instead of the rect fast path."""
    import math

    from geopandas_spark.functions.st import st_geomfromtext

    p = _part_rects(spark, sf_dir).select("p_partkey", "minx", "miny",
                                          "maxx", "maxy")
    cx = (F.col("minx") + F.col("maxx")) / 2
    cy = (F.col("miny") + F.col("maxy")) / 2
    half = (F.col("maxx") - F.col("minx")) / 2
    parts = [F.lit("POLYGON ((")]
    for k in range(13):
        a = 2 * math.pi * (k % 12) / 12
        rad = half * (0.7 + 0.3 * (((k % 12) * 2654435761 % 7) / 7.0))
        parts.append(cx + rad * math.cos(a))
        parts.append(F.lit(" "))
        parts.append(cy + rad * math.sin(a))
        if k < 12:
            parts.append(F.lit(", "))
    parts.append(F.lit("))"))
    return p.select("p_partkey",
                    st_geomfromtext(F.concat(*parts)).alias("geometry"))


def q_overlay_star_intersection(spark, sf_dir) -> DataFrame:
    """General-polygon overlay (rows-only: star x star intersection has no
    SQL oracle; the GH-vs-sweep equality is pinned in pytest). Splits the
    star set by key parity and intersects the halves."""
    from geopandas_spark.functions.st import st_area
    from geopandas_spark.operators.overlay import overlay

    stars = _star_polys(spark, sf_dir)
    a = stars.filter(F.col("p_partkey") % 2 == 0)
    b = (stars.filter(F.col("p_partkey") % 2 == 1)
         .withColumnRenamed("p_partkey", "q_partkey"))
    out = overlay(a, b, how="intersection", id1="p_partkey",
                  id2="q_partkey", make_valid=False)
    return out.select("p_partkey", "q_partkey",
                      F.round(st_area("geometry"), 9).alias("ia"))


def q_overlay_star_candidates(spark, sf_dir) -> DataFrame:
    """Hash-checked audit of the star overlay's candidate machinery
    (VERDICT r3 item 7): the bbox-overlap pair set of the SAME star
    inputs as ``overlay_star_intersection`` IS closed-form (the star
    radius pattern is fixed, so each bbox is the rect center plus fixed
    multiples of the half-width), and ``overlay_candidates`` runs the
    same cover/resolution/ancestor-chain/cell-join plan as ``overlay``
    but stops at the envelope test. Emits per pair the envelope
    intersection area — fully SQL-reproducible; the non-closed-form GH
    intersection areas stay pinned by the GH-vs-sweep pytest parity."""
    from geopandas_spark.operators.overlay import overlay_candidates

    stars = _star_polys(spark, sf_dir)
    a = stars.filter(F.col("p_partkey") % 2 == 0)
    b = (stars.filter(F.col("p_partkey") % 2 == 1)
         .withColumnRenamed("p_partkey", "q_partkey"))
    out = overlay_candidates(a, b, id1="p_partkey", id2="q_partkey")
    return out.select(
        "p_partkey", "q_partkey",
        F.round((F.col("imaxx") - F.col("iminx"))
                * (F.col("imaxy") - F.col("iminy")), 9).alias("env_ia"))


def q_overlay_dart_intersection(spark, sf_dir) -> DataFrame:
    """General-polygon overlay with a CLOSED-FORM oracle: two interlocking
    non-convex quads ('darts') per part row. The configuration is rigid up
    to similarity — unit darts (0,0),(2,1),(4,0),(2,3) and its 180-degree
    rotation about (2,1.5) intersect in area exactly 2 — so per row
    area(A ∩ B) = 2 s^2 (verified by the GH kernel, the Martinez-Rueda
    sweep and Monte Carlo; both quads are non-convex single rings, which
    is precisely the batched Greiner-Hormann path)."""
    from geopandas_spark.functions.st import st_area, st_geomfromtext
    from geopandas_spark.operators.overlay import overlay

    r = _part_rects(spark, sf_dir).select("p_partkey", "minx", "miny",
                                          "maxx")
    s = (F.col("maxx") - F.col("minx")) / 4
    x0, y0 = F.col("minx"), F.col("miny")

    def dart_wkt(verts):
        parts = [F.lit("POLYGON ((")]
        for i, (ux, uy) in enumerate(verts):
            parts.append(x0 + s * ux)
            parts.append(F.lit(" "))
            parts.append(y0 + s * uy)
            if i < len(verts) - 1:
                parts.append(F.lit(", "))
        parts.append(F.lit("))"))
        return F.concat(*parts)

    a_v = [(0, 0), (2, 1), (4, 0), (2, 3), (0, 0)]
    b_v = [(4, 3), (2, 2), (0, 3), (2, 0), (4, 3)]
    # pair_on pushes the per-part key into the candidate join: the dart
    # configuration is keyed (A_k x B_k), and without it the spatially
    # dense layers paid a 137x candidate inflation (2.74M bbox pairs at
    # sf0.1) only to discard everything off-diagonal.
    a = r.select("p_partkey", F.col("p_partkey").alias("pk"),
                 st_geomfromtext(dart_wkt(a_v)).alias("geometry"))
    b = r.select(F.col("p_partkey").alias("q_partkey"),
                 F.col("p_partkey").alias("pk"),
                 st_geomfromtext(dart_wkt(b_v)).alias("geometry"))
    out = overlay(a, b, how="intersection", id1="p_partkey",
                  id2="q_partkey", make_valid=False, pair_on="pk")
    return out.select("p_partkey",
                      F.round(st_area("geometry"), 9).alias("dart_ia"))


def q_boolean_ops_area(spark, sf_dir) -> DataFrame:
    """Pairwise union/difference/symmetric_difference areas of each part
    rect vs a fixed window — closed-form SQL oracle for the boolean
    kernels (base.py:3852/:3963/:4078)."""
    from geopandas_spark.functions.st import (
        st_area, st_difference, st_geomfromtext, st_symmetric_difference,
        st_union)

    r = _part_rects(spark, sf_dir)
    win = st_geomfromtext(F.lit(
        "POLYGON ((0.25 0.25, 0.75 0.25, 0.75 0.75, 0.25 0.75, 0.25 0.25))"))
    return r.select(
        "p_partkey",
        F.round(st_area(st_union("geometry", win)), 9).alias("u_area"),
        F.round(st_area(st_difference("geometry", win)), 9).alias("d_area"),
        F.round(st_area(st_symmetric_difference("geometry", win)), 9)
        .alias("x_area"),
    )


def q_delaunay_quad(spark, sf_dir) -> DataFrame:
    """st_delaunay_triangles (base.py:908) of the rect's 4 corners: the
    quad splits into exactly 2 triangles whose areas sum to the rect."""
    from geopandas_spark.functions.st import (
        st_area, st_delaunay_triangles, st_num_geometries)

    r = _part_rects(spark, sf_dir)
    tri = st_delaunay_triangles("geometry")
    return r.select(
        "p_partkey",
        st_num_geometries(tri).alias("n_tris"),
        F.round(st_area(tri), 9).alias("tri_area"))


def q_voronoi_rect_cells(spark, sf_dir) -> DataFrame:
    """st_voronoi_polygons (base.py:999) of the rect's 4 corners: 4 cells
    partitioning the GEOS-style extended envelope (2w x 2h = 4*side^2)."""
    from geopandas_spark.functions.st import (
        st_area, st_num_geometries, st_voronoi_polygons)

    r = _part_rects(spark, sf_dir)
    vor = st_voronoi_polygons("geometry")
    return r.select(
        "p_partkey",
        st_num_geometries(vor).alias("n_cells"),
        F.round(st_area(vor), 9).alias("cell_area"))


def q_polygonize_rect(spark, sf_dir) -> DataFrame:
    """st_polygonize (base.py:5763): the rect's 4 edge linestrings
    reassemble into exactly one polygon of area side^2."""
    from geopandas_spark.functions.st import (
        st_area, st_geomfromtext, st_num_geometries, st_polygonize)

    r = _part_rects(spark, sf_dir)

    def edge(x1, y1, x2, y2):
        return st_geomfromtext(F.concat(
            F.lit("LINESTRING ("), x1, F.lit(" "), y1, F.lit(", "),
            x2, F.lit(" "), y2, F.lit(")")))

    mnx, mny = F.col("minx"), F.col("miny")
    mxx, mxy = F.col("maxx"), F.col("maxy")
    edges = F.array(
        edge(mnx, mny, mxx, mny), edge(mxx, mny, mxx, mxy),
        edge(mxx, mxy, mnx, mxy), edge(mnx, mxy, mnx, mny))
    poly = st_polygonize(edges)
    return r.select(
        "p_partkey",
        st_num_geometries(poly).alias("n_polys"),
        F.round(st_area(poly), 9).alias("poly_area"))


def q_min_rotated_rect(spark, sf_dir) -> DataFrame:
    """st_minimum_rotated_rectangle (base.py:1475) of each rect rotated by
    a fixed angle — the MRR of a rotated rectangle is itself, so its
    area is exactly side^2 regardless of the rotation."""
    from geopandas_spark.functions.st import (
        st_area, st_minimum_rotated_rectangle, st_rotate)

    r = _part_rects(spark, sf_dir)
    rot = r.withColumn("rot", st_rotate("geometry", 33.0, origin="center"))
    return rot.select(
        "p_partkey",
        F.round(st_area(st_minimum_rotated_rectangle("rot")), 9)
        .alias("mrr_area"))


def q_relate_point_rect(spark, sf_dir) -> DataFrame:
    """st_relate / st_relate_pattern (base.py:4924/:5029): DE-9IM of a
    probe point vs its rect — inside / outside by key mod 3."""
    from geopandas_spark.functions.st import (
        st_point, st_relate, st_relate_pattern)

    r = _part_rects(spark, sf_dir)
    fr = F.lit(0.5) + (F.col("p_partkey") % 3 - 1) * F.lit(0.9)
    probe = st_point(F.col("minx") + F.col("side") * fr,
                     F.col("miny") + F.col("side") * 0.5)
    return r.select(
        "p_partkey",
        st_relate(probe, "geometry").alias("de9im"),
        st_relate_pattern(probe, "geometry", "T*F**F***").alias("within_p"))


def q_line_interpolate_project(spark, sf_dir) -> DataFrame:
    """st_interpolate / st_project (base.py:5240/:4460) on the rect
    diagonal: normalized interpolation at t=0.25 and the projection
    distance of the rect center (= half the diagonal length)."""
    from geopandas_spark.functions.st import (
        st_geomfromtext, st_interpolate, st_point, st_project, st_x, st_y)

    r = _part_rects(spark, sf_dir)
    diag = st_geomfromtext(F.concat(
        F.lit("LINESTRING ("), F.col("minx"), F.lit(" "), F.col("miny"),
        F.lit(", "), F.col("maxx"), F.lit(" "), F.col("maxy"), F.lit(")")))
    d = r.withColumn("diag", diag)
    ip = st_interpolate("diag", 0.25, normalized=True)
    ctr = st_point((F.col("minx") + F.col("maxx")) / 2,
                   (F.col("miny") + F.col("maxy")) / 2)
    return d.select(
        "p_partkey",
        F.round(st_x(ip), 9).alias("ipx"),
        F.round(st_y(ip), 9).alias("ipy"),
        F.round(st_project("diag", ctr), 9).alias("proj_d"))


def q_line_offset_frechet(spark, sf_dir) -> DataFrame:
    """st_offset_curve / st_frechet_distance / st_shortest_line
    (base.py:1265/:3729/:4262): offsetting the diagonal preserves its
    length, the Frechet distance to the offset is the offset magnitude,
    and the shortest line from the rect to an outside probe point has a
    closed-form gap length."""
    from geopandas_spark.functions.st import (
        st_frechet_distance, st_geomfromtext, st_length, st_offset_curve,
        st_point, st_shortest_line)

    r = _part_rects(spark, sf_dir)
    diag = st_geomfromtext(F.concat(
        F.lit("LINESTRING ("), F.col("minx"), F.lit(" "), F.col("miny"),
        F.lit(", "), F.col("maxx"), F.lit(" "), F.col("maxy"), F.lit(")")))
    d = r.withColumn("diag", diag)
    off = st_offset_curve("diag", 0.01)
    gap = F.lit(0.003) + (F.col("p_partkey") % 5) * F.lit(0.002)
    probe = st_point(F.col("maxx") + gap,
                     (F.col("miny") + F.col("maxy")) / 2)
    return d.withColumn("off", off).select(
        "p_partkey",
        F.round(st_length("off"), 9).alias("off_len"),
        F.round(st_frechet_distance("diag", "off"), 9).alias("fre_d"),
        F.round(st_length(st_shortest_line("geometry", probe)), 9)
        .alias("gap_len"))


def q_hull_points_area(spark, sf_dir) -> DataFrame:
    """st_convex_hull / st_concave_hull (base.py:677/:754) of the rect's
    4 corners plus its center: both hulls (ratio=1) are the rect itself
    — area side^2, ring of 5 coordinates."""
    from geopandas_spark.functions.st import (
        st_area, st_concave_hull, st_convex_hull, st_geomfromtext,
        st_num_coordinates)

    r = _part_rects(spark, sf_dir)
    mp = st_geomfromtext(F.concat(
        F.lit("MULTIPOINT ("),
        F.col("minx"), F.lit(" "), F.col("miny"), F.lit(", "),
        F.col("maxx"), F.lit(" "), F.col("miny"), F.lit(", "),
        F.col("maxx"), F.lit(" "), F.col("maxy"), F.lit(", "),
        F.col("minx"), F.lit(" "), F.col("maxy"), F.lit(", "),
        (F.col("minx") + F.col("maxx")) / 2, F.lit(" "),
        (F.col("miny") + F.col("maxy")) / 2, F.lit(")")))
    d = r.withColumn("mp", mp)
    hull = st_convex_hull("mp")
    chull = st_concave_hull("mp", ratio=1.0)
    return d.select(
        "p_partkey",
        F.round(st_area(hull), 9).alias("hull_area"),
        st_num_coordinates(hull).alias("hull_npts"),
        F.round(st_area(chull), 9).alias("chull_area"))


def q_rasterize_coverage(spark, sf_dir) -> DataFrame:
    """operators/tiles.rasterize (§2.8): per-rect covered-pixel count at
    zoom 4 x 16 px tiles (global 256-px grid) — pixel centers inside the
    rect have a closed-form count."""
    from geopandas_spark.operators.tiles import rasterize

    r = _part_rects(spark, sf_dir).select("p_partkey", "geometry")
    ras = rasterize(r, zoom=4, pixels=16)
    return (ras.groupBy("p_partkey")
            .agg(F.sum(F.size("covered_pixels")).alias("n_pix")))


def q_line_merge_chain(spark, sf_dir) -> DataFrame:
    """st_line_merge (base.py:1390): two chained edges merge into one
    3-point linestring of length 2*side."""
    from geopandas_spark.functions.st import (
        st_geomfromtext, st_length, st_line_merge, st_num_coordinates)

    r = _part_rects(spark, sf_dir)
    ml = st_geomfromtext(F.concat(
        F.lit("MULTILINESTRING (("),
        F.col("minx"), F.lit(" "), F.col("miny"), F.lit(", "),
        F.col("maxx"), F.lit(" "), F.col("miny"), F.lit("), ("),
        F.col("maxx"), F.lit(" "), F.col("miny"), F.lit(", "),
        F.col("maxx"), F.lit(" "), F.col("maxy"), F.lit("))")))
    m = r.withColumn("mg", st_line_merge(ml))
    return m.select(
        "p_partkey",
        st_num_coordinates("mg").alias("n_pts"),
        F.round(st_length("mg"), 9).alias("mlen"))


def q_constructive_scalars(spark, sf_dir) -> DataFrame:
    """st_boundary / st_envelope / st_reverse closed forms on the rect
    and its diagonal (base.py:576/:730/:1827)."""
    from geopandas_spark.functions.st import (
        st_area, st_boundary, st_envelope, st_geomfromtext, st_interpolate,
        st_length, st_reverse, st_x)

    r = _part_rects(spark, sf_dir)
    diag = st_geomfromtext(F.concat(
        F.lit("LINESTRING ("), F.col("minx"), F.lit(" "), F.col("miny"),
        F.lit(", "), F.col("maxx"), F.lit(" "), F.col("maxy"), F.lit(")")))
    d = r.withColumn("diag", diag)
    return d.select(
        "p_partkey",
        F.round(st_length(st_boundary("geometry")), 9).alias("blen"),
        F.round(st_area(st_envelope("diag")), 9).alias("earea"),
        F.round(st_x(st_interpolate(st_reverse("diag"), 0.0)), 9)
        .alias("rx"))


def q_bbox_partition_pruned(spark, sf_dir) -> DataFrame:
    """Cell-partitioned GeoParquet read path (§4 pruning backbone): write
    the customer points bucketed by coarse quadtree cell, read back with
    a bbox query that prunes whole directories (Catalyst PartitionFilters
    on the cell column), then row groups, then rows. Oracle = the plain
    window predicate on the raw table."""
    import tempfile

    from geopandas_spark.functions.st import st_x, st_y
    from geopandas_spark.sources.geoparquet import (
        read_geoparquet_bbox, write_geoparquet_partitioned)

    pts = _customer_points(spark, sf_dir).select("c_custkey", "geometry")
    path = tempfile.mkdtemp(prefix="gs_gpqp_") + "/pts"
    write_geoparquet_partitioned(pts, path, cell_res=3)
    out = read_geoparquet_bbox(spark, path, 0.25, 0.3, 0.65, 0.8)
    return out.select(
        "c_custkey",
        F.round(st_x("geometry"), 9).alias("x"),
        F.round(st_y("geometry"), 9).alias("y"))


def q_explode_corners(spark, sf_dir) -> DataFrame:
    """operators/explode (geodataframe.py:2164): MULTIPOINT of the rect's
    4 corners explodes into one row per part, with part index and the
    part's coordinates — closed-form SQL oracle via a 4-row cross join."""
    from geopandas_spark.functions.st import st_geomfromtext, st_x, st_y
    from geopandas_spark.operators.explode import explode

    r = _part_rects(spark, sf_dir)
    mp = st_geomfromtext(F.concat(
        F.lit("MULTIPOINT ("),
        F.col("minx"), F.lit(" "), F.col("miny"), F.lit(", "),
        F.col("maxx"), F.lit(" "), F.col("miny"), F.lit(", "),
        F.col("maxx"), F.lit(" "), F.col("maxy"), F.lit(", "),
        F.col("minx"), F.lit(" "), F.col("maxy"), F.lit(")")))
    d = r.select("p_partkey", mp.alias("geometry"))
    out = explode(d, index_parts=True)
    return out.select(
        "p_partkey", F.col("part_index").cast("int").alias("pidx"),
        F.round(st_x("geometry"), 9).alias("px"),
        F.round(st_y("geometry"), 9).alias("py"))


def q_intersection_all_groups(spark, sf_dir) -> DataFrame:
    """st_intersection_all (base.py:2017): n-ary intersection per group of
    overlapping rects (every rect contains [0.2,0.8]^2 so the result is a
    non-trivial rect with closed-form bounds in SQL)."""
    from geopandas_spark.functions.st import (
        st_area, st_geomfromtext, st_intersection_all)

    r = _part_rects(spark, sf_dir)
    x1 = F.col("minx") * 0.2
    y1 = F.col("miny") * 0.2
    x2 = F.col("maxx") * 0.2 + 0.78
    y2 = F.col("maxy") * 0.2 + 0.78
    wkt = F.concat(
        F.lit("POLYGON (("), x1, F.lit(" "), y1, F.lit(", "),
        x2, F.lit(" "), y1, F.lit(", "), x2, F.lit(" "), y2, F.lit(", "),
        x1, F.lit(" "), y2, F.lit(", "), x1, F.lit(" "), y1, F.lit("))"))
    g = r.withColumn("wide", st_geomfromtext(wkt)).withColumn(
        "grp", (F.col("p_partkey") % 10).cast("int"))
    agg = g.groupBy("grp").agg(
        st_intersection_all(F.collect_list("wide")).alias("ig"))
    return agg.select("grp", F.round(st_area("ig"), 9).alias("ia"))


def q_nearest_line(spark, sf_dir) -> DataFrame:
    """kNN (k=1, ties kept) from customer points to part-rect DIAGONAL
    LINES — exercises the non-puntal kNN path (segment-vectorized exact
    distance + tail re-probe) with a closed-form point-to-segment SQL
    oracle."""
    from geopandas_spark.functions.st import st_geomfromtext
    from geopandas_spark.operators.nearest import sjoin_nearest

    pts = _customer_points(spark, sf_dir).select("c_custkey", "geometry")
    diags = _part_rects(spark, sf_dir).select(
        "p_partkey",
        st_geomfromtext(F.concat(
            F.lit("LINESTRING ("), F.col("minx"), F.lit(" "), F.col("miny"),
            F.lit(", "), F.col("maxx"), F.lit(" "), F.col("maxy"),
            F.lit(")"))).alias("geometry"))
    out = sjoin_nearest(pts, diags, how="inner", distance_col="dist",
                        left_id="c_custkey", right_id="p_partkey")
    return out.select(
        "c_custkey", F.col("index_right").alias("p_partkey"),
        F.round("dist", 9).alias("dist_r"))


def q_stream_tile_counts(spark, sf_dir) -> DataFrame:
    """Structured Streaming end-to-end (streaming/agg.py): the events
    table read via readStream + Trigger.AvailableNow, watermarked 1-hour
    event-time windows counted per zoom-4 tile into a memory sink; the
    drained batch result carries a full SQL oracle (hour bucket + morton
    tile + count)."""
    import tempfile
    import uuid

    from geopandas_spark.functions.st import st_point
    from geopandas_spark.streaming import tile_counts_stream

    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    # the file stream source wants a directory; expose the read-only
    # table file through a symlink in a temp dir
    src_dir = tempfile.mkdtemp(prefix="gs_stream_src_")
    os.symlink(os.path.abspath(path),
               os.path.join(src_dir, "events.parquet"))
    stream = spark.readStream.schema(schema).parquet(src_dir)
    pts = (
        stream
        # parquet stores ts as TIMESTAMP_NTZ; watermarks need TIMESTAMP
        # (UTC session, so the wall-clock reading is unchanged)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withColumn("geometry",
                    st_point(_x_expr("event_id"), _y_expr("event_id"))))
    out = tile_counts_stream(pts, zoom=4, ts_col="ts",
                             window_duration="1 hour", watermark="2 hours")
    name = "stream_tc_" + uuid.uuid4().hex[:8]
    q = (
        out.writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="gs_ck_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name).select(
        F.unix_timestamp("win_start").alias("win_s"), "tile", "n")


def q_dwithin_join(spark, sf_dir) -> DataFrame:
    """sjoin predicate='dwithin' (base.py:2280 / sjoin.py distance arg):
    customer points within 0.025 of part rect centers. Exercises the
    padded-cover coarse path (probe bbox expanded by the distance);
    oracle = plain euclidean distance join."""
    from geopandas_spark.functions.st import st_point
    from geopandas_spark.operators.sjoin import sjoin

    pts = _customer_points(spark, sf_dir).select("c_custkey", "geometry")
    p = _load(spark, sf_dir, "part")
    half = (F.lit(0.02) + (F.col("p_partkey") % 10) * F.lit(0.005)) / 2
    centers = (
        p.withColumn("cx", _x_expr("p_partkey") * 0.9 + half)
        .withColumn("cy", _y_expr("p_partkey") * 0.9 + half)
        .withColumn("geometry", st_point("cx", "cy"))
        .select("p_partkey", "geometry")
    )
    out = sjoin(pts, centers, how="inner", predicate="dwithin",
                distance=0.025, left_id="c_custkey", right_id="p_partkey")
    return out.select("c_custkey", F.col("index_right").alias("p_partkey"))


def q_laea_transform(spark, sf_dir) -> DataFrame:
    """to_crs 4326 -> EPSG:3035 (ETRS89 LAEA Europe, EPSG method 9820;
    geoseries.py:878). Points mapped into the European window; oracle =
    the closed-form LAEA forward formulas in SQL (iteration-free)."""
    from geopandas_spark.functions.st import st_point, st_transform, st_x, st_y

    c = _load(spark, sf_dir, "customer")
    pts = (
        c.withColumn("lon", _x_expr("c_custkey") * 40 - 10)
        .withColumn("lat", _y_expr("c_custkey") * 25 + 35)
        .withColumn("geometry", st_point("lon", "lat"))
    )
    t = pts.withColumn("g", st_transform("geometry", 4326, 3035))
    return t.select(
        "c_custkey",
        (F.round(st_x("g"), 3) + F.lit(0.0)).alias("ex"),
        (F.round(st_y("g"), 3) + F.lit(0.0)).alias("ny"),
    )


def q_albers_transform(spark, sf_dir) -> DataFrame:
    """to_crs 4326 -> EPSG:5070 (NAD83 Conus Albers, EPSG method 9822;
    geoseries.py:878 arbitrary-CRS path, round-4 registry). Points
    mapped into the CONUS window; oracle = the closed-form AEA forward
    formulas in SQL (iteration-free), GRS80 constants inlined."""
    from geopandas_spark.functions.st import st_point, st_transform, st_x, st_y

    c = _load(spark, sf_dir, "customer")
    pts = (
        c.withColumn("lon", _x_expr("c_custkey") * 45 - 120)
        .withColumn("lat", _y_expr("c_custkey") * 23 + 25)
        .withColumn("geometry", st_point("lon", "lat"))
    )
    t = pts.withColumn("g", st_transform("geometry", 4326, 5070))
    return t.select(
        "c_custkey",
        (F.round(st_x("g"), 3) + F.lit(0.0)).alias("ex"),
        (F.round(st_y("g"), 3) + F.lit(0.0)).alias("ny"),
    )


def q_utm_zone_estimate(spark, sf_dir) -> DataFrame:
    """estimate_utm_crs (array.py:456) per nation: world-spread customer
    points grouped by nation, bounds aggregated, UTM EPSG picked from the
    bounds center; oracle = the zone arithmetic in SQL."""
    from pyspark.sql.functions import pandas_udf

    from geopandas_spark.geom.crs import estimate_utm_crs

    c = _load(spark, sf_dir, "customer")
    pts = (
        c.withColumn("lon", _x_expr("c_custkey") * 360 - 180)
        .withColumn("lat", _y_expr("c_custkey") * 160 - 80)
    )
    b = pts.groupBy("c_nationkey").agg(
        F.min("lon").alias("minx"), F.min("lat").alias("miny"),
        F.max("lon").alias("maxx"), F.max("lat").alias("maxy"))

    @pandas_udf("long")
    def _epsg(minx: pandas.Series, miny: pandas.Series, maxx: pandas.Series,
              maxy: pandas.Series) -> pandas.Series:
        # one call per GROUP (<= nation count), not per input row
        return pandas.Series([
            estimate_utm_crs(a, b_, c_, d_)
            for a, b_, c_, d_ in zip(minx, miny, maxx, maxy)
        ], dtype="int64")

    return b.select(
        F.col("c_nationkey").cast("long").alias("nk"),
        _epsg("minx", "miny", "maxx", "maxy").alias("epsg"))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_sjoin_points_in_rects(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Ordering matters: the driver's correctness gate snapshots the FIRST
    # 50 entries only. Round 5 rotation (VERDICT r4 item 7): the 21
    # queries past round 4's 50-query window (driver-checked at most in
    # r3, verified only locally in r4) lead, new round-5 queries follow,
    # then the round-4 single-driver-hash queries; the tail is queries
    # with TWO consecutive driver hashes (r3+r4) — every query keeps a
    # driver hash at most one round old.
    return {
        # -- past the r4 window (local-only in r4): must be in the first 50
        "voronoi_rect_cells": q_voronoi_rect_cells,
        "polygonize_rect": q_polygonize_rect,
        "min_rotated_rect": q_min_rotated_rect,
        "relate_point_rect": q_relate_point_rect,
        "line_interpolate_project": q_line_interpolate_project,
        "line_offset_frechet": q_line_offset_frechet,
        "hull_points_area": q_hull_points_area,
        "morton_cells": q_morton_cells,
        "hilbert_keys": q_hilbert_rank_partitioning,
        "token_stats": q_token_stats,
        "quality_ratios": q_quality_ratios,
        "fingerprint": q_fingerprint,
        "lang_id": q_lang_id,
        "events_topk_window": q_events_topk_window,
        "transform_webmercator": q_transform_webmercator,
        "buffer_point_area": q_buffer_point_area,
        "union_rect_area": q_union_rect_area,
        "segmentize_counts": q_segmentize_counts,
        "min_bounding_radius": q_min_bounding_radius,
        "hausdorff_center": q_hausdorff_center,
        "geojson_roundtrip": q_geojson_roundtrip,
        # -- new in round 5
        "buffer_styles": q_buffer_styles,
        "lsh_topk_recall": q_lsh_topk_recall,
        "pii_scrub": q_pii_scrub,
        "hash_split": q_hash_split,
        "embedding_near_dups": q_embedding_near_dups,
        # -- driver-checked once, in round 4 (the r3-item-4 backlog + the
        # r4-new queries)
        "bbox_partition_pruned": q_bbox_partition_pruned,
        "rasterize_coverage": q_rasterize_coverage,
        "line_merge_chain": q_line_merge_chain,
        "constructive_scalars": q_constructive_scalars,
        "explode_corners": q_explode_corners,
        "intersection_all_groups": q_intersection_all_groups,
        "nearest_line": q_nearest_line,
        "stream_tile_counts": q_stream_tile_counts,
        "dwithin_join": q_dwithin_join,
        "laea_transform": q_laea_transform,
        "utm_zone_estimate": q_utm_zone_estimate,
        "albers_transform": q_albers_transform,
        "fgb_roundtrip": q_fgb_roundtrip,
        "gml_mif_roundtrip": q_gml_mif_roundtrip,
        "overlay_star_candidates": q_overlay_star_candidates,
        "media_image_stats": q_media_image_stats,
        "media_audio_stats": q_media_audio_stats,
        "media_video_frames": q_media_video_frames,
        "decontaminate_docs": q_decontaminate_docs,
        "spans_pipeline": q_spans_pipeline,
        "repetition_stats": q_repetition_stats,
        # -- r3+r4 double-checked: fill the window to 50 with the ones
        # whose operators changed this round (dedup verify gating) or
        # anchor the bench
        "minhash_near_dups": q_minhash_near_dups,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "sjoin_points_in_rects": q_sjoin_points_in_rects,
        "sjoin_nearest_center": q_sjoin_nearest_center,
        "overlay_rect_intersection": q_overlay_rect_intersection,
        "disjoint_window": q_disjoint_window,
        "boolean_ops_area": q_boolean_ops_area,
        # -- tail: hash-matched by the driver in BOTH r3 and r4 —
        # safest to rotate out of the 50-gate
        "sjoin_count_by_rect": q_sjoin_count_by_rect,
        "bbox_filter_cx": q_bbox_filter_cx,
        "dissolve_nation_bounds": q_dissolve_nation_bounds,
        "cell_cover_counts": q_cell_cover_counts,
        "tile_assignment": q_tile_assignment,
        "clip_window_area": q_clip_window_area,
        "exact_dedup_docs": q_exact_dedup_docs,
        "cosine_topk": q_cosine_topk,
        "simhash_near_dups": q_simhash_near_dups,
        "gpkg_roundtrip": q_gpkg_roundtrip,
        "shapefile_roundtrip": q_shapefile_roundtrip,
        "geocode_nations": q_geocode_nations,
        "render_density": q_render_density,
        "sql_roundtrip": q_sql_roundtrip,
        "render_choropleth": q_render_choropleth,
        "make_valid_bowtie_area": q_make_valid_bowtie_area,
        "skew_transform_points": q_skew_transform_points,
        "lsh_topk_embeddings": q_lsh_topk_embeddings,
        "ivf_topk_embeddings": q_ivf_topk_embeddings,
        "overlay_star_intersection": q_overlay_star_intersection,
        "overlay_dart_intersection": q_overlay_dart_intersection,
        "delaunay_quad": q_delaunay_quad,
    }


# ---------------------------------------------------------------------------
# oracles


def _lang_sql() -> str:
    profiles = {
        "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
        "de": ["der", "die", "und", "das", "ist", "nicht", "von", "sie", "mit", "den"],
        "fr": ["le", "la", "les", "de", "et", "est", "que", "une", "dans", "pour"],
        "es": ["el", "la", "los", "de", "que", "y", "en", "un", "es", "por"],
    }
    langs = sorted(profiles)  # matches np.argmax order in lang_id
    scores = ", ".join(
        "len(regexp_extract_all(lower(coalesce(text,'')), '\\b("
        + "|".join(profiles[lang]) + ")\\b')) AS s_" + lang
        for lang in langs
    )
    # first-max-wins in sorted lang order == np.argmax tie rule
    case = "CASE "
    for k, lang in enumerate(langs):
        others = [f"s_{lang} >= s_{o}" for o in langs if o != lang]
        case += (f"WHEN s_{lang} > 0 AND " + " AND ".join(others)
                 + f" THEN '{lang}' ")
    case += "ELSE 'und' END"
    return f"""
        WITH scored AS (
            SELECT doc_id, {scores} FROM documents
        ), pred AS (
            SELECT doc_id, {case} AS lang_pred FROM scored
        )
        SELECT lang_pred, count(*) AS n FROM pred GROUP BY lang_pred
    """


def _laea_sql() -> str:
    """LAEA (EPSG method 9820, EPSG:3035 parameters) forward formulas in
    SQL — EPSG Guidance Note 7-2, iteration-free. Projection constants are
    inlined as IEEE-double literals computed with the same formulas."""
    import math

    f = 1.0 / 298.257223563
    e2 = f * (2 - f)
    e = math.sqrt(e2)
    a = 6378137.0
    qp = (1 - e2) * (1 / (1 - e2) - (1 / (2 * e)) * math.log((1 - e) / (1 + e)))
    phi0 = math.radians(52.0)
    s0 = math.sin(phi0)
    q0 = (1 - e2) * (s0 / (1 - e2 * s0 * s0)
                     - (1 / (2 * e)) * math.log((1 - e * s0) / (1 + e * s0)))
    beta0 = math.asin(q0 / qp)
    rq = a * math.sqrt(qp / 2)
    d = a * (math.cos(phi0) / math.sqrt(1 - e2 * s0 * s0)) / (rq * math.cos(beta0))
    sb0, cb0 = math.sin(beta0), math.cos(beta0)
    lon0 = math.radians(10.0)
    return f"""
        WITH pts AS (
            SELECT c_custkey,
                   (c_custkey * {_HA} % {_M32}) / {_M32}.0 * 40 - 10 AS lon,
                   (c_custkey * {_HB} % {_M32}) / {_M32}.0 * 25 + 35 AS lat
            FROM customer),
        t AS (
            SELECT c_custkey,
                   radians(lon) - {lon0!r} AS lam,
                   sin(radians(lat)) AS s
            FROM pts),
        q AS (
            SELECT c_custkey, lam,
                   asin({1 - e2!r} * (s / (1 - {e2!r} * s * s)
                        - {1 / (2 * e)!r} * ln((1 - {e!r} * s) / (1 + {e!r} * s)))
                        / {qp!r}) AS beta
            FROM t),
        bb AS (
            SELECT c_custkey, lam, beta,
                   {rq!r} * sqrt(2 / (1 + {sb0!r} * sin(beta)
                        + {cb0!r} * cos(beta) * cos(lam))) AS b
            FROM q)
        SELECT c_custkey,
               round(4321000.0 + (b * {d!r}) * cos(beta) * sin(lam), 3)
                 + 0.0 AS ex,
               round(3210000.0 + (b / {d!r}) * ({cb0!r} * sin(beta)
                     - {sb0!r} * cos(beta) * cos(lam)), 3) + 0.0 AS ny
        FROM bb
    """


def _aea_sql() -> str:
    """Albers Equal Area (EPSG method 9822, EPSG:5070 parameters) forward
    formulas in SQL — EPSG Guidance Note 7-2, iteration-free. GRS80
    projection constants inlined as IEEE-double literals computed with
    the same formulas the engine kernel uses (geom/crs.py)."""
    import math

    a = 6378137.0
    f = 1.0 / 298.257222101  # GRS80
    e2 = f * (2 - f)
    e = math.sqrt(e2)

    def q_of(phi):
        s = math.sin(phi)
        return (1 - e2) * (s / (1 - e2 * s * s)
                           - (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s)))

    p0, p1, p2 = (math.radians(v) for v in (23.0, 29.5, 45.5))
    m1 = math.cos(p1) / math.sqrt(1 - e2 * math.sin(p1) ** 2)
    m2 = math.cos(p2) / math.sqrt(1 - e2 * math.sin(p2) ** 2)
    q0, q1, q2 = q_of(p0), q_of(p1), q_of(p2)
    n = (m1 ** 2 - m2 ** 2) / (q2 - q1)
    c = m1 ** 2 + n * q1
    rho0 = a * math.sqrt(c - n * q0) / n
    lon0 = math.radians(-96.0)
    return f"""
        WITH pts AS (
            SELECT c_custkey,
                   (c_custkey * {_HA} % {_M32}) / {_M32}.0 * 45 - 120 AS lon,
                   (c_custkey * {_HB} % {_M32}) / {_M32}.0 * 23 + 25 AS lat
            FROM customer),
        t AS (
            SELECT c_custkey,
                   {n!r} * (radians(lon) - {lon0!r}) AS theta,
                   sin(radians(lat)) AS s
            FROM pts),
        r AS (
            SELECT c_custkey, theta,
                   {a!r} * sqrt({c!r} - {n!r} * ({1 - e2!r} * (s / (1 - {e2!r} * s * s)
                        - {1 / (2 * e)!r} * ln((1 - {e!r} * s) / (1 + {e!r} * s)))))
                        / {n!r} AS rho
            FROM t)
        SELECT c_custkey,
               round(rho * sin(theta), 3) + 0.0 AS ex,
               round({rho0!r} - rho * cos(theta), 3) + 0.0 AS ny
        FROM r
    """


def oracle_sql() -> dict[str, str]:
    pts = _PTS_SQL
    rects = _RECT_SQL
    join = f"""
        WITH pts AS ({pts}), rects AS ({rects})
        SELECT c_custkey, p_partkey FROM pts, rects
        WHERE x BETWEEN minx AND maxx AND y BETWEEN miny AND maxy
    """
    return {
        "sjoin_points_in_rects": join,
        "sjoin_count_by_rect": f"""
            WITH pts AS ({pts}), rects AS ({rects})
            SELECT p_partkey, count(*) AS n_points FROM pts, rects
            WHERE x BETWEEN minx AND maxx AND y BETWEEN miny AND maxy
            GROUP BY p_partkey
        """,
        "bbox_filter_cx": f"""
            WITH pts AS ({pts})
            SELECT c_custkey, x, y FROM pts
            WHERE x BETWEEN 0.2 AND 0.6 AND y BETWEEN 0.2 AND 0.7
        """,
        "dissolve_nation_bounds": f"""
            WITH pts AS (SELECT c_custkey, c_nationkey, {_PT_SQL_X} AS x,
                                {_PT_SQL_Y} AS y FROM customer)
            SELECT c_nationkey, count(*) AS n_points,
                   min(x) AS minx, min(y) AS miny,
                   max(x) AS maxx, max(y) AS maxy
            FROM pts GROUP BY c_nationkey
        """,
        "sjoin_nearest_center": f"""
            WITH pts AS ({pts}), rects AS ({rects}),
            centers AS (SELECT p_partkey, (minx+maxx)/2 AS cx,
                               (miny+maxy)/2 AS cy FROM rects),
            d AS (SELECT c_custkey, p_partkey,
                         sqrt((x-cx)*(x-cx) + (y-cy)*(y-cy)) AS dist
                  FROM pts, centers),
            r AS (SELECT c_custkey, p_partkey, dist,
                         rank() OVER (PARTITION BY c_custkey ORDER BY dist) AS rk
                  FROM d)
            SELECT c_custkey, p_partkey, round(dist, 9) AS dist_r
            FROM r WHERE rk = 1
        """,
        "morton_cells": f"""
            WITH pts AS ({pts})
            SELECT c_custkey, {_morton_sql('x', 'y', 8)} AS cell FROM pts
        """,
        "cell_cover_counts": f"""
            WITH rects AS ({rects})
            SELECT p_partkey,
                   CAST((floor(maxx*64) - floor(minx*64) + 1)
                      * (floor(maxy*64) - floor(miny*64) + 1) AS INT) AS n_cells
            FROM rects
        """,
        "tile_assignment": f"""
            WITH pts AS ({pts})
            SELECT c_custkey, {_morton_sql('x', 'y', 4)} AS tile FROM pts
        """,
        "clip_window_area": """
            WITH rects AS ({rects})
            SELECT p_partkey,
                   round(greatest(least(maxx, 0.75) - greatest(minx, 0.25), 0)
                       * greatest(least(maxy, 0.75) - greatest(miny, 0.25), 0), 9)
                       AS clip_area
            FROM rects
            WHERE least(maxx, 0.75) - greatest(minx, 0.25) > 0
              AND least(maxy, 0.75) - greatest(miny, 0.25) > 0
        """.format(rects=rects),
        "exact_dedup_docs": """
            SELECT count(DISTINCT lower(regexp_replace(text, '\\s+', ' ', 'g')))
                     AS n_unique,
                   count(*) AS n_docs
            FROM documents
        """,
        "token_stats": r"""
            SELECT doc_id,
                   CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(string_split_regex(trim(text), '\s+')) END
                     AS n_tokens,
                   length(text) AS n_chars_len
            FROM documents
        """,
        "quality_ratios": r"""
            SELECT doc_id,
                   round(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                         * 1.0 / greatest(length(text), 1), 9) AS alpha_r,
                   round(length(regexp_replace(text, '[^!-/:-@\[-`{-~]', '', 'g'))
                         * 1.0 / greatest(length(text), 1), 9) AS punct_r,
                   CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(string_split_regex(trim(text), '\s+')) END
                     AS n_tokens
            FROM documents
        """,
        "fingerprint": r"""
            SELECT doc_id,
                   md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
            FROM documents
        """,
        "lang_id": _lang_sql(),
        "cosine_topk": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qv
                       FROM embeddings WHERE vec_id < 5),
            s AS (SELECT q.query_id, e.vec_id AS corpus_id,
                         list_cosine_similarity(e.embedding, q.qv) AS score
                  FROM embeddings e, q),
            r AS (SELECT query_id, corpus_id,
                         row_number() OVER (PARTITION BY query_id
                                            ORDER BY score DESC, corpus_id)
                           AS rnk
                  FROM s)
            SELECT query_id, corpus_id, rnk FROM r WHERE rnk <= 3
        """,
        "hash_split": """
            WITH b AS (
                SELECT doc_id,
                       CAST(concat('0x', substr(md5(
                           CAST(doc_id AS VARCHAR) || 'r5'), 1, 8))
                         AS UBIGINT) % 1000000 AS bk
                FROM documents)
            SELECT doc_id,
                   CASE WHEN bk < 800000 THEN 'train'
                        WHEN bk < 900000 THEN 'val'
                        ELSE 'test' END AS split
            FROM b
        """,
        "pii_scrub": r"""
            WITH t AS (
                SELECT doc_id,
                       coalesce(text, '') || ' contact w' || doc_id
                       || '@example.com or 555-'
                       || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                       || '-'
                       || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                       || ' ip 10.' || CAST(doc_id % 256 AS VARCHAR)
                       || '.0.' || CAST(doc_id % 200 AS VARCHAR)
                       || ' ssn 123-45-6789 end' AS txt
                FROM documents)
            SELECT doc_id,
                   len(regexp_extract_all(txt,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                     AS n_email,
                   len(regexp_extract_all(txt,
                       '\b\d{3}-\d{2}-\d{4}\b')) AS n_ssn,
                   len(regexp_extract_all(txt,
                       '\+?\d{3}[-. ]\d{3}[-. ]\d{4}')) AS n_phone,
                   len(regexp_extract_all(txt,
                       '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))
                     AS n_ipv4,
                   md5(regexp_replace(regexp_replace(regexp_replace(
                       regexp_replace(txt,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                           '[email]', 'g'),
                           '\b\d{3}-\d{2}-\d{4}\b', '[ssn]', 'g'),
                           '\+?\d{3}[-. ]\d{3}[-. ]\d{4}', '[phone]', 'g'),
                           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
                           '[ipv4]', 'g')) AS fp
            FROM t
        """,
        "lsh_topk_recall": """
            SELECT DISTINCT vec_id AS query_id, TRUE AS recall_ge_08
            FROM embeddings WHERE vec_id < 5
        """,
        "embedding_near_dups": """
            SELECT vec_id AS id_a, vec_id + 10000 AS id_b FROM embeddings
        """,
        "ivf_topk_embeddings": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qv
                       FROM embeddings WHERE vec_id >= 5 AND vec_id < 10),
            s AS (SELECT q.query_id, e.vec_id AS corpus_id,
                         list_cosine_similarity(e.embedding, q.qv) AS score
                  FROM embeddings e, q),
            r AS (SELECT query_id, corpus_id,
                         row_number() OVER (PARTITION BY query_id
                                            ORDER BY score DESC, corpus_id)
                           AS rnk
                  FROM s)
            SELECT query_id, corpus_id, rnk FROM r WHERE rnk <= 3
        """,
        "events_topk_window": """
            WITH r AS (SELECT user_id, event_id,
                              row_number() OVER (PARTITION BY user_id
                                                 ORDER BY value DESC, event_id)
                                AS rnk
                       FROM events)
            SELECT user_id, event_id, rnk FROM r WHERE rnk <= 3
        """,
        "overlay_rect_intersection": f"""
            WITH rects AS ({rects}),
            a AS (SELECT * FROM rects WHERE p_partkey % 2 = 0),
            b AS (SELECT p_partkey AS q_partkey, minx, miny, maxx, maxy
                  FROM rects WHERE p_partkey % 2 = 1)
            SELECT a.p_partkey, b.q_partkey,
                   round((least(a.maxx, b.maxx) - greatest(a.minx, b.minx))
                       * (least(a.maxy, b.maxy) - greatest(a.miny, b.miny)), 9)
                       AS int_area
            FROM a, b
            WHERE least(a.maxx, b.maxx) - greatest(a.minx, b.minx) > 0
              AND least(a.maxy, b.maxy) - greatest(a.miny, b.miny) > 0
        """,
        "hilbert_keys": f"""
            WITH pts AS ({_PTS_SQL})
            SELECT c_custkey, hd AS hkey FROM ({_hilbert_sql('x', 'y', 8)})
        """,
        "overlay_dart_intersection": f"""
            WITH rects AS ({_RECT_SQL})
            SELECT p_partkey,
                   round(2 * ((maxx - minx) / 4) * ((maxx - minx) / 4), 9)
                     + 0.0 AS dart_ia
            FROM rects
        """,
        # Brute-force exact 5-char-shingle Jaccard over all pairs: the
        # engine's LSH (32 perms / 8 bands) has per-pair recall
        # 1-(1-J^4)^8 -- ~1.0 for the corpus's true near-dups (J >= 0.9),
        # and the hashing is seeded/deterministic, so candidates == truth
        # on this data (verified at sf0.01 and sf0.1); a genuinely
        # borderline-J corpus would surface as a row-count mismatch here
        # rather than silently passing.
        "minhash_near_dups": """
            WITH sh AS (
                SELECT doc_id,
                       list_distinct(list_transform(
                           generate_series(1, length(lower(text)) - 4),
                           i -> substr(lower(text), i, 5))) AS s
                FROM documents WHERE length(text) >= 5
            ), pairs AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       CAST(length(list_intersect(a.s, b.s)) AS DOUBLE) /
                       (length(a.s) + length(b.s)
                        - length(list_intersect(a.s, b.s))) AS jaccard
                FROM sh a, sh b WHERE a.doc_id < b.doc_id
            )
            SELECT id_a, id_b, round(jaccard, 9) + 0.0 AS jaccard
            FROM pairs WHERE jaccard >= 0.5
        """,
        # lsh_topk: rows-only (random-hyperplane bucketing not
        # SQL-expressible; recall vs cosine_topk pinned in pytest)
        "simhash_near_dups": _simhash_sql(),

        "transform_webmercator": f"""
            WITH pts AS ({_PTS_SQL})
            SELECT c_custkey,
                   round(radians(x) * 6378137.0, 3) + 0.0 AS mx,
                   round(6378137.0 * ln(tan(pi()/4 + radians(y)/2)), 3) + 0.0 AS my
            FROM pts
        """,
        "buffer_point_area": f"""
            SELECT c_custkey,
                   round(16.0 * sin(2*pi()/32.0) * 0.013 * 0.013, 9) AS barea
            FROM customer
        """,
        "buffer_styles": f"""
            WITH seg AS (
                SELECT p_partkey,
                       p_partkey * {_HA} % 16 + 5 AS l1,
                       p_partkey * {_HB} % 16 + 3 AS l2
                FROM part)
            SELECT p_partkey,
                   round(4.0 * (l1 + l2), 9) AS a_mitre,
                   round(4.0 * (l1 + l2) - 2.0, 9) AS a_bevel,
                   round(4.0 * (l1 + l2) + 16.0, 9) AS a_square,
                   round(2.0 * (l1 + l2) - 4.0, 9) AS a_ss_left,
                   round(2.0 * (l1 + l2) + 4.0, 9) AS a_ss_right
            FROM seg
        """,
        "union_rect_area": f"""
            WITH r AS ({_RECT_SQL}),
            a AS (SELECT p_partkey//2 AS k, minx, miny, maxx, maxy FROM r
                  WHERE p_partkey % 2 = 0),
            b AS (SELECT (p_partkey-1)//2 AS k, minx AS bminx, miny AS bminy,
                         maxx AS bmaxx, maxy AS bmaxy FROM r
                  WHERE p_partkey % 2 = 1)
            SELECT a.k,
                   round((a.maxx-a.minx)*(a.maxy-a.miny)
                       + (bmaxx-bminx)*(bmaxy-bminy)
                       - greatest(0, least(a.maxx,bmaxx)-greatest(a.minx,bminx))
                         * greatest(0, least(a.maxy,bmaxy)-greatest(a.miny,bminy)), 9)
                       AS u_area
            FROM a JOIN b ON a.k = b.k
        """,
        "segmentize_counts": f"""
            WITH r AS ({_RECT_SQL})
            SELECT p_partkey,
                   CAST(4 * ceil((maxx-minx) / 0.0097) + 1 AS INT) AS n_pts
            FROM r
        """,
        "min_bounding_radius": f"""
            WITH r AS ({_RECT_SQL})
            SELECT p_partkey, round((maxx-minx) * sqrt(2.0) / 2, 9) AS mbr
            FROM r
        """,
        "hausdorff_center": f"""
            WITH r AS ({_RECT_SQL})
            SELECT p_partkey, round((maxx-minx) * sqrt(2.0) / 2, 9) AS hd
            FROM r
        """,
        "geojson_roundtrip": f"""
            WITH pts AS ({_PTS_SQL})
            SELECT c_custkey, x, y FROM pts
        """,
        "gpkg_roundtrip": f"""
            WITH pts AS ({_PTS_SQL})
            SELECT c_custkey, x, y FROM pts
        """,
        "fgb_roundtrip": f"""
            WITH pts AS ({_PTS_SQL})
            SELECT c_custkey, x, y FROM pts
        """,
        "gml_mif_roundtrip": f"""
            WITH pts AS ({_PTS_SQL})
            SELECT c_custkey, x, y FROM pts
        """,
        # media_*: the oracle recomputes the closed-form pattern the
        # Spark side pushed through REAL PNG/BMP/WAV/MJPEG containers —
        # hash equality means encode->decode is exact end-to-end.
        "media_image_stats": """
            WITH p AS (SELECT c_custkey AS k,
                              4 + (c_custkey % 13) AS w,
                              4 + ((c_custkey // 13) % 11) AS h
                       FROM customer)
            SELECT k AS c_custkey, w, h,
                   min((x + 3*y + 7*ch + k) % 256) AS min_px,
                   max((x + 3*y + 7*ch + k) % 256) AS max_px,
                   round(CAST(sum((x + 3*y + 7*ch + k) % 256) AS DOUBLE)
                         / (w*h*3), 9) AS mean_px
            FROM p, range(0, 17) AS rx(x), range(0, 15) AS ry(y),
                 range(0, 3) AS rc(ch)
            WHERE x < w AND y < h
            GROUP BY k, w, h
        """,
        "media_audio_stats": """
            WITH p AS (SELECT c_custkey AS k, 64 + (c_custkey % 128) AS n
                       FROM customer),
            s AS (SELECT k, n, i,
                         ((40503*i + 2654435761*k) % 65536) - 32768 AS v
                  FROM p, range(0, 192) AS ri(i) WHERE i < n),
            w AS (SELECT *, lag(v) OVER (PARTITION BY k ORDER BY i) AS pv
                  FROM s)
            SELECT k AS c_custkey, n AS n_samples, max(abs(v)) AS peak,
                   CAST(sum(CASE WHEN i > 0 AND ((v < 0) != (pv < 0))
                            THEN 1 ELSE 0 END) AS INT) AS n_zc,
                   round(sqrt(sum((CAST(v AS DOUBLE)/32768)
                                  * (CAST(v AS DOUBLE)/32768)) / n), 9)
                       AS rms
            FROM w GROUP BY k, n
        """,
        "media_video_frames": """
            SELECT c_custkey,
                   CAST(ceil((2.0 + c_custkey % 4) / 2) AS INT)
                       AS n_sampled,
                   8 + (c_custkey % 9) AS w,
                   8 + ((c_custkey // 9) % 7) AS h
            FROM customer
        """,
        "repetition_stats": r"""
            WITH toks AS (
              SELECT doc_id,
                     CASE WHEN regexp_replace(lower(coalesce(text, '')),
                                              '^\s+|\s+$', '', 'g') = ''
                          THEN []::VARCHAR[]
                          ELSE string_split_regex(
                                 regexp_replace(lower(coalesce(text, '')),
                                                '^\s+|\s+$', '', 'g'),
                                 '\s+') END AS w
              FROM documents
            ), g AS (
              SELECT doc_id, concat(w[CAST(i AS BIGINT)], ' ',
                                    w[CAST(i + 1 AS BIGINT)]) AS gram
              FROM toks, UNNEST(generate_series(1, len(w) - 1)) AS u(i)
              WHERE len(w) >= 2
            ), topg AS (
              SELECT doc_id, max(c) AS top_2gram_n FROM (
                SELECT doc_id, gram, count(*) AS c
                FROM g GROUP BY doc_id, gram)
              GROUP BY doc_id
            )
            SELECT t.doc_id,
                   len(w) AS n_words,
                   len(list_distinct(w)) AS n_distinct_words,
                   coalesce(top_2gram_n, 0) AS top_2gram_n,
                   CASE WHEN len(w) = 0 THEN 0.0
                        ELSE round(1.0 - len(list_distinct(w))
                                 / CAST(len(w) AS DOUBLE), 9)
                   END AS dup_word_frac
            FROM toks t LEFT JOIN topg USING (doc_id)
        """,
        "spans_pipeline": f"""
            WITH d AS (
              SELECT o_orderkey,
                     (o_orderkey * 2654435761 % 4294967296) % 997 AS px,
                     (o_orderkey * 2246822519 % 4294967296) % 983 AS py,
                     o_orderpriority
              FROM orders
            )
            SELECT concat('doc-', lpad(CAST(o_orderkey AS VARCHAR), 12, '0'))
                       AS doc_id,
                   {_morton_sql('(px / 997.0)', '(py / 983.0)', 4)} AS tile,
                   px % 128 AS m_tx,
                   py % 128 AS m_ty,
                   md5(concat(
                     'text#', o_orderpriority, '##0',
                     '|text#POINT (', CAST(px AS VARCHAR), ' ',
                     CAST(py AS VARCHAR), ')##1',
                     '|media##tile://7/', CAST(px % 128 AS VARCHAR), '/',
                     CAST(py % 128 AS VARCHAR), '#2')) AS span_fp
            FROM d
        """,
        "decontaminate_docs": r"""
            WITH toks AS (
              SELECT doc_id,
                     string_split_regex(regexp_replace(lower(text),
                       '^\s+|\s+$', '', 'g'), '\s+') AS t
              FROM documents
            ), ng AS (
              SELECT DISTINCT doc_id,
                     array_to_string(
                       t[CAST(i AS BIGINT):CAST(i + 4 AS BIGINT)], ' ') AS g
              FROM toks, UNNEST(generate_series(1, len(t) - 4)) AS u(i)
              WHERE len(t) >= 5
              UNION
              SELECT doc_id, array_to_string(t, ' ') AS g
              FROM toks WHERE len(t) < 5
            ), bg AS (
              SELECT DISTINCT g FROM ng WHERE doc_id % 37 = 0
            ), hits AS (
              SELECT ng.doc_id, count(*) AS n_overlap
              FROM ng JOIN bg USING (g) GROUP BY 1
            )
            SELECT d.doc_id, coalesce(h.n_overlap, 0) AS n_overlap,
                   CAST(coalesce(h.n_overlap, 0) >= 2 AS INT)
                       AS contaminated
            FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
        """,
        "overlay_star_candidates": f"""
            WITH r AS ({_RECT_SQL}),
            b AS ({_star_bbox_sql()})
            SELECT a.p_partkey, q.p_partkey AS q_partkey,
                   round((least(a.bmaxx, q.bmaxx) - greatest(a.bminx, q.bminx))
                       * (least(a.bmaxy, q.bmaxy) - greatest(a.bminy, q.bminy)),
                         9) AS env_ia
            FROM b a JOIN b q
              ON a.p_partkey % 2 = 0 AND q.p_partkey % 2 = 1
             AND a.bminx <= q.bmaxx AND q.bminx <= a.bmaxx
             AND a.bminy <= q.bmaxy AND q.bminy <= a.bmaxy
        """,
        "shapefile_roundtrip": """
            SELECT p_partkey,
                   round(CAST(0.02 + (p_partkey % 10) * 0.005 AS DOUBLE)
                         * CAST(0.02 + (p_partkey % 10) * 0.005 AS DOUBLE),
                         9) AS area
            FROM part
        """,
        "render_density": f"""
            WITH pts AS ({_PTS_SQL})
            SELECT CAST(floor(y * 64) AS BIGINT) * 64
                     + CAST(floor(x * 64) AS BIGINT) AS pixel,
                   count(*) AS n
            FROM pts GROUP BY 1
        """,
        "sql_roundtrip": f"""
            SELECT c_custkey, {_PT_SQL_X} AS x, {_PT_SQL_Y} AS y
            FROM customer
        """,
        "render_choropleth": f"""
            WITH pts AS (
              SELECT c_acctbal, {_PT_SQL_X} AS x, {_PT_SQL_Y} AS y
              FROM customer
            )
            SELECT CAST(floor(y * 64) AS BIGINT) * 64
                     + CAST(floor(x * 64) AS BIGINT) AS pixel,
                   round(avg(c_acctbal), 9) AS v
            FROM pts GROUP BY 1
        """,
        "geocode_nations": f"""
            SELECT c_custkey, n_name AS matched_address,
                   round((n_nationkey * {_HA} % {_M32}) / {_M32}.0, 9)
                     AS gx,
                   round((n_nationkey * {_HB} % {_M32}) / {_M32}.0, 9)
                     AS gy
            FROM customer JOIN nation ON c_nationkey = n_nationkey
        """,
        "ngram_jaccard_pairs": r"""
            WITH toks AS (
              SELECT doc_id,
                     string_split_regex(regexp_replace(lower(text),
                       '^\s+|\s+$', '', 'g'), '\s+') AS t
              FROM documents
            ), ng AS (
              SELECT DISTINCT doc_id,
                     array_to_string(
                       t[CAST(i AS BIGINT):CAST(i + 2 AS BIGINT)], ' ') AS g
              FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS u(i)
              WHERE len(t) >= 3
              UNION
              SELECT doc_id, array_to_string(t, ' ') AS g
              FROM toks WHERE len(t) < 3
            ), cnt AS (
              SELECT doc_id, count(*) AS n FROM ng GROUP BY doc_id
            ), inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
              FROM ng a JOIN ng b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT id_a, id_b,
                   round(i * 1.0 / (ca.n + cb.n - i), 9) AS jaccard
            FROM inter
            JOIN cnt ca ON ca.doc_id = id_a
            JOIN cnt cb ON cb.doc_id = id_b
            WHERE i * 1.0 / (ca.n + cb.n - i) >= 0.2
        """,
        "disjoint_window": f"""
            WITH pts AS ({_PTS_SQL})
            SELECT c_custkey, round(x, 9) AS x, round(y, 9) AS y FROM pts
            WHERE NOT (x BETWEEN 0.2 AND 0.6 AND y BETWEEN 0.2 AND 0.7)
        """,
        "make_valid_bowtie_area": f"""
            WITH rects AS ({{rects}})
            SELECT p_partkey,
                   round((maxx - minx) * (maxy - miny) / 2, 9) AS fixed_area
            FROM rects
        """.format(rects=rects),
        "skew_transform_points": f"""
            WITH pts AS ({_PTS_SQL})
            SELECT c_custkey,
                   round(x + tan(radians(30)) * y, 9) AS skx,
                   round(y, 9) AS sky,
                   round(x * 2, 9) AS tfx
            FROM pts
        """,
        "boolean_ops_area": f"""
            WITH rects AS ({{rects}}),
            i AS (SELECT p_partkey,
                         (maxx - minx) * (maxy - miny) AS ra,
                         greatest(least(maxx, 0.75) - greatest(minx, 0.25), 0)
                       * greatest(least(maxy, 0.75) - greatest(miny, 0.25), 0)
                           AS ia
                  FROM rects)
            SELECT p_partkey,
                   round(ra + 0.25 - ia, 9) AS u_area,
                   round(ra - ia, 9) AS d_area,
                   round(ra + 0.25 - 2 * ia, 9) AS x_area
            FROM i
        """.format(rects=rects),
        "delaunay_quad": f"""
            WITH r AS ({rects})
            SELECT p_partkey, CAST(2 AS INT) AS n_tris,
                   round((maxx - minx) * (maxy - miny), 9) AS tri_area
            FROM r
        """,
        "voronoi_rect_cells": f"""
            WITH r AS ({rects})
            SELECT p_partkey, CAST(4 AS INT) AS n_cells,
                   round(4 * (maxx - minx) * (maxy - miny), 9) AS cell_area
            FROM r
        """,
        "polygonize_rect": f"""
            WITH r AS ({rects})
            SELECT p_partkey, CAST(1 AS INT) AS n_polys,
                   round((maxx - minx) * (maxy - miny), 9) AS poly_area
            FROM r
        """,
        "min_rotated_rect": f"""
            WITH r AS ({rects})
            SELECT p_partkey,
                   round((maxx - minx) * (maxy - miny), 9) AS mrr_area
            FROM r
        """,
        "relate_point_rect": f"""
            WITH r AS ({rects})
            SELECT p_partkey,
                   CASE WHEN p_partkey % 3 = 1 THEN '0FFFFF212'
                        ELSE 'FF0FFF212' END AS de9im,
                   (p_partkey % 3 = 1) AS within_p
            FROM r
        """,
        "line_interpolate_project": f"""
            WITH r AS ({rects})
            SELECT p_partkey,
                   round(minx + 0.25 * (maxx - minx), 9) AS ipx,
                   round(miny + 0.25 * (maxy - miny), 9) AS ipy,
                   round(sqrt((maxx-minx)*(maxx-minx)
                            + (maxy-miny)*(maxy-miny)) / 2, 9) AS proj_d
            FROM r
        """,
        "line_offset_frechet": f"""
            WITH r AS ({rects})
            SELECT p_partkey,
                   round(sqrt((maxx-minx)*(maxx-minx)
                            + (maxy-miny)*(maxy-miny)), 9) AS off_len,
                   round(0.01, 9) AS fre_d,
                   round(0.003 + (p_partkey % 5) * 0.002, 9) AS gap_len
            FROM r
        """,
        "hull_points_area": f"""
            WITH r AS ({rects})
            SELECT p_partkey,
                   round((maxx - minx) * (maxy - miny), 9) AS hull_area,
                   CAST(5 AS BIGINT) AS hull_npts,
                   round((maxx - minx) * (maxy - miny), 9) AS chull_area
            FROM r
        """,
        "bbox_partition_pruned": f"""
            WITH pts AS ({_PTS_SQL})
            SELECT c_custkey, round(x, 9) AS x, round(y, 9) AS y FROM pts
            WHERE x BETWEEN 0.25 AND 0.65 AND y BETWEEN 0.3 AND 0.8
        """,
        "rasterize_coverage": f"""
            WITH r AS ({rects})
            SELECT p_partkey,
                   CAST((floor(maxx * 256 - 0.5) - ceil(minx * 256 - 0.5) + 1)
                      * (floor(maxy * 256 - 0.5) - ceil(miny * 256 - 0.5) + 1)
                      AS BIGINT) AS n_pix
            FROM r
        """,
        "line_merge_chain": f"""
            WITH r AS ({rects})
            SELECT p_partkey, CAST(3 AS BIGINT) AS n_pts,
                   round(2 * (maxx - minx), 9) AS mlen
            FROM r
        """,
        "constructive_scalars": f"""
            WITH r AS ({rects})
            SELECT p_partkey,
                   round(4 * (maxx - minx), 9) AS blen,
                   round((maxx - minx) * (maxy - miny), 9) AS earea,
                   round(maxx, 9) AS rx
            FROM r
        """,
        "explode_corners": f"""
            WITH r AS ({rects}),
            k AS (SELECT * FROM (VALUES (0), (1), (2), (3)) AS t(pidx))
            SELECT p_partkey, CAST(pidx AS INT) AS pidx,
                   round(CASE WHEN pidx IN (1, 2) THEN maxx ELSE minx END,
                         9) AS px,
                   round(CASE WHEN pidx IN (2, 3) THEN maxy ELSE miny END,
                         9) AS py
            FROM r, k
        """,
        "intersection_all_groups": f"""
            WITH r AS ({rects}),
            w AS (SELECT CAST(p_partkey % 10 AS INT) AS grp,
                         0.2 * minx AS x1, 0.2 * miny AS y1,
                         0.2 * maxx + 0.78 AS x2, 0.2 * maxy + 0.78 AS y2
                  FROM r)
            SELECT grp,
                   round((min(x2) - max(x1)) * (min(y2) - max(y1)), 9) AS ia
            FROM w GROUP BY grp
        """,
        "nearest_line": f"""
            WITH pts AS ({pts}), r AS ({rects}),
            d AS (SELECT c_custkey, p_partkey,
                         greatest(0.0, least(1.0,
                             ((x - minx) * (maxx - minx)
                            + (y - miny) * (maxy - miny))
                           / ((maxx - minx) * (maxx - minx)
                            + (maxy - miny) * (maxy - miny)))) AS t,
                         x, y, minx, miny, maxx, maxy
                  FROM pts, r),
            dd AS (SELECT c_custkey, p_partkey,
                          sqrt((x - (minx + t * (maxx - minx)))
                             * (x - (minx + t * (maxx - minx)))
                             + (y - (miny + t * (maxy - miny)))
                             * (y - (miny + t * (maxy - miny)))) AS dist
                   FROM d),
            rk AS (SELECT c_custkey, p_partkey, dist,
                          rank() OVER (PARTITION BY c_custkey
                                       ORDER BY dist) AS rnk
                   FROM dd)
            SELECT c_custkey, p_partkey, round(dist, 9) AS dist_r
            FROM rk WHERE rnk = 1
        """,
        "stream_tile_counts": f"""
            WITH pts AS (
                SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS win_s,
                       (event_id * {_HA} % {_M32}) / {_M32}.0 AS x,
                       (event_id * {_HB} % {_M32}) / {_M32}.0 AS y
                FROM events)
            SELECT win_s, {_morton_sql('x', 'y', 4)} AS tile,
                   count(*) AS n
            FROM pts GROUP BY win_s, tile
        """,
        "dwithin_join": f"""
            WITH pts AS ({pts}),
            ctr AS (
                SELECT p_partkey,
                       0.9 * ((p_partkey * {_HA} % {_M32}) / {_M32}.0)
                         + (0.02 + (p_partkey % 10) * 0.005) / 2 AS cx,
                       0.9 * ((p_partkey * {_HB} % {_M32}) / {_M32}.0)
                         + (0.02 + (p_partkey % 10) * 0.005) / 2 AS cy
                FROM part)
            SELECT c_custkey, p_partkey
            FROM pts, ctr
            WHERE sqrt((x - cx) * (x - cx) + (y - cy) * (y - cy)) <= 0.025
        """,
        "laea_transform": _laea_sql(),
        "albers_transform": _aea_sql(),
        "utm_zone_estimate": f"""
            WITH pts AS (
                SELECT c_nationkey,
                       (c_custkey * {_HA} % {_M32}) / {_M32}.0 * 360 - 180 AS lon,
                       (c_custkey * {_HB} % {_M32}) / {_M32}.0 * 160 - 80 AS lat
                FROM customer),
            b AS (SELECT c_nationkey,
                         (min(lon) + max(lon)) / 2 AS clon,
                         (min(lat) + max(lat)) / 2 AS clat
                  FROM pts GROUP BY c_nationkey)
            SELECT CAST(c_nationkey AS BIGINT) AS nk,
                   CAST(CASE WHEN clat >= 0 THEN 32600 ELSE 32700 END
                        + (CAST(floor((clon + 180) / 6) AS BIGINT) % 60) + 1
                        AS BIGINT) AS epsg
            FROM b
        """,
    }
