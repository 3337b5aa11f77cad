"""Distributed spatial join — the engine's flagship operator.

Reference contract: ``geopandas.sjoin`` (/root/reference/geopandas/tools/
sjoin.py:11-97): pair (l, r) kept iff predicate(l.geom, r.geom); how in
{inner, left, right}; optional ``on_attribute`` equality conjunct;
column collisions suffixed (sjoin.py:193-224); outer rows null-padded
(sjoin.py:239-262).

Physical plan (SURVEY.md §2.4 / §4), designed for 1000-executor scale:

1. **Cover**: each side computes bbox -> quadtree cell cover at a shared
   resolution (adaptive if not given) — one Arrow-UDF projection, no
   shuffle.
2. **Coarse join**: explode cells, hash equi-join on (cell [, salt]
   [, on_attribute...]). The small side is broadcast when below threshold;
   otherwise a shuffle join with AQE skew splitting plus *explicit salting*
   of hot cells (north rule: explicit skew handling — ocean/megacity cells
   are replicated on the build side, probe rows hash into salt buckets).
3. **Dedupe**: a pair can share several cells -> dropDuplicates on ids.
4. **Refine**: exact predicate via the vectorized numpy kernels
   (geom/predicates.py) — the distributed analogue of the reference's
   prepared-geometry refinement (sindex.py:86-87).
5. **Assemble**: suffix collided columns, attach ``index_right``
   (``index_left`` for how='right'), null-pad outer rows via anti-join.

At 100 TB the dominant cost is the coarse-join shuffle; the cell id is a
single int64 so shuffle rows are (cell, id, wkb). Resolution is chosen so
an average geometry covers ~1-2 cells (index/cells.pick_resolution),
bounding both candidate-pair inflation and refine selectivity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..functions.st import st_bounds, st_cells_from_bbox, st_predicate
from ..index.cells import DOMAIN_UNIT, pick_resolution

VALID_HOW = ("inner", "left", "right")
VALID_PRED = (
    "intersects", "contains", "contains_properly", "within", "covers",
    "covered_by", "touches", "crosses", "overlaps", "dwithin", "equals",
)


def _check_crs_like(left_geom: str, right_geom: str) -> None:
    # CRS metadata travels at the table level in this engine; equality is
    # asserted by callers that attach it (sources/geoparquet.py). The
    # reference warns on mismatch (array.py:38-63).
    return None


def _suffix_columns(left: DataFrame, right: DataFrame, lsuffix: str,
                    rsuffix: str, exclude: set[str]):
    """Reference collision rule (tools/sjoin.py:193-224): columns present
    on both sides get '{name}_{lsuffix}' / '{name}_{rsuffix}'."""
    lcols = [c for c in left.columns if c not in exclude]
    rcols = [c for c in right.columns if c not in exclude]
    shared = set(lcols) & set(rcols)
    lmap = {c: (f"{c}_{lsuffix}" if c in shared else c) for c in lcols}
    rmap = {c: (f"{c}_{rsuffix}" if c in shared else c) for c in rcols}
    return lmap, rmap


def _bbox_stats(left: DataFrame, right: DataFrame) -> list[dict]:
    """ONE tiny agg job: avg + max bbox extents of both sides."""
    aggs = [
        F.avg(F.col("__bb.maxx") - F.col("__bb.minx")).alias("aw"),
        F.avg(F.col("__bb.maxy") - F.col("__bb.miny")).alias("ah"),
        F.max(F.col("__bb.maxx") - F.col("__bb.minx")).alias("mw"),
        F.max(F.col("__bb.maxy") - F.col("__bb.miny")).alias("mh"),
        F.count(F.lit(1)).alias("n"),
    ]
    rows = (
        left.select(F.lit(0).alias("side"), "__bb").groupBy("side").agg(*aggs)
        .unionAll(right.select(F.lit(1).alias("side"), "__bb").groupBy("side").agg(*aggs))
        .collect()
    )
    out = [dict(aw=0.0, ah=0.0, mw=0.0, mh=0.0, n=0),
           dict(aw=0.0, ah=0.0, mw=0.0, mh=0.0, n=0)]
    for r in rows:
        out[r["side"]] = {k: (r[k] or 0) for k in ("aw", "ah", "mw", "mh", "n")}
    return out


# exploded build-side rows below this -> broadcast the exploded cell cover
# instead of shuffling both sides (UDF-derived sizes defeat AQE's own
# auto-broadcast estimation, so the operators decide from the stats job)
BROADCAST_ROWS = 100_000
BROADCAST_EXPLODED_ROWS = 2_000_000


def _est_exploded(stats: dict, resolution: int, domain, pad: float = 0.0) -> float:
    """Estimated exploded cell-cover rows for a side (n x avg cells)."""
    from ..index.cells import cell_size

    cw, ch = cell_size(resolution, domain)
    cells = (stats["aw"] + 2 * pad) / cw + 1.5
    cells *= (stats["ah"] + 2 * pad) / ch + 1.5
    return stats["n"] * max(cells, 1.0)


def _estimate_resolution(stats: list[dict], domain) -> int:
    avg_w = max(stats[0]["aw"], stats[1]["aw"])
    avg_h = max(stats[0]["ah"], stats[1]["ah"])
    if avg_w == 0.0 and avg_h == 0.0:
        # pure point data both sides: fine grid, capped
        return 12
    return pick_resolution(avg_w, avg_h, domain=domain, target_cells=1.0)


def _min_cover_res(stats: dict, resolution: int, domain, pad: float = 0.0,
                   max_cells: int = 4096) -> int:
    """Lower bound on the per-row cover res this side can produce
    (bbox_cover's max_cells fallback on the largest bbox, worst grid
    alignment). Never higher than any actual row's res."""
    from ..index.cells import cell_size

    w = stats["mw"] + 2 * pad
    h = stats["mh"] + 2 * pad
    for r in range(resolution, 0, -1):
        cw, ch = cell_size(r, domain)
        nx = int(np.floor(w / cw)) + 2
        ny = int(np.floor(h / ch)) + 2
        if nx * ny <= max_cells:
            return r
    return 0


def _ancestors_udf(down_to: int):
    """array<long> cells -> cells + ancestor chain down to ``down_to``.

    Vectorized over the whole Arrow batch: flat-offset parent math
    (_flat_ancestors) + one lexsort for the per-row unique — no per-row
    Python loop (round-2 verdict item; the broadcast-probe path got the
    same treatment in session 3)."""

    @pandas_udf("array<long>")
    def _f(cells: pd.Series) -> pd.Series:
        import pyarrow as pa

        n = len(cells)
        arr = pa.array(cells, type=pa.list_(pa.int64()))
        offs = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = arr.values.to_numpy(zero_copy_only=False).astype(
            np.int64, copy=False)
        lens = np.diff(offs)
        prow = np.repeat(np.arange(n, dtype=np.int64), lens)
        nulls = None
        if arr.null_count:
            nulls = arr.is_null().to_numpy(zero_copy_only=False)
            keep = ~np.repeat(nulls, lens)
            flat, prow = flat[keep], prow[keep]
        cflat, crow = _flat_ancestors(flat, prow, down_to)
        order = np.lexsort((cflat, crow))
        cs, rs = cflat[order], crow[order]
        first = np.ones(len(cs), dtype=bool)
        first[1:] = (cs[1:] != cs[:-1]) | (rs[1:] != rs[:-1])
        cs, rs = cs[first], rs[first]
        bounds_ = np.append(0, np.cumsum(np.bincount(rs, minlength=n)))
        out = [None if (nulls is not None and nulls[i])
               else cs[bounds_[i]:bounds_[i + 1]]
               for i in range(n)]
        return pd.Series(out, dtype=object)

    return _f


def _refine_rp_udf(pred: str, resolution: int, domain, distance, lpad: float):
    """Exact predicate AND reference-point dedup in one Arrow pass.

    A candidate pair that shares k cover cells is evaluated k times but
    kept exactly once: in the canonical cell — the cell (at the pair's
    coarser per-row cover res) containing (max(minx), max(miny)) of the
    two bboxes. Replaces a dropDuplicates shuffle with pure map-side math;
    the canonical cell is always among the joined cells because it lies in
    both bboxes and both sides emit ancestors down to the other's min res.

    Bounds arrive as columns carried through the cell join (computed once
    in _prep_side) — round 1 recomputed them from a second decode here.
    """

    @pandas_udf("boolean")
    def _f(lg: pd.Series, rg: pd.Series, cell: pd.Series,
           lmnx: pd.Series, lmny: pd.Series, lmxx: pd.Series, lmxy: pd.Series,
           rmnx: pd.Series, rmny: pd.Series, rmxx: pd.Series, rmxy: pd.Series,
           ) -> pd.Series:
        from ..geom.predicates import pairwise_predicate
        from ..geom.wkb import from_wkb
        from ..index import cells as C

        # candidate batches repeat the same build-side geometry many
        # times (every probe row joined to a rect repeats the rect WKB):
        # decode UNIQUES once and gather — WKB parse is the hot cost
        lcod, luniq = pd.factorize(lg, use_na_sentinel=False)
        rcod, runiq = pd.factorize(rg, use_na_sentinel=False)
        lb = from_wkb(pd.Series(luniq))
        rb = from_wkb(pd.Series(runiq))
        # all-unique columns factorize to identity codes -> skip the gather
        if len(luniq) != len(lg):
            lb = lb.take(lcod)
        if len(runiq) != len(rg):
            rb = rb.take(rcod)
        ok = pairwise_predicate(pred, lb, rb, distance)
        lbb = np.nan_to_num(np.column_stack([
            lmnx.to_numpy(np.float64), lmny.to_numpy(np.float64),
            lmxx.to_numpy(np.float64), lmxy.to_numpy(np.float64)]))
        rbb = np.nan_to_num(np.column_stack([
            rmnx.to_numpy(np.float64), rmny.to_numpy(np.float64),
            rmxx.to_numpy(np.float64), rmxy.to_numpy(np.float64)]))
        if lpad:
            lbb = lbb + np.array([-lpad, -lpad, lpad, lpad])
        rl = C.cover_res(lbb[:, 0], lbb[:, 1], lbb[:, 2], lbb[:, 3],
                         resolution, domain=domain)
        rr = C.cover_res(rbb[:, 0], rbb[:, 1], rbb[:, 2], rbb[:, 3],
                         resolution, domain=domain)
        rc = np.minimum(rl, rr)
        rx = np.maximum(lbb[:, 0], rbb[:, 0])
        ry = np.maximum(lbb[:, 1], rbb[:, 1])
        canon = np.empty(len(rc), dtype=np.int64)
        for r in np.unique(rc):
            m = rc == r
            canon[m] = C.point_cell(rx[m], ry[m], int(r), domain)
        return pd.Series(ok & (canon == cell.to_numpy(dtype=np.int64)))

    return _f


def _widen(df: DataFrame) -> DataFrame:
    from ..conf import widen

    return widen(df)


# worker-process cache of decoded broadcast build sides, keyed by a
# plan-time UUID (a pyspark Broadcast's .value is re-read per task; the
# decoded GeometryBatch must survive across tasks of the same worker)
_BUILD_CACHE: dict = {}
_BUILD_CACHE_MAX = 4


def _flat_ancestors(cflat: np.ndarray, prow: np.ndarray, down_to: int):
    """Vectorized ancestor chain over a flat (cell, row) cover: append each
    cell's parents from its res down to ``down_to``. Same cells as
    _ancestors_udf (without the per-row unique — duplicate lookup cells are
    deduped later at the pair level)."""
    from ..index import cells as C

    if not len(cflat):
        return cflat, prow
    rs = C.cell_res(cflat)
    top = int(rs.max())
    outs_c = [cflat]
    outs_p = [prow]
    for s in range(1, top - down_to + 1):
        m = rs - s >= down_to
        if not m.any():
            break
        outs_c.append(C.parent(cflat[m], s))
        outs_p.append(prow[m])
    if len(outs_c) == 1:
        return cflat, prow
    return np.concatenate(outs_c), np.concatenate(outs_p)


def _collect_build_index(rcov, rid: str):
    """Arrow-collect a (rid, __rgeom, __cells) build side into a broadcast
    cell->row CSR index (+ raw WKB). Shared by the sjoin broadcast probe
    and overlay's broadcast intersection probe. Returns
    (cache_key, broadcast, n_build_rows, rid_values)."""
    import uuid

    spark = rcov.sparkSession
    tbl = (rcov.select(F.col(rid).alias("i"), F.col("__rgeom").alias("g"),
                       F.col("__cells").alias("c"))
           .toArrow().combine_chunks())
    nb = tbl.num_rows
    rid_vals = np.asarray(tbl["i"].to_pandas(), dtype=object)
    rwkb: list = tbl["g"].to_pylist()
    ccol = tbl["c"].combine_chunks()
    flat = ccol.values.to_numpy(zero_copy_only=False).astype(np.int64,
                                                             copy=False)
    offs = ccol.offsets.to_numpy(zero_copy_only=False).astype(np.int64,
                                                              copy=False)
    lens = np.diff(offs)
    if len(flat):
        fc = flat
        fi = np.repeat(np.arange(nb, dtype=np.int64), lens)
        if ccol.null_count:
            # drop flat entries that belong to null list rows (offsets may
            # still span them)
            keep = ~np.repeat(ccol.is_null().to_numpy(zero_copy_only=False),
                              lens)
            fc = fc[keep]
            fi = fi[keep]
        o = np.argsort(fc, kind="stable")
        fc = fc[o]
        fi = fi[o]
        ucells, starts = np.unique(fc, return_index=True)
        off = np.append(starts, len(fc)).astype(np.int64)
    else:
        ucells = np.empty(0, np.int64)
        off = np.zeros(1, np.int64)
        fi = np.empty(0, np.int64)
    cache_key = uuid.uuid4().hex
    bc = spark.sparkContext.broadcast(
        {"wkb": rwkb, "ucells": ucells, "off": off, "ridx": fi})
    return cache_key, bc, nb, rid_vals


def _load_build(cache_key: str, bc):
    """Worker-side: decoded build batch from the process cache (decode
    once per worker, reused across tasks). Returns
    (batch, bounds, ucells, off, ridx, raw_wkb_list)."""
    got = _BUILD_CACHE.get(cache_key)
    if got is None:
        from ..geom.kernels import bounds as _bounds
        from ..geom.wkb import from_wkb

        v = bc.value
        rb_all = from_wkb(pd.Series(v["wkb"]))
        rbb = np.nan_to_num(_bounds(rb_all))
        got = (rb_all, rbb, v["ucells"], v["off"], v["ridx"], v["wkb"])
        if len(_BUILD_CACHE) >= _BUILD_CACHE_MAX:
            _BUILD_CACHE.pop(next(iter(_BUILD_CACHE)))
        _BUILD_CACHE[cache_key] = got
    return got


def _broadcast_probe_refined(lraw, rcov, lid: str, rid: str, predicate: str,
                             distance, lpad: float, resolution: int, domain,
                             anc_down_to: int | None,
                             emit_geom: bool = False):
    """Broadcast spatial join as a single probe-side ``mapInPandas`` pass.

    Round-2 scale fix: the round-1 plan materialized every candidate
    pair's full payload (probe WKB + build WKB + two bbox structs +
    cell ≈ 300 B/pair) through Arrow into a refine UDF — O(pairs) wire
    traffic, tens of GB at 10^8 candidate pairs, and a per-pair build
    WKB decode.  Here the build side (already small enough to broadcast
    by this path's precondition) is shipped ONCE per worker as a cell→
    row CSR index + WKB list, decoded ONCE per worker process, and the
    probe side streams through a single Arrow pass with NO join, NO
    explode and NO pair materialization: candidates are generated
    in-kernel from the CSR, deduped per probe row, and refined against
    the cached decoded build batch.  Wire traffic is O(|probe| +
    |build|) + O(|matches|) id pairs out.

    ``lraw`` carries ONLY (lid, __lgeom): bounds, cell cover and the
    ancestor chain are computed in-kernel from the decoded geometry
    (vectorized bbox_cover over flat offsets), so the probe side pays a
    single Arrow stage — the earlier plan ran st_bounds +
    st_cells_from_bbox + a per-row-Python _ancestors_udf upstream and
    shipped the cell arrays through Arrow.

    Returns a DataFrame (__xlid, __xrid[, __lgeom]) of matched pairs —
    ``emit_geom`` rides the probe WKB along only when the caller will
    consume it directly (the narrow assembly fast path); every other
    consumer re-joins attributes by id, so shipping WKB per match
    through Arrow would be pure serialization waste.
    """
    # Arrow collect + vectorized CSR build: the row-wise collect() plus a
    # per-row Python loop here was the dominant SERIAL cost of the whole
    # join (Amdahl fit on the 1M x 100k scaling input put ~18 s of the
    # local[2] 59 s outside the parallel fraction). toArrow() lands the
    # cell lists as one flat int64 buffer + offsets, so the cell->row
    # index is pure numpy.
    cache_key, bc, nb, rid_vals = _collect_build_index(rcov, rid)

    lid_t = dict(lraw.dtypes)[lid]
    rid_t = dict(rcov.dtypes)[rid]
    probe = lraw.select(F.col(lid).alias("__xlid"), "__lgeom")
    pad = float(lpad or 0.0)

    def fn(it):
        from ..geom.kernels import bounds as _bounds
        from ..geom.predicates import pairwise_predicate
        from ..geom.ragged import _expand_ranges
        from ..geom.wkb import from_wkb
        from ..index import cells as C

        rb_all, rbb, uc, off_, ridx, _ = _load_build(cache_key, bc)
        for pdf in it:
            if len(pdf) == 0 or len(uc) == 0:
                continue
            lb = from_wkb(pdf["__lgeom"])
            lbb = _bounds(lb)
            miss = np.isnan(lbb[:, 0])
            lbb = np.nan_to_num(lbb)
            if pad:
                lbb = lbb + np.array([-pad, -pad, pad, pad])
            # in-kernel cover: flat (cell, row) pairs straight from the
            # padded bounds — no object lists, no per-row Python
            cflat, coff = C.bbox_cover(lbb[:, 0], lbb[:, 1],
                                       lbb[:, 2], lbb[:, 3],
                                       resolution, domain=domain)
            ncell = np.diff(coff)
            prow = np.repeat(np.arange(len(pdf)), ncell)
            if miss.any():
                keep = ~miss[prow]
                cflat = cflat[keep]
                prow = prow[keep]
            multi = bool((ncell > 1).any())
            if anc_down_to is not None:
                n0 = len(cflat)
                cflat, prow = _flat_ancestors(cflat, prow, anc_down_to)
                multi = multi or len(cflat) > n0
            if not len(cflat):
                continue
            pos = np.minimum(np.searchsorted(uc, cflat), len(uc) - 1)
            okc = uc[pos] == cflat
            cnt = np.where(okc, off_[pos + 1] - off_[pos], 0)
            sel = cnt > 0
            if not sel.any():
                continue
            li = np.repeat(prow[sel], cnt[sel])
            ri = ridx[_expand_ranges(off_[pos[sel]], off_[pos[sel]] + cnt[sel])]
            # multi-cell probes can produce the same pair via several
            # cells: dedup on the (probe, build) key (in-kernel — the
            # round-1 plan needed a canonical-cell rule for this)
            if multi:
                key = li * np.int64(nb) + ri
                ukey = np.unique(key)
                li = (ukey // nb).astype(np.int64)
                ri = (ukey % nb).astype(np.int64)
            lids = pdf["__xlid"].to_numpy()
            lws = pdf["__lgeom"].to_numpy(dtype=object) if emit_geom else None
            o_lid = []
            o_rid = []
            o_lw = []
            from ._cellstream import BUFFER_ROWS as _CAP

            for lo in range(0, len(li), _CAP):
                ls = li[lo:lo + _CAP]
                rs = ri[lo:lo + _CAP]
                # bbox prefilter (lbb already dwithin-padded): prunes
                # exact predicate work; any predicate in VALID_PRED is
                # false on bbox-disjoint (beyond pad) pairs
                pre = ((lbb[ls, 0] <= rbb[rs, 2])
                       & (rbb[rs, 0] <= lbb[ls, 2])
                       & (lbb[ls, 1] <= rbb[rs, 3])
                       & (rbb[rs, 1] <= lbb[ls, 3]))
                ls = ls[pre]
                rs = rs[pre]
                if not len(ls):
                    continue
                ok = pairwise_predicate(predicate, lb.take(ls),
                                        rb_all.take(rs), distance)
                ls = ls[ok]
                rs = rs[ok]
                if not len(ls):
                    continue
                o_lid.append(lids[ls])
                o_rid.append(rid_vals[rs])
                if emit_geom:
                    o_lw.append(lws[ls])
            if o_lid:
                d = {"__xlid": np.concatenate(o_lid),
                     "__xrid": np.concatenate(o_rid)}
                if emit_geom:
                    d["__lgeom"] = np.concatenate(o_lw)
                yield pd.DataFrame(d)

    schema = f"__xlid {lid_t}, __xrid {rid_t}"
    if emit_geom:
        schema += ", __lgeom binary"
    return probe.mapInPandas(fn, schema=schema)


def _cogroup_refined(lcov, rcov, lid: str, rid: str, predicate: str,
                     distance, lpad: float, resolution: int, domain,
                     salt_hot_cells: bool, hot_cell_threshold: int,
                     salt_factor: int, emit_geom: bool = False):
    """Shuffle spatial join as a union-cogroup-by-cell streaming pass.

    Round-2 scale fix for the big×big path: instead of a hash join whose
    OUTPUT carries both geometries per candidate pair into a refine UDF
    (O(pairs) shuffle+Arrow payload), both sides are union-tagged and
    hash-partitioned by (cell, salt) — each geometry crosses the wire
    once per cover cell, pairs are generated in-kernel per cell group,
    deduped by the canonical-cell rule, refined, and leave the pass as
    id pairs.  Explicit hot-cell salting (north rule): build rows of hot
    cells are replicated into ``salt_factor`` buckets, probe rows hash
    into one bucket; the kernel groups on (cell, salt) so each pair is
    still generated exactly once.

    Returns a DataFrame (__xlid, __xrid, __lgeom) of matched pairs.
    """
    spark = lcov.sparkSession
    lx = lcov.select(F.col(lid).alias("__lid"),
                     F.col("__lgeom").alias("__geom"),
                     F.explode("__cells").alias("__cell"),
                     ).withColumn("__side", F.lit(1))
    rx = rcov.select(F.col(rid).alias("__rid"),
                     F.col("__rgeom").alias("__geom"),
                     F.explode("__cells").alias("__cell"),
                     ).withColumn("__side", F.lit(0))
    salted = False
    if salt_hot_cells:
        hot = (
            rx.groupBy("__cell").count()
            .filter(F.col("count") >= int(hot_cell_threshold))
            .select(F.col("__cell").alias("__hc"))
        )
        hot_list = [r["__hc"] for r in hot.collect()]
        if hot_list:
            S = int(salt_factor)
            lx = lx.withColumn(
                "__salt",
                F.when(F.col("__cell").isin(hot_list),
                       F.pmod(F.xxhash64(F.col("__lid")), F.lit(S)))
                .otherwise(F.lit(0)).cast("long"))
            rx = rx.withColumn(
                "__salt_arr",
                F.when(F.col("__cell").isin(hot_list),
                       F.sequence(F.lit(0), F.lit(S - 1)))
                .otherwise(F.array(F.lit(0))),
            ).withColumn("__salt0", F.explode("__salt_arr")
                         ).withColumn("__salt", F.col("__salt0").cast("long")
                         ).drop("__salt_arr", "__salt0")
            salted = True
    if not salted:
        lx = lx.withColumn("__salt", F.lit(0).cast("long"))
        rx = rx.withColumn("__salt", F.lit(0).cast("long"))

    lid_t = dict(lcov.dtypes)[lid]
    rid_t = dict(rcov.dtypes)[rid]
    # explicit partition count (AQE would size this exchange by bytes;
    # the pass is compute-bound — see operators/nearest.py)
    n_parts = max(spark.sparkContext.defaultParallelism * 2,
                  int(spark.conf.get("spark.sql.shuffle.partitions")))
    tagged = (
        lx.unionByName(rx, allowMissingColumns=True)
        .repartition(n_parts, "__cell", "__salt")
        .sortWithinPartitions("__cell", "__salt")
    )

    pad = float(lpad or 0.0)

    def _process(pdf):
        from ..geom.kernels import bounds as _bounds
        from ..geom.predicates import pairwise_predicate
        from ..geom.ragged import _expand_ranges
        from ..geom.wkb import from_wkb
        from ..index import cells as C

        n = len(pdf)
        cell = pdf["__cell"].to_numpy(dtype=np.int64)
        salt = pdf["__salt"].to_numpy(dtype=np.int64)
        side = pdf["__side"].to_numpy()
        chg = np.empty(n, dtype=bool)
        chg[0] = True
        chg[1:] = (cell[1:] != cell[:-1]) | (salt[1:] != salt[:-1])
        gid = np.cumsum(chg) - 1
        lmask = side == 1
        if not lmask.any() or lmask.all():
            return None
        lsub = np.nonzero(lmask)[0]
        rsub = np.nonzero(~lmask)[0]
        r0 = np.searchsorted(gid[rsub], gid[lsub], side="left")
        r1 = np.searchsorted(gid[rsub], gid[lsub], side="right")
        rcnt = r1 - r0
        has = rcnt > 0
        if not has.any():
            return None
        lw = pdf["__geom"].to_numpy(dtype=object)[lsub]
        rw = pdf["__geom"].to_numpy(dtype=object)[rsub]
        lb = from_wkb(pd.Series(lw))
        rb = from_wkb(pd.Series(rw))
        lbb = np.nan_to_num(_bounds(lb))
        rbb = np.nan_to_num(_bounds(rb))
        if pad:
            lbb = lbb + np.array([-pad, -pad, pad, pad])
        lres = C.cover_res(lbb[:, 0], lbb[:, 1], lbb[:, 2], lbb[:, 3],
                           resolution, domain=domain)
        rres = C.cover_res(rbb[:, 0], rbb[:, 1], rbb[:, 2], rbb[:, 3],
                           resolution, domain=domain)
        lid_arr = pdf["__lid"].to_numpy()[lsub]
        rid_arr = pdf["__rid"].to_numpy()[rsub]
        lcell = cell[lsub]
        o_lid = []
        o_rid = []
        o_lw = []
        # combo-bounded group loop — cache-resident temporaries (see
        # operators/nearest.py COMBO_CAP rationale)
        hpos = np.nonzero(has)[0]
        hcnt = rcnt[hpos]
        csum = np.cumsum(hcnt)
        from ._cellstream import BUFFER_ROWS as _CAP

        gb = [0]
        while gb[-1] < len(hpos):
            prev = csum[gb[-1] - 1] if gb[-1] else 0
            j = int(np.searchsorted(csum, prev + _CAP, side="left")) + 1
            gb.append(min(max(j, gb[-1] + 1), len(hpos)))
        for ga, gz in zip(gb[:-1], gb[1:]):
            grp = hpos[ga:gz]
            gcnt = rcnt[grp]
            li = np.repeat(grp, gcnt)
            ri = _expand_ranges(r0[grp], r1[grp])
            # bbox prefilter (lbb already dwithin-padded)
            pre = ((lbb[li, 0] <= rbb[ri, 2]) & (rbb[ri, 0] <= lbb[li, 2])
                   & (lbb[li, 1] <= rbb[ri, 3]) & (rbb[ri, 1] <= lbb[li, 3]))
            li = li[pre]
            ri = ri[pre]
            if not len(li):
                continue
            # canonical-cell dedup: a pair sharing k cover cells is kept
            # only in the cell (at the pair's coarser per-row cover res)
            # containing (max(minx), max(miny)) of the two bboxes —
            # exactly the _refine_rp_udf rule, computed in-kernel
            rc = np.minimum(lres[li], rres[ri])
            rxm = np.maximum(lbb[li, 0], rbb[ri, 0])
            rym = np.maximum(lbb[li, 1], rbb[ri, 1])
            canon = np.empty(len(rc), dtype=np.int64)
            for r in np.unique(rc):
                m = rc == r
                canon[m] = C.point_cell(rxm[m], rym[m], int(r), domain)
            keep = canon == lcell[li]
            li = li[keep]
            ri = ri[keep]
            if not len(li):
                continue
            ok = pairwise_predicate(predicate, lb.take(li), rb.take(ri),
                                    distance)
            li = li[ok]
            ri = ri[ok]
            if not len(li):
                continue
            o_lid.append(lid_arr[li])
            o_rid.append(rid_arr[ri])
            if emit_geom:
                o_lw.append(lw[li])
        if not o_lid:
            return None
        d = {"__xlid": np.concatenate(o_lid),
             "__xrid": np.concatenate(o_rid)}
        if emit_geom:
            d["__lgeom"] = np.concatenate(o_lw)
        return pd.DataFrame(d)

    def fn(it):
        from ._cellstream import stream_groups

        yield from stream_groups(it, ["__cell", "__salt"], _process)

    schema = f"__xlid {lid_t}, __xrid {rid_t}"
    if emit_geom:
        schema += ", __lgeom binary"
    return tagged.mapInPandas(fn, schema=schema)


def _prep_side(df: DataFrame, geom: str, id_col: str | None, tag: str):
    """Attach a row id (if none supplied) and bbox struct.

    Auto ids come from monotonically_increasing_id, which Spark defines as
    NONDETERMINISTIC across plan branches — the join assembles results by
    re-joining on these ids from two branches, so the id-bearing frame is
    pinned to one materialization via localCheckpoint (otherwise attribute
    rows can attach to the wrong geometry rows). localCheckpoint (lazy)
    rather than persist(): the blocks are released automatically by the
    ContextCleaner once the frame is unreferenced — persist() entries sit
    in the CacheManager until an explicit unpersist, which leaked one
    cached frame per auto-id join call in long sessions — and checkpoint
    blocks cannot be silently evicted-and-recomputed (which would reroll
    the ids)."""
    df = _widen(df)
    if id_col is None:
        id_col = f"__{tag}_id"
        df = df.withColumn(id_col, F.monotonically_increasing_id())
        df = df.localCheckpoint(eager=False)
    df = df.withColumn("__bb", st_bounds(geom))
    return df, id_col


def sjoin(
    left: DataFrame,
    right: DataFrame,
    how: str = "inner",
    predicate: str = "intersects",
    lsuffix: str = "left",
    rsuffix: str = "right",
    distance: float | None = None,
    on_attribute: list[str] | str | None = None,
    left_geom: str = "geometry",
    right_geom: str = "geometry",
    left_id: str | None = None,
    right_id: str | None = None,
    resolution: int | None = None,
    domain=DOMAIN_UNIT,
    broadcast_right: bool | None = None,
    salt_hot_cells: bool = False,
    hot_cell_threshold: int = 100_000,
    salt_factor: int = 16,
) -> DataFrame:
    """Spatial join of two WKB-geometry DataFrames.

    Matches geopandas.sjoin semantics row-for-row (tools/sjoin.py:11-97):
    returns left columns + right columns (collisions suffixed) + the
    retained side's geometry + ``index_right`` (or ``index_left``).
    """
    if how not in VALID_HOW:
        raise ValueError(f"`how` was {how!r} but is expected to be in {VALID_HOW}")
    if predicate not in VALID_PRED:
        raise ValueError(
            f"`predicate` was {predicate!r} but is expected to be in {VALID_PRED}"
        )
    if predicate == "dwithin" and distance is None:
        raise ValueError("`distance` is required for predicate 'dwithin'")
    # reference _basic_checks (tools/sjoin.py:123-127): the output's
    # index column names must not pre-exist, else the join would emit
    # duplicate column names
    if f"index_{lsuffix}" in left.columns:
        raise ValueError(
            f"'index_{lsuffix}' column already exists in left DataFrame")
    if f"index_{rsuffix}" in right.columns:
        raise ValueError(
            f"'index_{rsuffix}' column already exists in right DataFrame")
    if isinstance(on_attribute, str):
        on_attribute = [on_attribute]
    on_attribute = list(on_attribute or [])
    for col in on_attribute:
        if col not in left.columns or col not in right.columns:
            raise ValueError(f"on_attribute column {col!r} missing from a side")
        if col in (left_geom, right_geom):
            raise ValueError("on_attribute cannot be the geometry column")

    left, lid = _prep_side(left, left_geom, left_id, "l")
    right, rid = _prep_side(right, right_geom, right_id, "r")

    pad = float(distance) if (predicate == "dwithin" and distance) else 0.0

    stats = _bbox_stats(left, right)  # one tiny agg job
    if resolution is None:
        resolution = _estimate_resolution(stats, domain)
    # coarsest cover res each side can fall back to (giant bboxes):
    # the other side must emit ancestor cells down to that level so
    # mixed-resolution pairs still meet on a common cell (SURVEY.md §4)
    lmin = _min_cover_res(stats[0], resolution, domain, pad)
    rmin = _min_cover_res(stats[1], resolution, domain, 0.0)

    def cover(df, geom, pad_by):
        # cover from the __bb struct computed in _prep_side — the geometry
        # is NOT decoded a second time (round-1 covered via st_cells)
        c = st_cells_from_bbox("__bb.minx", "__bb.miny", "__bb.maxx",
                               "__bb.maxy", resolution, domain=domain)
        if pad_by:
            # dwithin: expand the probe bbox by the distance — done by
            # covering a padded rectangle instead of the raw bbox
            @pandas_udf("array<long>")
            def _padded(minx: pd.Series, miny: pd.Series, maxx: pd.Series, maxy: pd.Series) -> pd.Series:
                from ..index import cells as C

                mnx = minx.to_numpy(dtype=np.float64) - pad_by
                mny = miny.to_numpy(dtype=np.float64) - pad_by
                mxx = maxx.to_numpy(dtype=np.float64) + pad_by
                mxy = maxy.to_numpy(dtype=np.float64) + pad_by
                miss = np.isnan(mnx)
                flat, off = C.bbox_cover(
                    np.nan_to_num(mnx), np.nan_to_num(mny),
                    np.nan_to_num(mxx), np.nan_to_num(mxy),
                    resolution, domain=domain)
                return pd.Series([
                    None if miss[i] else flat[off[i]:off[i+1]].tolist()
                    for i in range(len(mnx))
                ])

            c = _padded("__bb.minx", "__bb.miny", "__bb.maxx", "__bb.maxy")
        return df.withColumn("__cells", c)

    lcov = cover(left.select(lid, F.col(left_geom).alias("__lgeom"), "__bb",
                             *on_attribute), "__lgeom", pad)
    rcov = cover(right.select(rid, F.col(right_geom).alias("__rgeom"), "__bb", *on_attribute),
                 "__rgeom", 0.0)
    if rmin < resolution:  # right may have coarse rows -> left emits chain
        lcov = lcov.withColumn("__cells", _ancestors_udf(rmin)(F.col("__cells")))
    if lmin < resolution:
        rcov = rcov.withColumn("__cells", _ancestors_udf(lmin)(F.col("__cells")))

    if broadcast_right is None:
        broadcast_right = (
            0 < stats[1]["n"]
            and _est_exploded(stats[1], resolution, domain) <= BROADCAST_EXPLODED_ROWS
        )

    # ---- output shape (decided BEFORE refine: it steers emit_geom) -------
    # Internal unambiguous keys __LID/__RID; user id columns (when supplied)
    # also remain as ordinary data columns, like the pandas index does.
    lclean = left.drop("__bb")
    rclean = right.drop("__bb")
    auto_l = left_id is None  # auto ids are internal -> dropped from output
    auto_r = right_id is None
    ldata = [c for c in lclean.columns if not (auto_l and c == lid)]
    rdata = [c for c in rclean.columns if not (auto_r and c == rid)]
    # the non-retained geometry is dropped BEFORE suffixing — the retained
    # geometry keeps its original name (reference _frame_join behavior)
    if how in ("inner", "left"):
        rdata = [c for c in rdata if c != right_geom]
    else:
        ldata = [c for c in ldata if c != left_geom]
    # Narrow-assembly fast path precondition: both sides carry nothing
    # beyond (id, geometry) — every output column can flow through the
    # refine stage directly, skipping BOTH assembly joins (the dominant
    # shuffles at scale: matched is |result| rows, the joins re-shuffle
    # it twice against the base tables). Only THEN do the kernels emit
    # the probe WKB per match; every other shape re-joins by id, where
    # per-match WKB through Arrow is pure serialization waste.
    narrow = (how == "inner" and not on_attribute
              and set(ldata) <= {lid, left_geom}
              and set(rdata) <= {rid})
    emit_geom = narrow and left_geom in ldata

    if not on_attribute and broadcast_right and not salt_hot_cells:
        # small build side: single probe-side pass, no join, no explode
        # (an explicit salting request signals a shuffle-scale build side
        # — it always routes to the cogroup pass). The probe ships ONLY
        # (id, wkb); bounds/cover/ancestors happen in-kernel.
        lraw = left.select(lid, F.col(left_geom).alias("__lgeom"))
        refined = _broadcast_probe_refined(
            lraw, rcov, lid, rid, predicate, distance, pad, resolution,
            domain, rmin if rmin < resolution else None,
            emit_geom=emit_geom)
    elif not on_attribute:
        # big×big: union-cogroup by cell — geometry crosses the wire once
        # per cover cell, pairs leave as ids
        refined = _cogroup_refined(lcov, rcov, lid, rid, predicate,
                                   distance, pad, resolution, domain,
                                   salt_hot_cells, hot_cell_threshold,
                                   salt_factor, emit_geom=emit_geom)
    else:
        refined = _join_refine_path(
            lcov, rcov, lid, rid, on_attribute, predicate, distance, pad,
            resolution, domain, broadcast_right, salt_hot_cells,
            hot_cell_threshold, salt_factor)
        if narrow:
            narrow = False  # legacy path emits no geometry column
            emit_geom = False
    matched = refined.select("__xlid", "__xrid")

    if narrow:
        # collision naming must mirror _suffix_columns (ADVICE fix): when
        # the two user id columns share a name, BOTH get suffixed, so the
        # fast path emits the same schema as the general assembly
        collide = lid in ldata and rid in rdata and lid == rid
        cols = []
        if lid in ldata:
            cols.append(F.col("__xlid").alias(
                f"{lid}_{lsuffix}" if collide else lid))
        if emit_geom:
            cols.append(F.col("__lgeom").alias(left_geom))
        if rid in rdata:
            cols.append(F.col("__xrid").alias(
                f"{rid}_{rsuffix}" if collide else rid))
        cols.append(F.col("__xrid").alias("index_right"))
        return refined.select(*cols)

    lmap, rmap = _suffix_columns(
        lclean.select(ldata), rclean.select(rdata), lsuffix, rsuffix, exclude=set()
    )
    lfull = lclean.select(
        *[F.col(c).alias(lmap.get(c, c)) for c in ldata],
        F.col(lid).alias("__LID"),
    )
    rfull = rclean.select(
        *[F.col(c).alias(rmap.get(c, c)) for c in rdata],
        F.col(rid).alias("__RID"),
    )
    pairs = matched.select(F.col("__xlid").alias("__LID"),
                           F.col("__xrid").alias("__RID"))

    if how in ("inner", "left"):
        joined = (
            lfull.join(pairs, on="__LID", how="inner" if how == "inner" else "left")
            .join(rfull, on="__RID", how="left")
            .withColumn("index_right", F.col("__RID"))
        )
    else:
        joined = (
            rfull.join(pairs, on="__RID", how="left")
            .join(lfull, on="__LID", how="left")
            .withColumn("index_left", F.col("__LID"))
        )
    return joined.drop("__LID", "__RID")


def _join_refine_path(lcov, rcov, lid, rid, on_attribute, predicate,
                      distance, pad, resolution, domain, broadcast_right,
                      salt_hot_cells, hot_cell_threshold, salt_factor):
    """Legacy coarse-join + per-pair-refine plan, kept for the
    ``on_attribute`` conjunct (the cogroup/broadcast passes group on
    cell only).  Returns (__xlid, __xrid, __lgeom, ...) matched pairs."""
    lx = lcov.select(F.col(lid).alias("__xlid"), "__lgeom",
                     F.col("__bb").alias("__lbb"), *on_attribute,
                     F.explode("__cells").alias("__cell"))
    rx = rcov.select(F.col(rid).alias("__xrid"), "__rgeom",
                     F.col("__bb").alias("__rbb"),
                     *[F.col(c).alias(f"__r_{c}") for c in on_attribute],
                     F.explode("__cells").alias("__cell"))

    join_keys = [lx["__cell"] == rx["__cell"]] + [
        lx[c] == rx[f"__r_{c}"] for c in on_attribute
    ]

    if salt_hot_cells:
        hot = (
            rx.groupBy("__cell").count()
            .filter(F.col("count") >= hot_cell_threshold)
            .select(F.col("__cell").alias("__hot_cell"))
        )
        hot_list = [r["__hot_cell"] for r in hot.collect()]
        if hot_list:
            S = int(salt_factor)
            lx = lx.withColumn(
                "__salt",
                F.when(F.col("__cell").isin(hot_list),
                       F.pmod(F.xxhash64(F.col("__xlid")), F.lit(S)))
                .otherwise(F.lit(0)),
            )
            rx = rx.withColumn(
                "__salt_arr",
                F.when(F.col("__cell").isin(hot_list),
                       F.sequence(F.lit(0), F.lit(S - 1)))
                .otherwise(F.array(F.lit(0))),
            ).withColumn("__salt", F.explode("__salt_arr")).drop("__salt_arr")
            join_keys.append(lx["__salt"] == rx["__salt"].cast("long"))

    rj = F.broadcast(rx) if broadcast_right else rx

    # Refine runs map-side in the same stage as the coarse join; the only
    # shuffled payload afterwards is (lid, rid) id pairs. Duplicate
    # candidate pairs (a pair can share several cells) are eliminated
    # WITHOUT a shuffle by the reference-point rule: the pair only counts
    # in the canonical cell containing the top-left corner of its bbox
    # intersection, at the pair's coarser cover res.
    cand = lx.join(rj, on=join_keys, how="inner").select(
        lx["__xlid"], rx["__xrid"], lx["__lgeom"], rx["__rgeom"],
        lx["__cell"].alias("__jcell"), lx["__lbb"], rx["__rbb"],
    )
    return cand.filter(
        _refine_rp_udf(predicate, resolution, domain, distance, pad)(
            F.col("__lgeom"), F.col("__rgeom"), F.col("__jcell"),
            F.col("__lbb.minx"), F.col("__lbb.miny"),
            F.col("__lbb.maxx"), F.col("__lbb.maxy"),
            F.col("__rbb.minx"), F.col("__rbb.miny"),
            F.col("__rbb.maxx"), F.col("__rbb.maxy")))
