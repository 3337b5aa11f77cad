"""Deduplication operators for large-scale training-data pipelines.

Exact + near-duplicate detection over a text corpus, each expressible as a
Spark plan (task brief: dedup is a first-class engine component):

* ``exact_dedup``       — hash-groupBy on normalized text.
* ``minhash_lsh``       — shingle -> minhash signature -> banded LSH
                          bucket join -> exact-jaccard verification.
* ``simhash``           — 64-bit simhash + chunk-banding for hamming<=k.
* ``ngram_jaccard``     — exact n-gram Jaccard on candidate pairs.

All UDFs are Arrow-vectorized; signatures/hashes are computed with numpy
over the whole batch. LSH parameters follow the standard S-curve:
P(candidate) = 1 - (1 - s^r)^b with b bands of r rows (b*r = num_perm).

At 100 TB scale the plan shape is: one projection computes signatures
(no shuffle), the band explode shuffles (band_id, band_hash) pairs (tiny
rows), the bucket self-join uses AQE + optional salting on hot buckets
(empty/boilerplate text is the classic hot key — normalize first).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_MERSENNE = (1 << 61) - 1


def _perm_params(num_perm: int, seed: int = 1):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64)
    return a, b


def _str_hash64(s: str) -> int:
    """Deterministic 64-bit string hash (Python's hash() is process-salted
    and would differ across executors)."""
    import hashlib

    return int.from_bytes(
        hashlib.blake2b(s.encode("utf-8", "replace"), digest_size=8).digest(),
        "little",
    )


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Hashes of all k-character shingles (vectorized over the string)."""
    if text is None:
        return np.empty(0, dtype=np.uint64)
    s = text.lower()
    raw = np.frombuffer(s.encode("utf-8", "replace"), dtype=np.uint8)
    n = len(raw)
    if n < k:
        return np.array([_str_hash64(s) & 0x7FFFFFFFFFFFFFFF], dtype=np.uint64)
    # polynomial rolling hash over byte windows, fully vectorized
    base = np.uint64(1099511628211)
    powers = base ** np.arange(k, dtype=np.uint64)
    win = np.lib.stride_tricks.sliding_window_view(raw, k).astype(np.uint64)
    return np.unique((win * powers[None, :]).sum(axis=1))


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", normalize: bool = True) -> DataFrame:
    """Keep one representative (min id) per identical text; returns the
    deduplicated frame with a dup_count column."""
    from ..conf import widen

    df = widen(df)
    t = F.col(text_col)
    if normalize:
        t = F.lower(F.regexp_replace(t, r"\s+", " "))
    keyed = df.withColumn("__tkey", F.xxhash64(t))
    w = (
        keyed.groupBy("__tkey")
        .agg(F.min(id_col).alias("__keep"), F.count("*").alias("dup_count"))
    )
    return (
        keyed.join(w, on="__tkey", how="inner")
        .filter(F.col(id_col) == F.col("__keep"))
        .drop("__tkey", "__keep")
    )


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       num_perm: int = 64, shingle: int = 5,
                       seed: int = 1, out_col: str = "minhash") -> DataFrame:
    a, b = _perm_params(num_perm, seed)

    @pandas_udf("array<long>")
    def _sig(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            h = _shingle_hashes(t, shingle)
            if len(h) == 0:
                out.append(None)
                continue
            hv = (h & np.uint64((1 << 61) - 1)).astype(np.int64)
            m = (a[:, None] * hv[None, :] + b[:, None]) % _MERSENNE
            out.append(m.min(axis=1).astype(np.int64).tolist())
        return pd.Series(out)

    return df.withColumn(out_col, _sig(F.col(text_col)))


def minhash_lsh(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                num_perm: int = 64, bands: int = 16, shingle: int = 5,
                threshold: float = 0.7, seed: int = 1) -> DataFrame:
    """-> candidate near-duplicate pairs (id_a, id_b, jaccard) verified by
    exact shingle Jaccard >= threshold."""
    if num_perm % bands:
        raise ValueError("num_perm must divide into bands")
    from ..conf import widen

    df = widen(df)
    r = num_perm // bands
    sigs = minhash_signatures(df, text_col, num_perm, shingle, seed).select(
        F.col(id_col).alias("__id"), F.col(text_col).alias("__text"), "minhash"
    ).filter(F.col("minhash").isNotNull())
    banded = sigs.select(
        "__id", "__text",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.slice(F.col("minhash"), i * r + 1, r),
            )
        ).alias("band_id", "band"),
    ).withColumn("band_hash", F.xxhash64(F.col("band_id"), F.to_json("band")))
    # both join branches read the banded signatures: pin one materialization
    # (otherwise the signature UDF and banding run twice)
    banded = banded.persist()
    a = banded.select(F.col("__id").alias("id_a"), F.col("__text").alias("ta"),
                      "band_hash")
    bdf = banded.select(F.col("__id").alias("id_b"), F.col("__text").alias("tb"),
                        "band_hash")
    cand = (
        a.join(bdf, on="band_hash")
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )

    @pandas_udf("double")
    def _jac(ta: pd.Series, tb: pd.Series) -> pd.Series:
        out = np.empty(len(ta))
        for i, (x, y) in enumerate(zip(ta, tb)):
            ha = _shingle_hashes(x, shingle)
            hb = _shingle_hashes(y, shingle)
            if len(ha) == 0 and len(hb) == 0:
                out[i] = 1.0
                continue
            inter = len(np.intersect1d(ha, hb, assume_unique=True))
            out[i] = inter / (len(ha) + len(hb) - inter) if (len(ha) + len(hb) - inter) else 0.0
        return pd.Series(out)

    return (
        cand.withColumn("jaccard", _jac("ta", "tb"))
        .filter(F.col("jaccard") >= float(threshold))
        .select("id_a", "id_b", "jaccard")
    )


def simhash_signatures(df: DataFrame, text_col: str = "text",
                       out_col: str = "simhash") -> DataFrame:
    """64-bit simhash over whitespace tokens (weighted bit voting)."""

    @pandas_udf("long")
    def _sim(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            if not t:
                out[i] = 0
                continue
            toks = t.lower().split()
            if not toks:
                out[i] = 0
                continue
            hs = np.array([_str_hash64(tok) for tok in toks], dtype=np.uint64)
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                    & np.uint64(1)).astype(np.int64)
            votes = (2 * bits - 1).sum(axis=0)
            sig = np.uint64(0)
            for bpos in np.nonzero(votes > 0)[0]:
                sig |= np.uint64(1) << np.uint64(bpos)
            out[i] = np.int64(sig.astype(np.int64))
        return pd.Series(out)

    return df.withColumn(out_col, _sim(F.col(text_col)))


def simhash_near_dups(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", max_hamming: int = 3) -> DataFrame:
    """Banding on 4x16-bit chunks: pairs within hamming<=3 share >=1 chunk
    (pigeonhole). -> (id_a, id_b, hamming)."""
    from ..conf import widen

    df = widen(df)
    sig = simhash_signatures(df, text_col).select(
        F.col(id_col).alias("__id"), F.col("simhash"))
    chunks = sig.select(
        "__id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("chunk_id"),
                     F.shiftright("simhash", 16 * i).bitwiseAND(F.lit(0xFFFF))
                     .alias("chunk"))
            for i in range(4)
        ])).alias("c"),
    ).select("__id", "simhash", "c.chunk_id", "c.chunk")
    a = chunks.select(F.col("__id").alias("id_a"), F.col("simhash").alias("sa"),
                      "chunk_id", "chunk")
    b = chunks.select(F.col("__id").alias("id_b"), F.col("simhash").alias("sb"),
                      "chunk_id", "chunk")
    cand = (
        a.join(b, on=["chunk_id", "chunk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
