"""Similarity search over embedding columns (array<float>).

* ``cosine_topk``       — exact brute-force top-k: broadcast the query set,
                          score each corpus batch with one numpy matmul,
                          rank per query. The baseline/oracle path.
* ``lsh_topk``          — random-hyperplane LSH: sign-bit signatures ->
                          multi-probe band buckets -> exact rerank of the
                          bucketed candidates. The 100 TB path: the corpus
                          is scanned once to emit (bucket, id) pairs; only
                          bucket-colliding pairs are scored.
* ``embedding_near_dups`` — cosine >= threshold near-duplicate pairs via
                          the same LSH bucketing (dedup use case).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window
from pyspark.sql.functions import pandas_udf


def _to_matrix(col: pd.Series) -> np.ndarray:
    return np.array([np.asarray(v, dtype=np.float32) for v in col])


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                qid_col: str = "vec_id", qvec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors of every query against the corpus.

    Plan: queries are collected + broadcast (queries are the small side by
    definition); each corpus Arrow batch scores against the whole query
    matrix with one matmul; per-batch top-k -> global top-k via window
    rank. Shuffle volume is corpus_batches * q * k, never corpus * q.
    """
    from ..conf import widen

    corpus = widen(corpus)
    qrows = queries.select(qid_col, qvec_col).collect()
    qids = np.array([r[qid_col] for r in qrows])
    qm = np.array([np.asarray(r[qvec_col], dtype=np.float32) for r in qrows])
    qn = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-30)

    @pandas_udf("array<struct<qid:long,score:double>>")
    def _score(ids: pd.Series, vecs: pd.Series) -> pd.Series:
        m = _to_matrix(vecs)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        sims = mn @ qn.T  # (batch, q)
        out = []
        for i in range(len(ids)):
            out.append([
                {"qid": int(qids[j]), "score": float(sims[i, j])}
                for j in range(len(qids))
            ])
        return pd.Series(out)

    scored = (
        corpus.select(F.col(id_col).alias("corpus_id"), vec_col)
        .withColumn("__s", _score(F.col("corpus_id"), F.col(vec_col)))
        .select("corpus_id", F.explode("__s").alias("p"))
        .select("corpus_id", F.col("p.qid").alias("query_id"),
                F.col("p.score").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
    )


def _hyperplanes(dim: int, nbits: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((nbits, dim)).astype(np.float32)


def lsh_signatures(df: DataFrame, vec_col: str = "embedding",
                   nbits: int = 64, seed: int = 11,
                   dim: int | None = None,
                   out_col: str = "lsh_sig") -> DataFrame:
    if dim is None:
        first = df.select(vec_col).first()
        dim = len(first[0])
    H = _hyperplanes(dim, nbits, seed)

    @pandas_udf("long")
    def _sig(vecs: pd.Series) -> pd.Series:
        m = _to_matrix(vecs)
        bits = (m @ H.T) > 0  # (n, nbits)
        weights = (1 << np.arange(nbits, dtype=np.uint64))
        sig = (bits.astype(np.uint64) * weights[None, :]).sum(axis=1)
        return pd.Series(sig.astype(np.int64))

    return df.withColumn(out_col, _sig(F.col(vec_col)))


def embedding_near_dups(df: DataFrame, id_col: str = "vec_id",
                        vec_col: str = "embedding", threshold: float = 0.95,
                        nbits: int = 64, bands: int = 8, seed: int = 11) -> DataFrame:
    """Cosine >= threshold pairs via hyperplane-LSH banding + exact rerank.
    -> (id_a, id_b, cosine)."""
    bits_per_band = nbits // bands
    sig = lsh_signatures(df, vec_col, nbits, seed).select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"), "lsh_sig")
    mask = (1 << bits_per_band) - 1
    banded = sig.select(
        "__id", "__v",
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("band_id"),
                F.shiftright("lsh_sig", i * bits_per_band)
                .bitwiseAND(F.lit(mask)).alias("band"),
            ) for i in range(bands)
        ])).alias("b"),
    ).select("__id", "__v", "b.band_id", "b.band")
    a = banded.select(F.col("__id").alias("id_a"), F.col("__v").alias("va"),
                      "band_id", "band")
    b = banded.select(F.col("__id").alias("id_b"), F.col("__v").alias("vb"),
                      "band_id", "band")
    cand = (
        a.join(b, on=["band_id", "band"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )

    @pandas_udf("double")
    def _cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        ma = _to_matrix(va)
        mb = _to_matrix(vb)
        na = np.maximum(np.linalg.norm(ma, axis=1), 1e-30)
        nb = np.maximum(np.linalg.norm(mb, axis=1), 1e-30)
        return pd.Series(((ma * mb).sum(axis=1) / (na * nb)).astype(np.float64))

    return (
        cand.withColumn("cosine", _cos("va", "vb"))
        .filter(F.col("cosine") >= float(threshold))
        .select("id_a", "id_b", "cosine")
    )
