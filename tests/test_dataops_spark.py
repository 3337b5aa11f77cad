"""Training-data operators: dedup, text stats, similarity, multimodal."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geopandas_spark.operators.dedup import (
    exact_dedup, minhash_lsh, simhash_near_dups)
from geopandas_spark.operators.similarity import (
    cosine_topk, embedding_near_dups)
from geopandas_spark.operators.textstats import (
    fingerprint, lang_id, quality_columns, token_count)


@pytest.fixture(scope="module")
def corpus(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog",          # exact dup
        "the quick brown fox jumped over the lazy dog",         # near dup
        "a completely different document about spark joins",
        "der schnelle braune fuchs springt und das ist gut",
        "le renard brun rapide saute et c'est dans la nature",
        "",
    ]
    return spark.createDataFrame(pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts}))


def test_exact_dedup(corpus):
    out = exact_dedup(corpus, "text", "doc_id").toPandas()
    assert len(out) == 6
    kept = set(out.doc_id)
    assert 0 in kept and 1 not in kept
    assert out.set_index("doc_id").dup_count[0] == 2


def test_minhash_lsh_finds_near_dup(corpus):
    pairs = minhash_lsh(corpus, "text", "doc_id", num_perm=64, bands=16,
                        shingle=4, threshold=0.5).toPandas()
    got = set(zip(pairs.id_a, pairs.id_b))
    assert (0, 1) in got and (0, 2) in got
    assert not any(3 in p for p in got)


def test_simhash_near_dups(corpus):
    pairs = simhash_near_dups(corpus, "text", "doc_id", max_hamming=10).toPandas()
    got = set(zip(pairs.id_a, pairs.id_b))
    assert (0, 1) in got  # identical -> hamming 0
    h = pairs.set_index(["id_a", "id_b"]).hamming
    assert h[(0, 1)] == 0


def test_quality_and_tokens(corpus, spark):
    out = quality_columns(corpus).toPandas().set_index("doc_id")
    assert out.n_tokens[0] == 9
    assert out.n_tokens[6] == 0
    assert out.stopword_ratio[0] > 0.2  # 'the' twice + 'over'
    assert 0 <= out.quality_score[0] <= 1.01
    tc = corpus.select(token_count("text").alias("t")).collect()
    assert tc[0]["t"] == 9


def test_lang_id(corpus):
    out = lang_id(corpus).toPandas().set_index("doc_id")
    assert out.lang_pred[0] == "en"
    assert out.lang_pred[4] == "de"
    assert out.lang_pred[5] == "fr"
    assert out.lang_pred[6] == "und"


def test_fingerprint_normalizes_whitespace(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1], "text": ["Hello  World", "hello world"]}))
    out = fingerprint(df).toPandas()
    assert out.doc_fp[0] == out.doc_fp[1]


@pytest.fixture(scope="module")
def embeddings(spark):
    rng = np.random.default_rng(5)
    base = rng.standard_normal((40, 16)).astype(np.float32)
    base[1] = base[0] + 0.001 * rng.standard_normal(16).astype(np.float32)
    return spark.createDataFrame(pd.DataFrame({
        "vec_id": range(40), "embedding": [v.tolist() for v in base]})), base


def test_cosine_topk_exact(embeddings, spark):
    df, base = embeddings
    q = df.filter(F.col("vec_id") < 3)
    out = cosine_topk(df, q, k=5).toPandas()
    bn = base / np.linalg.norm(base, axis=1, keepdims=True)
    sims = bn @ bn[:3].T
    for qid in range(3):
        exp = list(np.argsort(-sims[:, qid])[:5])
        got = list(out[out.query_id == qid].sort_values("rank").corpus_id)
        assert got == exp


def test_embedding_near_dups(embeddings, spark):
    df, base = embeddings
    pairs = embedding_near_dups(df, threshold=0.99).toPandas()
    assert (0, 1) in set(zip(pairs.id_a, pairs.id_b))
    assert len(pairs) == 1  # random gaussians don't collide at 0.99


def test_multimodal_plumbing(spark):
    from geopandas_spark.operators.multimodal import (
        decode_metadata, frame_sample, image_features, resize_image,
        synthesize_media)

    refs = spark.createDataFrame(pd.DataFrame(
        {"media_ref": ["img://a", "aud://b", None]}))
    mm = synthesize_media(refs)
    meta = decode_metadata(mm)
    rows = {r["media_ref"]: r for r in meta.select("media_ref", "media_meta.*").collect()}
    assert rows["img://a"]["kind"] == "image" and rows["img://a"]["channels"] == 3
    assert rows["aud://b"]["sample_rate"] == 16000
    assert rows[None]["kind"] is None
    feat = image_features(mm).filter(F.col("media_feat").isNotNull()).collect()
    assert len(feat) == 1 and abs(
        sum(v * v for v in feat[0]["media_feat"]) - 1.0) < 1e-5
    rz = decode_metadata(
        resize_image(mm.filter(F.col("media_ref") == "img://a"), 8, 6),
        "media_resized")
    r = rz.select("media_meta.width", "media_meta.height").collect()[0]
    assert (r["width"], r["height"]) == (8, 6)
    fs = frame_sample(decode_metadata(mm), every_n=100)
    arr = fs.filter(F.col("media_ref") == "aud://b").collect()[0]["frame_indices"]
    assert arr[0] == 0 and arr[1] == 100
    # real codec bytes raise NotImplementedError (documented stub)
    bad = spark.createDataFrame(pd.DataFrame({"media_bytes": [b"\x89PNG1234"]}))
    import pyspark.errors

    with pytest.raises(Exception, match="NotImplementedError|real media"):
        decode_metadata(bad).collect()
