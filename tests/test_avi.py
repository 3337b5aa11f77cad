"""MJPEG AVI video container (operators/avicodec.py) + the video
modality through the Spark multimodal stages."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geopandas_spark.operators import avicodec as A
from geopandas_spark.operators import codecs
from geopandas_spark.operators import jpegcodec as J


def _frames(n=4, h=16, w=20, seed=1):
    yy, xx = np.mgrid[0:h, 0:w]
    return [np.clip(127 + 90 * np.sin(xx / 8.0 + t + seed)
                    * np.cos(yy / 6.0), 0, 255).astype(np.uint8)[..., None]
            .repeat(3, -1) for t in range(n)]


def test_avi_roundtrip_and_info():
    fr = _frames(5)
    b = A.encode_avi(fr, fps=12, quality=92)
    assert codecs.sniff(b) == "avi"
    assert A.avi_info(b) == (20, 16, 5, 12)
    assert A.avi_frame_info(b) == (20, 16, 3)
    dec = A.decode_avi_frames(b)
    assert len(dec) == 5
    for d, f in zip(dec, fr):
        assert d.shape == f.shape
        assert np.abs(d.astype(int) - f.astype(int)).mean() < 4.0
    # index selection matches full decode
    sub = A.decode_avi_frames(b, indices=[1, 4])
    assert (sub[0] == dec[1]).all() and (sub[1] == dec[4]).all()
    # frames inside the container are plain baseline JPEGs
    for jb in A.iter_avi_frames(b):
        assert jb[:3] == b"\xff\xd8\xff" and J.jpeg_info(jb) == (20, 16, 3)


def test_avi_grayscale_and_errors():
    g = [f[:, :, :1] for f in _frames(2)]
    b = A.encode_avi(g, fps=4)
    assert A.avi_info(b) == (20, 16, 2, 4)
    assert A.decode_avi_frames(b)[0].shape == (16, 20, 1)
    with pytest.raises(ValueError, match="no frames"):
        A.encode_avi([])
    with pytest.raises(ValueError, match="share one"):
        A.encode_avi([np.zeros((4, 4, 3), np.uint8),
                      np.zeros((4, 5, 3), np.uint8)])
    with pytest.raises(ValueError, match="RIFF"):
        A.avi_info(b"nope")


def test_non_mjpeg_codec_raises_by_name():
    b = bytearray(A.encode_avi(_frames(1), fps=1))
    i = b.find(b"vidsMJPG")
    b[i + 4:i + 8] = b"H264"
    with pytest.raises(NotImplementedError, match="H264"):
        list(A.iter_avi_frames(bytes(b)))


def test_video_modality_spark_stages(spark):
    """vid:// refs ride synthesize -> metadata -> frame_sample ->
    extract_frames, fake and real containers agreeing on every lossless
    field and frame count."""
    from geopandas_spark.operators.multimodal import (
        decode_metadata, extract_frames, frame_sample, synthesize_media)

    refs = spark.createDataFrame(pd.DataFrame(
        {"media_ref": [f"vid://{i}" for i in range(4)] + ["img://x"]}))
    fake = synthesize_media(refs, fmt="fake")
    real = synthesize_media(refs, fmt="real")

    blobs = {r["media_ref"]: bytes(r["media_bytes"]) for r in real.collect()}
    assert all(codecs.sniff(blobs[f"vid://{i}"]) == "avi" for i in range(4))

    mf = {r["media_ref"]: r for r in decode_metadata(fake)
          .select("media_ref", "media_meta.*").collect()}
    mr = {r["media_ref"]: r for r in decode_metadata(real)
          .select("media_ref", "media_meta.*").collect()}
    for i in range(4):
        k = f"vid://{i}"
        assert mf[k]["kind"] == mr[k]["kind"] == "video"
        for fld in ("width", "height", "channels", "sample_rate",
                    "n_samples"):
            assert mf[k][fld] == mr[k][fld], (k, fld)
        assert mf[k]["sample_rate"] == 10  # fps rides sample_rate
        assert 2 <= mf[k]["n_samples"] <= 5

    # frame_sample indices stay pure-Catalyst and match frame counts
    fs = {r["media_ref"]: r["frame_indices"]
          for r in frame_sample(decode_metadata(real), every_n=2).collect()}
    for i in range(4):
        k = f"vid://{i}"
        assert fs[k] == list(range(0, mr[k]["n_samples"], 2))

    # extract_frames materializes decodable JPEGs from BOTH containers
    for df_, meta in ((fake, mf), (real, mr)):
        got = {r["media_ref"]: r["frames"]
               for r in extract_frames(df_, every_n=2).collect()}
        assert got["img://x"] is None
        for i in range(4):
            k = f"vid://{i}"
            nf = meta[k]["n_samples"]
            assert len(got[k]) == len(range(0, nf, 2))
            for jb in got[k]:
                w, h, c = J.jpeg_info(bytes(jb))
                assert (w, h, c) == (meta[k]["width"], meta[k]["height"], 3)
                J.decode_jpeg(bytes(jb))  # decodes cleanly

def test_avi_rec_groups_and_stream_filter():
    """Spec-conforming interleaved AVIs wrap frame chunks in LIST 'rec '
    groups and interleave other streams' chunks ('01wb' audio); the
    reader must descend into rec groups and keep only the first video
    stream's dc/db chunks."""
    import struct

    def chunk(fourcc, payload):
        pad = b"\x00" if len(payload) % 2 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(fourcc, payload):
        return chunk(b"LIST", fourcc + payload)

    base = A.encode_avi(_frames(3), fps=10)
    jpegs = list(A.iter_avi_frames(base))
    assert len(jpegs) == 3
    # rebuild: same headers, movi now rec-grouped with interleaved audio
    hdrl_start = base.index(b"hdrl") - 8
    movi_start = base.index(b"movi") - 8
    hdrl = base[hdrl_start:movi_start]
    movi_payload = b"".join(
        lst(b"rec ", chunk(b"00dc", j) + chunk(b"01wb", b"\x00\x00AUDIO"))
        for j in jpegs)
    body = hdrl + lst(b"movi", movi_payload)
    blob = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body
    got = list(A.iter_avi_frames(blob))
    assert got == jpegs  # all frames found, audio chunks skipped
    assert len(A.decode_avi_frames(blob)) == 3


def test_avi_encode_validation():
    fr = _frames(2)
    with pytest.raises(ValueError, match="fps"):
        A.encode_avi(fr, fps=2_000_000)
    rgba = [np.zeros((8, 8, 4), np.uint8)]
    with pytest.raises(ValueError, match="channel"):
        A.encode_avi(rgba)


def test_jpeg_tem_marker_skipped():
    """0xFF 0x01 (TEM) is a standalone marker with no length field; a
    foreign JPEG carrying it before SOS must still parse."""
    b = J.encode_jpeg(_frames(1)[0], quality=90)
    assert b[:2] == b"\xff\xd8"
    patched = b[:2] + b"\xff\x01" + b[2:]
    w, h, c = J.jpeg_info(patched)
    assert (w, h, c) == (20, 16, 3)
    assert (J.decode_jpeg(patched) == J.decode_jpeg(b)).all()
