"""Baseline JPEG codec (operators/jpegcodec.py) — unit + Spark plumbing.

The codec is self-contained (T.81 baseline sequential), so tests anchor
on properties that a shared encoder/decoder bug can't fake:

* the DCT matrix is checked against the DCT-II definition computed
  with an independent double loop;
* a constant image round-trips EXACTLY (DCT of a flat block is DC-only,
  and the DC quantizer at q>=50 divides the shift evenly);
* smooth images round-trip within a small bounded error at q>=90;
* header fields (dims, components, subsampling) read back via the
  independent marker walker jpeg_info.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from geopandas_spark.operators import codecs
from geopandas_spark.operators import jpegcodec as J


def _smooth(h, w, c=3, seed=3):
    yy, xx = np.mgrid[0:h, 0:w]
    base = 127 + 90 * np.sin(xx / 9.0 + seed) * np.cos(yy / 7.0)
    if c == 1:
        return np.clip(base, 0, 255).astype(np.uint8)[:, :, None]
    return np.clip(np.stack(
        [base, np.roll(base, 3, 0), np.roll(base, 5, 1)], -1), 0, 255
    ).astype(np.uint8)


def test_dct_matches_definition():
    rng = np.random.default_rng(0)
    blk = rng.normal(0, 50, (3, 8, 8))
    got = J._fdct(blk)
    want = np.zeros_like(got)
    for n in range(3):
        for u in range(8):
            for v in range(8):
                cu = np.sqrt(0.5) if u == 0 else 1.0
                cv = np.sqrt(0.5) if v == 0 else 1.0
                s = 0.0
                for x in range(8):
                    for y in range(8):
                        s += (blk[n, x, y]
                              * np.cos((2 * x + 1) * u * np.pi / 16)
                              * np.cos((2 * y + 1) * v * np.pi / 16))
                want[n, u, v] = 0.25 * cu * cv * s
    assert np.allclose(got, want, atol=1e-9)
    # and the inverse really inverts
    assert np.allclose(J._idct(got), blk, atol=1e-9)


def test_zigzag_is_antidiagonal_permutation():
    z = J.ZIGZAG
    assert sorted(z.tolist()) == list(range(64))
    # zigzag walks anti-diagonals: sum of (row, col) is non-decreasing
    diag = z // 8 + z % 8
    assert (np.diff(diag) >= 0).all()
    # first/last few entries per T.81 figure 5
    assert z[:6].tolist() == [0, 1, 8, 16, 9, 2]
    assert z[-4:].tolist() == [47, 55, 62, 63]
    assert (J.ZIGZAG_INV[J.ZIGZAG] == np.arange(64)).all()


def test_constant_image_roundtrips_exactly():
    for val in (0, 57, 128, 255):
        px = np.full((16, 24, 3), val, np.uint8)
        out = J.decode_jpeg(J.encode_jpeg(px, quality=90))
        assert out.shape == (16, 24, 3)
        assert int(np.abs(out.astype(int) - int(val)).max()) <= 1


@pytest.mark.parametrize("subsample", [True, False])
@pytest.mark.parametrize("hw", [(32, 32), (17, 23), (8, 40), (9, 9)])
def test_smooth_roundtrip_bounded_error(hw, subsample):
    px = _smooth(*hw)
    b = J.encode_jpeg(px, quality=95, subsample=subsample)
    out = J.decode_jpeg(b)
    assert out.shape == px.shape
    err = np.abs(out.astype(int) - px.astype(int))
    if subsample:
        # 2x2 chroma averaging + replication upsample: local chroma error
        # is real JPEG loss, so only the mean is tight
        assert err.max() <= 64 and err.mean() < 6.0
    else:
        assert err.max() <= 12 and err.mean() < 3.0


def test_grayscale_roundtrip_and_info():
    px = _smooth(21, 13, c=1)
    b = J.encode_jpeg(px[:, :, 0], quality=92)
    assert J.jpeg_info(b) == (13, 21, 1)
    out = J.decode_jpeg(b)
    assert out.shape == (21, 13, 1)
    assert np.abs(out.astype(int) - px.astype(int)).max() <= 10


def test_restart_markers_roundtrip():
    px = _smooth(48, 48)
    b = J.encode_jpeg(px, quality=90, restart_interval=2)
    assert b"\xff\xdd" in b  # DRI segment present
    assert any(bytes([0xFF, 0xD0 + i]) in b for i in range(8))
    out = J.decode_jpeg(b)
    err = np.abs(out.astype(int) - px.astype(int))
    # identical pixels to the no-restart stream (entropy layout only)
    base = J.decode_jpeg(J.encode_jpeg(px, quality=90))
    assert (out == base).all()
    assert err.max() <= 64 and err.mean() < 6.0


def test_quality_controls_size():
    px = _smooth(40, 40)
    sizes = [len(J.encode_jpeg(px, quality=q)) for q in (30, 60, 90)]
    assert sizes[0] < sizes[1] < sizes[2]


def test_jpeg_info_and_sniff():
    px = _smooth(10, 31)
    b = J.encode_jpeg(px, quality=85)
    assert codecs.sniff(b) == "jpeg"
    assert J.jpeg_info(b) == (31, 10, 3)
    assert codecs.jpeg_info(b) == (31, 10, 3)  # re-export


def test_progressive_raises_by_name():
    # splice a SOF2 marker in place of SOF0
    b = bytearray(J.encode_jpeg(_smooth(8, 8), quality=80))
    i = b.find(b"\xff\xc0")
    assert i > 0
    b[i + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="progressive"):
        J.jpeg_info(bytes(b))
    with pytest.raises(NotImplementedError, match="progressive"):
        J.decode_jpeg(bytes(b))


def test_not_a_jpeg_raises():
    with pytest.raises(ValueError, match="SOI"):
        J.decode_jpeg(b"\x00\x01\x02\x03")


def test_multimodal_stages_decode_jpeg(spark):
    """JPEG payloads ride the same Spark stages as PNG/BMP: metadata,
    histogram features, resize (re-encoded as JPEG)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from geopandas_spark.operators.multimodal import (
        decode_metadata, image_features, resize_image)

    px = _smooth(24, 18)
    blob = J.encode_jpeg(px, quality=95)
    df = spark.createDataFrame(pd.DataFrame({"media_bytes": [blob]}))

    meta = decode_metadata(df).select("media_meta.*").collect()[0]
    assert (meta["kind"], meta["width"], meta["height"],
            meta["channels"]) == ("image", 18, 24, 3)

    feat = image_features(df).collect()[0]["media_feat"]
    ref = np.concatenate([
        np.histogram(J.decode_jpeg(blob)[..., ch], bins=8,
                     range=(0, 256))[0] for ch in range(3)]).astype(float)
    ref /= np.linalg.norm(ref)
    assert np.allclose(feat, ref, atol=1e-6)

    rz = resize_image(df, 9, 6)
    out = bytes(rz.collect()[0]["media_resized"])
    assert codecs.sniff(out) == "jpeg"
    assert J.jpeg_info(out) == (9, 6, 3)
    # resized content is the nearest-neighbor downsample of the DECODED
    # payload (what the stage actually saw), within 4:4:4 re-encode loss
    want = J.decode_jpeg(blob)[(np.arange(6) * 24 // 6)][:, (np.arange(9) * 18 // 9)]
    got = J.decode_jpeg(out)
    assert np.abs(got.astype(int) - want.astype(int)).mean() < 6.0


def test_sof_dims_in_stream():
    b = J.encode_jpeg(_smooth(300, 129), quality=50)
    i = b.find(b"\xff\xc0")
    _ln, _prec, h, w, nc = struct.unpack_from(">HBHHB", b, i + 2)
    assert (h, w, nc) == (300, 129, 3)
