"""Real media codecs in pure numpy + stdlib: PNG, BMP, JPEG, WAV.

The task brief asks for multimodal binary columns whose decode /
feature-extract / resize / frame-sample stages are Arrow-batched UDFs,
with the decode STUBBED only where the container genuinely lacks codec
libraries. PNG (zlib is stdlib), uncompressed BMP, baseline JPEG
(jpegcodec.py — DCT + Huffman from the public T.81 spec) and PCM WAV
need no external library at all — so these four formats decode and
encode for real; only formats that require native codecs (MP4/H.264,
progressive/arithmetic JPEG, ...) remain NotImplementedError in
operators/multimodal.py.

Supported:
* PNG  — 8-bit depth, color types 0 (grey), 2 (RGB), 3 (palette),
  4 (grey+alpha), 6 (RGBA); all five scanline filters on decode
  (Sub/Up/Average vectorized per row, Paeth per-pixel only on rows that
  use it); non-interlaced. Encode writes filter-0 RGB/greyscale.
* BMP  — BITMAPINFOHEADER, uncompressed 24-bit BGR (the common case),
  bottom-up or top-down. Encode writes 24-bit.
* JPEG — baseline/extended sequential Huffman (SOF0/SOF1), 4:4:4 /
  4:2:2 / 4:2:0 / grayscale, restart intervals. Encode writes JFIF
  4:2:0 or 4:4:4 with the Annex K tables (see jpegcodec.py).
* WAV  — RIFF PCM 16-bit, any channel count. Encode writes 16-bit PCM.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
BMP_MAGIC = b"BM"
WAV_MAGIC = b"RIFF"
JPEG_MAGIC = b"\xff\xd8\xff"

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def sniff(blob: bytes) -> str | None:
    """-> 'png' | 'bmp' | 'jpeg' | 'wav' | 'avi' | None."""
    if blob is None:
        return None
    if blob[:8] == PNG_MAGIC:
        return "png"
    if blob[:2] == BMP_MAGIC:
        return "bmp"
    if blob[:3] == JPEG_MAGIC:
        return "jpeg"
    if blob[:4] == WAV_MAGIC and blob[8:12] == b"WAVE":
        return "wav"
    if blob[:4] == WAV_MAGIC and blob[8:12] == b"AVI ":
        return "avi"
    return None


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

def _png_chunks(b: bytes):
    pos = 8
    while pos + 8 <= len(b):
        (ln,) = struct.unpack_from(">I", b, pos)
        ctype = b[pos + 4:pos + 8]
        yield ctype, b[pos + 8:pos + 8 + ln]
        if ctype == b"IEND":
            return
        pos += 12 + ln


def png_info(b: bytes) -> tuple[int, int, int]:
    """-> (width, height, channels)."""
    for ctype, data in _png_chunks(b):
        if ctype == b"IHDR":
            w, h = struct.unpack_from(">II", data, 0)
            depth, color = data[8], data[9]
            if depth != 8:
                raise NotImplementedError(f"PNG bit depth {depth} (only 8)")
            return w, h, _PNG_CHANNELS[color]
    raise ValueError("PNG without IHDR")


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filters. raw: uint8[(h, 1+stride)]."""
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = int(raw[y, 0])
        row = raw[y, 1:].copy()
        if f == 0:
            pass
        elif f == 1:  # Sub: prefix sum over stride-bpp lanes
            for lane in range(bpp):
                row[lane::bpp] = np.cumsum(
                    row[lane::bpp], dtype=np.uint64).astype(np.uint8)
        elif f == 2:  # Up
            row += prev
        elif f == 3:  # Average
            for x in range(stride):
                left = int(row[x - bpp]) if x >= bpp else 0
                row[x] = (int(row[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth (inherently sequential)
            for x in range(stride):
                a = int(row[x - bpp]) if x >= bpp else 0
                bb = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + bb - c
                pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (
                    bb if pb <= pc else c)
                row[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise ValueError(f"PNG filter {f}")
        out[y] = row
        prev = row
    return out


def decode_png(b: bytes) -> np.ndarray:
    """-> uint8[(h, w, channels)]."""
    w = h = None
    color = None
    palette = None
    idat = []
    for ctype, data in _png_chunks(b):
        if ctype == b"IHDR":
            w, hh = struct.unpack_from(">II", data, 0)
            h = hh
            depth, color, _comp, _filt, interlace = data[8:13]
            if depth != 8:
                raise NotImplementedError(f"PNG bit depth {depth} (only 8)")
            if interlace:
                raise NotImplementedError("interlaced PNG")
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
    if w is None:
        raise ValueError("PNG without IHDR")
    c = _PNG_CHANNELS[int(color)]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)),
                        dtype=np.uint8).reshape(h, 1 + w * c)
    px = _unfilter(raw, h, w * c, c).reshape(h, w, c)
    if color == 3:
        if palette is None:
            raise ValueError("palette PNG without PLTE")
        px = palette[px[:, :, 0]]
    return px


def encode_png(px: np.ndarray) -> bytes:
    """uint8[(h,w)] or [(h,w,c)] with c in {1,2,3,4} -> PNG bytes
    (filter 0, one IDAT)."""
    px = np.ascontiguousarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    rows = np.zeros((h, 1 + w * c), dtype=np.uint8)
    rows[:, 1:] = px.reshape(h, w * c)
    idat = zlib.compress(rows.tobytes(), 6)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data \
            + struct.pack(">I", crc)

    return (PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
            + chunk(b"IEND", b""))


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------

def bmp_info(b: bytes) -> tuple[int, int, int]:
    """-> (width, height, channels)."""
    w, h = struct.unpack_from("<ii", b, 18)
    bpp = struct.unpack_from("<H", b, 28)[0]
    return int(w), abs(int(h)), bpp // 8


def decode_bmp(b: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP -> uint8[(h, w, 3)] RGB."""
    off = struct.unpack_from("<I", b, 10)[0]
    w, h = struct.unpack_from("<ii", b, 18)
    bpp = struct.unpack_from("<H", b, 28)[0]
    comp = struct.unpack_from("<I", b, 30)[0]
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"BMP bpp={bpp} compression={comp} (only uncompressed 24-bit)")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(b, dtype=np.uint8, count=stride * h,
                         offset=off).reshape(h, stride)
    px = rows[:, :w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    if not top_down:
        px = px[::-1]
    return np.ascontiguousarray(px)


def encode_bmp(px: np.ndarray) -> bytes:
    """uint8[(h,w,3)] RGB -> 24-bit BMP bytes."""
    px = np.ascontiguousarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = np.repeat(px[:, :, None], 3, axis=2)
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    data = rows.tobytes()
    header = (b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            len(data), 2835, 2835, 0, 0))
    return header + data


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------

def wav_info(b: bytes) -> tuple[int, int, int]:
    """-> (sample_rate, n_frames, channels)."""
    sr, ch, data_len, bits = _wav_headers(b)[:4]
    return sr, data_len // (ch * (bits // 8)), ch


def _wav_headers(b: bytes):
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV file")
    pos = 12
    sr = ch = bits = None
    data_off = data_len = None
    while pos + 8 <= len(b):
        cid = b[pos:pos + 4]
        (ln,) = struct.unpack_from("<I", b, pos + 4)
        if cid == b"fmt ":
            fmt, ch, sr = struct.unpack_from("<HHI", b, pos + 8)
            bits = struct.unpack_from("<H", b, pos + 22)[0]
            if fmt != 1 or bits != 16:
                raise NotImplementedError(
                    f"WAV format {fmt}/{bits}-bit (only PCM 16)")
        elif cid == b"data":
            data_off, data_len = pos + 8, ln
        pos += 8 + ln + (ln & 1)
    if sr is None or data_off is None:
        raise ValueError("WAV missing fmt/data chunk")
    return sr, ch, data_len, bits, data_off


def decode_wav(b: bytes) -> tuple[int, np.ndarray]:
    """-> (sample_rate, int16[(n_frames, channels)])."""
    sr, ch, data_len, _bits, off = _wav_headers(b)
    n = data_len // (2 * ch)
    samples = np.frombuffer(b, dtype="<i2", count=n * ch,
                            offset=off).reshape(n, ch)
    return sr, samples


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16[(n,)] or [(n, channels)] -> PCM WAV bytes."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate,
                      sample_rate * ch * 2, ch * 2, 16)
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


# ---------------------------------------------------------------------------
# JPEG (baseline sequential — full implementation in jpegcodec.py) and
# MJPEG AVI video (avicodec.py)
# ---------------------------------------------------------------------------

from .jpegcodec import decode_jpeg, encode_jpeg, jpeg_info  # noqa: E402,F401
from .avicodec import (  # noqa: E402,F401
    avi_info, decode_avi_frames, encode_avi, iter_avi_frames)
