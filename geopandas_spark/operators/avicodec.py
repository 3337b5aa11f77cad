"""AVI (RIFF) container with MJPEG video frames — pure stdlib + numpy.

Makes the VIDEO modality real: an MJPEG AVI is a RIFF tree (the same
chunk grammar codecs.py already parses for WAV) whose frame payloads
are plain baseline JPEGs, which jpegcodec.py decodes natively. So
frame sampling / decode / feature stages in operators/multimodal.py
can run end-to-end on a genuine video container with no native codec
library. MP4/H.264 (and any inter-frame codec) still raise by name —
those need real codec libs.

Layout written (and the subset read):

    RIFF 'AVI '
      LIST 'hdrl'
        'avih' MainAVIHeader   (us/frame, total frames, dims)
        LIST 'strl'
          'strh' AVIStreamHeader (fccType='vids', handler='MJPG')
          'strf' BITMAPINFOHEADER (biCompression='MJPG')
      LIST 'movi'
        '00dc' <JPEG bytes> ...  (one chunk per frame, even-padded)
      'idx1' index (written; readers may ignore it)

Public-spec sources: Microsoft AVI RIFF reference, OpenDML AVI 1.02.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpegcodec import decode_jpeg, encode_jpeg, jpeg_info

AVI_MAGIC_RIFF = b"RIFF"
AVI_MAGIC_TYPE = b"AVI "


def is_avi(b: bytes) -> bool:
    return b[:4] == AVI_MAGIC_RIFF and b[8:12] == AVI_MAGIC_TYPE


# --- encode ----------------------------------------------------------------

def encode_avi(frames, fps: int = 10, quality: int = 90) -> bytes:
    """frames: uint8 (n, h, w, 3|1) array or list of (h, w, c) arrays
    -> MJPEG AVI bytes. All frames must share one (h, w)."""
    frames = [np.asarray(f) for f in frames]
    if not frames:
        raise ValueError("encode_avi: no frames")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("encode_avi: frames must share one (h, w)")
    if not 0 < fps <= 1_000_000:
        # above 1 MHz the avih dwMicroSecPerFrame field would floor to 0
        # — an AVI with invalid (zero) frame timing
        raise ValueError("encode_avi: fps must be in 1..1000000")
    for f in frames:
        if f.ndim == 3 and f.shape[2] not in (1, 3):
            raise ValueError(
                f"encode_avi: {f.shape[2]}-channel frame (1 or 3 only)")
    jpegs = [encode_jpeg(f if f.ndim == 3 and f.shape[2] == 3 else
                         f.reshape(h, w), quality=quality) for f in frames]
    n = len(jpegs)
    max_sz = max(len(j) for j in jpegs)

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(fourcc: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", fourcc + payload)

    avih = struct.pack(
        "<10I4x4x",  # MainAVIHeader; 2 of the 4 reserved dwords via pad
        1_000_000 // fps,      # dwMicroSecPerFrame
        max_sz * fps,          # dwMaxBytesPerSec (upper bound)
        0,                     # dwPaddingGranularity
        0x10,                  # dwFlags: AVIF_HASINDEX
        n, 0, 1, max_sz,       # frames, initial, streams, sug. buffer
        w, h) + b"\x00" * 8
    strh = struct.pack(
        "<4s4sIHHIIIIIIII8x",
        b"vids", b"MJPG", 0, 0, 0, 0,
        1, fps,                # dwScale / dwRate -> fps
        0, n, max_sz, 0xFFFFFFFF, 0)
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)

    movi_payload = b"".join(chunk(b"00dc", j) for j in jpegs)
    # idx1: offsets are relative to the 'movi' fourcc position
    idx = bytearray()
    off = 4
    for j in jpegs:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(j))
        off += 8 + len(j) + (len(j) % 2)

    body = (lst(b"hdrl",
                chunk(b"avih", avih)
                + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
            + lst(b"movi", movi_payload)
            + chunk(b"idx1", bytes(idx)))
    return AVI_MAGIC_RIFF + struct.pack("<I", 4 + len(body)) \
        + AVI_MAGIC_TYPE + body


# --- decode ----------------------------------------------------------------

def _chunks(b: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_len) within [pos, end)."""
    while pos + 8 <= end:
        fourcc = b[pos:pos + 4]
        (ln,) = struct.unpack_from("<I", b, pos + 4)
        yield fourcc, pos + 8, ln
        pos += 8 + ln + (ln % 2)


def _find_list(b: bytes, pos: int, end: int, want: bytes):
    for fourcc, p, ln in _chunks(b, pos, end):
        if fourcc == b"LIST" and b[p:p + 4] == want:
            return p + 4, p + ln
    return None


def avi_info(b: bytes) -> tuple[int, int, int, int]:
    """-> (width, height, n_frames, fps) from the avih header."""
    b = bytes(b)
    if not is_avi(b):
        raise ValueError("not an AVI (missing RIFF/AVI header)")
    hdrl = _find_list(b, 12, len(b), b"hdrl")
    if hdrl is None:
        raise ValueError("corrupt AVI: no hdrl list")
    for fourcc, p, ln in _chunks(b, *hdrl):
        if fourcc == b"avih":
            us, _mb, _pg, _fl, n = struct.unpack_from("<5I", b, p)
            w, h = struct.unpack_from("<II", b, p + 32)
            fps = round(1_000_000 / us) if us else 0
            return w, h, n, fps
    raise ValueError("corrupt AVI: no avih header")


def _video_stream(b: bytes) -> tuple[int, bytes]:
    """(stream index, handler fourcc) of the FIRST 'vids' stream — stream
    index is the strl position within hdrl (AVI RIFF spec: chunk ids are
    '<2-digit stream index><dc|db|wb|tx>')."""
    hdrl = _find_list(b, 12, len(b), b"hdrl")
    if hdrl is None:
        raise ValueError("corrupt AVI: no hdrl list")
    stream_i = -1
    for fourcc, p, ln in _chunks(b, *hdrl):
        if fourcc == b"LIST" and b[p:p + 4] == b"strl":
            stream_i += 1
            for f2, p2, l2 in _chunks(b, p + 4, p + ln):
                if f2 == b"strh" and b[p2:p2 + 4] == b"vids":
                    return stream_i, b[p2 + 4:p2 + 8]
    raise ValueError("corrupt AVI: no video stream header")


def _frame_chunks(b: bytes, pos: int, end: int, prefix: bytes):
    """dc/db chunks of one stream within [pos, end), descending into
    LIST 'rec ' groups (interleaved files wrap frame chunks in them)."""
    for fourcc, p, ln in _chunks(b, pos, end):
        if fourcc == b"LIST" and b[p:p + 4] == b"rec ":
            yield from _frame_chunks(b, p + 4, p + ln, prefix)
        elif fourcc[:2] == prefix and fourcc[2:4] in (b"dc", b"db"):
            yield p, ln


def iter_avi_frames(b: bytes):
    """Yield raw JPEG bytes per video frame of the first 'vids' stream
    ('NNdc'/'NNdb' chunks, incl. inside LIST 'rec ' groups; other
    streams' chunks — audio 'NNwb', a second video stream — are
    skipped)."""
    b = bytes(b)
    if not is_avi(b):
        raise ValueError("not an AVI (missing RIFF/AVI header)")
    stream_i, handler = _video_stream(b)
    if handler not in (b"MJPG", b"mjpg", b"jpeg", b"\x00\x00\x00\x00"):
        raise NotImplementedError(
            f"AVI video codec {handler!r} — only MJPEG decodes natively "
            "(H.264/MP4-family codecs need native libs)")
    movi = _find_list(b, 12, len(b), b"movi")
    if movi is None:
        raise ValueError("corrupt AVI: no movi list")
    prefix = b"%02d" % stream_i
    for p, ln in _frame_chunks(b, *movi, prefix):
        yield b[p:p + ln]


def decode_avi_frames(b: bytes, indices=None) -> list[np.ndarray]:
    """Decode all (or the given 0-based `indices` of) video frames to
    uint8 (h, w, c) arrays."""
    want = set(indices) if indices is not None else None
    out = []
    for i, jb in enumerate(iter_avi_frames(b)):
        if want is None or i in want:
            out.append(decode_jpeg(jb))
    return out


def avi_frame_info(b: bytes) -> tuple[int, int, int]:
    """(width, height, channels) of the first frame's actual JPEG."""
    for jb in iter_avi_frames(b):
        return jpeg_info(jb)
    raise ValueError("AVI with no video frames")
