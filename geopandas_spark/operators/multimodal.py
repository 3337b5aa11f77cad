"""Multimodal column plumbing: opaque binary media + typed metadata.

Task-brief contract: image/audio/video live as opaque ``binary`` columns
with typed metadata; decode/feature-extract/resize/frame-sample are
Arrow-batched UDF stages. The real codec libraries are not in this
container, so the *decode* of real formats raises NotImplementedError —
but the Spark-side plumbing (schema, partitioning, UDF signatures, batch
shapes) is real and exercised by a deterministic fake payload format:

    FAKEIMG1 | uint16 width | uint16 height | uint8 channels | pixels...
    FAKEAUD1 | uint32 sample_rate | uint32 n_samples | samples (int16)...

``synthesize_media`` generates these fakes deterministically from a
media_ref so the whole path is testable end-to-end.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_IMG_MAGIC = b"FAKEIMG1"
_AUD_MAGIC = b"FAKEAUD1"

MEDIA_META_SCHEMA = (
    "kind string, width int, height int, channels int, sample_rate int, "
    "n_samples int, byte_len int"
)


def synthesize_media(df: DataFrame, ref_col: str = "media_ref",
                     out_col: str = "media_bytes") -> DataFrame:
    """Deterministic fake payload per media_ref (seeded by the ref hash)."""

    @pandas_udf("binary")
    def _gen(refs: pd.Series) -> pd.Series:
        out = []
        for ref in refs:
            if ref is None:
                out.append(None)
                continue
            seed = abs(hash_ref(ref)) % (2**32)
            rng = np.random.default_rng(seed)
            if ref.startswith("aud://"):
                sr, n = 16000, int(rng.integers(100, 400))
                samples = rng.integers(-32768, 32767, n, dtype=np.int16)
                out.append(_AUD_MAGIC + struct.pack("<II", sr, n) + samples.tobytes())
            else:
                w, h, c = int(rng.integers(4, 32)), int(rng.integers(4, 32)), 3
                px = rng.integers(0, 256, w * h * c, dtype=np.uint8)
                out.append(_IMG_MAGIC + struct.pack("<HHB", w, h, c) + px.tobytes())
        return pd.Series(out)

    return df.withColumn(out_col, _gen(F.col(ref_col)))


def hash_ref(ref: str) -> int:
    import hashlib

    return int.from_bytes(
        hashlib.blake2b(ref.encode(), digest_size=8).digest(), "little", signed=True
    )


def decode_metadata(df: DataFrame, bytes_col: str = "media_bytes",
                    out_col: str = "media_meta") -> DataFrame:
    """Parse typed metadata from the payload header. Real formats (JPEG,
    PNG, WAV, MP4...) raise NotImplementedError — codec libs absent here;
    the schema and batch plumbing are the product surface."""

    @pandas_udf(MEDIA_META_SCHEMA)
    def _meta(blobs: pd.Series) -> pd.DataFrame:
        rows = []
        for b in blobs:
            if b is None:
                rows.append((None, None, None, None, None, None, None))
            elif b[:8] == _IMG_MAGIC:
                w, h, c = struct.unpack_from("<HHB", b, 8)
                rows.append(("image", w, h, c, None, None, len(b)))
            elif b[:8] == _AUD_MAGIC:
                sr, n = struct.unpack_from("<II", b, 8)
                rows.append(("audio", None, None, None, sr, n, len(b)))
            else:
                raise NotImplementedError(
                    "real media codecs (JPEG/PNG/WAV/...) are unavailable in "
                    "this environment; only the FAKE* payloads decode"
                )
        return pd.DataFrame(rows, columns=[
            "kind", "width", "height", "channels", "sample_rate",
            "n_samples", "byte_len"])

    return df.withColumn(out_col, _meta(F.col(bytes_col)))


def image_features(df: DataFrame, bytes_col: str = "media_bytes",
                   out_col: str = "media_feat", bins: int = 8) -> DataFrame:
    """Feature extraction: per-channel histogram over decoded pixels
    (array<float>, unit-normalized) — the embedding-column producer."""

    @pandas_udf("array<float>")
    def _feat(blobs: pd.Series) -> pd.Series:
        out = []
        for b in blobs:
            if b is None or b[:8] != _IMG_MAGIC:
                out.append(None)
                continue
            w, h, c = struct.unpack_from("<HHB", b, 8)
            px = np.frombuffer(b, dtype=np.uint8, offset=13).reshape(-1, c)
            hist = np.concatenate([
                np.histogram(px[:, ch], bins=bins, range=(0, 256))[0]
                for ch in range(c)
            ]).astype(np.float32)
            n = np.linalg.norm(hist)
            out.append((hist / max(n, 1e-9)).tolist())
        return pd.Series(out)

    return df.withColumn(out_col, _feat(F.col(bytes_col)))


def resize_image(df: DataFrame, width: int, height: int,
                 bytes_col: str = "media_bytes",
                 out_col: str = "media_resized") -> DataFrame:
    """Nearest-neighbor resize of the fake pixel grid (real formats raise)."""

    @pandas_udf("binary")
    def _resize(blobs: pd.Series) -> pd.Series:
        out = []
        for b in blobs:
            if b is None:
                out.append(None)
                continue
            if b[:8] != _IMG_MAGIC:
                raise NotImplementedError("real image resize requires codec libs")
            w, h, c = struct.unpack_from("<HHB", b, 8)
            px = np.frombuffer(b, dtype=np.uint8, offset=13).reshape(h, w, c)
            yi = (np.arange(height) * h // height)
            xi = (np.arange(width) * w // width)
            rp = px[yi][:, xi]
            out.append(_IMG_MAGIC + struct.pack("<HHB", width, height, c)
                       + rp.tobytes())
        return pd.Series(out)

    return df.withColumn(out_col, _resize(F.col(bytes_col)))


def frame_sample(df: DataFrame, every_n: int = 10,
                 meta_col: str = "media_meta",
                 out_col: str = "frame_indices") -> DataFrame:
    """Frame sampling plan for audio/video payloads: indices only (decode
    of real containers is out of scope here)."""
    n = F.col(f"{meta_col}.n_samples")
    return df.withColumn(
        out_col,
        F.when(n.isNotNull(),
               F.sequence(F.lit(0), n - 1, F.lit(int(every_n))))
        .otherwise(F.lit(None)),
    )
