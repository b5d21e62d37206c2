"""Multimodal columns: opaque binary payloads + typed metadata.

The container ships no image/audio codecs, so the *decode* step is a
deterministic fake behind a clearly-marked boundary — but every piece of
Spark plumbing around it is real and tested: schemas, Arrow batch
shapes, mapInPandas iterator contracts, partition sizing.

At 100 TB the rules encoded here are: binary payloads ride in their own
column (Parquet keeps them out of unrelated scans via column pruning);
feature extraction is mapInPandas (streaming Arrow batches, bounded
memory); and metadata predicates (width/height/duration filters) push
down to the scan because they live in ordinary typed columns.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),          # image | audio | video
        StructField("payload", BinaryType(), True),        # opaque encoded bytes
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)


def decode_image(payload: bytes) -> np.ndarray:
    """STUB — compressed-format decoders (PIL/ffmpeg) are not in this
    container.

    Deterministic fake: derives an 8x8 grayscale patch from the payload
    hash so downstream plumbing (shapes, dtypes, batching) is exercised
    honestly.  Real pure-stdlib decoders for the UNcompressed formats
    exist below (decode_bmp, decode_wav) and are enabled per call via
    ``extract_features(codecs="stdlib")``; the default path stays the
    fake so the driver's hash gate (which models it) is untouched.
    """
    digest = hashlib.sha256(payload or b"").digest()
    arr = np.frombuffer((digest * 2)[:64], dtype=np.uint8).astype(np.float64)
    return arr.reshape(8, 8) / 255.0


def decode_wav(payload: bytes) -> np.ndarray:
    """REAL decoder for PCM WAV (pure stdlib ``wave``): returns
    (n_samples, n_channels) float64 in [-1, 1].  Raises on non-PCM or
    non-WAV payloads (callers fall back to the fake)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload)) as w:
        ch, sw, _, n = (w.getnchannels(), w.getsampwidth(),
                        w.getframerate(), w.getnframes())
        raw = w.readframes(n)
    if sw == 1:  # unsigned 8-bit
        arr = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif sw == 2:
        arr = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 4:
        arr = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported sample width {sw}")
    return arr.reshape(-1, ch)


def decode_bmp(payload: bytes) -> np.ndarray:
    """REAL decoder for uncompressed 24-bit BMP (pure struct parsing):
    returns (h, w, 3) float64 RGB in [0, 1].  Raises on compressed or
    non-24-bit BMPs (callers fall back to the fake)."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    w, h = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    top_down = h < 0
    h = abs(h)
    row_bytes = ((w * 3 + 3) // 4) * 4  # rows pad to 4-byte boundaries
    out = np.empty((h, w, 3), dtype=np.float64)
    for r in range(h):
        src = r if top_down else h - 1 - r
        row = np.frombuffer(payload, dtype=np.uint8,
                            count=w * 3, offset=data_off + src * row_bytes)
        out[r] = row.reshape(w, 3)[:, ::-1]  # BGR -> RGB
    return out / 255.0


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_png(payload: bytes) -> np.ndarray:
    """REAL decoder for 8-bit non-interlaced PNG (pure stdlib ``zlib`` +
    ``struct``): gray / gray+alpha / RGB / RGBA, all five scanline
    filters (None/Sub/Up/Average/Paeth).  Returns (h, w, channels)
    float64 in [0, 1].  Raises on palette, 16-bit, or interlaced PNGs
    (callers fall back to the fake).

    Sub rows unfilter as a per-channel cumsum; Up rows as one vector
    add; Average/Paeth pay the per-pixel left dependency.
    """
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    width = height = channels = None
    idat: list[bytes] = []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctag = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length  # chunk header + data + CRC
        if ctag == b"IHDR":
            width, height, bitd, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data)
            if bitd != 8 or comp != 0 or filt != 0 or interlace != 0:
                raise ValueError(
                    f"unsupported PNG (depth={bitd}, interlace={interlace})")
            channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(ctype)
            if channels is None:
                raise ValueError(f"unsupported PNG color type {ctype}")
        elif ctag == b"IDAT":
            idat.append(data)
        elif ctag == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    raw = zlib.decompress(b"".join(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("bad PNG scanline payload")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    bpp = channels
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(raw, np.uint8, stride,
                             y * (stride + 1) + 1).astype(np.int64)
        if f == 0:
            cur = line
        elif f == 1:  # Sub: per-channel running sum mod 256
            cur = (np.cumsum(line.reshape(width, bpp), axis=0) & 0xFF).ravel()
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        elif f in (3, 4):  # Average / Paeth: left dependency, per pixel
            cur = np.empty(stride, dtype=np.int64)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                if f == 3:
                    pred = (a + b) >> 1
                else:
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(height, width, channels).astype(np.float64) / 255.0


def decode_payload(kind: str, payload: bytes, codecs: str | None = None) -> np.ndarray:
    """Dispatch: with codecs='stdlib', payloads with real WAV/BMP/PNG
    magic decode for real; anything else (or any parse failure) falls
    back to the deterministic fake so a corrupt byte can never kill a
    100-TB batch mid-stage."""
    if codecs == "stdlib" and payload:
        try:
            if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
                return decode_wav(payload)
            if payload[:2] == b"BM":
                return decode_bmp(payload)
            if payload[:8] == _PNG_SIG:
                return decode_png(payload)
        except Exception:
            pass
    return decode_image(payload)


FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("feat_mean", DoubleType()),
        StructField("feat_std", DoubleType()),
        StructField("feat_vec", ArrayType(DoubleType())),
    ]
)


def extract_features(media: DataFrame, batch_size: int = 256,
                     codecs: str | None = None) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Iterator-of-batches contract: bounded memory however large the
    partition; Arrow moves the binary column zero-copy.  codecs='stdlib'
    turns on the real WAV/BMP decoders (decode_payload) — the default
    keeps the deterministic fake for every payload, which the driver's
    DuckDB oracle models.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_payload(k, p, codecs)
                for k, p in zip(pdf["kind"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feat_mean": [float(f.mean()) for f in feats],
                    "feat_std": [float(f.std()) for f in feats],
                    "feat_vec": [f.ravel().tolist() for f in feats],
                }
            )

    return media.mapInPandas(gen, FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plan: one row per sampled frame timestamp.

    The decode itself is the stub; the *plan* (explode of a sequence
    bounded by duration metadata, pushdown-friendly) is the real part.
    """
    return media.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.expr(f"sequence(0, greatest(duration_ms - 1, 0), {every_ms})")
        ).alias("frame_ts_ms"),
    )
