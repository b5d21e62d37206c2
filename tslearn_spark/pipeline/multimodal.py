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
    """STUB fallback — ffmpeg-class codecs (mp4/webm audio+video) are
    not in this container.

    Deterministic fake: derives an 8x8 grayscale patch from the payload
    hash so downstream plumbing (shapes, dtypes, batching) is exercised
    honestly.  Real pure-stdlib decoders exist below for PCM WAV,
    uncompressed 24-bit BMP, 8-bit PNG (zlib inflate + all five
    scanline filters) and BASELINE JPEG (Huffman + IDCT), enabled per
    call via ``extract_features(codecs="stdlib")``; the default path
    stays the fake so the driver's hash gate (which models it) is
    untouched.
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


class _JpegBitReader:
    """MSB-first bit reader over entropy-coded JPEG data: unstuffs
    0xFF00, stops at (and reports) marker bytes."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                self.bits = (self.bits << 8) | 0
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:  # stuffed 0xFF data byte
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:  # RSTn handled by caller
                    self.bits = (self.bits << 8) | 0
                    self.nbits += 8
                    continue
                else:  # real marker: pad with zeros
                    self.bits = (self.bits << 8) | 0
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.bits = (self.bits << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_restart(self) -> None:
        """Consume a restart marker at the current byte position."""
        self.bits = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1


def _jpeg_huff_table(counts: bytes, symbols: bytes) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, per ITU T.81 Annex C canonical codes."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _jpeg_decode_huff(br: _JpegBitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("bad JPEG huffman code")


def _jpeg_extend(v: int, t: int) -> int:
    """EXTEND (T.81 F.2.2.1): map t-bit magnitude to signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# orthonormal 8-point DCT-II basis; IDCT of F is C.T @ F @ C
_DCT_C = np.array([
    [(np.sqrt(1.0 / 8) if u == 0 else np.sqrt(2.0 / 8))
     * np.cos((2 * x + 1) * u * np.pi / 16) for x in range(8)]
    for u in range(8)
])


def decode_jpeg(payload: bytes) -> np.ndarray:
    """REAL decoder for BASELINE sequential JPEG (SOF0, Huffman, optional
    4:2:0/4:2:2 chroma subsampling, restart markers) — pure stdlib
    parsing + numpy IDCT.  Returns (h, w, 3) float64 RGB in [0, 1]
    (grayscale replicated to 3 channels).  Raises on progressive (SOF2),
    arithmetic-coded, or 12-bit payloads (callers fall back to the fake).
    """
    import struct

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seg_len,) = struct.unpack_from(">H", payload, pos + 2)
        seg = payload[pos + 4:pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if pq == 0:
                    vals = np.frombuffer(seg, np.uint8, 64, i).astype(np.float64)
                    i += 64
                else:
                    vals = np.frombuffer(seg, ">u2", 64, i).astype(np.float64)
                    i += 128
                tbl = np.zeros(64)
                tbl[_ZIGZAG] = vals
                qt[tq] = tbl.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                counts = seg[i + 1:i + 17]
                n = sum(counts)
                symbols = seg[i + 17:i + 17 + n]
                (huff_dc if tc == 0 else huff_ac)[th] = _jpeg_huff_table(
                    counts, symbols)
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("unsupported JPEG precision")
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * c)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("unsupported JPEG coding process")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF0")
            ns = seg[0]
            scan = {}
            for s in range(ns):
                cs, tdta = seg[1 + 2 * s], seg[2 + 2 * s]
                scan[cs] = (tdta >> 4, tdta & 0xF)
            return _jpeg_scan(payload, pos + 2 + seg_len, frame, scan, qt,
                              huff_dc, huff_ac, restart_interval)
        elif marker == 0xD9:
            break
        pos += 2 + seg_len
    raise ValueError("no JPEG scan found")


def _jpeg_scan(payload, data_pos, frame, scan, qt, huff_dc, huff_ac,
               restart_interval) -> np.ndarray:
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        planes.append(np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8)))
    br = _JpegBitReader(payload, data_pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                br.align_restart()
                pred = [0] * len(comps)
            mcu_count += 1
            for ci, c in enumerate(comps):
                tdc, tac = scan[c["id"]]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64)
                        t = _jpeg_decode_huff(br, huff_dc[tdc])
                        diff = _jpeg_extend(br.read_bits(t), t) if t else 0
                        pred[ci] += diff
                        coef[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _jpeg_decode_huff(br, huff_ac[tac])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC overflow")
                            coef[k] = _jpeg_extend(br.read_bits(s), s)
                            k += 1
                        block = np.zeros(64)
                        block[_ZIGZAG] = coef
                        F8 = block.reshape(8, 8) * q
                        px = _DCT_C.T @ F8 @ _DCT_C + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = px
    out_planes = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if c["h"] != hmax or c["v"] != vmax:  # nearest-neighbor upsample
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        g = np.clip(out_planes[0], 0.0, 255.0)
        return np.dstack([g, g, g]) / 255.0
    y, cb, cr = out_planes[0], out_planes[1] - 128.0, out_planes[2] - 128.0
    rgb = np.dstack([
        y + 1.402 * cr,
        y - 0.344136 * cb - 0.714136 * cr,
        y + 1.772 * cb,
    ])
    return np.clip(rgb, 0.0, 255.0) / 255.0


# ---------------------------------------------------------------------------
# Container METADATA parsers — pure stdlib, no codec work.  The pixel /
# sample DATA of mp4/webm stays behind the deterministic fake (ffmpeg
# absent from this environment), but the container metadata (duration,
# track count, per-track sample counts/bytes) is real: an ISO-BMFF box
# walk (public spec ISO/IEC 14496-12) and an EBML element walk (public
# Matroska/WebM spec).  Matching minimal builders exist so tests and the
# oracled query can round-trip parse(build(params)) == params.
# ---------------------------------------------------------------------------

_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _mp4_boxes(data: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for sibling boxes in [start, end)."""
    pos = start
    while pos + 8 <= end:
        size = int.from_bytes(data[pos:pos + 4], "big")
        btype = data[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                return
            size = int.from_bytes(data[pos + 8:pos + 16], "big")
            body = pos + 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < 8 or pos + size > end:
            return  # malformed — stop the walk, never raise mid-batch
        yield btype, body, pos + size
        pos += size


def parse_mp4_metadata(payload: bytes) -> dict | None:
    """ISO-BMFF metadata walk: ftyp major brand, mvhd timescale+duration,
    trak count, per-trak hdlr handler + stsz sample count/bytes.
    Returns None when the payload is not an ISO-BMFF file (no valid
    top-level ftyp/moov structure)."""
    if not payload or len(payload) < 16:
        return None
    out = {"container": "mp4", "brand": None, "duration_ms": None,
           "n_tracks": 0, "n_samples": 0, "sample_bytes": 0}
    saw_box = False

    def walk(start, end, depth=0):
        nonlocal saw_box
        for btype, b0, b1 in _mp4_boxes(payload, start, end):
            saw_box = True
            if btype == b"ftyp" and depth == 0:
                out["brand"] = payload[b0:b0 + 4].decode("ascii", "replace")
            elif btype == b"mvhd" and b1 - b0 >= 20:
                version = payload[b0]
                if version == 1 and b1 - b0 >= 28:
                    ts = int.from_bytes(payload[b0 + 20:b0 + 24], "big")
                    dur = int.from_bytes(payload[b0 + 24:b0 + 32], "big")
                else:
                    ts = int.from_bytes(payload[b0 + 12:b0 + 16], "big")
                    dur = int.from_bytes(payload[b0 + 16:b0 + 20], "big")
                if ts:
                    out["duration_ms"] = int(round(dur * 1000.0 / ts))
            elif btype == b"trak":
                out["n_tracks"] += 1
            elif btype == b"stsz" and b1 - b0 >= 12:
                fixed = int.from_bytes(payload[b0 + 4:b0 + 8], "big")
                count = int.from_bytes(payload[b0 + 8:b0 + 12], "big")
                out["n_samples"] += count
                if fixed:
                    out["sample_bytes"] += fixed * count
                else:
                    tbl = payload[b0 + 12:b0 + 12 + 4 * count]
                    out["sample_bytes"] += sum(
                        int.from_bytes(tbl[i:i + 4], "big")
                        for i in range(0, len(tbl) - 3, 4))
            if btype in _MP4_CONTAINERS:
                walk(b0, b1, depth + 1)

    walk(0, len(payload))
    if not saw_box or (out["brand"] is None and out["duration_ms"] is None):
        return None
    return out


def _ebml_read_vint(data: bytes, pos: int, strip_marker: bool):
    """(value, next_pos) for one EBML variable-size integer; None on
    malformed input."""
    if pos >= len(data):
        return None
    first = data[pos]
    if first == 0:
        return None
    length = 1
    mask = 0x80
    while not (first & mask):
        mask >>= 1
        length += 1
    if pos + length > len(data):
        return None
    val = first & (mask - 1) if strip_marker else first
    for i in range(1, length):
        val = (val << 8) | data[pos + i]
    return val, pos + length


def _ebml_elements(data: bytes, start: int, end: int):
    """Yield (element_id, body_start, body_end) for siblings in [start, end)."""
    pos = start
    while pos < end:
        rid = _ebml_read_vint(data, pos, strip_marker=False)
        if rid is None:
            return
        eid, pos = rid
        rsz = _ebml_read_vint(data, pos, strip_marker=True)
        if rsz is None:
            return
        size, pos = rsz
        if pos + size > end:
            return
        yield eid, pos, pos + size
        pos += size


_EBML_HEADER = 0x1A45DFA3
_EBML_DOCTYPE = 0x4282
_MKV_SEGMENT = 0x18538067
_MKV_INFO = 0x1549A966
_MKV_TIMESCALE = 0x2AD7B1
_MKV_DURATION = 0x4489
_MKV_TRACKS = 0x1654AE6B
_MKV_TRACKENTRY = 0xAE


def parse_webm_metadata(payload: bytes) -> dict | None:
    """EBML walk (public Matroska/WebM spec): DocType from the EBML
    header, Duration * TimestampScale from Segment>Info, TrackEntry
    count from Segment>Tracks.  Returns None for non-EBML payloads."""
    import struct

    if not payload or payload[:4] != b"\x1aE\xdf\xa3":
        return None
    out = {"container": None, "brand": None, "duration_ms": None,
           "n_tracks": 0, "n_samples": 0, "sample_bytes": 0}
    scale_ns = 1_000_000  # spec default: 1 ms
    duration_units = None
    for eid, b0, b1 in _ebml_elements(payload, 0, len(payload)):
        if eid == _EBML_HEADER:
            for cid, c0, c1 in _ebml_elements(payload, b0, b1):
                if cid == _EBML_DOCTYPE:
                    doctype = payload[c0:c1].split(b"\x00")[0].decode(
                        "ascii", "replace")
                    out["container"] = doctype
                    out["brand"] = doctype
        elif eid == _MKV_SEGMENT:
            for cid, c0, c1 in _ebml_elements(payload, b0, b1):
                if cid == _MKV_INFO:
                    for gid, g0, g1 in _ebml_elements(payload, c0, c1):
                        if gid == _MKV_TIMESCALE:
                            scale_ns = int.from_bytes(payload[g0:g1], "big")
                        elif gid == _MKV_DURATION:
                            raw = payload[g0:g1]
                            duration_units = struct.unpack(
                                ">f" if len(raw) == 4 else ">d", raw)[0]
                elif cid == _MKV_TRACKS:
                    out["n_tracks"] += sum(
                        1 for gid, _, _ in
                        _ebml_elements(payload, c0, c1)
                        if gid == _MKV_TRACKENTRY)
    if out["container"] is None:
        return None
    if duration_units is not None:
        out["duration_ms"] = int(round(duration_units * scale_ns / 1e6))
    return out


def parse_media_metadata(payload: bytes) -> dict | None:
    """Container dispatch by magic: ISO-BMFF (ftyp at offset 4) or EBML."""
    if payload and len(payload) >= 12 and payload[4:8] == b"ftyp":
        return parse_mp4_metadata(payload)
    if payload and payload[:4] == b"\x1aE\xdf\xa3":
        return parse_webm_metadata(payload)
    return None


def _box(btype: bytes, body: bytes) -> bytes:
    return (len(body) + 8).to_bytes(4, "big") + btype + body


def build_mp4(duration_ms: int, n_tracks: int = 1, n_samples: int = 0,
              sample_size: int = 256, brand: str = "isom") -> bytes:
    """Minimal-but-valid ISO-BMFF container for round-trip tests and the
    oracled metadata query: ftyp + moov{mvhd, n_tracks x trak{mdia{hdlr,
    minf{stbl{stsz}}}}} + mdat filler.  No codec data — the mdat bytes
    are deterministic filler."""
    ftyp = _box(b"ftyp", brand.encode("ascii")[:4].ljust(4) +
                (0).to_bytes(4, "big") + brand.encode("ascii")[:4].ljust(4))
    mvhd_body = (
        b"\x00\x00\x00\x00"                      # version/flags
        + (0).to_bytes(4, "big") * 2             # creation/modification
        + (1000).to_bytes(4, "big")              # timescale: 1 kHz -> ms
        + int(duration_ms).to_bytes(4, "big")    # duration
        + (0x00010000).to_bytes(4, "big")        # rate 1.0
        + (0x0100).to_bytes(2, "big")            # volume 1.0
        + b"\x00" * 10                           # reserved
        + b"\x00" * 36                           # matrix (identity omitted)
        + b"\x00" * 24                           # pre_defined
        + (n_tracks + 1).to_bytes(4, "big")      # next_track_ID
    )
    traks = b""
    for t in range(n_tracks):
        handler = b"vide" if t == 0 else b"soun"
        hdlr = _box(b"hdlr", b"\x00" * 8 + handler + b"\x00" * 12 + b"\x00")
        stsz = _box(b"stsz", b"\x00" * 4
                    + int(sample_size).to_bytes(4, "big")
                    + int(n_samples).to_bytes(4, "big"))
        stbl = _box(b"stbl", stsz)
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", hdlr + minf)
        traks += _box(b"trak", mdia)
    moov = _box(b"moov", _box(b"mvhd", mvhd_body) + traks)
    mdat = _box(b"mdat", bytes((7 * i) % 251 for i in range(64)))
    return ftyp + moov + mdat


def _ebml_size(n: int) -> bytes:
    """EBML data-size varint (marker in the leading byte)."""
    for width in range(1, 9):
        if n < (1 << (7 * width)) - 1:
            val = n | (1 << (7 * width))
            return val.to_bytes(width, "big")
    raise ValueError("EBML size too large")


def _ebml_elt(eid: int, body: bytes) -> bytes:
    id_len = (eid.bit_length() + 7) // 8
    return eid.to_bytes(id_len, "big") + _ebml_size(len(body)) + body


def build_webm(duration_ms: int, n_tracks: int = 1,
               doctype: str = "webm") -> bytes:
    """Minimal-but-valid EBML/WebM container: EBML header with DocType,
    Segment{Info{TimestampScale, Duration}, Tracks{TrackEntry...}}."""
    import struct

    header = _ebml_elt(_EBML_HEADER, _ebml_elt(
        _EBML_DOCTYPE, doctype.encode("ascii")))
    info = _ebml_elt(_MKV_INFO,
                     _ebml_elt(_MKV_TIMESCALE,
                               (1_000_000).to_bytes(3, "big"))
                     + _ebml_elt(_MKV_DURATION,
                                 struct.pack(">d", float(duration_ms))))
    entries = b"".join(
        _ebml_elt(_MKV_TRACKENTRY, _ebml_elt(0xD7, bytes([t + 1])))
        for t in range(n_tracks))
    tracks = _ebml_elt(_MKV_TRACKS, entries)
    return header + _ebml_elt(_MKV_SEGMENT, info + tracks)


METADATA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("container", StringType()),
        StructField("brand", StringType()),
        StructField("duration_ms", LongType()),
        StructField("n_tracks", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("sample_bytes", LongType()),
    ]
)


def extract_metadata(media: DataFrame) -> DataFrame:
    """mapInPandas container-metadata extraction: REAL parse of mp4/webm
    payload bytes (box/EBML walks above); unparseable payloads emit a
    null row (never a task failure — a corrupt byte cannot kill a
    100-TB batch)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                meta = parse_media_metadata(
                    bytes(payload) if payload is not None else b"")
                if meta is None:
                    meta = {"container": None, "brand": None,
                            "duration_ms": None, "n_tracks": None,
                            "n_samples": None, "sample_bytes": None}
                rows.append({"media_id": mid, **meta})
            yield pd.DataFrame(rows, columns=[f.name for f in METADATA_SCHEMA])

    return media.select("media_id", "payload").mapInPandas(
        gen, METADATA_SCHEMA)


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
            if payload[:2] == b"\xff\xd8":
                return decode_jpeg(payload)
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
