"""Multimodal column plumbing: binary payloads + typed metadata.

PNG/JPEG/GIF/BMP dimensions and WAV audio metadata are decoded for REAL
via stdlib header parsing (IHDR chunk / SOF marker / logical screen
descriptor / BITMAPINFOHEADER / RIFF chunk walk), and 16-bit PCM WAV
SIGNAL features (RMS / peak / zero-crossing rate / frame-level silence
ratio) are computed from a REAL stdlib sample decode
(:func:`extract_pcm_features`). Pixel-level resize is
REAL for 24-bpp BMP (struct), 8-bit non-interlaced PNG (zlib inflate
+ the five RFC 2083 scanline filters, nearest-neighbor resample, filter-0
deflate re-encode), and non-interlaced single-frame GIF (full LZW
decode, index-raster resample, literal-code LZW re-encode), AND
baseline sequential 4:4:4/grayscale JPEG (full entropy decode +
dequant + 8×8 IDCT + YCbCr→RGB in operators/jpegcodec.py, numpy only —
unsupported baseline flavors like progressive or subsampled chroma
keep the fallback); GIF frame demux is real too. Video frame sampling
is REAL for RIFF/AVI (LIST-movi chunk walk), ISO-BMFF MP4/MOV
(box-tree walk to stsz/stsc/stco sample tables), AND Matroska/WebM
(EBML varint walk to the video track's Cluster blocks) — all three
mainstream containers demux for real; only exotic flavors (laced MKV,
progressive JPEG) keep deterministic stand-ins clearly marked as such
(PIL/torchaudio are not in this container). The
Spark-side contract (schema, Arrow batch shape, ``mapInPandas``
partition-parallel execution) is real and tested either way; swapping a
stub body for a PIL/torchaudio call changes nothing about the plan.

Layout rule at scale: binary payloads live in their own column so parquet
column pruning means metadata-only queries never read the blobs; the table
is partitioned/bucketed by content id.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
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
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("content_hash", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# JPEG start-of-frame markers that carry dimensions (baseline,
# progressive, lossless, arithmetic variants) — everything in the
# C0-CF range except C4 (DHT), C8 (JPG extension) and CC (DAC).
_JPEG_SOF = {
    0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
    0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
}


def _png_dimensions(payload: bytes) -> tuple[int, int] | None:
    """PNG width/height straight from the IHDR chunk (stdlib only):
    8-byte signature, 4-byte chunk length, 'IHDR', then two big-endian
    32-bit ints. IHDR is required to be the first chunk by the spec."""
    import struct

    if len(payload) < 24 or not payload.startswith(_PNG_SIG):
        return None
    if payload[12:16] != b"IHDR":
        return None
    w, h = struct.unpack(">II", payload[16:24])
    return w, h


def _jpeg_dimensions(payload: bytes) -> tuple[int, int] | None:
    """JPEG width/height from the first SOFn marker (stdlib only): walk
    the marker stream (each non-standalone segment carries a 2-byte
    big-endian length including itself); SOFn payload is
    precision(1) + height(2) + width(2)."""
    import struct

    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        return None
    i = 2
    while i + 4 <= len(payload):
        if payload[i] != 0xFF:
            return None  # desynchronized marker stream
        marker = payload[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:  # standalone
            i += 2
            continue
        if i + 4 > len(payload):
            return None
        (seg_len,) = struct.unpack(">H", payload[i + 2:i + 4])
        if marker in _JPEG_SOF:
            if i + 9 > len(payload):
                return None
            h, w = struct.unpack(">HH", payload[i + 5:i + 9])
            return w, h
        i += 2 + seg_len
    return None


def _gif_dimensions(payload: bytes) -> tuple[int, int] | None:
    """GIF logical-screen width/height (stdlib only): 6-byte version
    signature then two little-endian 16-bit ints."""
    import struct

    if len(payload) < 10 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w, h = struct.unpack("<HH", payload[6:10])
    return w, h


def _bmp_dimensions(payload: bytes) -> tuple[int, int] | None:
    """BMP width/height from the BITMAPINFOHEADER (stdlib only): 14-byte
    file header, then header size + two little-endian 32-bit ints.
    Height is signed — negative means a top-down bitmap, so take abs."""
    import struct

    if len(payload) < 26 or payload[:2] != b"BM":
        return None
    (hdr_size,) = struct.unpack("<I", payload[14:18])
    if hdr_size == 12:  # 12-byte BITMAPCOREHEADER is the ONLY 16-bit-dim form
        w, h = struct.unpack("<HH", payload[18:22])
        return w, h
    if hdr_size < 40:  # rare OS/2 2.x short headers (e.g. 16) store
        return None    # 32-bit dims but truncate later fields — fall back
    w, h = struct.unpack("<ii", payload[18:26])
    return abs(w), abs(h)


def _decode_dimensions(payload: bytes) -> tuple[int, int]:
    """Image dimensions: REAL stdlib header parse for PNG (IHDR chunk),
    JPEG (SOF marker), GIF (logical screen descriptor) and BMP
    (BITMAPINFOHEADER); other formats fall back to a deterministic
    STUB (stable pseudo-dimensions from the content hash — a real
    deployment swaps the fallback for PIL.Image.open; neither image lib
    is in this container)."""
    dims = (
        _png_dimensions(payload)
        or _jpeg_dimensions(payload)
        or _gif_dimensions(payload)
        or _bmp_dimensions(payload)
    )
    if dims is not None:
        return dims
    h = hashlib.md5(payload).digest()
    return 16 + h[0] % 64, 16 + h[1] % 64


def _wav_audio_meta(payload: bytes) -> tuple[int, int, int] | None:
    """(channels, sample_rate, n_samples) from a RIFF/WAVE payload
    (stdlib only): walk the chunk list for 'fmt ' (channels LE16 @+2,
    rate LE32 @+4, bits/sample LE16 @+14) and 'data' (byte length →
    sample count). Chunks are word-aligned (odd sizes pad one byte)."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    channels = rate = bits = data_len = None
    i = 12
    while i + 8 <= len(payload):
        cid = payload[i:i + 4]
        (clen,) = struct.unpack("<I", payload[i + 4:i + 8])
        body = payload[i + 8:i + 8 + clen]
        if cid == b"fmt " and len(body) >= 16:
            channels, rate = struct.unpack("<HI", body[2:8])
            (bits,) = struct.unpack("<H", body[14:16])
        elif cid == b"data":
            # clamp to the bytes actually present: a truncated WAV whose
            # declared chunk length exceeds the remaining payload must not
            # overstate n_samples/duration
            data_len = min(clen, max(0, len(payload) - i - 8))
        i += 8 + clen + (clen % 2)
    if not channels or not rate or not bits or data_len is None:
        return None
    n_samples = data_len // max(1, channels * (bits // 8))
    return channels, rate, n_samples



def extract_media_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Decode/feature-extract media payloads, partition-parallel via Arrow.

    One Arrow batch in → one feature frame out; no per-row Python UDF
    calls, no shuffle (narrow transformation over the scan).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [_decode_dimensions(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "content_hash": [
                        hashlib.md5(bytes(p)).hexdigest() for p in pdf["payload"]
                    ],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


AUDIO_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("duration_ms", LongType()),
    ]
)


def extract_audio_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Audio metadata per payload, partition-parallel via Arrow.

    REAL stdlib RIFF/WAVE chunk parse (channels / sample rate / sample
    count → duration); non-WAV payloads fall back to a deterministic
    STUB (stable pseudo-metadata from the content hash — a real
    deployment swaps the fallback for soundfile/torchaudio, neither of
    which is in this container). Only ``kind='audio'`` rows produce
    output; narrow transformation, payload column pruned upstream of
    any metadata-only consumer.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            auds = pdf[pdf["kind"] == "audio"]
            for mid, p in zip(auds["media_id"], auds["payload"]):
                raw = bytes(p)
                meta = _wav_audio_meta(raw)
                if meta is None:
                    h = hashlib.md5(raw).digest()
                    meta = (1 + h[0] % 2, 8000 * (1 + h[1] % 6), len(raw))
                ch, rate, n = meta
                rows.append((mid, len(raw), ch, rate, n, n * 1000 // rate))
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "media_id", "n_bytes", "channels",
                        "sample_rate", "n_samples", "duration_ms",
                    ],
                )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=AUDIO_SCHEMA
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def _bmp_resize(payload: bytes, max_dim: int) -> tuple[bytes, int, int] | None:
    """REAL nearest-neighbor resize for uncompressed 24-bpp BMPs,
    stdlib only: parse BITMAPFILEHEADER/BITMAPINFOHEADER, sample source
    pixels (rows are 4-byte aligned; positive height = bottom-up, which
    the resample preserves), and re-emit a valid 54-byte-header BMP.
    Returns None for any other BMP flavor (palette, RLE, 32-bpp...)."""
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    (data_off,) = struct.unpack("<I", payload[10:14])
    (hdr_size,) = struct.unpack("<I", payload[14:18])
    if hdr_size < 40:
        return None
    w, h_signed = struct.unpack("<ii", payload[18:26])
    (bpp,) = struct.unpack("<H", payload[28:30])
    (compression,) = struct.unpack("<I", payload[30:34])
    h = abs(h_signed)
    if bpp != 24 or compression != 0 or w <= 0 or h == 0:
        return None
    stride = (w * 3 + 3) // 4 * 4
    if data_off + stride * h > len(payload):
        return None
    scale = min(1.0, max_dim / max(w, h))
    nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
    nstride = (nw * 3 + 3) // 4 * 4
    rows = []
    for oy in range(nh):
        sy = min(h - 1, oy * h // nh)
        src = data_off + sy * stride
        row = bytearray(nstride)
        for ox in range(nw):
            sx = min(w - 1, ox * w // nw)
            row[ox * 3:ox * 3 + 3] = payload[src + sx * 3:src + sx * 3 + 3]
        rows.append(bytes(row))
    pixels = b"".join(rows)
    info = struct.pack(
        "<IiiHHIIiiII", 40, nw, nh if h_signed > 0 else -nh,
        1, 24, 0, len(pixels), 2835, 2835, 0, 0,
    )
    hdr = b"BM" + struct.pack("<IHHI", 54 + len(pixels), 0, 0, 54)
    return hdr + info + pixels, nw, nh


_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # greyscale, RGB, grey+A, RGBA


def _png_decode(payload: bytes) -> tuple[bytearray, int, int, int] | None:
    """REAL PNG pixel decode, stdlib only (``zlib`` + ``struct``): walk
    the chunk list, inflate the concatenated IDAT stream, and undo the
    five per-scanline filters (None/Sub/Up/Average/Paeth, RFC 2083 §6).
    Returns (flat pixel bytes, width, height, channels) for 8-bit-depth
    non-interlaced images of any color type without a palette; None for
    palette/16-bit/interlaced flavors (the labeled stand-in covers those).
    """
    import struct
    import zlib

    if len(payload) < 33 or payload[:8] != _PNG_SIG:
        return None
    w = h = channels = None
    idat = bytearray()
    i = 8
    while i + 8 <= len(payload):
        (clen,) = struct.unpack(">I", payload[i:i + 4])
        ctype = payload[i + 4:i + 8]
        body = payload[i + 8:i + 8 + clen]
        if ctype == b"IHDR":
            if len(body) < 13:
                return None
            w, h = struct.unpack(">II", body[:8])
            bit_depth, color_type, _comp, _filt, interlace = body[8:13]
            if bit_depth != 8 or interlace != 0 or color_type not in _PNG_CHANNELS:
                return None
            channels = _PNG_CHANNELS[color_type]
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        i += 12 + clen  # len + type + data + crc
    if not w or not h or channels is None or not idat:
        return None
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    stride = w * channels
    if len(raw) < (stride + 1) * h:
        return None
    out = bytearray(stride * h)
    prev_start = -1  # start of the previous RECONSTRUCTED row in `out`
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        row = bytearray(raw[pos + 1:pos + 1 + stride])
        pos += 1 + stride
        o = y * stride
        if ftype == 1:  # Sub
            for x in range(channels, stride):
                row[x] = (row[x] + row[x - channels]) & 0xFF
        elif ftype == 2:  # Up
            if prev_start >= 0:
                for x in range(stride):
                    row[x] = (row[x] + out[prev_start + x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                a = row[x - channels] if x >= channels else 0
                b = out[prev_start + x] if prev_start >= 0 else 0
                row[x] = (row[x] + (a + b) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = row[x - channels] if x >= channels else 0
                b = out[prev_start + x] if prev_start >= 0 else 0
                c = out[prev_start + x - channels] if (
                    prev_start >= 0 and x >= channels
                ) else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[x] = (row[x] + pred) & 0xFF
        elif ftype != 0:
            return None
        out[o:o + stride] = row
        prev_start = o
    return out, w, h, channels


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body)) + ctype + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _png_encode(pixels: bytes, w: int, h: int, channels: int) -> bytes:
    """Minimal valid PNG writer (stdlib only): filter 0 on every
    scanline, one zlib-deflated IDAT, correct CRCs."""
    import struct

    import zlib

    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    stride = w * channels
    raw = b"".join(
        b"\x00" + bytes(pixels[y * stride:(y + 1) * stride]) for y in range(h)
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def _png_resize(payload: bytes, max_dim: int) -> tuple[bytes, int, int] | None:
    """REAL nearest-neighbor PNG resize: decode (all five scanline
    filters), resample, re-encode (filter 0 + deflate). Same contract
    as ``_bmp_resize``; returns None for flavors ``_png_decode`` skips."""
    dec = _png_decode(payload)
    if dec is None:
        return None
    pixels, w, h, channels = dec
    scale = min(1.0, max_dim / max(w, h))
    nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
    stride = w * channels
    out = bytearray(nw * nh * channels)
    for oy in range(nh):
        sy = min(h - 1, oy * h // nh)
        src = sy * stride
        dst = oy * nw * channels
        for ox in range(nw):
            sx = min(w - 1, ox * w // nw) * channels
            out[dst + ox * channels:dst + (ox + 1) * channels] = pixels[
                src + sx:src + sx + channels
            ]
    return _png_encode(out, nw, nh, channels), nw, nh


def _lzw_decode(data: bytes, min_code_size: int) -> bytearray | None:
    """REAL GIF-flavor LZW decode, stdlib only: variable-width codes read
    LSB-first, clear/end codes, KwKwK case, 12-bit table cap with
    deferred clear (no adds at 4096). Returns the palette-index stream,
    or None on a malformed code."""
    if not 2 <= min_code_size <= 11:
        return None
    clear = 1 << min_code_size
    end = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    code_size = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    bitpos = 0
    nbits = len(data) * 8
    while bitpos + code_size <= nbits:
        byte_i = bitpos >> 3
        window = int.from_bytes(data[byte_i:byte_i + 3], "little")
        code = (window >> (bitpos & 7)) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                return None
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + prev[:1]  # KwKwK
            else:
                return None
            if len(table) < 4096:
                table.append(prev + entry[:1])
                if len(table) == (1 << code_size) and code_size < 12:
                    code_size += 1
        out += entry
        prev = entry
    return out


def _lzw_encode_literal(indices: bytes, min_code_size: int) -> bytes:
    """Valid GIF LZW stream of pure literal codes (the classic
    "uncompressed GIF" construction): a clear code is re-emitted every
    ``2^mcs - 2`` literals — the decoder's table grows by one per
    literal after the first and bumps the code width when it reaches
    ``2^(mcs+1)``, so that span is the longest run for which every code
    (including the following clear) still fits in ``mcs+1`` bits. No
    table entry is ever referenced. ~0.8% code overhead at mcs=8 — fine
    for a resize sink; any conformant decoder (including
    ``_lzw_decode``) reads it."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    out = bytearray()
    cur = 0
    cur_bits = 0

    def emit(code: int) -> None:
        nonlocal cur, cur_bits
        cur |= code << cur_bits
        cur_bits += code_size
        while cur_bits >= 8:
            out.append(cur & 0xFF)
            cur >>= 8
            cur_bits -= 8

    span = max(1, clear - 2)  # literals safe per clear before a size bump
    for i, b in enumerate(indices):
        if i % span == 0:
            emit(clear)
        emit(b)
    emit(end)
    if cur_bits:
        out.append(cur & 0xFF)
    return bytes(out)


def _gif_decode(payload: bytes) -> tuple[bytearray, int, int, bytes] | None:
    """REAL single-frame GIF pixel decode, stdlib only: logical screen
    descriptor + palette walk (``_gif_split_frames``'s block grammar),
    then a full LZW decode of the image data. Returns (palette indices
    row-major, width, height, palette bytes) for non-interlaced
    single-image GIFs whose frame covers the logical screen; None for
    animated / interlaced / palette-less flavors (those keep the
    labeled stand-in or the frame demuxer)."""
    if len(payload) < 14 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    try:
        flags = payload[10]
        gct_n = 2 ** ((flags & 7) + 1) if flags & 0x80 else 0
        palette = bytes(payload[13:13 + 3 * gct_n])
        i = 13 + 3 * gct_n
        result = None
        while i < len(payload):
            b0 = payload[i]
            if b0 == 0x3B:
                break
            if b0 == 0x21:  # extension: skip sub-block chain
                i += 2
                while payload[i] != 0:
                    i += 1 + payload[i]
                i += 1
            elif b0 == 0x2C:
                if result is not None:
                    return None  # animated: not a still-resize target
                import struct

                left, top, iw, ih = struct.unpack("<HHHH", payload[i + 1:i + 9])
                dflags = payload[i + 9]
                i += 10
                if dflags & 0x40:  # interlaced
                    return None
                if dflags & 0x80:  # local palette wins
                    lct_n = 2 ** ((dflags & 7) + 1)
                    palette = bytes(payload[i:i + 3 * lct_n])
                    i += 3 * lct_n
                if not palette or iw == 0 or ih == 0:
                    return None
                mcs = payload[i]
                i += 1
                data = bytearray()
                while payload[i] != 0:
                    n = payload[i]
                    data += payload[i + 1:i + 1 + n]
                    i += 1 + n
                i += 1
                idx = _lzw_decode(bytes(data), mcs)
                if idx is None or len(idx) < iw * ih:
                    return None
                if max(idx[: iw * ih]) * 3 >= len(palette):
                    return None
                result = (idx[: iw * ih], iw, ih, palette)
            else:
                return None
        return result
    except IndexError:
        return None


def _gif_encode(indices: bytes, w: int, h: int, palette: bytes) -> bytes:
    """Minimal valid single-frame GIF89a writer: logical screen = image,
    global palette (padded to a power of two), literal-code LZW stream
    in ≤255-byte sub-blocks."""
    import struct

    n = len(palette) // 3
    bits = max(1, (max(n, 2) - 1).bit_length())
    pal = palette + bytes(3 * ((1 << bits) - n))
    mcs = max(2, bits)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 7), 0, 0)
    out += pal
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(mcs)
    stream = _lzw_encode_literal(indices, mcs)
    for off in range(0, len(stream), 255):
        block = stream[off:off + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"
    return bytes(out)


def _gif_resize(payload: bytes, max_dim: int) -> tuple[bytes, int, int] | None:
    """REAL nearest-neighbor GIF resize: LZW decode to palette indices,
    resample the INDEX raster (so the source palette is preserved
    exactly — nearest-neighbor can produce no new colors), re-encode.
    Same contract as ``_png_resize``/``_bmp_resize``; returns None for
    the flavors ``_gif_decode`` skips."""
    dec = _gif_decode(payload)
    if dec is None:
        return None
    idx, w, h, palette = dec
    scale = min(1.0, max_dim / max(w, h))
    nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
    out = bytearray(nw * nh)
    for oy in range(nh):
        sy = min(h - 1, oy * h // nh)
        src = sy * w
        dst = oy * nw
        for ox in range(nw):
            out[dst + ox] = idx[src + min(w - 1, ox * w // nw)]
    return _gif_encode(bytes(out), nw, nh, palette), nw, nh


def _jpeg_resize(payload: bytes, max_dim: int) -> tuple[bytes, int, int] | None:
    """REAL nearest-neighbor JPEG resize: full baseline entropy decode
    to RGB/grey pixels (operators/jpegcodec.py — dequant, inverse
    zigzag, 8×8 IDCT, YCbCr→RGB), resample, re-encode as baseline JFIF
    with the codec's engine-generated tables. Same contract as the
    BMP/PNG/GIF kernels; returns None for non-JPEG input and the
    baseline flavors jpeg_decode skips (progressive, subsampled
    chroma, restart intervals, 16-bit DQT)."""
    from biokg_spark.operators.jpegcodec import jpeg_decode, jpeg_encode

    dec = jpeg_decode(payload)
    if dec is None:
        return None
    px, w, h, ch = dec
    scale = min(1.0, max_dim / max(w, h))
    nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
    out = bytearray(nw * nh * ch)
    for oy in range(nh):
        sy = min(h - 1, oy * h // nh)
        src = sy * w * ch
        dst = oy * nw * ch
        for ox in range(nw):
            sx = min(w - 1, ox * w // nw)
            out[dst + ox * ch:dst + (ox + 1) * ch] = px[
                src + sx * ch:src + (sx + 1) * ch
            ]
    return jpeg_encode(bytes(out), nw, nh, ch), nw, nh


def resize_media(media: DataFrame, max_dim: int = 32) -> DataFrame:
    """Resize images to fit ``max_dim``, preserving aspect ratio.

    REAL nearest-neighbor decode→resample→re-encode for uncompressed
    24-bpp BMPs (stdlib struct), for 8-bit non-interlaced PNGs of any
    color type (stdlib zlib: inflate IDAT, undo all five scanline
    filters, resample, re-deflate), for non-interlaced single-frame
    GIFs (full LZW decode to palette indices, index-raster resample —
    palette preserved exactly — literal-code LZW re-encode), AND for
    baseline sequential 4:4:4/grayscale JPEGs (full entropy decode +
    dequant + IDCT + YCbCr→RGB via operators/jpegcodec.py; re-encoded
    as baseline JFIF — no image library anywhere). Remaining flavors
    (progressive/subsampled JPEG, exotic PNG/GIF/BMP variants) keep the
    labeled deterministic stand-in (clamp the header-decoded
    dimensions, truncate the payload proportionally) — a real
    deployment swaps that fallback for PIL resize + re-encode.
    Narrow transformation: no shuffle, payload column pruned for any
    downstream metadata-only consumer.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for mid, kind, p in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                raw = bytes(p)
                real = (
                    _bmp_resize(raw, max_dim)
                    or _png_resize(raw, max_dim)
                    or _gif_resize(raw, max_dim)
                    or _jpeg_resize(raw, max_dim)
                )
                if real is not None:
                    out_rows.append((mid, kind, *real))
                    continue
                w, h = _decode_dimensions(raw)
                scale = min(1.0, max_dim / max(w, h))
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                keep = max(1, int(len(raw) * (nw * nh) / (w * h)))
                out_rows.append((mid, kind, raw[:keep], nw, nh))
            yield pd.DataFrame(
                out_rows, columns=["media_id", "kind", "payload", "width", "height"]
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def _gif_split_frames(payload: bytes) -> list[bytes] | None:
    """REAL GIF container demux, stdlib only: walk the block structure
    (logical screen descriptor + global palette, extension blocks, image
    descriptors with optional local palettes and LZW sub-block chains)
    and re-wrap EACH animation frame as a standalone valid single-frame
    GIF (shared header/global palette + that frame's graphic-control
    extension + descriptor + image data + trailer). The LZW pixel data
    passes through untouched — demux-without-decode, the same contract
    as packet-level video frame extraction. Returns None for non-GIF or
    structurally corrupt payloads (caller falls back to the stub)."""
    if len(payload) < 14 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    try:
        flags = payload[10]
        gct = 3 * (2 ** ((flags & 7) + 1)) if flags & 0x80 else 0
        header = payload[: 13 + gct]
        i = 13 + gct
        frames: list[bytes] = []
        pending_gce = b""
        while i < len(payload):
            b0 = payload[i]
            if b0 == 0x3B:  # trailer
                break
            if b0 == 0x21:  # extension block
                ext_start = i
                label = payload[i + 1]
                i += 2
                while payload[i] != 0:  # sub-block chain
                    i += 1 + payload[i]
                i += 1  # block terminator
                if label == 0xF9:  # graphic control: belongs to next frame
                    pending_gce = payload[ext_start:i]
                # comment/application extensions are dropped per-frame
            elif b0 == 0x2C:  # image descriptor
                start = i
                dflags = payload[i + 9]
                i += 10
                if dflags & 0x80:  # local color table
                    i += 3 * (2 ** ((dflags & 7) + 1))
                i += 1  # LZW minimum code size
                while payload[i] != 0:
                    i += 1 + payload[i]
                i += 1
                frames.append(header + pending_gce + payload[start:i] + b"\x3b")
                pending_gce = b""
            else:
                return None  # unknown block type: corrupt stream
        return frames or None
    except IndexError:
        return None  # truncated stream


def _avi_split_frames(payload: bytes) -> list[bytes] | None:
    """Video-frame payloads from a RIFF/AVI container, stdlib only.

    Walks the RIFF chunk list (the same word-aligned layout as WAV) to
    the ``LIST movi`` body and collects every ``##db``/``##dc`` chunk —
    uncompressed/compressed video frames; for MJPEG AVIs each ``00dc``
    body IS a standalone JPEG. ``LIST rec `` interleave groups (frames
    batched for CD-ROM-era streaming) are recursed into. Audio (``wb``)
    and index chunks are skipped. Returns None for non-AVI payloads;
    a truncated final chunk clamps to the bytes present.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return None
    import struct

    def walk(buf: bytes, frames: list[bytes]) -> None:
        i = 0
        while i + 8 <= len(buf):
            cid = buf[i:i + 4]
            (clen,) = struct.unpack("<I", buf[i + 4:i + 8])
            body = buf[i + 8:i + 8 + clen]
            if cid == b"LIST" and body[:4] == b"rec ":
                walk(body[4:], frames)
            elif len(cid) == 4 and cid[2:4] in (b"db", b"dc"):
                frames.append(body)
            i += 8 + clen + (clen % 2)

    frames: list[bytes] = []
    i = 12
    while i + 8 <= len(payload):
        cid = payload[i:i + 4]
        (clen,) = struct.unpack("<I", payload[i + 4:i + 8])
        body = payload[i + 8:i + 8 + clen]
        if cid == b"LIST" and body[:4] == b"movi":
            walk(body[4:], frames)
        i += 8 + clen + (clen % 2)
    return frames


def _mp4_split_frames(payload: bytes) -> list[bytes] | None:
    """REAL ISO-BMFF (MP4/MOV) video sample demux, stdlib only: walk
    the box tree to the first video track's sample tables and
    reconstruct every sample's absolute byte range — ``stsz`` (sizes),
    ``stco``/``co64`` (chunk offsets), ``stsc`` (sample→chunk runs).
    For MJPEG-in-MP4 each extracted sample is a standalone JPEG (the
    same composition the AVI path has). Returns None for non-BMFF
    payloads, tracks without a complete stbl, or out-of-range offsets
    (truncated file) — those keep the labeled fallback."""
    import struct

    if len(payload) < 16:
        return None

    def children(start: int, end: int):
        i = start
        while i + 8 <= end:
            (size,) = struct.unpack(">I", payload[i:i + 4])
            btype = payload[i + 4:i + 8]
            hdr = 8
            if size == 1:
                if i + 16 > end:
                    return
                (size,) = struct.unpack(">Q", payload[i + 8:i + 16])
                hdr = 16
            elif size == 0:
                size = end - i
            if size < hdr or i + size > end:
                return
            yield btype, i + hdr, i + size
            i += size

    def find(start: int, end: int, btype: bytes):
        for t, b, e in children(start, end):
            if t == btype:
                return b, e
        return None

    moov = find(0, len(payload), b"moov")
    if moov is None:
        return None
    for t, tb, te in children(*moov):
        if t != b"trak":
            continue
        mdia = find(tb, te, b"mdia")
        if mdia is None:
            continue
        hdlr = find(*mdia, b"hdlr")
        if hdlr is None or payload[hdlr[0] + 8:hdlr[0] + 12] != b"vide":
            continue
        minf = find(*mdia, b"minf")
        if minf is None:
            continue
        stbl = find(*minf, b"stbl")
        if stbl is None:
            continue
        stsz = find(*stbl, b"stsz")
        stsc = find(*stbl, b"stsc")
        stco = find(*stbl, b"stco")
        wide = stco is None
        if wide:
            stco = find(*stbl, b"co64")
        if stsz is None or stsc is None or stco is None:
            return None
        b = stsz[0]
        uniform, n_samples = struct.unpack(">II", payload[b + 4:b + 12])
        if uniform:
            sizes = [uniform] * n_samples
        else:
            sizes = list(
                struct.unpack(f">{n_samples}I", payload[b + 12:b + 12 + 4 * n_samples])
            )
        b = stco[0]
        (n_chunks,) = struct.unpack(">I", payload[b + 4:b + 8])
        fmt, wd = (">Q", 8) if wide else (">I", 4)
        offsets = [
            struct.unpack(fmt, payload[b + 8 + k * wd:b + 8 + (k + 1) * wd])[0]
            for k in range(n_chunks)
        ]
        b = stsc[0]
        (n_runs,) = struct.unpack(">I", payload[b + 4:b + 8])
        runs = [
            struct.unpack(">III", payload[b + 8 + k * 12:b + 20 + k * 12])[:2]
            for k in range(n_runs)
        ]
        frames: list[bytes] = []
        si = 0
        for ci in range(1, n_chunks + 1):
            per = 0
            for first, spc in runs:
                if first <= ci:
                    per = spc
                else:
                    break
            off = offsets[ci - 1]
            for _ in range(per):
                if si >= n_samples:
                    break
                sz = sizes[si]
                if off + sz > len(payload):
                    return None  # truncated
                frames.append(payload[off:off + sz])
                off += sz
                si += 1
        if si != n_samples:
            return None  # tables inconsistent
        return frames
    return None


def _mkv_split_frames(payload: bytes) -> list[bytes] | None:
    """REAL Matroska/WebM (EBML) video frame demux, stdlib only: parse
    EBML varints, find the Segment's Tracks to learn the video track
    number (TrackType 1), then walk Clusters extracting that track's
    SimpleBlock / BlockGroup>Block frames (no-lacing blocks — the
    common case for video; laced or unknown-size elements return None
    so the labeled fallback keeps those). With MP4 and AVI this makes
    all three mainstream containers real demux paths."""
    def varint(buf: bytes, i: int, keep_marker: bool):
        if i >= len(buf):
            return None
        first = buf[i]
        if first == 0:
            return None
        length = 9 - first.bit_length()
        if i + length > len(buf):
            return None
        v = first if keep_marker else first & ((1 << (8 - length)) - 1)
        for k in range(1, length):
            v = (v << 8) | buf[i + k]
        return v, i + length, length

    def elements(buf: bytes, start: int, end: int):
        i = start
        while i < end:
            rid = varint(buf, i, True)
            if rid is None:
                return
            eid, i2, _ = rid
            rsz = varint(buf, i2, False)
            if rsz is None:
                return
            size, i3, slen = rsz
            if size == (1 << (7 * slen)) - 1:  # unknown-size element
                return
            if i3 + size > end:
                return
            yield eid, i3, i3 + size
            i = i3 + size

    if len(payload) < 8:
        return None
    top = list(elements(payload, 0, len(payload)))
    if not top or top[0][0] != 0x1A45DFA3:  # EBML header
        return None
    seg = next(((b, e) for eid, b, e in top if eid == 0x18538067), None)
    if seg is None:
        return None
    video_track = None
    for eid, b, e in elements(payload, *seg):
        if eid != 0x1654AE6B:  # Tracks
            continue
        for tid, tb, te in elements(payload, b, e):
            if tid != 0xAE:  # TrackEntry
                continue
            num = ttype = None
            for fid, fb, fe in elements(payload, tb, te):
                if fid == 0xD7:  # TrackNumber
                    num = int.from_bytes(payload[fb:fe], "big")
                elif fid == 0x83:  # TrackType
                    ttype = int.from_bytes(payload[fb:fe], "big")
            if ttype == 1 and num is not None and video_track is None:
                video_track = num
    if video_track is None:
        return None

    def block_frame(b: int, e: int) -> bytes | None:
        r = varint(payload, b, False)
        if r is None:
            return None
        tnum, i, _ = r
        if tnum != video_track:
            return b""  # other track: valid, not ours
        if i + 3 > e:
            return None
        flags = payload[i + 2]
        if flags & 0x06:  # laced — unsupported
            raise ValueError
        return payload[i + 3:e]

    frames: list[bytes] = []
    try:
        for eid, b, e in elements(payload, *seg):
            if eid != 0x1F43B675:  # Cluster
                continue
            for cid, cb, ce in elements(payload, b, e):
                if cid == 0xA3:  # SimpleBlock
                    f = block_frame(cb, ce)
                    if f is None:
                        return None
                    if f != b"":
                        frames.append(f)
                elif cid == 0xA0:  # BlockGroup
                    for gid, gb, ge in elements(payload, cb, ce):
                        if gid == 0xA1:  # Block
                            f = block_frame(gb, ge)
                            if f is None:
                                return None
                            if f != b"":
                                frames.append(f)
    except ValueError:
        return None
    return frames if frames else None


def sample_frames(media: DataFrame, every_nth: int = 4, frame_bytes: int = 4) -> DataFrame:
    """Sample frames from video payloads — the 1→N (UDTF-shaped) media op.

    REAL for animated GIFs (``_gif_split_frames``: block-structure demux,
    each frame re-wrapped as a standalone valid GIF), for RIFF/AVI
    containers (``_avi_split_frames``: LIST-movi chunk walk), AND for
    ISO-BMFF MP4/MOV (``_mp4_split_frames``: box-tree walk to the video
    track's stsz/stsc/stco sample tables), AND for Matroska/WebM
    (``_mkv_split_frames``: EBML varint walk, Cluster SimpleBlocks of
    the video track); for MJPEG in any container each emitted frame is
    a standalone JPEG that operators/jpegcodec.py entropy-decodes to
    pixels. Every ``every_nth`` frame is emitted. Unparseable or
    exotic payloads (laced MKV blocks, unknown-size EBML elements,
    truncated tables) keep the labeled STUB (payload treated as
    ``frame_bytes``-sized frames); the Spark contract (mapInPandas
    fan-out, one input batch → many output rows, binary frame column)
    is identical either way. Only ``kind='video'`` rows produce
    output.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            vids = pdf[pdf["kind"] == "video"]
            for mid, p in zip(vids["media_id"], vids["payload"]):
                raw = bytes(p)
                frames = _gif_split_frames(raw)
                if frames is None:
                    frames = _avi_split_frames(raw)
                if frames is None:
                    frames = _mp4_split_frames(raw)
                if frames is None:
                    frames = _mkv_split_frames(raw)
                if frames is not None:
                    for i in range(0, len(frames), every_nth):
                        rows.append((mid, i, frames[i]))
                    continue
                n_frames = len(raw) // frame_bytes
                for i in range(0, n_frames, every_nth):
                    rows.append((mid, i, raw[i * frame_bytes:(i + 1) * frame_bytes]))
            if rows:
                yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame"])

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=FRAME_SCHEMA
    )


TRANSCODE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("src_format", StringType()),
        StructField("converted", StringType()),  # 'yes' | 'no' (oracle-friendly)
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def _bmp_decode_rgb(payload: bytes) -> tuple[bytes, int, int] | None:
    """Top-down RGB pixels from an uncompressed 24-bpp BMP (the decode
    half of ``_bmp_resize``'s parser: 4-byte-aligned BGR rows, positive
    height = bottom-up)."""
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    (data_off,) = struct.unpack("<I", payload[10:14])
    (hdr_size,) = struct.unpack("<I", payload[14:18])
    if hdr_size < 40:
        return None
    w, h_signed = struct.unpack("<ii", payload[18:26])
    (bpp,) = struct.unpack("<H", payload[28:30])
    (compression,) = struct.unpack("<I", payload[30:34])
    h = abs(h_signed)
    if bpp != 24 or compression != 0 or w <= 0 or h == 0:
        return None
    stride = (w * 3 + 3) // 4 * 4
    if data_off + stride * h > len(payload):
        return None
    out = bytearray(w * h * 3)
    for y in range(h):
        sy = h - 1 - y if h_signed > 0 else y  # bottom-up unless negative
        row = payload[data_off + sy * stride:data_off + sy * stride + w * 3]
        for x in range(w):
            b, g, r = row[x * 3:x * 3 + 3]
            out[(y * w + x) * 3:(y * w + x) * 3 + 3] = bytes((r, g, b))
    return bytes(out), w, h


def _any_decode_rgb(payload: bytes) -> tuple[str, bytes, int, int] | None:
    """(src_format, RGB pixels top-down, w, h) via whichever REAL codec
    recognizes the payload: 24-bpp BMP, 8-bit PNG (alpha dropped /
    grey expanded), single-frame GIF (palette applied), or baseline
    JPEG (grey expanded)."""
    bmp = _bmp_decode_rgb(payload)
    if bmp is not None:
        px, w, h = bmp
        return "bmp", px, w, h
    png = _png_decode(payload)
    if png is not None:
        raw, w, h, ch = png
        out = bytearray(w * h * 3)
        for i in range(w * h):
            p = raw[i * ch:(i + 1) * ch]
            if ch >= 3:
                out[i * 3:i * 3 + 3] = p[:3]
            else:  # grey / grey+alpha
                out[i * 3:i * 3 + 3] = bytes((p[0], p[0], p[0]))
        return "png", bytes(out), w, h
    gif = _gif_decode(payload)
    if gif is not None:
        idx, w, h, palette = gif
        out = bytearray(w * h * 3)
        for i, k in enumerate(idx):
            out[i * 3:i * 3 + 3] = palette[k * 3:k * 3 + 3]
        return "gif", bytes(out), w, h
    from biokg_spark.operators.jpegcodec import jpeg_decode

    jpg = jpeg_decode(payload)
    if jpg is not None:
        px, w, h, ch = jpg
        if ch == 1:
            out = bytearray(w * h * 3)
            for i in range(w * h):
                out[i * 3:i * 3 + 3] = bytes((px[i],) * 3)
            px = bytes(out)
        return "jpeg", px, w, h
    return None


def transcode_media(media: DataFrame) -> DataFrame:
    """Normalize every decodable image payload to RGB PNG — the
    format-unification pass a multimodal training pipeline runs before
    models consume pixels (one decode surface downstream instead of
    four). Exercises all four REAL codecs: BMP (struct), PNG (zlib +
    scanline filters), GIF (LZW + palette), baseline JPEG (entropy
    decode + IDCT). Rows no codec recognizes pass through unchanged
    with ``converted='no'`` and the header-derived dimensions — the
    same labeled-fallback contract as resize_media.

    Narrow Arrow ``mapInPandas`` transformation: no shuffle; the blob
    column stays isolated so metadata-only consumers never read it.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            imgs = pdf[pdf["kind"] == "image"]
            for mid, p in zip(imgs["media_id"], imgs["payload"]):
                raw = bytes(p)
                dec = _any_decode_rgb(raw)
                if dec is None:
                    w, h = _decode_dimensions(raw)
                    rows.append((mid, "unknown", "no", raw, w, h))
                    continue
                fmt, px, w, h = dec
                rows.append((mid, fmt, "yes", _png_encode(px, w, h, 3), w, h))
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[f.name for f in TRANSCODE_SCHEMA],
                )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=TRANSCODE_SCHEMA
    )


def synth_media(spark, n: int = 100) -> DataFrame:
    """Deterministic synthetic media table (payload = md5-chain bytes)."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col("id"), 3) + 1).cast("int"),
        ).alias("kind"),
        F.unhex(F.md5(F.col("id").cast("string"))).alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
    )


def _wav_pcm16_samples(payload: bytes) -> tuple[int, int, list[int]] | None:
    """(channels, sample_rate, interleaved int16 samples) for a 16-bit
    PCM RIFF/WAVE payload, stdlib only (the signal-level sibling of
    :func:`_wav_audio_meta`'s chunk walk). Returns None for non-WAV,
    non-PCM (audio_format != 1), or non-16-bit payloads; a truncated
    data chunk clamps to the bytes present (dropping a trailing half
    sample)."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    fmt = data = None
    i = 12
    while i + 8 <= len(payload):
        cid = payload[i:i + 4]
        (clen,) = struct.unpack("<I", payload[i + 4:i + 8])
        body = payload[i + 8:i + 8 + clen]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        i += 8 + clen + (clen % 2)
    if fmt is None or data is None:
        return None
    audio_format, channels, rate, _brate, _align, bits = fmt
    if audio_format != 1 or bits != 16 or channels < 1 or rate < 1:
        return None
    import array

    a = array.array("h")
    a.frombytes(data[: (len(data) // 2) * 2])
    if __import__("sys").byteorder == "big":  # WAV is little-endian
        a.byteswap()
    return channels, rate, list(a)


PCM_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("rms", DoubleType()),
        StructField("peak", IntegerType()),
        StructField("zero_cross_rate", DoubleType()),
        StructField("silence_ratio", DoubleType()),
        StructField("n_frames", IntegerType()),
        StructField("max_frame_rms", DoubleType()),
    ]
)


def extract_pcm_features(
    media: DataFrame,
    frame_ms: int = 25,
    silence_threshold: int = 328,  # ~1% of int16 full scale
    batch_hint: int = 1024,
) -> DataFrame:
    """REAL signal-level audio features from 16-bit PCM WAV payloads,
    partition-parallel via Arrow ``mapInPandas`` (stdlib decode — no
    soundfile/torchaudio in this container, none needed for PCM).

    Per ``kind='audio'`` payload that parses as 16-bit PCM: mono-mixed
    (channel-mean) sample stream → overall RMS, absolute peak,
    zero-crossing rate (sign changes / (n-1), zeros carry the previous
    sign), silence ratio (fraction of ``frame_ms`` frames whose RMS is
    below ``silence_threshold``), frame count, and max frame RMS — the
    triage features a speech/music corpus pipeline filters and buckets
    on before any model sees the audio. Non-PCM/non-WAV audio rows are
    OMITTED (this is the decode tier, not the metadata tier —
    :func:`extract_audio_features` already covers every row with
    metadata/stub fallback).

    Plumbing contract (the part that matters at 100 TB): narrow
    transformation over the scan — no shuffle; one Arrow batch in, one
    feature frame out; the binary column never reaches the driver and
    is pruned upstream of any features-only consumer. RMS/ZCR floats
    are computed in fixed left-to-right order over integer samples, so
    the values are run- and partition-stable.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            auds = pdf[pdf["kind"] == "audio"]
            for mid, p in zip(auds["media_id"], auds["payload"]):
                parsed = _wav_pcm16_samples(bytes(p))
                if parsed is None:
                    continue
                ch, rate, inter = parsed
                n = len(inter) // ch
                if n == 0:
                    continue
                mono = [
                    sum(inter[i * ch:(i + 1) * ch]) / ch for i in range(n)
                ]
                sq = 0.0
                peak = 0
                crossings = 0
                prev_sign = 0
                for x in mono:
                    sq += x * x
                    ax = int(abs(x))
                    if ax > peak:
                        peak = ax
                    sign = 1 if x > 0 else (-1 if x < 0 else prev_sign)
                    if prev_sign != 0 and sign != 0 and sign != prev_sign:
                        crossings += 1
                    if sign != 0:
                        prev_sign = sign
                rms = (sq / n) ** 0.5
                zcr = crossings / (n - 1) if n > 1 else 0.0
                flen = max(1, rate * frame_ms // 1000)
                frames = [mono[i:i + flen] for i in range(0, n, flen)]
                frame_rms = [
                    (sum(x * x for x in f) / len(f)) ** 0.5 for f in frames
                ]
                silent = sum(1 for r in frame_rms if r < silence_threshold)
                rows.append(
                    (
                        mid, ch, rate, n, rms, peak, zcr,
                        silent / len(frames), len(frames), max(frame_rms),
                    )
                )
            if rows:
                yield pd.DataFrame(rows, columns=[f.name for f in PCM_FEATURE_SCHEMA])

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=PCM_FEATURE_SCHEMA
    )
