"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata, processed by
Arrow-batched ``mapInPandas`` so each executor sees columnar batches,
never row-at-a-time Python.  Six decode paths are fully real:
baseline JPEG (SOF0 huffman/DCT, pure numpy —
``etl_caltopo_spark.llm.jpeg``), PNG (8-bit gray/RGB/±alpha, stdlib
zlib + all five scanline unfilters — ``encode_png``/``decode_png``),
binary PPM (P6) via pure numpy (``encode_ppm``/``decode_ppm``),
24-bit BMP (``encode_bmp``/``decode_bmp``), GIF87a/89a with a full
pure-python LZW (``encode_gif``/``decode_gif``), RIFF/WAVE audio in both
PCM16 and compressed IMA ADPCM forms (``encode_wav`` /
``encode_adpcm_wav`` / ``decode_wav`` / ``decode_audio``; the ADPCM
nibble decoder is bit-exact vs stdlib audioop's reference), plus
uncompressed AVI video (``encode_avi``/``decode_avi``/``decode_video``),
Motion-JPEG AVI (``encode_avi_mjpeg`` + the 'MJPG' branch of
``decode_avi`` — real compressed video through the llm/jpeg.py
codec), and WebP lossless (VP8L — :mod:`etl_caltopo_spark.llm.vp8l`,
full prefix-code/LZ77/color-cache/transform bitstream,
tests/test_vp8l.py).  ``decode_image`` magic-sniffs and dispatches;
formats still needing an external codec (lossy WebP, MP3,
non-MJPEG compressed video) return None under the dirty-row policy
but run in the identical Spark-side contract (schemas, batch shapes,
partitioning), all tested (tests/test_llm_ops.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: schema of a multimodal asset row: payload + typed metadata
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)

#: schema appended by the feature extractor
FEATURE_SCHEMA = StructType(
    ASSET_SCHEMA.fields
    + [StructField("features", ArrayType(FloatType()), True)]
)


def as_binary_assets(df: DataFrame, id_col: str, payload_col: Column, media_type: str) -> DataFrame:
    """Wrap any bytes-producing column as a typed asset table."""
    return df.select(
        F.col(id_col).cast("long").alias("asset_id"),
        F.lit(media_type).alias("media_type"),
        payload_col.alias("payload"),
        F.octet_length(payload_col).cast("long").alias("n_bytes"),
    )


#: PNG file signature
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_image(payload: bytes):
    """General image decode dispatcher — magic-sniffs the payload and
    routes to a REAL pure-python decoder: baseline JPEG
    (:mod:`etl_caltopo_spark.llm.jpeg`), PNG (:func:`decode_png`,
    zlib is stdlib), binary PPM (:func:`decode_ppm`), BMP
    (:func:`decode_bmp`), GIF (:func:`decode_gif`, pure-python
    LZW), WebP lossless (:mod:`etl_caltopo_spark.llm.vp8l` —
    VP8L prefix codes, color cache, LZ77, all four inverse
    transforms), or baseline TIFF (:func:`decode_tiff`, both byte
    orders).  Formats without a pure-python decoder here (lossy
    WebP/AVIF/...) and any undecodable payload return None — dirty
    rows flow through as nulls instead of failing the job, the same
    policy as try_* expressions."""
    if payload is None:
        return None
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:2] == b"\xff\xd8":
        from etl_caltopo_spark.llm.jpeg import decode_jpeg

        return decode_jpeg(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        from etl_caltopo_spark.llm.vp8l import decode_webp

        return decode_webp(payload)
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        return decode_tiff(payload)
    return None


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(pixels, filter_type: int = 0) -> bytes:
    """Encode an (H, W[, C]) uint8 array (C in {1,2,3,4} → gray/
    gray+alpha/RGB/RGBA) as a non-interlaced 8-bit PNG — pure
    struct+zlib.  ``filter_type`` applies one of the five standard
    scanline filters (0 None, 1 Sub, 2 Up, 3 Average, 4 Paeth) to
    every row; filtering against the ORIGINAL pixels is fully
    vectorizable, so this doubles as the fixture generator that
    exercises every unfilter branch of :func:`decode_png`."""
    import struct
    import zlib

    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, channels = arr.shape
    colortype = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    flat = arr.reshape(h, w * channels).astype(np.int32)
    bpp = channels

    def shifted(row):  # value bpp bytes to the left, 0 past the edge
        return np.concatenate([np.zeros(bpp, dtype=np.int32), row[:-bpp]])

    out = []
    prev = np.zeros(w * channels, dtype=np.int32)
    for r in range(h):
        cur = flat[r]
        if filter_type == 0:
            filtered = cur
        elif filter_type == 1:
            filtered = (cur - shifted(cur)) & 0xFF
        elif filter_type == 2:
            filtered = (cur - prev) & 0xFF
        elif filter_type == 3:
            filtered = (cur - ((shifted(cur) + prev) >> 1)) & 0xFF
        elif filter_type == 4:
            a, b, c = shifted(cur), prev, shifted(prev)
            p = a + b - c
            pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
            pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
            filtered = (cur - pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {filter_type}")
        out.append(bytes([filter_type]) + filtered.astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(out)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes):
    """REAL decoder: non-interlaced 8-bit-depth PNG (gray / gray+alpha
    / RGB / RGBA) → (H, W[, C]) uint8 numpy array.  Pure stdlib zlib
    inflate + the five standard scanline unfilters.  Up unfilters
    vectorized per row; Sub/Average/Paeth reconstruct left-to-right
    (an inherent byte dependency chain — acceptable inside an Arrow
    batch; a columnar engine would JIT this).  Palette, 16-bit,
    interlaced, or truncated payloads return None (dirty-row
    policy)."""
    import struct
    import zlib

    import numpy as np

    if payload is None or payload[:8] != _PNG_SIG:
        return None
    pos, dims, idat = 8, None, []
    while pos + 8 <= len(payload):
        (clen,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + clen]
        if ctype == b"IHDR" and len(body) == 13:
            dims = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + clen
    if dims is None or not idat:
        return None
    w, h, bitdepth, colortype, _comp, _filt, interlace = dims
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(colortype)
    if channels is None or bitdepth != 8 or interlace != 0 or w == 0 or h == 0:
        return None
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    stride, bpp = w * channels, channels
    if len(raw) < h * (stride + 1):
        return None
    rows = np.frombuffer(raw[: h * (stride + 1)], dtype=np.uint8).reshape(
        h, stride + 1
    )
    filters, data = rows[:, 0], rows[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), dtype=np.int32)
    for r in range(h):
        f, row = filters[r], data[r]
        prev = out[r - 1] if r else np.zeros(stride, dtype=np.int32)
        if f == 0:
            out[r] = row
        elif f == 2:  # Up: no intra-row dependency, vector add
            out[r] = (row + prev) & 0xFF
        elif f == 1:  # Sub: recon[i] = raw[i] + recon[i-bpp] — a
            # per-channel-lane prefix sum, so mod-256 cumsum per lane
            # replaces the left-to-right byte chain entirely
            out[r] = (
                np.cumsum(row.reshape(w, bpp), axis=0, dtype=np.int64) & 0xFF
            ).reshape(-1)
        elif f in (3, 4):  # Average/Paeth: inherent left-to-right chain
            # (the >>1 / min() make it non-linear — no prefix-sum form);
            # run it over Python lists, ~10x faster than numpy scalar
            # indexing in a per-byte loop
            row_l = row.tolist()
            prev_l = prev.tolist()
            cur = [0] * stride
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                if f == 3:
                    pred = (a + prev_l[i]) >> 1
                else:
                    b, c = prev_l[i], (prev_l[i - bpp] if i >= bpp else 0)
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                cur[i] = (row_l[i] + pred) & 0xFF
            out[r] = cur
        else:
            return None
    arr = out.astype(np.uint8).reshape(h, w, channels)
    return arr if channels > 1 else arr.reshape(h, w)


def encode_ppm(pixels) -> bytes:
    """Encode an (H, W, 3) uint8 array as binary PPM (P6) — the
    deterministic fixture generator for the real decode path."""
    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def decode_ppm(payload: bytes):
    """REAL decoder: binary PPM (P6) → (H, W, 3) uint8 numpy array.
    Pure numpy, no external codec.  Returns None for None/non-PPM
    payloads (dirty rows flow through as nulls instead of failing the
    job — same policy as try_* expressions)."""
    import re

    import numpy as np

    if payload is None:
        return None
    # header = magic, width, height, maxval, then EXACTLY ONE whitespace
    # before the raster — a split() would eat raster bytes that happen
    # to be whitespace values (0x09/0x0a/0x20).  No comment support.
    m = re.match(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)\s", payload)
    if m is None:
        return None
    w, h = int(m.group(1)), int(m.group(2))
    raster = payload[m.end() : m.end() + w * h * 3]
    if len(raster) < w * h * 3:
        return None
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def encode_bmp(pixels) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a 24-bit uncompressed
    BMP (BITMAPINFOHEADER, bottom-up, BGR rows padded to 4 bytes) —
    pure struct+numpy, the fixture generator for the real decode
    path."""
    import struct

    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    rows = bytearray()
    pad = b"\x00" * (stride - w * 3)
    for r in range(h - 1, -1, -1):  # bottom-up
        rows += arr[r, :, ::-1].tobytes() + pad  # RGB → BGR
    data = bytes(rows)
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 0, 0, 0, 0)
    return header + dib + data


def decode_bmp(payload: bytes):
    """REAL decoder: 24-bit uncompressed BMP (BITMAPINFOHEADER) →
    (H, W, 3) uint8 RGB numpy array.  Handles both bottom-up
    (positive height, the common case) and top-down (negative height)
    row orders and the 4-byte row padding.  Palette, 16/32-bit,
    RLE-compressed, or truncated payloads return None (dirty-row
    policy)."""
    import struct

    import numpy as np

    if payload is None or len(payload) < 54 or payload[:2] != b"BM":
        return None
    try:
        (offset,) = struct.unpack("<I", payload[10:14])
        dib_size, w, h_signed, planes, bpp, compression = struct.unpack(
            "<IiiHHI", payload[14:34]
        )
    except struct.error:
        return None
    if dib_size < 40 or planes != 1 or bpp != 24 or compression != 0:
        return None
    h = abs(h_signed)
    if w <= 0 or h == 0:
        return None
    stride = (w * 3 + 3) & ~3
    raster = payload[offset : offset + stride * h]
    if len(raster) < stride * h:
        return None
    rows = np.frombuffer(raster, dtype=np.uint8).reshape(h, stride)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    rgb = bgr[:, :, ::-1]
    return rgb.copy() if h_signed < 0 else rgb[::-1].copy()


def _gif_lzw_decode(min_code_size: int, data: bytes, n_pixels: int):
    """GIF-variant LZW decompression (LSB-first variable-width codes,
    clear/end codes, 12-bit cap) → index bytes, or None on a corrupt
    stream."""
    clear = 1 << min_code_size
    end = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    code_size = min_code_size + 1
    out = bytearray()
    prev = None
    bitpos, total_bits = 0, len(data) * 8
    while bitpos + code_size <= total_bits and len(out) < n_pixels:
        byte_idx = bitpos >> 3
        chunk = int.from_bytes(data[byte_idx : byte_idx + 4], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:  # first code after a clear: emit as-is
            if code >= len(table):
                return None
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            if len(table) < 4096:
                table.append(entry)
        else:
            return None
        out += entry
        prev = entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
    return bytes(out[:n_pixels]) if len(out) >= n_pixels else None


def encode_gif(pixels, interlaced: bool = False) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array with ≤256 distinct colors
    as a GIF89a (global color table, real variable-width LZW using the
    clear-code-before-overflow strategy, optional interlaced row
    order) — the fixture generator for the real decode path, pure
    numpy + bit packing."""
    import struct

    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = arr.shape
    colors, inv = np.unique(arr.reshape(-1, 3), axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("GIF palette limited to 256 colors")
    bits = max(1, (len(colors) - 1).bit_length())
    n_entries = 1 << bits
    palette = np.zeros((n_entries, 3), dtype=np.uint8)
    palette[: len(colors)] = colors
    idx = inv.reshape(h, w)
    if interlaced:
        order = (
            list(range(0, h, 8))
            + list(range(4, h, 8))
            + list(range(2, h, 4))
            + list(range(1, h, 2))
        )
        idx = idx[order]
    mcs = max(2, bits)
    clear, end = 1 << mcs, (1 << mcs) + 1
    code_size = mcs + 1
    max_lits = (1 << mcs) - 2  # keep the decoder's table below 2^(mcs+1)
    bitbuf, nbits, packed = 0, 0, bytearray()

    def emit(code: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += code_size
        while nbits >= 8:
            packed.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    emit(clear)
    count = 0
    for v in idx.ravel():
        if count == max_lits:
            emit(clear)
            count = 0
        emit(int(v))
        count += 1
    emit(end)
    if nbits:
        packed.append(bitbuf & 0xFF)
    blocks = bytearray()
    for i in range(0, len(packed), 255):
        chunk = packed[i : i + 255]
        blocks += bytes([len(chunk)]) + chunk
    lsd_packed = 0x80 | ((bits - 1) << 4) | (bits - 1)
    img_packed = 0x40 if interlaced else 0x00
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, lsd_packed, 0, 0)
        + palette.tobytes()
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, w, h, img_packed)
        + bytes([mcs])
        + bytes(blocks)
        + b"\x00"
        + b"\x3b"
    )


def decode_gif(payload: bytes):
    """REAL decoder: GIF87a/89a first frame → (H, W, 3) uint8 RGB
    numpy array.  Pure-python LZW (variable code width, clear/end
    codes, the KwKwK case, 12-bit cap), global and local color
    tables, interlaced row deinterlacing, extension blocks skipped.
    Truncated or corrupt streams return None (dirty-row policy)."""
    import struct

    import numpy as np

    if payload is None or payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    try:
        sw, sh, lsd_packed, _bg, _aspect = struct.unpack("<HHBBB", payload[6:13])
        pos = 13
        gct = None
        if lsd_packed & 0x80:
            n = 2 << (lsd_packed & 0x07)
            gct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8)
            if gct.size < 3 * n:
                return None
            gct = gct.reshape(n, 3)
            pos += 3 * n
        while pos < len(payload):
            block = payload[pos]
            pos += 1
            if block == 0x3B:  # trailer
                return None
            if block == 0x21:  # extension: label then sub-blocks
                pos += 1
                while pos < len(payload) and payload[pos] != 0:
                    pos += 1 + payload[pos]
                pos += 1
                continue
            if block != 0x2C:
                return None
            left, top, w, h, img_packed = struct.unpack(
                "<HHHHB", payload[pos : pos + 9]
            )
            pos += 9
            table = gct
            if img_packed & 0x80:
                n = 2 << (img_packed & 0x07)
                table = np.frombuffer(
                    payload[pos : pos + 3 * n], dtype=np.uint8
                ).reshape(n, 3)
                pos += 3 * n
            if table is None or w == 0 or h == 0:
                return None
            mcs = payload[pos]
            pos += 1
            data = bytearray()
            while pos < len(payload) and payload[pos] != 0:
                ln = payload[pos]
                data += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            indices = _gif_lzw_decode(mcs, bytes(data), w * h)
            if indices is None:
                return None
            idx = np.frombuffer(indices, dtype=np.uint8)
            if idx.max(initial=0) >= len(table):
                return None
            rows = idx.reshape(h, w)
            if img_packed & 0x40:  # interlaced: undo the 4-pass order
                order = (
                    list(range(0, h, 8))
                    + list(range(4, h, 8))
                    + list(range(2, h, 4))
                    + list(range(1, h, 2))
                )
                out = np.empty_like(rows)
                out[order] = rows
                rows = out
            return table[rows]
    except (struct.error, IndexError, ValueError):
        return None
    return None


def encode_wav(samples, sample_rate: int = 8000) -> bytes:
    """Encode a 1-D int16 array as a canonical RIFF/WAVE file (PCM16
    mono) — pure struct packing, the fixture generator for the real
    audio decode path."""
    import struct

    import numpy as np

    arr = np.asarray(samples, dtype="<i2")
    data = arr.tobytes()
    byte_rate = sample_rate * 2
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, byte_rate, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


#: IMA/DVI ADPCM step-size and index-adaptation tables (public spec)
_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37, 41,
    45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173, 190,
    209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658, 724,
    796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272,
    2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132,
    7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500,
    20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ima_decode_core(nibbles, pred: int = 0, index: int = 0):
    """IMA/DVI ADPCM nibble decoder (bit-exact vs the classic Intel/
    DVI reference implementation — cross-checked against stdlib
    audioop.adpcm2lin in tests).  Returns (samples, pred, index)."""
    out = []
    for n in nibbles:
        step = _IMA_STEPS[index]
        diff = step >> 3
        if n & 1:
            diff += step >> 2
        if n & 2:
            diff += step >> 1
        if n & 4:
            diff += step
        pred = pred - diff if n & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        index = max(0, min(88, index + _IMA_INDEX[n & 7]))
        out.append(pred)
    return out, pred, index


def _ima_encode_core(samples, pred: int = 0, index: int = 0):
    """IMA/DVI ADPCM nibble encoder (the reference quantizer: greedy
    per-nibble bit allocation against the current step size).  Returns
    (nibbles, pred, index)."""
    nibbles = []
    for s in samples:
        step = _IMA_STEPS[index]
        delta = int(s) - pred
        n = 8 if delta < 0 else 0
        delta = abs(delta)
        if delta >= step:
            n |= 4
            delta -= step
        if delta >= step >> 1:
            n |= 2
            delta -= step >> 1
        if delta >= step >> 2:
            n |= 1
        # reconstruct exactly as the decoder will
        diff = step >> 3
        if n & 1:
            diff += step >> 2
        if n & 2:
            diff += step >> 1
        if n & 4:
            diff += step
        pred = pred - diff if n & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        index = max(0, min(88, index + _IMA_INDEX[n & 7]))
        nibbles.append(n)
    return nibbles, pred, index


def encode_adpcm_wav(samples, sample_rate: int = 8000, block_samples: int = 505) -> bytes:
    """Encode a 1-D int16 array as an IMA ADPCM WAV (wFormatTag 0x11,
    mono): each block carries a 4-byte state header (predictor int16 +
    step index) whose predictor IS the block's first sample, followed
    by 4-bit codes packed low-nibble-first — 4:1 compression vs PCM16.
    The fixture generator for the real compressed-audio decode path."""
    import struct

    import numpy as np

    arr = [int(x) for x in np.asarray(samples, dtype="<i2")]
    block_align = 4 + (block_samples - 1 + 1) // 2
    index = 0
    blocks = []
    for start in range(0, len(arr), block_samples):
        chunk = arr[start : start + block_samples]
        index_at_start = index  # the header carries the PRE-block state
        nibbles, _pred, index = _ima_encode_core(chunk[1:], chunk[0], index)
        if len(nibbles) % 2:
            nibbles.append(0)
        packed = bytes(
            nibbles[i] | (nibbles[i + 1] << 4) for i in range(0, len(nibbles), 2)
        )
        body = struct.pack("<hBB", chunk[0], index_at_start, 0) + packed
        blocks.append(body.ljust(block_align, b"\x00"))
    data = b"".join(blocks)
    byte_rate = (sample_rate * block_align + block_samples - 1) // block_samples
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, sample_rate, byte_rate, block_align, 4, 2,
        block_samples,
    )
    fact = struct.pack("<I", len(arr))  # true sample count (last block is padded)
    # RIFF chunk size = bytes after the size field: "WAVE" (4) +
    # (8 + len(fmt)) + (8 + len(fact)) + (8 + len(data)); with the
    # 4-byte fact body that is 32 + len(fmt) + len(data)
    return (
        b"RIFF"
        + struct.pack("<I", 32 + len(fmt) + len(data))
        + b"WAVEfmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"fact"
        + struct.pack("<I", len(fact))
        + fact
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def encode_tiff(pixels, big_endian: bool = False) -> bytes:
    """Encode an (H, W, 3) uint8 array as a minimal baseline TIFF
    (uncompressed RGB, one strip, chunky planar config) in either
    byte order — the fixture generator for the real TIFF decode
    path.  Layout: 8-byte header → pixel strip → BitsPerSample
    array → IFD."""
    import struct

    import numpy as np

    e = ">" if big_endian else "<"
    arr = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = arr.shape
    strip = arr.tobytes()
    strip_off = 8
    bps_off = strip_off + len(strip)
    ifd_off = bps_off + 6

    def entry(tag, typ, count, value):
        return struct.pack(f"{e}HHI", tag, typ, count) + value

    def long_val(v):
        return struct.pack(f"{e}I", v)

    def short_val(v):
        # inline SHORT value occupies the first two bytes of the field
        return struct.pack(f"{e}H", v) + b"\x00\x00"

    entries = [
        entry(256, 3, 1, short_val(w)),            # ImageWidth
        entry(257, 3, 1, short_val(h)),            # ImageLength
        entry(258, 3, 3, long_val(bps_off)),       # BitsPerSample -> offset
        entry(259, 3, 1, short_val(1)),            # Compression: none
        entry(262, 3, 1, short_val(2)),            # Photometric: RGB
        entry(273, 4, 1, long_val(strip_off)),     # StripOffsets
        entry(277, 3, 1, short_val(3)),            # SamplesPerPixel
        entry(278, 3, 1, short_val(h)),            # RowsPerStrip
        entry(279, 4, 1, long_val(len(strip))),    # StripByteCounts
        entry(284, 3, 1, short_val(1)),            # PlanarConfig: chunky
    ]
    ifd = (
        struct.pack(f"{e}H", len(entries))
        + b"".join(entries)
        + struct.pack(f"{e}I", 0)
    )
    header = (b"MM" if big_endian else b"II") + struct.pack(f"{e}HI", 42, ifd_off)
    return header + strip + struct.pack(f"{e}HHH", 8, 8, 8) + ifd


def decode_tiff(payload: bytes):
    """REAL decoder: baseline TIFF (uncompressed 8-bit RGB, chunky,
    either byte order, one or many strips) → (H, W, 3) uint8 array.
    Compressed/planar/palette/grayscale variants and malformed
    payloads return None (dirty-row policy)."""
    import struct

    import numpy as np

    try:
        if payload is None or len(payload) < 8:
            return None
        if payload[:4] == b"II*\x00":
            e = "<"
        elif payload[:4] == b"MM\x00*":
            e = ">"
        else:
            return None
        (ifd_off,) = struct.unpack(f"{e}I", payload[4:8])
        if ifd_off + 2 > len(payload):
            return None
        (n_entries,) = struct.unpack(f"{e}H", payload[ifd_off : ifd_off + 2])
        tags = {}
        for i in range(n_entries):
            off = ifd_off + 2 + 12 * i
            if off + 12 > len(payload):
                return None
            tag, typ, count = struct.unpack(f"{e}HHI", payload[off : off + 8])
            field = payload[off + 8 : off + 12]
            if typ == 3:  # SHORT
                if count * 2 <= 4:
                    vals = struct.unpack(f"{e}{count}H", field[: 2 * count])
                else:
                    (p,) = struct.unpack(f"{e}I", field)
                    vals = struct.unpack(
                        f"{e}{count}H", payload[p : p + 2 * count]
                    )
            elif typ == 4:  # LONG
                if count == 1:
                    vals = struct.unpack(f"{e}I", field)
                else:
                    (p,) = struct.unpack(f"{e}I", field)
                    vals = struct.unpack(
                        f"{e}{count}I", payload[p : p + 4 * count]
                    )
            else:
                continue
            tags[tag] = vals
        w = tags.get(256, (0,))[0]
        h = tags.get(257, (0,))[0]
        if w <= 0 or h <= 0:
            return None
        if tags.get(259, (1,))[0] != 1:  # compression
            return None
        if tags.get(262, (2,))[0] != 2:  # photometric RGB
            return None
        if tags.get(277, (3,))[0] != 3 or tags.get(284, (1,))[0] != 1:
            return None
        if tuple(tags.get(258, (8, 8, 8))) != (8, 8, 8):
            return None
        offs = tags.get(273)
        counts = tags.get(279)
        if not offs or not counts or len(offs) != len(counts):
            return None
        data = b"".join(
            payload[o : o + c] for o, c in zip(offs, counts)
        )
        if len(data) < w * h * 3:
            return None
        return (
            np.frombuffer(data[: w * h * 3], dtype=np.uint8)
            .reshape(h, w, 3)
            .copy()
        )
    except (struct.error, ValueError):
        return None


#: G.711 segment-end tables (Sun g711.c / CPython audioop lineage —
#: both decoders are pinned bit-exact against audioop in tests)
_SEG_UEND = (0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF)
_SEG_AEND = (0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF)


def lin2ulaw(samples):
    """G.711 µ-law encode of an int16 array (audioop-bit-exact: the
    14-bit arithmetic pre-shift happens BEFORE negation, which is
    where naive implementations diverge on negative segment
    boundaries)."""
    import numpy as np

    v = np.asarray(samples, dtype=np.int16).astype(np.int32) >> 2
    mask = np.where(v < 0, 0x7F, 0xFF)
    mag = np.minimum(np.where(v < 0, -v, v), 8159) + 33
    seg = np.full_like(mag, 8)
    for s in range(7, -1, -1):
        seg = np.where(mag <= _SEG_UEND[s], s, seg)
    out = np.where(
        seg >= 8,
        0x7F ^ mask,
        ((seg << 4) | ((mag >> (seg + 1)) & 0xF)) ^ mask,
    )
    return (out & 0xFF).astype(np.uint8)


def ulaw2lin(codes):
    """G.711 µ-law decode to int16 (audioop-bit-exact)."""
    import numpy as np

    u = (~np.asarray(codes, dtype=np.uint8).astype(np.int32)) & 0xFF
    t = ((((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 7)) - 0x84
    return np.where(u & 0x80 != 0, -t, t).astype(np.int16)


def lin2alaw(samples):
    """G.711 A-law encode of an int16 array (audioop-bit-exact; 13-bit
    pre-shift, negatives map through −v−1)."""
    import numpy as np

    v = np.asarray(samples, dtype=np.int16).astype(np.int32) >> 3
    mask = np.where(v >= 0, 0xD5, 0x55)
    mag = np.where(v >= 0, v, -v - 1)
    seg = np.full_like(mag, 8)
    for s in range(7, -1, -1):
        seg = np.where(mag <= _SEG_AEND[s], s, seg)
    low = np.where(seg < 2, (mag >> 1) & 0xF, (mag >> seg) & 0xF)
    out = np.where(seg >= 8, 0x7F ^ mask, ((seg << 4) | low) ^ mask)
    return (out & 0xFF).astype(np.uint8)


def alaw2lin(codes):
    """G.711 A-law decode to int16 (audioop-bit-exact)."""
    import numpy as np

    u = np.asarray(codes, dtype=np.uint8).astype(np.int32) ^ 0x55
    t = (u & 0xF) << 4
    seg = (u >> 4) & 7
    t = np.where(
        seg == 0, t + 8, np.where(seg == 1, t + 0x108, (t + 0x108) << np.maximum(seg - 1, 0))
    )
    return np.where(u & 0x80 != 0, t, -t).astype(np.int16)


def encode_g711_wav(samples, sample_rate: int = 8000, law: str = "ulaw") -> bytes:
    """Encode a 1-D int16 array as a G.711 WAV (wFormatTag 7 = µ-law,
    6 = A-law; 8 bits/sample, 2:1 vs PCM16) — the telephony codec pair
    and the fixture generator for the compressed-audio decode path."""
    import struct

    import numpy as np

    arr = np.asarray(samples, dtype="<i2")
    data = (lin2ulaw(arr) if law == "ulaw" else lin2alaw(arr)).tobytes()
    tag = 7 if law == "ulaw" else 6
    fmt = struct.pack("<HHIIHHH", tag, 1, sample_rate, sample_rate, 1, 8, 0)
    fact = struct.pack("<I", len(arr))
    return (
        b"RIFF"
        + struct.pack("<I", 4 + (8 + len(fmt)) + (8 + len(fact)) + (8 + len(data)))
        + b"WAVEfmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"fact"
        + struct.pack("<I", len(fact))
        + fact
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav(payload: bytes):
    """REAL decoder: RIFF/WAVE mono → (sample_rate, int16 numpy
    array).  Four stream formats: PCM16 (wFormatTag 1 — a raw
    length-prefixed container), IMA ADPCM (0x11 — a genuinely
    compressed 4-bit codec, decoded block-by-block with the reference
    Intel/DVI algorithm, :func:`_ima_decode_core`), and the G.711
    telephony pair (7 = µ-law, 6 = A-law; both audioop-bit-exact).
    Returns None for None / non-WAV / other formats (dirty rows
    become nulls, same policy as decode_ppm)."""
    import struct

    import numpy as np

    if payload is None or len(payload) < 44:
        return None
    if payload[0:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    # walk the chunk list: fmt then data (other chunks skipped)
    pos, data, fmt_body, n_samples = 12, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt " and len(body) >= 16:
            fmt_body = body
        elif cid == b"fact" and len(body) >= 4:
            (n_samples,) = struct.unpack("<I", body[:4])
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt_body is None or data is None:
        return None
    fmt, channels, rate, _, block_align, bits = struct.unpack(
        "<HHIIHH", fmt_body[:16]
    )
    if channels != 1:
        return None
    if fmt == 1 and bits == 16:
        return rate, np.frombuffer(
            data[: len(data) - (len(data) % 2)], dtype="<i2"
        )
    if fmt in (6, 7) and bits == 8:
        codes = np.frombuffer(data, dtype=np.uint8)
        if n_samples is not None:
            codes = codes[:n_samples]
        return rate, (ulaw2lin(codes) if fmt == 7 else alaw2lin(codes))
    if fmt == 0x11 and bits == 4 and block_align > 4:
        if len(fmt_body) >= 20:
            (samples_per_block,) = struct.unpack("<H", fmt_body[18:20])
        else:
            samples_per_block = (block_align - 4) * 2 + 1
        out = []
        for start in range(0, len(data), block_align):
            block = data[start : start + block_align]
            if len(block) < 4:
                break
            pred, index, _r = struct.unpack("<hBB", block[:4])
            if index > 88:
                return None
            out.append(pred)  # the header predictor is sample 0
            nibbles = []
            for byte in block[4:]:
                nibbles.append(byte & 0x0F)
                nibbles.append(byte >> 4)
            # clamp: a crafted fmt with wSamplesPerBlock <= 0 must decode
            # zero nibbles, not a negative slice of the padded block
            nibbles = nibbles[: max(samples_per_block - 1, 0)]
            samples, _p, _i = _ima_decode_core(nibbles, pred, index)
            out.extend(samples)
        if not out:
            return None
        if n_samples is not None:
            out = out[:n_samples]
        return rate, np.asarray(out, dtype="<i2")
    return None


#: 'MJPG' biCompression fourcc as the little-endian DWORD it is on disk
_MJPG_FOURCC = int.from_bytes(b"MJPG", "little")


def _avi_chunk(fourcc: bytes, body: bytes) -> bytes:
    import struct

    return fourcc + struct.pack("<I", len(body)) + body + (
        b"\x00" if len(body) & 1 else b""
    )


def _avi_list(fourcc: bytes, body: bytes) -> bytes:
    return _avi_chunk(b"LIST", fourcc + body)


def _avi_container(
    frame_chunks: list[bytes],
    w: int,
    h: int,
    fps: int,
    handler: bytes,
    compression: int,
    frame_size: int,
) -> bytes:
    """Assemble a minimal RIFF/AVI around pre-built frame chunks."""
    import struct

    n = len(frame_chunks)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, frame_size * fps, 0, 0, n, 0, 1, frame_size, w, h,
        0, 0, 0, 0,
    )
    strh = (
        b"vids" + handler + struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0, 1, fps, 0,
                                        n, frame_size, 0, 0)
        + struct.pack("<HHHH", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, compression, frame_size, 0, 0, 0, 0
    )
    hdrl = _avi_list(
        b"hdrl",
        _avi_chunk(b"avih", avih)
        + _avi_list(b"strl", _avi_chunk(b"strh", strh) + _avi_chunk(b"strf", strf)),
    )
    movi = _avi_list(b"movi", b"".join(frame_chunks))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def encode_avi_mjpeg(frames, fps: int = 10) -> bytes:
    """Encode an (N, H, W, 3) uint8 RGB frame stack as a Motion-JPEG
    AVI: same RIFF container as :func:`encode_avi`, but the stream
    handler is 'MJPG' and each '00dc' chunk is a complete baseline
    JPEG (llm/jpeg.py encoder) — the ubiquitous legacy compressed
    video format (webcams, capture cards).  Lossy only through JPEG
    quantization; the container and entropy layers are bit-exact."""
    import numpy as np

    from etl_caltopo_spark.llm.jpeg import encode_jpeg

    arr = np.asarray(frames, dtype=np.uint8)
    _n, h, w, _ = arr.shape
    chunks = [_avi_chunk(b"00dc", encode_jpeg(f)) for f in arr]
    biggest = max(len(c) - 8 for c in chunks)
    return _avi_container(chunks, w, h, fps, b"MJPG", _MJPG_FOURCC, biggest)


def encode_avi(frames, fps: int = 10) -> bytes:
    """Encode an (N, H, W, 3) uint8 RGB frame stack as a minimal
    uncompressed AVI (RIFF container, 'DIB ' video stream, one '00db'
    chunk per frame holding a bottom-up BGR raster with 4-byte row
    padding — the same raster layout as BMP).  Pure struct+numpy; the
    fixture generator for the real video decode path."""
    import struct

    import numpy as np

    arr = np.asarray(frames, dtype=np.uint8)
    n, h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    pad = b"\x00" * (stride - w * 3)

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    def lst(fourcc: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", fourcc + body)

    frame_bytes = []
    for f in range(n):
        rows = b"".join(
            arr[f, r, :, ::-1].tobytes() + pad for r in range(h - 1, -1, -1)
        )
        frame_bytes.append(chunk(b"00db", rows))
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, stride * h * fps, 0, 0, n, 0, 1, stride * h, w, h,
        0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0, 1, fps, 0, n,
                                        stride * h, 0, 0)
        + struct.pack("<HHHH", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 0, 0, 0, 0)
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(frame_bytes))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi(payload: bytes):
    """REAL decoder: AVI → (fps, (N, H, W, 3) uint8 RGB array) for
    the two streams the repo's codecs cover — uncompressed 'DIB '
    (each '00db' frame a bottom-up padded BGR raster, the BMP layout)
    and Motion-JPEG ('MJPG' biCompression; each frame chunk a complete
    baseline JPEG decoded by llm/jpeg.py).  Walks the RIFF chunk tree
    for the stream format and the 'movi' frame chunks.  Other
    compressed handlers, non-24-bit DIB formats, or truncated payloads
    return None (dirty-row policy)."""
    import struct

    import numpy as np

    if payload is None or len(payload) < 12 or payload[:4] != b"RIFF":
        return None
    if payload[8:12] != b"AVI ":
        return None

    dims, rate, frames = {}, None, []

    def walk(buf: bytes, pos: int, end: int, depth: int = 0):
        nonlocal rate
        if depth > 32:  # crafted deep LIST nesting must not blow the stack
            return
        while pos + 8 <= end:
            fourcc = buf[pos : pos + 4]
            (clen,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            body_start = pos + 8
            body_end = min(body_start + clen, end)
            if fourcc == b"LIST":
                walk(buf, body_start + 4, body_end, depth + 1)
            elif fourcc == b"strf" and clen >= 40:
                _sz, w, h, _planes, bpp, comp = struct.unpack(
                    "<IiiHHI", buf[body_start : body_start + 20]
                )
                dims.update(w=w, h=h, bpp=bpp, comp=comp)
            elif fourcc == b"strh" and clen >= 36:
                if buf[body_start : body_start + 4] == b"vids":
                    scale, r = struct.unpack(
                        "<II", buf[body_start + 20 : body_start + 28]
                    )
                    rate = (r // scale) if scale else r
            elif fourcc in (b"00db", b"00dc"):
                frames.append(bytes(buf[body_start:body_end]))
            pos = body_start + clen + (clen & 1)

    try:
        walk(payload, 12, len(payload))
    except struct.error:
        return None
    if not dims or not frames:
        return None
    w, h = dims["w"], abs(dims["h"])
    if w <= 0 or h == 0:
        return None
    if dims["comp"] == _MJPG_FOURCC:
        # Motion-JPEG stream: every frame chunk is a complete baseline
        # JPEG.  Any frame whose entropy decode fails or whose decoded
        # dims contradict the stream header poisons the whole payload
        # (dirty-row policy — None, never a partial stack).
        from etl_caltopo_spark.llm.jpeg import decode_jpeg

        out = []
        for raster in frames:
            img = decode_jpeg(bytes(raster))
            if img is None or img.ndim != 3 or img.shape[:2] != (h, w):
                return None
            out.append(img)
        return (rate or 0), np.stack(out)
    if dims["bpp"] != 24 or dims["comp"] != 0:
        return None
    stride = (w * 3 + 3) & ~3
    out = []
    for raster in frames:
        if len(raster) < stride * h:
            return None
        rows = np.frombuffer(raster[: stride * h], dtype=np.uint8).reshape(h, stride)
        bgr = rows[:, : w * 3].reshape(h, w, 3)
        rgb = bgr[:, :, ::-1]
        out.append(rgb.copy() if dims["h"] < 0 else rgb[::-1].copy())
    return (rate or 0), np.stack(out)


def decode_video(assets: DataFrame) -> DataFrame:
    """mapInPandas over AVI payloads: one output row per decoded
    frame with per-channel means — REAL video decode (RIFF walk +
    DIB raster frames) in the same Arrow-batched, map-only plan shape
    a compressed codec would use.  Undecodable payloads yield a
    single null-frame row under the dirty-row policy."""
    out_schema = StructType(
        [
            StructField("asset_id", LongType(), False),
            StructField("frame_idx", LongType(), True),
            StructField("width", LongType(), True),
            StructField("height", LongType(), True),
            StructField("mean_r", FloatType(), True),
            StructField("mean_g", FloatType(), True),
            StructField("mean_b", FloatType(), True),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "asset_id", "frame_idx", "width", "height",
                "mean_r", "mean_g", "mean_b",
            )}
            for aid, b in zip(pdf["asset_id"], pdf["payload"]):
                out = decode_avi(b)
                if out is None:
                    rows["asset_id"].append(aid)
                    for k in ("frame_idx", "width", "height",
                              "mean_r", "mean_g", "mean_b"):
                        rows[k].append(None)
                    continue
                _fps, frames = out
                for i, fr in enumerate(frames):
                    m = fr.mean(axis=(0, 1))
                    rows["asset_id"].append(aid)
                    rows["frame_idx"].append(i)
                    rows["width"].append(fr.shape[1])
                    rows["height"].append(fr.shape[0])
                    rows["mean_r"].append(float(m[0]))
                    rows["mean_g"].append(float(m[1]))
                    rows["mean_b"].append(float(m[2]))
            yield pd.DataFrame(rows)

    return assets.mapInPandas(fn, schema=out_schema)


def decode_audio(assets: DataFrame) -> DataFrame:
    """mapInPandas over WAV payloads: sample_rate / n_samples /
    duration_ms / RMS amplitude per asset — a real audio decode in
    the same Arrow-batched, shuffle-free plan shape a compressed-codec
    decoder would use."""
    out_schema = StructType(
        [
            StructField("asset_id", LongType(), False),
            StructField("sample_rate", LongType(), True),
            StructField("n_samples", LongType(), True),
            StructField("duration_ms", FloatType(), True),
            StructField("rms", FloatType(), True),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rates, counts, durs, rmss = [], [], [], []
            for b in pdf["payload"]:
                out = decode_wav(b)
                if out is None:
                    rates.append(None), counts.append(None)
                    durs.append(None), rmss.append(None)
                else:
                    rate, samples = out
                    rates.append(rate)
                    counts.append(len(samples))
                    durs.append(1000.0 * len(samples) / rate)
                    rmss.append(
                        float(np.sqrt(np.mean(samples.astype(np.float64) ** 2)))
                        if len(samples)
                        else 0.0
                    )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "sample_rate": rates,
                    "n_samples": counts,
                    "duration_ms": durs,
                    "rms": rmss,
                }
            )

    return assets.mapInPandas(fn, schema=out_schema)


def decode_images(assets: DataFrame) -> DataFrame:
    """mapInPandas over image payloads (PNG or PPM, magic-sniffed via
    :func:`decode_image`): width/height/mean-RGB per asset — a real
    decode running in the exact plan shape a JPEG decoder would use
    (Arrow batches in, declared schema out, no shuffle).  Grayscale
    replicates to 3 channels; alpha is dropped from the mean."""
    out_schema = StructType(
        [
            StructField("asset_id", LongType(), False),
            StructField("width", LongType(), True),
            StructField("height", LongType(), True),
            StructField("mean_rgb", ArrayType(FloatType()), True),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths, heights, means = [], [], []
            for b in pdf["payload"]:
                img = decode_image(b)
                if img is None:
                    widths.append(None), heights.append(None), means.append(None)
                else:
                    if img.ndim == 2:  # gray → replicate
                        m = [float(img.mean())] * 3
                    elif img.shape[2] == 2:  # gray+alpha → replicate gray
                        m = [float(img[:, :, 0].mean())] * 3
                    else:  # RGB / RGBA → first three channels
                        m = [float(x) for x in img[:, :, :3].mean(axis=(0, 1))]
                    widths.append(img.shape[1])
                    heights.append(img.shape[0])
                    means.append(m)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": widths,
                    "height": heights,
                    "mean_rgb": means,
                }
            )

    return assets.mapInPandas(fn, schema=out_schema)


def image_histogram_features(payload: pd.Series, bins: int = 8) -> pd.Series:
    """REAL image feature extractor: decode the payload with the
    pure-python codecs (:func:`decode_image` — JPEG/PNG/PPM), then an
    L1-normalized ``bins``-bin luminance histogram (Rec. 601 weights
    for color, the single channel for gray).  Features sum to 1 and
    lie in [0, 1].  Undecodable payloads yield None — the same
    dirty-row policy as decode — so downstream filters see real
    signal, not byte noise."""
    import numpy as np

    weights = np.array([0.299, 0.587, 0.114])

    def one(b: bytes | None) -> list[float] | None:
        img = decode_image(b)
        if img is None:
            return None
        a = np.asarray(img, dtype=np.float64)
        if a.ndim == 2:
            lum = a
        elif a.shape[2] == 2:  # gray + alpha
            lum = a[:, :, 0]
        else:  # RGB / RGBA
            lum = a[:, :, :3] @ weights
        hist, _ = np.histogram(lum, bins=bins, range=(0.0, 256.0))
        return (hist / lum.size).astype(np.float32).tolist()

    return payload.map(one)


def sample_frames(
    assets: DataFrame, every_n_bytes: int = 4096, max_frames: int = 8
) -> DataFrame:
    """Frame sampling plumbing for video payloads: emit one row per
    sampled 'frame' (byte-offset slice standing in for a decoded
    frame).  The explode happens JVM-side (sequence + transform on the
    binary column); a real codec would replace the slicing inside the
    same plan shape."""
    n_frames = F.least(
        F.lit(max_frames),
        F.greatest((F.octet_length("payload") / every_n_bytes).cast("int"), F.lit(1)),
    )
    frames = F.transform(
        F.sequence(F.lit(0), n_frames - 1),
        lambda i: F.struct(
            i.alias("frame_idx"),
            (i * every_n_bytes).alias("byte_offset"),
        ),
    )
    return assets.select(
        "asset_id",
        "media_type",
        F.explode(frames).alias("frame"),
    ).select("asset_id", "media_type", "frame.frame_idx", "frame.byte_offset")


def resize_stub(assets: DataFrame, width: int, height: int) -> DataFrame:
    """Metadata-only resize annotation (kept for plan-shape tests):
    same schema out plus target dims in typed metadata.  The REAL
    pixel path is :func:`resize_images`."""
    return assets.withColumn(
        "resize_to",
        F.struct(F.lit(width).alias("width"), F.lit(height).alias("height")),
    )


def resize_images(assets: DataFrame, width: int, height: int) -> DataFrame:
    """REAL image resize over binary payloads: decode via the
    pure-python codecs (JPEG/PNG/PPM), nearest-neighbor sample to
    (width, height), re-encode as PNG.  Arrow-batched mapInPandas,
    map-only (no shuffle); undecodable payloads carry a null resized
    payload under the dirty-row policy.  Output: asset_id,
    media_type, resized (PNG bytes), width, height."""
    import numpy as np
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("asset_id", LongType(), False),
            StructField("media_type", StringType(), True),
            StructField("resized", BinaryType(), True),
            StructField("width", LongType(), True),
            StructField("height", LongType(), True),
        ]
    )

    def one(b: bytes | None) -> bytes | None:
        img = decode_image(b)
        if img is None:
            return None
        a = np.asarray(img)
        ys = (np.arange(height) * a.shape[0] // height).clip(0, a.shape[0] - 1)
        xs = (np.arange(width) * a.shape[1] // width).clip(0, a.shape[1] - 1)
        small = a[ys][:, xs]
        return encode_png(small.astype(np.uint8))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = pdf["payload"].map(one)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "resized": resized,
                    "width": [None if r is None else width for r in resized],
                    "height": [None if r is None else height for r in resized],
                }
            )

    return assets.mapInPandas(fn, schema=out_schema)


def extract_features(assets: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction over binary payloads: Arrow
    batches in, Arrow batches out, schema declared up front.  The
    extractor is :func:`image_histogram_features` — a real decode +
    luminance histogram over the pure-python codecs; swapping in a
    heavier model embedding changes only the inner function, never the
    Spark plan."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["features"] = image_histogram_features(pdf["payload"])
            yield pdf

    return assets.mapInPandas(fn, schema=FEATURE_SCHEMA)
