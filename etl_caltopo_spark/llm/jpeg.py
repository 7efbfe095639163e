"""Baseline JPEG (ITU-T T.81 / JFIF) codec — pure python + numpy.

Closes the multimodal brief's "general image decode" gap with zero
external codec dependency: ``decode_jpeg`` handles baseline sequential
DCT JPEGs (SOF0), grayscale or YCbCr without subsampling (all
sampling factors 1x1), optional restart markers; anything else —
progressive, arithmetic-coded, subsampled — returns None under the
engine's dirty-row policy.  ``encode_jpeg`` produces a conforming
baseline stream (Annex-K-style quantization + Huffman tables, 4:4:4)
and is the deterministic fixture generator.  The decoder builds its
Huffman/quantization tables from the stream's own DQT/DHT segments,
so the pair is self-consistent end-to-end and the roundtrip error is
exactly the quantization loss.

Performance note: Huffman entropy coding is inherently bit-serial, so
this runs in python per block (DCT/IDCT are numpy matrix products).
That is the right trade inside ``mapInPandas`` for the asset sizes
the tests use; a production 100-TB image pipeline would swap this
module for a native codec behind the SAME ``decode_image`` dispatch
without touching any Spark plan.
"""

from __future__ import annotations

import struct

from functools import lru_cache

import numpy as np

# ---------------------------------------------------------------- tables

#: Annex K quantization tables (luminance, chrominance), row-major.
QT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)
QT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

#: Annex K Huffman specs: (BITS[1..16], HUFFVAL)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _zigzag_order() -> list[tuple[int, int]]:
    order = []
    for s in range(15):
        if s % 2:  # odd diagonals run top-right → bottom-left
            rng = range(max(0, s - 7), min(7, s) + 1)
        else:
            rng = range(min(7, s), max(0, s - 7) - 1, -1)
        order.extend((i, s - i) for i in rng)
    return order


ZIGZAG = _zigzag_order()
_ZZ_ROWS = np.array([i for i, _ in ZIGZAG])
_ZZ_COLS = np.array([j for _, j in ZIGZAG])


def _dct_matrix() -> np.ndarray:
    k = np.arange(8)[:, None]
    n = np.arange(8)[None, :]
    d = np.cos((2 * n + 1) * k * np.pi / 16) * np.sqrt(2 / 8)
    d[0, :] = np.sqrt(1 / 8)
    return d


_DCT = _dct_matrix()


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value → (code, length), canonical Huffman assignment (memoized:
    decoding a corpus re-reads the same DHT vectors per frame, and the
    tables are immutable after construction)."""
    return dict(_canonical_codes_cached(tuple(bits), tuple(vals)))


@lru_cache(maxsize=64)
def _canonical_codes_cached(
    bits: tuple[int, ...], vals: tuple[int, ...]
) -> tuple[tuple[int, tuple[int, int]], ...]:
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return tuple(codes.items())


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → value — the encoder's canonical assignment,
    inverted, so both directions share one construction (memoized by
    the DHT vectors, same rationale as _canonical_codes)."""
    return dict(_decode_table_cached(tuple(bits), tuple(vals)))


@lru_cache(maxsize=64)
def _decode_table_cached(
    bits: tuple[int, ...], vals: tuple[int, ...]
) -> tuple[tuple[tuple[int, int], int], ...]:
    return tuple(
        ((length, code), v)
        for v, (code, length) in _canonical_codes_cached(bits, vals)
    )


# ---------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._nbits += length
        while self._nbits >= 8:
            self._nbits -= 8
            byte = (self._acc >> self._nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self._acc &= (1 << self._nbits) - 1

    def flush(self) -> None:
        if self._nbits:
            pad = 8 - self._nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _category(v: int) -> tuple[int, int]:
    """value → (size, raw bits): negatives use one's-complement bits."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_block(
    bw: _BitWriter,
    block: np.ndarray,
    qt: np.ndarray,
    dc_codes: dict,
    ac_codes: dict,
    pred: int,
) -> int:
    coeff = np.rint(_DCT @ (block - 128.0) @ _DCT.T / qt).astype(np.int32)
    zz = coeff[_ZZ_ROWS, _ZZ_COLS]
    dc = int(zz[0])
    size, bits = _category(dc - pred)
    code, length = dc_codes[size]
    bw.write(code, length)
    if size:
        bw.write(bits, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        if k > last_nz:
            break
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, length = ac_codes[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        size, bits = _category(v)
        code, length = ac_codes[(run << 4) | size]
        bw.write(code, length)
        bw.write(bits, size)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        bw.write(code, length)
    return dc


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">HH", marker, len(body) + 2) + body


def encode_jpeg(pixels) -> bytes:
    """Encode an (H, W[, 3]) uint8 array as a baseline JFIF JPEG
    (grayscale or YCbCr 4:4:4, Annex-K-style tables).  Deterministic;
    lossy only through quantization."""
    arr = np.asarray(pixels, dtype=np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if gray:
        planes = [arr.astype(np.float64)]
    else:
        r, g, b = (arr[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    n_comp = len(planes)

    qts = [QT_LUMA] + ([QT_CHROMA] if n_comp == 3 else [])
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tq, qt in enumerate(qts):
        out += _seg(0xFFDB, bytes([tq]) + bytes(int(qt[i, j]) for i, j in ZIGZAG))
    sof = struct.pack(">BHHB", 8, h, w, n_comp)
    for c in range(n_comp):
        sof += bytes([c + 1, 0x11, 0 if c == 0 else 1])
    out += _seg(0xFFC0, sof)
    huffs = [(0x00, DC_LUMA_BITS, DC_LUMA_VALS), (0x10, AC_LUMA_BITS, AC_LUMA_VALS)]
    if n_comp == 3:
        huffs += [
            (0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
            (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS),
        ]
    for tc, bits, vals in huffs:
        out += _seg(0xFFC4, bytes([tc]) + bytes(bits) + bytes(vals))
    sos = bytes([n_comp])
    for c in range(n_comp):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += _seg(0xFFDA, sos)

    dc_luma = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_luma = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_chroma = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_chroma = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    comp_tabs = [
        (QT_LUMA, dc_luma, ac_luma),
        (QT_CHROMA, dc_chroma, ac_chroma),
        (QT_CHROMA, dc_chroma, ac_chroma),
    ]

    bh, bw_ = (h + 7) // 8, (w + 7) // 8
    padded = [
        np.pad(p, ((0, bh * 8 - h), (0, bw_ * 8 - w)), mode="edge") for p in planes
    ]
    writer = _BitWriter()
    preds = [0] * n_comp
    for by in range(bh):
        for bx in range(bw_):
            for c in range(n_comp):
                qt, dcc, acc = comp_tabs[c]
                block = padded[c][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                preds[c] = _encode_block(writer, block, qt, dcc, acc, preds[c])
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decoder


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; stops at any
    real marker (restart handling is the caller's job)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._nbits = 0

    def _fill(self) -> bool:
        if self.pos >= len(self.data):
            return False
        byte = self.data[self.pos]
        if byte == 0xFF:
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else None
            if nxt == 0x00:
                self.pos += 2
            else:
                return False  # a marker: leave it for the caller
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | byte
        self._nbits += 8
        return True

    def read_bit(self) -> int | None:
        if self._nbits == 0 and not self._fill():
            return None
        self._nbits -= 1
        return (self._acc >> self._nbits) & 1

    def read_bits(self, n: int) -> int | None:
        v = 0
        for _ in range(n):
            b = self.read_bit()
            if b is None:
                return None
            v = (v << 1) | b
        return v

    def align_to_marker(self) -> None:
        self._acc = 0
        self._nbits = 0

    def read_huffman(self, table: dict[tuple[int, int], int]) -> int | None:
        code = 0
        for length in range(1, 17):
            b = self.read_bit()
            if b is None:
                return None
            code = (code << 1) | b
            if (length, code) in table:
                return table[(length, code)]
        return None


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def decode_jpeg(payload: bytes):
    """Decode a baseline sequential JPEG (SOF0, 8-bit, grayscale or
    4:4:4 YCbCr, optional restart markers) → (H, W[, 3]) uint8 numpy
    array.  Progressive/arithmetic/subsampled streams and malformed
    payloads return None (dirty-row policy)."""
    try:
        return _decode_jpeg_strict(payload)
    except Exception:  # noqa: BLE001 - malformed stream → dirty-row null
        return None


def _decode_jpeg_strict(payload: bytes):
    if payload is None or payload[:2] != b"\xff\xd8":
        return None
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) → decode table
    frame = None
    restart_interval = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            return None
        # spec allows 0xFF fill bytes before a marker (B.1.1.2)
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > len(payload):
            return None
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # standalone markers (TEM, RSTn) carry no length segment
            pos += 2
            continue
        if pos + 4 > len(payload):
            return None
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                if pq != 0:
                    return None  # 16-bit tables unsupported
                vals = np.frombuffer(body[b + 1 : b + 65], dtype=np.uint8)
                qt = np.zeros((8, 8), dtype=np.int32)
                qt[_ZZ_ROWS, _ZZ_COLS] = vals
                qts[tq] = qt
                b += 65
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1 : b + 17])
                n = sum(bits)
                vals = list(body[b + 17 : b + 17 + n])
                huff[(tc, th)] = _decode_table(bits, vals)
                b += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            precision, h, w, n_comp = struct.unpack(">BHHB", body[:6])
            if precision != 8 or n_comp not in (1, 3):
                return None
            comps = []
            for c in range(n_comp):
                cid, sampling, tq = body[6 + 3 * c : 9 + 3 * c]
                if sampling != 0x11:
                    return None  # subsampling unsupported
                comps.append((cid, tq))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            return None  # non-baseline frame types
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                return None
            h, w, comps = frame
            ns = body[0]
            scan_tabs = []
            for c in range(ns):
                cid, tabs = body[1 + 2 * c], body[2 + 2 * c]
                tq = dict(comps)[cid]
                scan_tabs.append(
                    (huff[(0, tabs >> 4)], huff[(1, tabs & 0x0F)], qts[tq])
                )
            data_start = pos + 2 + seglen
            return _decode_scan(
                payload, data_start, h, w, scan_tabs, restart_interval
            )
        pos += 2 + seglen
    return None


def _decode_scan(payload, pos, h, w, scan_tabs, restart_interval):
    n_comp = len(scan_tabs)
    bh, bw_ = (h + 7) // 8, (w + 7) // 8
    planes = [np.zeros((bh * 8, bw_ * 8), dtype=np.float64) for _ in range(n_comp)]
    reader = _BitReader(payload, pos)
    preds = [0] * n_comp
    mcu = 0
    for by in range(bh):
        for bx in range(bw_):
            if restart_interval and mcu and mcu % restart_interval == 0:
                reader.align_to_marker()
                p = reader.pos
                if p + 1 < len(payload) and payload[p] == 0xFF and 0xD0 <= payload[p + 1] <= 0xD7:
                    reader.pos = p + 2
                    preds = [0] * n_comp
                else:
                    # a DRI stream without its RST marker is malformed;
                    # decoding on would yield plausible-but-corrupt
                    # pixels — honor the dirty-row policy instead
                    return None
            for c in range(n_comp):
                dc_tab, ac_tab, qt = scan_tabs[c]
                zz = np.zeros(64, dtype=np.int32)
                size = reader.read_huffman(dc_tab)
                if size is None:
                    return None
                bits = reader.read_bits(size) if size else 0
                if bits is None:
                    return None
                preds[c] += _extend(bits, size)
                zz[0] = preds[c]
                k = 1
                while k < 64:
                    sym = reader.read_huffman(ac_tab)
                    if sym is None:
                        return None
                    if sym == 0x00:  # EOB
                        break
                    run, size = sym >> 4, sym & 0x0F
                    if sym == 0xF0:  # ZRL
                        k += 16
                        continue
                    k += run
                    if k > 63:
                        return None
                    bits = reader.read_bits(size)
                    if bits is None:
                        return None
                    zz[k] = _extend(bits, size)
                    k += 1
                coeff = np.zeros((8, 8), dtype=np.float64)
                coeff[_ZZ_ROWS, _ZZ_COLS] = zz * qt[_ZZ_ROWS, _ZZ_COLS]
                block = _DCT.T @ coeff @ _DCT + 128.0
                planes[c][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
            mcu += 1
    planes = [p[:h, :w] for p in planes]
    if n_comp == 1:
        return np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
