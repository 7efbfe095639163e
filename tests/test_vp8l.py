"""WebP-lossless (VP8L) codec tests: encoder/decoder roundtrip,
hand-crafted bitstreams for every decode path the literal-only fixture
encoder cannot emit (LZ77 backward references, color cache, palette +
pixel bundling, predictor and color transforms, meta prefix codes),
and the dirty-row fuzz contract."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_caltopo_spark.llm import multimodal as mm
from etl_caltopo_spark.llm import vp8l
from etl_caltopo_spark.llm.vp8l import (
    _BitWriter,
    _emit,
    _equal_weight_lengths,
    _write_prefix_code,
)


def _container(data: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(data)) + data
    if len(data) % 2:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _header(bw, w, h):
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)


class _Tab:
    def __init__(self, table, single):
        self.table, self.single = table, single


def _codes_for(bw, symbols, alphabet):
    syms = set(symbols)
    tab = _write_prefix_code(bw, _equal_weight_lengths(syms), alphabet)
    return _Tab(tab, len(syms) == 1)


def _e(bw, tab, sym):
    # 1-symbol codes decode with zero bits — emit nothing
    if not tab.single:
        _emit(bw, tab.table[sym])


def _emit_entropy_body(bw, argb_pixels):
    """cache bit + 5 prefix codes + literal pixels (sub-images use this
    directly; the main image writes its meta bit first)."""
    g = [(p >> 8) & 0xFF for p in argb_pixels]
    r = [(p >> 16) & 0xFF for p in argb_pixels]
    b = [p & 0xFF for p in argb_pixels]
    a = [(p >> 24) & 0xFF for p in argb_pixels]
    bw.write(0, 1)
    gt = _codes_for(bw, g, 280)
    rt = _codes_for(bw, r, 256)
    bt = _codes_for(bw, b, 256)
    at = _codes_for(bw, a, 256)
    _codes_for(bw, [0], 40)
    for i in range(len(argb_pixels)):
        _e(bw, gt, g[i])
        _e(bw, rt, r[i])
        _e(bw, bt, b[i])
        _e(bw, at, a[i])


def _argb(r, g, b, a=255):
    return (a << 24) | (r << 16) | (g << 8) | b


def _ch(p, sh):
    return (int(p) >> sh) & 0xFF


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 20),
    w=st.integers(1, 20),
    channels=st.sampled_from([3, 4]),
    subtract_green=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_roundtrip_any_shape(h, w, channels, subtract_green, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, channels), dtype=np.uint8)
    enc = vp8l.encode_webp_lossless(img, subtract_green=subtract_green)
    dec = vp8l.decode_webp(enc)
    assert dec is not None
    want = (
        img
        if channels == 4
        else np.concatenate(
            [img, np.full((h, w, 1), 255, np.uint8)], axis=2
        )
    )
    assert np.array_equal(dec, want)


def test_dispatcher_routes_webp():
    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    enc = vp8l.encode_webp_lossless(img)
    dec = mm.decode_image(enc)
    assert dec is not None and dec.shape == (4, 4, 4)
    assert np.array_equal(dec[:, :, :3], img)


def test_lossy_and_vp8x_return_none():
    # lossy VP8 and extended VP8X containers are honest out-of-scope
    for fourcc in (b"VP8 ", b"VP8X"):
        payload = (
            b"RIFF" + struct.pack("<I", 20) + b"WEBP" + fourcc
            + struct.pack("<I", 8) + b"\x00" * 8
        )
        assert vp8l.decode_webp(payload) is None


def test_lz77_backward_reference():
    bw = _BitWriter()
    _header(bw, 4, 1)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no meta
    bw.write(0, 1)  # no cache
    gtab = _codes_for(bw, [20, 258], 280)  # literal g=20 + length code 2
    for sym in (10, 30, 255):  # r, b, a: 1-symbol simple codes
        bw.write(1, 1)
        bw.write(0, 1)
        bw.write(1, 1)
        bw.write(sym, 8)
    bw.write(1, 1)  # distance: simple 1-symbol = 1 → dist_code 2 → (1,0)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(1, 1)
    _e(bw, gtab, 20)  # literal pixel (r/b/a cost 0 bits)
    _e(bw, gtab, 258)  # backward ref: length prefix 2 → 3 pixels, dist 1
    dec = vp8l.decode_webp(_container(bw.done()))
    want = np.tile(np.array([10, 20, 30, 255], np.uint8), (1, 4, 1))
    assert dec is not None and np.array_equal(dec, want)


def test_color_cache():
    P = _argb(1, 2, 3)
    cache_bits = 4
    idx_p = ((0x1E35A7BD * P) & 0xFFFFFFFF) >> (32 - cache_bits)
    bw = _BitWriter()
    _header(bw, 3, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(1, 1)  # cache on
    bw.write(cache_bits, 4)
    gt = _codes_for(bw, [2, 5, 280 + idx_p], 256 + 24 + 16)
    rt = _codes_for(bw, [1, 4], 256)
    bt = _codes_for(bw, [3, 6], 256)
    _codes_for(bw, [255], 256)  # alpha (0-bit)
    _codes_for(bw, [0], 40)
    _e(bw, gt, 2), _e(bw, rt, 1), _e(bw, bt, 3)  # P
    _e(bw, gt, 5), _e(bw, rt, 4), _e(bw, bt, 6)  # Q
    _e(bw, gt, 280 + idx_p)  # cache hit → P again
    dec = vp8l.decode_webp(_container(bw.done()))
    want = np.array([[[1, 2, 3, 255], [4, 5, 6, 255], [1, 2, 3, 255]]], np.uint8)
    assert dec is not None and np.array_equal(dec, want)


def test_color_indexing_with_pixel_bundling():
    # 2x2 image over a 3-color palette → 2-bit bundled indices
    bw = _BitWriter()
    _header(bw, 2, 2)
    bw.write(1, 1)
    bw.write(3, 2)  # COLOR_INDEXING
    bw.write(2, 8)  # 3 colors
    colors = [_argb(255, 0, 0), _argb(0, 255, 0), _argb(0, 0, 255)]
    deltas, prev = [], 0
    for ci in colors:  # palette entries are component-delta-coded
        d = 0
        for sh in (24, 16, 8, 0):
            d |= (((ci >> sh) - (prev >> sh)) & 0xFF) << sh
        deltas.append(d)
        prev = ci
    _emit_entropy_body(bw, deltas)
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # no meta
    # packed greens: row0 = idx0 | idx1<<2 = 4, row1 = idx2 | idx3<<2 = 2
    _emit_entropy_body(bw, [_argb(0, 4, 0, 0), _argb(0, 2, 0, 0)])
    dec = vp8l.decode_webp(_container(bw.done()))
    want = np.array(
        [[[255, 0, 0, 255], [0, 255, 0, 255]],
         [[0, 0, 255, 255], [255, 0, 0, 255]]],
        np.uint8,
    )
    assert dec is not None and np.array_equal(dec, want)


def test_predictor_transform_mode7():
    tgt = np.array(
        [[_argb(10, 20, 30), _argb(40, 50, 60)],
         [_argb(70, 80, 90), _argb(101, 111, 121)]],
        dtype=np.uint64,
    )
    preds = {
        (0, 0): 255 << 24,  # top-left pixel predicts opaque black
        (0, 1): int(tgt[0, 0]),  # first row → L
        (1, 0): int(tgt[0, 0]),  # first column → T
    }
    p11 = 0  # mode 7: avg(L, T) per channel
    for sh in (24, 16, 8, 0):
        p11 |= (((_ch(tgt[1, 0], sh) + _ch(tgt[0, 1], sh)) // 2) & 0xFF) << sh
    preds[(1, 1)] = p11
    residuals = []
    for y in range(2):
        for x in range(2):
            d = 0
            for sh in (24, 16, 8, 0):
                d |= ((_ch(tgt[y, x], sh) - _ch(preds[(y, x)], sh)) & 0xFF) << sh
            residuals.append(d)
    bw = _BitWriter()
    _header(bw, 2, 2)
    bw.write(1, 1)
    bw.write(0, 2)  # PREDICTOR
    bw.write(0, 3)  # bits = 2 → 1x1 sub-image
    _emit_entropy_body(bw, [_argb(0, 7, 0, 0)])  # mode 7 in green
    bw.write(0, 1)
    bw.write(0, 1)
    _emit_entropy_body(bw, residuals)
    dec = vp8l.decode_webp(_container(bw.done()))
    want = np.zeros((2, 2, 4), np.uint8)
    for y in range(2):
        for x in range(2):
            want[y, x] = [
                _ch(tgt[y, x], 16),
                _ch(tgt[y, x], 8),
                _ch(tgt[y, x], 0),
                _ch(tgt[y, x], 24),
            ]
    assert dec is not None and np.array_equal(dec, want)


def test_color_transform():
    g2r, g2b, r2b = 17, (-10) & 0xFF, 5
    cte = (r2b << 16) | (g2b << 8) | g2r
    tgt = np.array(
        [[_argb(10, 200, 30), _argb(250, 50, 7)],
         [_argb(70, 130, 220), _argb(5, 255, 128)]],
        dtype=np.uint64,
    )

    def s8(v):
        v &= 0xFF
        return v - 256 if v >= 128 else v

    def delta(t, c):
        return (s8(t) * s8(c)) >> 5

    residuals = []
    for y in range(2):
        for x in range(2):
            p = int(tgt[y, x])
            a, r, g, b = _ch(p, 24), _ch(p, 16), _ch(p, 8), _ch(p, 0)
            tr = (r - delta(g2r, g)) & 0xFF
            tb = (b - delta(g2b, g) - delta(r2b, r)) & 0xFF
            residuals.append((a << 24) | (tr << 16) | (g << 8) | tb)
    bw = _BitWriter()
    _header(bw, 2, 2)
    bw.write(1, 1)
    bw.write(1, 2)  # COLOR
    bw.write(0, 3)  # bits = 2
    _emit_entropy_body(bw, [cte])
    bw.write(0, 1)
    bw.write(0, 1)
    _emit_entropy_body(bw, residuals)
    dec = vp8l.decode_webp(_container(bw.done()))
    want = np.zeros((2, 2, 4), np.uint8)
    for y in range(2):
        for x in range(2):
            want[y, x] = [
                _ch(tgt[y, x], 16),
                _ch(tgt[y, x], 8),
                _ch(tgt[y, x], 0),
                _ch(tgt[y, x], 24),
            ]
    assert dec is not None and np.array_equal(dec, want)


def test_meta_prefix_groups():
    bw = _BitWriter()
    _header(bw, 8, 1)
    bw.write(0, 1)  # no transforms
    bw.write(1, 1)  # meta prefix present
    bw.write(0, 3)  # meta_bits = 2 → 2x1 meta image
    _emit_entropy_body(bw, [_argb(0, 0, 0, 0), _argb(0, 1, 0, 0)])
    bw.write(0, 1)  # no cache
    g0 = _codes_for(bw, [11, 12], 280)
    r0 = _codes_for(bw, [1], 256)
    b0 = _codes_for(bw, [2], 256)
    a0 = _codes_for(bw, [255], 256)
    _codes_for(bw, [0], 40)
    g1 = _codes_for(bw, [33], 280)
    r1 = _codes_for(bw, [3], 256)
    b1 = _codes_for(bw, [4], 256)
    a1 = _codes_for(bw, [254], 256)
    _codes_for(bw, [0], 40)
    for gv in (11, 12, 11, 12):
        _e(bw, g0, gv), _e(bw, r0, 1), _e(bw, b0, 2), _e(bw, a0, 255)
    for _ in range(4):
        _e(bw, g1, 33), _e(bw, r1, 3), _e(bw, b1, 4), _e(bw, a1, 254)
    dec = vp8l.decode_webp(_container(bw.done()))
    want = np.zeros((1, 8, 4), np.uint8)
    for x, gv in enumerate((11, 12, 11, 12)):
        want[0, x] = [1, gv, 2, 255]
    for x in range(4, 8):
        want[0, x] = [3, 33, 4, 254]
    assert dec is not None and np.array_equal(dec, want)


@settings(max_examples=30, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), n_flips=st.integers(1, 8))
def test_decoder_never_raises_on_corruption(seed, n_flips):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(7, 9, 3), dtype=np.uint8)
    buf = bytearray(vp8l.encode_webp_lossless(img, subtract_green=bool(seed % 2)))
    for _ in range(n_flips):
        pos = int(rng.integers(0, len(buf)))
        buf[pos] = int(rng.integers(0, 256))
    out = vp8l.decode_webp(bytes(buf))
    assert out is None or (out.ndim == 3 and out.dtype == np.uint8)


def test_encoder_rejects_bad_shapes():
    with pytest.raises(ValueError):
        vp8l.encode_webp_lossless(np.zeros((4, 4), np.uint8))
    with pytest.raises(ValueError):
        vp8l.encode_webp_lossless(np.zeros((0, 4, 3), np.uint8))


def test_lz77_overlapping_run_and_long_copy():
    """Backward reference with 1 < dist < length (the stepwise overlap
    branch of _decode_pixels_fast) AND a second non-overlapping copy
    (the dist >= length slice branch): 3 literals A B C, then length-5
    dist-3 (-> A B C A B), then length-3 dist-8 (-> A B C again)."""
    bw = _BitWriter()
    _header(bw, 11, 1)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no meta
    bw.write(0, 1)  # no cache
    # greens 1,2,3; length sym 260 = prefix 4 (1 extra bit) and
    # length sym 258 = prefix 2 (-> 3, no extra)
    gtab = _codes_for(bw, [1, 2, 3, 258, 260], 280)
    for sym in (10, 30, 255):  # r, b, a: 1-symbol simple codes
        bw.write(1, 1)
        bw.write(0, 1)
        bw.write(1, 1)
        bw.write(sym, 8)
    # distance prefix 13 (1-symbol code, zero bits): offset
    # (2+1)<<5 = 96, plain distance = 96 + extra + 1 - 120
    dtab = _codes_for(bw, [13], 40)
    for g in (1, 2, 3):
        _e(bw, gtab, g)
    _e(bw, gtab, 260)  # length prefix 4: offset (2+0)<<1 = 4
    bw.write(0, 1)  # extra 0 -> length 5
    _e(bw, dtab, 13)
    bw.write(26, 5)  # 96 + 26 + 1 = 123 -> plain dist 3
    _e(bw, gtab, 258)  # length 3, no extra
    _e(bw, dtab, 13)
    bw.write(31, 5)  # 96 + 31 + 1 = 128 -> plain dist 8
    dec = vp8l.decode_webp(_container(bw.done()))
    greens = [1, 2, 3, 1, 2, 3, 1, 2, 1, 2, 3]
    want = np.array(
        [[[10, g, 30, 255] for g in greens]], np.uint8
    )
    assert dec is not None and np.array_equal(dec, want)

def test_cache_insert_during_backward_copy():
    """Copied pixels must enter the color cache: literal A fills
    bucket k, literal C (chosen to COLLIDE with A's bucket) evicts it,
    then a length-1 dist-3 backward copy re-copies A — the copy's ONLY
    write to bucket k — and a final cache-hit on bucket k must decode
    A.  If the copy path skipped cache insertion the hit would yield
    C (the last literal insert into k)."""
    cache_bits = 4

    def bucket(px):
        return ((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)

    A = _argb(10, 1, 30)
    B = _argb(10, 2, 30)
    C = None
    for g in range(3, 256):
        cand = _argb(10, g, 30)
        if bucket(cand) == bucket(A) and g != 1:
            C = cand
            break
    assert C is not None, "no colliding green found"
    gC = (C >> 8) & 0xFF
    assert bucket(B) != bucket(A), "pick B outside the collision bucket"
    bw = _BitWriter()
    _header(bw, 5, 1)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no meta
    bw.write(1, 1)  # cache on
    bw.write(cache_bits, 4)
    # greens: 1 (A), gC (C), 2 (B); length sym 256 (prefix 0 ->
    # length 1, no extra); cache-hit sym 280 + bucket(A)
    gtab = _codes_for(bw, [1, 2, gC, 256, 280 + bucket(A)], 280 + 16)
    for sym in (10, 30, 255):  # r, b, a single-symbol
        bw.write(1, 1)
        bw.write(0, 1)
        bw.write(1, 1)
        bw.write(sym, 8)
    # distance prefix 7 + 2 extra bits -> dist_code 12 + extra + 1;
    # extra 1 -> 14 -> _DIST_MAP[13] = (3, 0) -> plain dist 3
    dtab = _codes_for(bw, [7], 40)
    from etl_caltopo_spark.llm.vp8l import _DIST_MAP

    assert _DIST_MAP[13] == (3, 0)
    _e(bw, gtab, 1)  # A  (cache: k <- A)
    _e(bw, gtab, gC)  # C  (cache: k <- C, evicts A)
    _e(bw, gtab, 2)  # B
    _e(bw, gtab, 256)  # length 1
    _e(bw, dtab, 7)
    bw.write(1, 2)  # dist_code 14 -> dist 3 -> copies A (k <- A)
    _e(bw, gtab, 280 + bucket(A))  # cache hit -> must be A
    dec = vp8l.decode_webp(_container(bw.done()))
    want_greens = [1, gC, 2, 1, 1]
    want = np.array([[[10, g, 30, 255] for g in want_greens]], np.uint8)
    assert dec is not None and np.array_equal(dec, want)
