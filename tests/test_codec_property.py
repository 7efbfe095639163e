"""Property tests for the session's pure-python codecs (BMP, GIF,
ADPCM WAV, AVI): randomized roundtrips over the whole parameter space
— image sizes, palette widths, interlacing, non-block-aligned sample
counts — catching the header/stride/bit-packing edge cases a fixed
fixture misses."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_caltopo_spark.llm import multimodal as mm


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 17),
    w=st.integers(1, 17),
    seed=st.integers(0, 2**31 - 1),
)
def test_bmp_roundtrip_any_size(h, w, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(mm.decode_bmp(mm.encode_bmp(img)), img)


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 16),
    w=st.integers(1, 16),
    n_colors=st.integers(1, 256),
    interlaced=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_gif_roundtrip_any_palette(h, w, n_colors, interlaced, seed):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
    # palette rows need not be unique in the source image; encode_gif
    # re-derives its own palette from the distinct colors
    img = pal[rng.integers(0, n_colors, size=(h, w))]
    enc = mm.encode_gif(img, interlaced=interlaced)
    assert np.array_equal(mm.decode_gif(enc), img)


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(1, 1600),
    seed=st.integers(0, 2**31 - 1),
)
def test_adpcm_length_and_block_headers(n, seed):
    rng = np.random.default_rng(seed)
    # smooth-ish signal: ADPCM tracks it; white noise would not
    base = np.cumsum(rng.integers(-300, 301, size=n)).clip(-30000, 30000)
    sig = base.astype(np.int16)
    out = mm.decode_wav(mm.encode_adpcm_wav(sig, 8000, block_samples=505))
    assert out is not None
    rate, dec = out
    assert rate == 8000
    assert len(dec) == n  # fact chunk trims the padded final block
    # every block's first sample is stored verbatim in its header
    for start in range(0, n, 505):
        assert dec[start] == sig[start]


@settings(max_examples=15, deadline=None)
@given(
    n=st.integers(1, 5),
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    fps=st.integers(1, 60),
    seed=st.integers(0, 2**31 - 1),
)
def test_avi_roundtrip_any_shape(n, h, w, fps, seed):
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)
    got_fps, dec = mm.decode_avi(mm.encode_avi(frames, fps=fps))
    assert got_fps == fps
    assert np.array_equal(dec, frames)


@settings(max_examples=30, deadline=None)
@given(
    kind=st.sampled_from(
        ["png", "ppm", "bmp", "gif", "jpeg", "wav", "adpcm", "g711u", "g711a", "avi", "mjpeg", "webp", "tiff"]
    ),
    seed=st.integers(0, 2**31 - 1),
    n_flips=st.integers(1, 8),
)
def test_decoders_never_raise_on_corruption(kind, seed, n_flips):
    """Dirty-row policy under fuzzing: flipping random bytes in a valid
    payload must yield either None or a well-formed result — decoders
    NEVER raise (an exception would kill the whole Spark task, not one
    row)."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(9, 11, 3), dtype=np.uint8)
    pal = rng.integers(0, 256, size=(12, 3), dtype=np.uint8)
    sig = np.cumsum(rng.integers(-200, 201, size=700)).clip(-30000, 30000).astype(np.int16)
    frames = rng.integers(0, 256, size=(2, 6, 5, 3), dtype=np.uint8)
    payloads = {
        "png": lambda: mm.encode_png(img, filter_type=int(seed) % 5),
        "ppm": lambda: mm.encode_ppm(img),
        "bmp": lambda: mm.encode_bmp(img),
        "gif": lambda: mm.encode_gif(pal[rng.integers(0, 12, size=(9, 11))]),
        "jpeg": lambda: b"\xff\xd8\xff\xe0" + bytes(rng.integers(0, 256, size=400, dtype=np.uint8).tolist()),
        "wav": lambda: mm.encode_wav(sig),
        "adpcm": lambda: mm.encode_adpcm_wav(sig),
        "g711u": lambda: mm.encode_g711_wav(sig, 8000, "ulaw"),
        "g711a": lambda: mm.encode_g711_wav(sig, 8000, "alaw"),
        "avi": lambda: mm.encode_avi(frames),
        "mjpeg": lambda: mm.encode_avi_mjpeg(frames),
        "tiff": lambda: mm.encode_tiff(img, big_endian=bool(seed % 2)),
        "webp": lambda: __import__(
            "etl_caltopo_spark.llm.vp8l", fromlist=["encode_webp_lossless"]
        ).encode_webp_lossless(img, subtract_green=bool(seed % 2)),
    }
    buf = bytearray(payloads[kind]())
    for _ in range(n_flips):
        pos = int(rng.integers(0, len(buf)))
        buf[pos] = int(rng.integers(0, 256))
    corrupted = bytes(buf)
    if kind in ("wav", "adpcm", "g711u", "g711a"):
        out = mm.decode_wav(corrupted)
        assert out is None or (isinstance(out, tuple) and len(out) == 2)
    elif kind in ("avi", "mjpeg"):
        out = mm.decode_avi(corrupted)
        assert out is None or (isinstance(out, tuple) and out[1].ndim == 4)
    else:
        out = mm.decode_image(corrupted)
        assert out is None or (out.ndim in (2, 3) and out.dtype == np.uint8)


def test_avi_deep_list_nesting_returns_none():
    """A crafted AVI with thousands of nested LIST chunks must hit the
    depth cap and return None — not blow the Python stack (a
    RecursionError would kill the whole Spark task, violating the
    dirty-row policy)."""
    import struct
    import sys

    inner = b""
    for _ in range(2000):
        inner = b"LIST" + struct.pack("<I", len(inner) + 4) + b"hdrl" + inner
    payload = b"RIFF" + struct.pack("<I", len(inner) + 4) + b"AVI " + inner
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(500)
    try:
        assert mm.decode_avi(payload) is None
    finally:
        sys.setrecursionlimit(old)


def test_adpcm_riff_size_field_matches_file_length():
    """The RIFF chunk-size field must equal len(file) - 8 — our own
    decoder ignores it, but strict external WAV parsers reject files
    whose declared size overruns the buffer (ADVICE r4)."""
    import struct

    sig = np.arange(-500, 500, dtype=np.int16)
    enc = mm.encode_adpcm_wav(sig, 8000, block_samples=505)
    (declared,) = struct.unpack("<I", enc[4:8])
    assert declared == len(enc) - 8
    # sibling PCM16 encoder, same invariant
    enc_pcm = mm.encode_wav(sig, 8000)
    (declared_pcm,) = struct.unpack("<I", enc_pcm[4:8])
    assert declared_pcm == len(enc_pcm) - 8


def test_adpcm_zero_samples_per_block_is_not_negative_slice():
    """A crafted fmt with wSamplesPerBlock == 0 must decode ZERO
    nibbles per block (header predictor only), never a negative slice
    that decodes nearly the whole padded block (ADVICE r4)."""
    import struct

    sig = np.cumsum(np.ones(64, dtype=np.int64) * 50).clip(-30000, 30000).astype(np.int16)
    enc = bytearray(mm.encode_adpcm_wav(sig, 8000, block_samples=64))
    # patch wSamplesPerBlock (last ushort of the 20-byte fmt body,
    # which starts right after "fmt "+size at offset 20) to 0, and
    # drop the fact chunk's sample-count trim by patching it too
    fmt_off = enc.find(b"fmt ") + 8
    enc[fmt_off + 18 : fmt_off + 20] = struct.pack("<H", 0)
    fact_off = enc.find(b"fact") + 8
    enc[fact_off : fact_off + 4] = struct.pack("<I", 1)
    out = mm.decode_wav(bytes(enc))
    assert out is not None
    _rate, dec = out
    # one block → exactly the header predictor sample survives
    assert len(dec) == 1


@settings(max_examples=10, deadline=None)
@given(
    n=st.integers(1, 4),
    h=st.integers(8, 20),
    w=st.integers(8, 20),
    seed=st.integers(0, 2**31 - 1),
)
def test_mjpeg_avi_roundtrip_fidelity(n, h, w, seed):
    """MJPEG AVI roundtrip: frame count/dims exact, pixels within the
    JPEG quantization envelope on smooth content."""
    rng = np.random.default_rng(seed)
    # smooth gradient + small noise (JPEG error is bounded on smooth data)
    base = (
        np.arange(w)[None, None, :, None]
        + 2 * np.arange(h)[None, :, None, None]
        + 60 * np.arange(3)[None, None, None, :]
        + 5 * np.arange(n)[:, None, None, None]
    )
    frames = (base % 200).astype(np.uint8)
    got_fps, dec = mm.decode_avi(mm.encode_avi_mjpeg(frames, fps=25))
    assert got_fps == 25
    assert dec.shape == frames.shape
    err = np.abs(dec.astype(int) - frames.astype(int))
    assert err.max() <= 64 and err.mean() < 12


def test_mjpeg_one_bad_frame_poisons_payload():
    """Dirty-row policy: a single corrupt frame chunk must null the
    whole payload — never a partial frame stack."""
    frames = (np.arange(3 * 16 * 16 * 3) % 251).reshape(3, 16, 16, 3).astype(np.uint8)
    payload = bytearray(mm.encode_avi_mjpeg(frames))
    # find the SECOND frame chunk and wreck its entropy data
    first = payload.find(b"00dc")
    second = payload.find(b"00dc", first + 4)
    assert second > 0
    # destroy the frame's SOI marker: that frame can no longer decode
    payload[second + 8 : second + 10] = b"\x00\x00"
    assert mm.decode_avi(bytes(payload)) is None


def test_g711_bit_exact_vs_audioop_full_domain():
    """Both G.711 laws, both directions, the ENTIRE 16-bit input
    domain and all 256 code values — bit-exact against stdlib
    audioop's reference implementation."""
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop

    xs = np.arange(-32768, 32768, dtype=np.int16)
    assert mm.lin2ulaw(xs).tobytes() == audioop.lin2ulaw(xs.tobytes(), 2)
    assert mm.lin2alaw(xs).tobytes() == audioop.lin2alaw(xs.tobytes(), 2)
    us = np.arange(256, dtype=np.uint8)
    assert mm.ulaw2lin(us).tobytes() == audioop.ulaw2lin(us.tobytes(), 2)
    assert mm.alaw2lin(us).tobytes() == audioop.alaw2lin(us.tobytes(), 2)


@settings(max_examples=10, deadline=None)
@given(
    n=st.integers(1, 2000),
    law=st.sampled_from(["ulaw", "alaw"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_g711_wav_roundtrip(n, law, seed):
    rng = np.random.default_rng(seed)
    sig = np.cumsum(rng.integers(-400, 401, size=n)).clip(-30000, 30000).astype(np.int16)
    out = mm.decode_wav(mm.encode_g711_wav(sig, 8000, law))
    assert out is not None
    rate, dec = out
    assert rate == 8000 and len(dec) == n
    # companding error envelope: log-PCM keeps SNR high on smooth
    # data — but the bound is STATISTICAL: a handful of near-zero
    # samples can legitimately quantize at ~17 dB (hypothesis found
    # n=1, first step small — correct codec behavior, the companding
    # curve's worst region), so assert only where the envelope
    # argument applies (enough samples, non-trivial energy)
    energy = (sig.astype(np.int64) ** 2).sum()
    if n >= 16 and energy >= n * 100**2:
        err = (sig.astype(np.int64) - dec.astype(np.int64)) ** 2
        snr = 10 * np.log10(energy / max(err.sum(), 1))
        assert snr > 25, snr


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(1, 17),
    w=st.integers(1, 17),
    be=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_tiff_roundtrip_any_size_both_endians(h, w, be, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    enc = mm.encode_tiff(img, big_endian=be)
    assert np.array_equal(mm.decode_tiff(enc), img)
    assert np.array_equal(mm.decode_image(enc), img)  # magic dispatch


def test_tiff_rejects_compressed_and_truncated():
    import struct

    img = np.arange(4 * 5 * 3, dtype=np.uint8).reshape(4, 5, 3)
    enc = bytearray(mm.encode_tiff(img))
    # find the Compression entry (tag 259) and flip to LZW (5)
    ifd_off = struct.unpack("<I", enc[4:8])[0]
    n = struct.unpack("<H", enc[ifd_off : ifd_off + 2])[0]
    for i in range(n):
        off = ifd_off + 2 + 12 * i
        tag = struct.unpack("<H", enc[off : off + 2])[0]
        if tag == 259:
            enc[off + 8 : off + 10] = struct.pack("<H", 5)
    assert mm.decode_tiff(bytes(enc)) is None
    assert mm.decode_tiff(mm.encode_tiff(img)[:30]) is None
