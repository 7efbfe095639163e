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
