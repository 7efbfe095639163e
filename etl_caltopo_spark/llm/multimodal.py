"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata, processed by
Arrow-batched ``mapInPandas`` so each executor sees columnar batches,
never row-at-a-time Python.  Two decode paths are fully real: binary
PPM (P6) images via pure numpy (``encode_ppm``/``decode_ppm``/
``decode_images``) and RIFF/WAVE PCM16 audio via pure struct+numpy
(``encode_wav``/``decode_wav``/``decode_audio``).
Codec work needing external libraries (JPEG/PNG/MP3/video) is
STUBBED — not present in this container — but runs in the identical
Spark-side contract (schemas, batch shapes, partitioning), all tested
(tests/test_llm_ops.py).
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

#: schema appended by the (stubbed) feature extractor
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


def decode_image(payload: bytes) -> object:
    """STUB — general image decode (JPEG/PNG/...) requires a codec
    library not present in this environment.  The mapInPandas plumbing
    around it is real, and :func:`decode_ppm` is a fully real decoder
    for the one format pure numpy can handle."""
    raise NotImplementedError(
        "image decode stub: install a codec (e.g. Pillow) and decode "
        "payload bytes here; PPM payloads decode for real via decode_ppm"
    )


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


def decode_wav(payload: bytes):
    """REAL decoder: RIFF/WAVE PCM16 mono → (sample_rate, int16 numpy
    array).  WAV is a length-prefixed container, not a compressed
    codec, so pure numpy/struct suffice.  Returns None for None /
    non-WAV / non-PCM16 payloads (dirty rows become nulls, same
    policy as decode_ppm)."""
    import struct

    import numpy as np

    if payload is None or len(payload) < 44:
        return None
    if payload[0:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    # walk the chunk list: fmt then data (other chunks skipped)
    pos, rate, bits, channels, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt " and len(body) >= 16:
            fmt, channels, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if fmt != 1:  # PCM only
                return None
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if rate is None or data is None or bits != 16 or channels != 1:
        return None
    return rate, np.frombuffer(data[: len(data) - (len(data) % 2)], dtype="<i2")


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
    """mapInPandas over PPM payloads: width/height/mean-RGB per asset —
    a real decode running in the exact plan shape a JPEG decoder would
    use (Arrow batches in, declared schema out, no shuffle)."""
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
                img = decode_ppm(b)
                if img is None:
                    widths.append(None), heights.append(None), means.append(None)
                else:
                    widths.append(img.shape[1])
                    heights.append(img.shape[0])
                    means.append([float(x) for x in img.mean(axis=(0, 1))])
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": widths,
                    "height": heights,
                    "mean_rgb": means,
                }
            )

    return assets.mapInPandas(fn, schema=out_schema)


def _fake_features(payload: pd.Series, dim: int = 8) -> pd.Series:
    """Deterministic fake feature extractor standing in for the codec:
    folds payload bytes into ``dim`` float accumulators.  Keeps the
    batch shape/latency profile of a real extractor without the
    dependency."""
    import numpy as np

    def one(b: bytes | None) -> list[float] | None:
        if b is None:
            return None
        arr = np.frombuffer(b, dtype=np.uint8)
        if len(arr) == 0:
            return [0.0] * dim
        pad = (-len(arr)) % dim
        arr = np.pad(arr, (0, pad)).reshape(-1, dim)
        return (arr.mean(axis=0) / 255.0).astype(float).tolist()

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
    """Resize contract: same schema out, plus target dims in typed
    metadata.  The pixel work is a codec concern (stubbed); the Spark
    side — schema evolution, no shuffle, columnar pass-through — is
    the part that matters for the plan."""
    return assets.withColumn(
        "resize_to",
        F.struct(F.lit(width).alias("width"), F.lit(height).alias("height")),
    )


def extract_features(assets: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Real contract: Arrow batches in, Arrow batches out, schema declared
    up front; swap ``_fake_features`` for a real decoder without
    touching the Spark plan."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["features"] = _fake_features(pdf["payload"])
            yield pdf

    return assets.mapInPandas(fn, schema=FEATURE_SCHEMA)
