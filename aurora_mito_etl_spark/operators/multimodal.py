"""Multimodal (image/audio/video) column operators — beyond-reference
surface per BASELINE.json's north star.

Design: media payloads are opaque `binary` columns traveling next to
a typed metadata struct; all per-item compute is Arrow-batched
`mapInPandas` so batches stream through Python workers without
row-at-a-time overhead, and the big binary column is only deserialized
where needed. Partitioning guidance at 100 TB: media rows are wide —
keep `spark.sql.files.maxPartitionBytes` at the default 128 MiB and
store payloads in Parquet binary columns (or pointers to object
storage when items exceed a few MiB each; the operator shapes are
identical either way).

The actual codec work (JPEG decode, audio resample, video demux)
needs native libs absent from this container, so the *decoders* are
pluggable: `fake_media_backend` synthesizes deterministic frames from
the bytes so every Spark-side contract (schemas, batch shapes, UDF
signatures, partition behavior) is real and tested; the default
backend raises NotImplementedError with a clear message.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Callable, Iterator
from dataclasses import dataclass

import numpy as np

from aurora_mito_etl_spark.functions.numeric import fixed6_np as _f6np, fixed6_py as _f6py
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType(), True),  # jpeg|png|wav|mp4|...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
    ]
)


def media_table_schema(id_type: T.DataType = T.LongType()) -> T.StructType:
    """The canonical multimodal table: (id, payload, meta)."""
    return T.StructType(
        [
            T.StructField("media_id", id_type, False),
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("meta", MEDIA_META_SCHEMA, True),
        ]
    )


# ---------------------------------------------------------------------------
# Pluggable decode backends
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class MediaBackend:
    # bytes -> HxWxC uint8 array
    decode_image: Callable[[bytes], np.ndarray]
    # bytes -> (samples float32 [-1,1], sample_rate)
    decode_audio: Callable[[bytes], tuple[np.ndarray, int]]
    # bytes, n -> list of HxWxC uint8 frames (uniformly sampled)
    sample_video_frames: Callable[[bytes, int], list[np.ndarray]]


def unavailable_media_backend() -> MediaBackend:
    """Default in this container: the decode step is a stub
    (image/audio libs are not installed); swap in a Pillow/ffmpeg
    backend in production."""

    def no(*_a, **_k):
        raise NotImplementedError(
            "media codecs not available in this environment; use "
            "fake_media_backend() or provide a real MediaBackend"
        )

    return MediaBackend(no, no, no)


def fake_media_backend(height: int = 8, width: int = 8) -> MediaBackend:
    """Deterministic synthetic decoder: pixels/samples are a pure
    function of the payload bytes, so tests can assert exact
    downstream values without any codec.

    Image pixels come from an md5 hash chain over the payload
    (block b of 16 bytes = md5(payload || '#' || str(b))) — an
    ENGINE-PORTABLE construction, so the whole decode→feature path is
    expressible in plain SQL and the driver's DuckDB gate can
    hash-check it end to end (see docs_media_features' oracle).
    Audio/video use a seeded RNG (structural tests only)."""

    def _rng(data: bytes) -> np.random.Generator:
        return np.random.default_rng(zlib.crc32(data or b""))

    def decode_image(data: bytes) -> np.ndarray:
        n = height * width * 3
        buf = b"".join(
            hashlib.md5(data + b"#" + str(b).encode()).digest()
            for b in range((n + 15) // 16)
        )
        return (
            np.frombuffer(buf[:n], dtype=np.uint8)
            .reshape(height, width, 3)
            .copy()
        )

    def decode_audio(data: bytes) -> tuple[np.ndarray, int]:
        rng = _rng(data)
        return (rng.random(1600, dtype=np.float32) * 2 - 1, 16000)

    def sample_video_frames(data: bytes, n: int) -> list[np.ndarray]:
        rng = _rng(data)
        return [
            rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)
            for _ in range(n)
        ]

    return MediaBackend(decode_image, decode_audio, sample_video_frames)


BackendFactory = Callable[[], MediaBackend]

# ---------------------------------------------------------------------------
# Operators (all mapInPandas — iterator of Arrow batches)
# ---------------------------------------------------------------------------

_IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mean_rgb", T.ArrayType(T.DoubleType()), True),
        T.StructField("std_rgb", T.ArrayType(T.DoubleType()), True),
        T.StructField("phash", T.StringType(), True),
    ]
)


def image_features(
    df: DataFrame,
    backend_factory: BackendFactory,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Decode → per-channel mean/std + a perceptual-hash-style 64-bit
    signature (mean-threshold on the downsampled grayscale). The
    backend is constructed once per worker; each Arrow batch is
    processed vectorized."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        be = backend_factory()
        for pdf in batches:
            out = []
            for mid, data in zip(pdf[id_col], pdf[payload_col]):
                if data is None:
                    out.append((mid, None, None, None))
                    continue
                img = be.decode_image(bytes(data))
                flat = img.reshape(-1, img.shape[-1]).astype(np.float64)
                # 64-cell mean-threshold signature on EXACT integer
                # sums: cell_mean >= global_mean ⟺ cell_sum·N >=
                # total_sum·n_cell — no float epsilon at the bit
                # boundary, identical in any engine (the SQL oracle
                # relies on this).
                gray_i = img.reshape(-1, img.shape[-1]).astype(np.int64).sum(axis=1)
                total_n = gray_i.shape[0]
                total_sum = int(gray_i.sum())
                cells = np.array_split(gray_i, 64)
                bits = "".join(
                    "1" if int(c.sum()) * total_n >= total_sum * len(c) else "0"
                    for c in cells
                )
                out.append(
                    (
                        mid,
                        _f6np(flat.mean(axis=0)).tolist(),
                        _f6np(flat.std(axis=0)).tolist(),
                        f"{int(bits, 2):016x}",
                    )
                )
            yield pd.DataFrame(out, columns=["media_id", "mean_rgb", "std_rgb", "phash"])

    return df.mapInPandas(run, _IMAGE_FEATURES_SCHEMA)


_AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("zero_crossings", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]
)


def audio_features(
    df: DataFrame,
    backend_factory: BackendFactory,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Decode → RMS energy + zero-crossing count (the cheap audio
    quality/speech-ness signals)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        be = backend_factory()
        for pdf in batches:
            out = []
            for mid, data in zip(pdf[id_col], pdf[payload_col]):
                if data is None:
                    out.append((mid, None, None, None))
                    continue
                samples, sr = be.decode_audio(bytes(data))
                rms = float(np.sqrt(np.mean(samples**2)))
                zc = int(np.count_nonzero(np.diff(np.signbit(samples))))
                out.append((mid, _f6py(rms), zc, sr))
            yield pd.DataFrame(
                out, columns=["media_id", "rms", "zero_crossings", "sample_rate"]
            )

    return df.mapInPandas(run, _AUDIO_FEATURES_SCHEMA)


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_mean", T.DoubleType(), True),
        T.StructField("frame_phash", T.StringType(), True),
    ]
)


def video_frame_sample(
    df: DataFrame,
    backend_factory: BackendFactory,
    n_frames: int = 4,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """UDTF-shaped: one output row per sampled frame (fan-out inside
    mapInPandas — no explode of giant arrays through the shuffle)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        be = backend_factory()
        for pdf in batches:
            out = []
            for mid, data in zip(pdf[id_col], pdf[payload_col]):
                if data is None:
                    continue
                for i, frame in enumerate(be.sample_video_frames(bytes(data), n_frames)):
                    gray = frame.astype(np.float64).mean(axis=-1)
                    out.append((mid, i, _f6py(float(gray.mean())),
                                hashlib.md5(frame.tobytes()).hexdigest()[:16]))
            yield pd.DataFrame(
                out, columns=["media_id", "frame_idx", "frame_mean", "frame_phash"]
            )

    return df.mapInPandas(run, _FRAME_SCHEMA)


def phash_near_dup_pairs(
    features: DataFrame,
    id_col: str = "media_id",
    phash_col: str = "phash",
    max_hamming: int = 6,
) -> DataFrame:
    """Media near-duplicate pairs by perceptual-hash Hamming distance,
    banded like SimHash (4×16-bit bands over the 64-bit phash) so the
    shuffle stays O(n) — the image twin of text SimHash dedup.
    Input is :func:`image_features` output (phash as 16-hex-char
    string).

    Recall caveat (as in simhash_pairs): 4 bands GUARANTEE candidates
    only up to Hamming 3; pairs at distance 4..max_hamming are found
    only when their differing bits avoid one full band."""
    # hex → long via two 32-bit halves: a direct 16-hex-digit conv
    # overflows signed BIGINT under ANSI for hashes ≥ 2^63; bitwise
    # shift wraps into the sign bit, which is exactly two's-complement.
    hi = F.conv(F.substring(phash_col, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(phash_col, 9, 8), 16, 10).cast("long")
    h = F.shiftleft(hi, 32).bitwiseOR(lo)
    base = features.filter(F.col(phash_col).isNotNull()).select(
        F.col(id_col), h.alias("h64")
    )
    from aurora_mito_etl_spark.operators.dedup import banded_hamming_pairs

    return banded_hamming_pairs(
        base, id_col, "h64", band_bits=16, n_bands=4, max_hamming=max_hamming
    )


def payload_stats(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Pure-Catalyst media bookkeeping: byte size + content digest —
    no decode, no Python; this is the exact-dedup key for media."""
    return df.withColumn("payload_bytes", F.length(F.col(payload_col))).withColumn(
        "payload_sha256", F.sha2(F.col(payload_col), 256)
    )
