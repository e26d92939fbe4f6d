"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata maps.  The
Spark-side plumbing — schemas, ``mapInPandas`` batching, partitioning —
is real and tested.  Image decode is REAL for the formats the standard
library can honestly handle — PNG (zlib + scanline unfiltering), 24-bit
BMP, binary PPM via :mod:`.imagecodec` — feeding
:func:`extract_image_features`.  Only genuinely-absent codecs stay
stubbed: ``decoder='fake'`` derives deterministic pseudo-features from
raw bytes (numpy, vectorized); ``decoder='real'`` in
:func:`extract_media_features` still raises ``NotImplementedError`` at
the exact point an ffmpeg/libjpeg call would go (video/JPEG/compressed
audio).  WAV audio is REAL via the from-scratch RIFF/PCM parser in
:mod:`.audiocodec` feeding :func:`extract_audio_features`.
"""

from __future__ import annotations

from struct import error as struct_error
from typing import Iterator
from zlib import error as zlib_error

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, meta map<string,string>"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, "
    "byte_mean double, byte_std double, head_hash long"
)


def _fake_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic stand-in for a codec: per-row byte stats computed
    with numpy over the Arrow batch (the real decoder would produce
    pixel/sample tensors here)."""
    payloads = pdf["payload"]
    n = len(pdf)
    n_bytes = np.empty(n, dtype=np.int64)
    mean = np.empty(n, dtype=np.float64)
    std = np.empty(n, dtype=np.float64)
    head = np.empty(n, dtype=np.int64)
    for i, buf in enumerate(payloads):            # bounded by Arrow batch size
        a = np.frombuffer(buf or b"\x00", dtype=np.uint8)
        n_bytes[i] = a.size
        mean[i] = float(a.mean())
        std[i] = float(a.std())
        head[i] = int.from_bytes(a[:8].tobytes().ljust(8, b"\x00"), "little", signed=True)
    return pd.DataFrame(
        {
            "media_id": pdf["media_id"],
            "kind": pdf["kind"],
            "n_bytes": n_bytes,
            "byte_mean": mean,
            "byte_std": std,
            "head_hash": head,
        }
    )


def extract_media_features(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """mapInPandas feature extraction over a media table.

    decoder='real' marks where an image/audio library would decode the
    payload; it intentionally raises in this container.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "video/JPEG/compressed-audio decode (ffmpeg/libjpeg) not "
                    "available in this environment; PNG/BMP/PPM images decode "
                    "for real via extract_image_features, WAV audio via "
                    "extract_audio_features, 'fake' gives deterministic "
                    "byte-stat stand-ins for everything else"
                )
            yield _fake_decode_batch(pdf)

    return media.mapInPandas(run, FEATURE_SCHEMA)


IMAGE_FEATURE_SCHEMA = (
    "media_id long, width int, height int, channels int, "
    "px_mean double, px_std double, err string"
)


def extract_image_features(media: DataFrame) -> DataFrame:
    """REAL image decode + pixel statistics over a media table.

    PNG/BMP/PPM payloads are decoded with the stdlib codecs in
    :mod:`.imagecodec`; undecodable rows (JPEG, truncated bytes) keep
    their ``media_id`` with null stats and the error message in ``err``
    — a 100 TB ingest must skip-and-log bad blobs, not die on row one.
    Per-image Python is inherent to variable-size binary decode (it is
    what PIL itself would be); the per-pixel math is numpy and the
    batching is Arrow via ``mapInPandas``.
    """
    from .imagecodec import decode_image

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            width = np.full(n, -1, dtype=np.int64)
            height = np.full(n, -1, dtype=np.int64)
            channels = np.full(n, -1, dtype=np.int64)
            mean = np.full(n, np.nan)
            std = np.full(n, np.nan)
            err: list = [None] * n
            for i, buf in enumerate(pdf["payload"]):
                try:
                    img = decode_image(bytes(buf or b""))
                    height[i], width[i], channels[i] = img.shape
                    mean[i] = float(img.mean())
                    std[i] = float(img.std())
                except (ValueError, NotImplementedError, IndexError,
                        struct_error, zlib_error) as e:
                    err[i] = f"{type(e).__name__}: {e}"
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "channels": channels,
                    "px_mean": mean,
                    "px_std": std,
                    "err": err,
                }
            )
            bad = pd.Series(err).notna().to_numpy()
            for col in ("width", "height", "channels", "px_mean", "px_std"):
                out.loc[bad, col] = None
            yield out

    return media.mapInPandas(run, IMAGE_FEATURE_SCHEMA)


AUDIO_FEATURE_SCHEMA = (
    "media_id long, n_channels int, sample_rate int, n_frames long, "
    "duration_sec double, rms double, peak double, err string"
)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """REAL audio decode + sample statistics over a media table.

    WAV payloads decode via the from-scratch RIFF parser in
    :mod:`.audiocodec` (PCM 8/16/24/32 + IEEE float); undecodable rows
    (MP3, ADPCM, truncated bytes) keep their ``media_id`` with null
    stats and the error in ``err`` — skip-and-log, same ingest contract
    as :func:`extract_image_features`.  Per-blob Python is inherent to
    variable-size binary decode; the per-sample math is numpy and the
    batching is Arrow via ``mapInPandas``.
    """
    from .audiocodec import decode_wav

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            n_ch = np.full(n, -1, dtype=np.int64)
            rate = np.full(n, -1, dtype=np.int64)
            frames = np.full(n, -1, dtype=np.int64)
            dur = np.full(n, np.nan)
            rms = np.full(n, np.nan)
            peak = np.full(n, np.nan)
            err: list = [None] * n
            for i, buf in enumerate(pdf["payload"]):
                try:
                    samples, sr = decode_wav(bytes(buf or b""))
                    frames[i], n_ch[i] = samples.shape
                    rate[i] = sr
                    dur[i] = samples.shape[0] / sr
                    rms[i] = float(np.sqrt((samples**2).mean())) if samples.size else 0.0
                    peak[i] = float(np.abs(samples).max()) if samples.size else 0.0
                except (ValueError, NotImplementedError, struct_error) as e:
                    err[i] = f"{type(e).__name__}: {e}"
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_channels": n_ch,
                    "sample_rate": rate,
                    "n_frames": frames,
                    "duration_sec": dur,
                    "rms": rms,
                    "peak": peak,
                    "err": err,
                }
            )
            bad = pd.Series(err).notna().to_numpy()
            for col in ("n_channels", "sample_rate", "n_frames",
                        "duration_sec", "rms", "peak"):
                out.loc[bad, col] = None
            yield out

    return media.mapInPandas(run, AUDIO_FEATURE_SCHEMA)
