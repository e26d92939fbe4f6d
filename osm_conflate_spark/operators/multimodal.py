"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata maps.  The
Spark-side plumbing — schemas, ``mapInPandas`` batching, partitioning —
is real and tested; the actual codec decode is STUBBED (no image/audio
libraries in this environment): ``decoder='fake'`` derives deterministic
pseudo-features from the raw bytes (numpy, vectorized), ``decoder='real'``
raises ``NotImplementedError`` at the exact point a PIL/ffmpeg call
would go.
"""

from __future__ import annotations

from typing import Iterator

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
                    "codec decode (PIL/ffmpeg) not available in this environment; "
                    "use decoder='fake' for the deterministic byte-stat stand-in"
                )
            yield _fake_decode_batch(pdf)

    return media.mapInPandas(run, FEATURE_SCHEMA)
