"""Freeze the image-codec fixtures (run once; committed to git).

Real PNG/BMP/PPM bytes generated deterministically: the pixel pattern
is reproducible from ``pattern()`` so tests decode the committed bytes
and compare against a freshly computed array.  PNG fixtures cycle all
five scanline filters so every unfilter path is exercised on-disk.

Usage: python tests/make_image_fixtures.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm_conflate_spark.operators.imagecodec import (  # noqa: E402
    encode_bmp,
    encode_png,
    encode_ppm,
)

FIX_DIR = os.path.join(os.path.dirname(__file__), "fixtures", "images")


def pattern(h: int, w: int, c: int) -> np.ndarray:
    """Deterministic pixel pattern with gradients + structure so filter
    encode/decode mistakes can't cancel out."""
    y, x, ch = np.meshgrid(
        np.arange(h), np.arange(w), np.arange(c), indexing="ij"
    )
    return ((x * 7 + y * 13 + ch * 101 + (x * y) % 29) % 256).astype(np.uint8)


def main():
    os.makedirs(FIX_DIR, exist_ok=True)
    cases = {
        "rgb_mixed_filters.png": encode_png(
            pattern(23, 17, 3), filters=[(i % 5) for i in range(23)]
        ),
        "gray_paeth.png": encode_png(pattern(16, 16, 1), filters=[4] * 16),
        "rgba_updown.png": encode_png(
            pattern(12, 9, 4), filters=[0, 2] * 6
        ),
        "rgb_oddwidth.bmp": encode_bmp(pattern(11, 13, 3)),
        "rgb.ppm": encode_ppm(pattern(8, 21, 3)),
    }
    for name, data in cases.items():
        with open(os.path.join(FIX_DIR, name), "wb") as f:
            f.write(data)
    print(f"froze {len(cases)} image fixtures into {FIX_DIR}")


if __name__ == "__main__":
    main()
