"""Freeze the extractor goldens (run once; committed to git).

Usage: python tests/freeze_goldens.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osm_conflate_spark.gen import gen_dataset, gen_pages  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "fixtures", "text")


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    ds = gen_dataset(100, seed=42, dup_id_frac=0.0, spatial_dup_frac=0.0)
    pages = gen_pages(ds, seed=42)
    for i in range(len(pages)):
        url = pages["url"].iloc[i]
        fname = url.replace("https://", "").replace("/", "_") + ".txt"
        with open(os.path.join(GOLDEN_DIR, fname), "wb") as f:
            f.write(pages["text"].iloc[i].encode("utf-8"))
    print(f"froze {len(pages)} goldens into {GOLDEN_DIR}")


if __name__ == "__main__":
    main()
