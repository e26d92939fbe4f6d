"""Build the --py-files archive for cluster submission.

    python scripts/make_pyfiles_zip.py [out.zip]
    spark-submit --py-files osm_conflate_spark.zip \
        --conf spark.sql.adaptive.enabled=true \
        scripts/submit_cli.py --pages <pages-table-or-path> ...

Zips the ``osm_conflate_spark`` package (source only, no caches/tests)
so every executor's python worker can import it — the cluster-side twin
of the PYTHONPATH propagation ``plans.pipeline.build_session`` does for
local runs.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str) -> str:
    pkg = os.path.join(REPO, "osm_conflate_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "osm_conflate_spark.zip"
    )
    print(build(out))
