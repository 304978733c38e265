"""Package walk_spark for spark-submit: builds dist/walk_spark.zip.

Usage:
    python tools/make_pyfiles.py
    spark-submit --py-files dist/walk_spark.zip jobs/crawl_job.py \
        --job job.json --pages s3://corpus/pages --output s3://out/run1
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(dest: str | None = None) -> str:
    dest = dest or os.path.join(REPO, "dist", "walk_spark.zip")
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    src = os.path.join(REPO, "walk_spark")
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(src):
            for fn in sorted(files):
                if fn.endswith(".pyc") or "__pycache__" in root:
                    continue
                full = os.path.join(root, fn)
                z.write(full, os.path.relpath(full, REPO))
    return dest


if __name__ == "__main__":
    print(build())
