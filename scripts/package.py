#!/usr/bin/env python
"""Build the --py-files artifact: dist/document_extractor_spark.zip.

The engine is pure Python (no native deps beyond the preinstalled
pandas/pyarrow/numpy), so cluster deployment is exactly the north-rule
shape: ``spark-submit --py-files dist/document_extractor_spark.zip
scripts/extract_job.py …`` — every executor unpacks the zip onto its
PYTHONPATH.

The artifact is NOT versioned (dist/ is gitignored): a committed zip
inevitably drifts from the source tree between fixes. submit_extract.sh
rebuilds it from source on every invocation, so what ships is always
what the tree contains.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "document_extractor_spark"


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", f"{PKG}.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
            if "__pycache__" in root:
                continue
            for name in sorted(files):
                if not name.endswith(".py"):
                    continue
                full = os.path.join(root, name)
                z.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == "__main__":
    print(build())
