#!/usr/bin/env python
"""Build dist/biokg_spark.zip for ``spark-submit --py-files``.

Pure stdlib, deterministic member order, no timestamps in the archive
beyond zip's required fields (fixed to epoch for reproducible builds).
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "biokg_spark")
OUT = os.path.join(REPO, "dist", "biokg_spark.zip")


def main() -> None:
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    members = []
    for root, _dirs, files in os.walk(PKG):
        if "__pycache__" in root:
            continue
        for fn in sorted(files):
            if fn.endswith(".py"):
                full = os.path.join(root, fn)
                members.append((os.path.relpath(full, REPO), full))
    members.sort()
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as zf:
        for arcname, full in members:
            with open(full, "rb") as f:
                data = f.read()
            info = zipfile.ZipInfo(arcname, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, data)
    print(f"{OUT}: {len(members)} files")


if __name__ == "__main__":
    main()
