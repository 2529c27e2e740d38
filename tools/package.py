"""Build the --py-files artifact for spark-submit (north-rule packaging).

    python tools/package.py            # -> dist/ds_raster_pipelines_spark.zip
    spark-submit --py-files dist/ds_raster_pipelines_spark.zip \
        run_pipeline.py flagship --sf-dir /root/testdata/sf0.001

The zip contains only the package sources (no tests/tools), laid out so
``import ds_raster_pipelines_spark`` resolves from the zip on every
executor — the standard deployment unit for a multi-executor cluster.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "ds_raster_pipelines_spark"


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", f"{PKG}.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    src_root = os.path.join(REPO, PKG)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, dirnames, filenames in os.walk(src_root):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                z.write(full, os.path.relpath(full, REPO))
    return out_path


if __name__ == "__main__":
    print(build())
