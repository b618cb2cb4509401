"""Build dist/clp_core_spark.zip for `spark-submit --py-files`.

Pure-python package -> a single zip executors can import from; no wheels
or native deps, so the same artifact works on any cluster Python that has
pyspark/pandas/numpy/pyarrow (standard Spark runtime images).
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "clp_core_spark")
OUT = os.path.join(REPO, "dist", "clp_core_spark.zip")


def build(out_path: str = OUT) -> str:
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(PKG):
            if "__pycache__" in root:
                continue
            for fn in sorted(files):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                rel = os.path.relpath(full, REPO)
                zf.write(full, rel)
    return out_path


if __name__ == "__main__":
    print(build())
