"""Build the spark-submit --py-files artifact (M4 packaging).

Produces dist/valideer_spark.zip containing the package, suitable for:

    spark-submit --py-files dist/valideer_spark.zip your_job.py

Example multi-executor job (cluster deployment):

    from valideer_spark.engine import ValidationEngine
    from valideer_spark.flagship import doc_schema
    engine = ValidationEngine(doc_schema(), checkpoint_dir="s3://…/ckpt")
    docs = spark.read.format("iceberg").load("catalog.db.documents")
    engine.run_with_checkpoint(docs)
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DIST = os.path.join(ROOT, "dist")


def main() -> str:
    os.makedirs(DIST, exist_ok=True)
    out = os.path.join(DIST, "valideer_spark.zip")
    pkg = os.path.join(ROOT, "valideer_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, ROOT))
    return out


if __name__ == "__main__":
    print(main())
