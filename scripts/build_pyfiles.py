"""Package the engine for spark-submit --py-files.

    python scripts/build_pyfiles.py        # → dist/engine.zip
    spark-submit --py-files dist/engine.zip \
        --conf spark.sql.shuffle.partitions=<2-3x total cores> \
        -m oct_report_ocr_spark.jobs.extract_job --input ... --output ...
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    out = os.path.join(REPO, "dist", "engine.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(REPO, "oct_report_ocr_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))
    print(out)
    return out


if __name__ == "__main__":
    main()
