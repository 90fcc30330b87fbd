"""Build dist/engine.zip for spark-submit --py-files (north_rule
packaging requirement).

    python scripts/package_pyfiles.py
    spark-submit --py-files dist/engine.zip \\
        $(python -c 'import document_extraction_service_spark.job as j; print(j.__file__)') \\
        --input ... --output ... --lineage ... --run-id r1

The zip carries only the engine package (no tests/fix/goldens); the
UDF module tree is what executors import.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "document_extraction_service_spark"


def main() -> str:
    os.makedirs(os.path.join(REPO, "dist"), exist_ok=True)
    out = os.path.join(REPO, "dist", "engine.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    print(out)
    return out


if __name__ == "__main__":
    main()
