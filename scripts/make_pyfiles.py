"""Package cortex_spark for `spark-submit --py-files` (north-rule launch mode).

Builds a single zip of the package (no tests, no caches) that executors and
the driver can import from:

    python scripts/make_pyfiles.py [dist/cortex_spark.zip]
    spark-submit --py-files dist/cortex_spark.zip scripts/submit_main.py \
        --synth 300 --out /tmp/kg_out
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def build(dest: Path) -> Path:
    dest.parent.mkdir(parents=True, exist_ok=True)
    pkg = REPO / "cortex_spark"
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted(pkg.rglob("*.py")):
            if "__pycache__" in py.parts:
                continue
            zf.write(py, py.relative_to(REPO))
    return dest


if __name__ == "__main__":
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "dist" / "cortex_spark.zip"
    print(build(out))
