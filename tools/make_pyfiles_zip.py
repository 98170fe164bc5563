"""Build dist/tempeh_spark.zip for spark-submit --py-files.

Includes the package plus the fixture corpus (corpus.py falls back to a
TEMPEH_FIXTURE_DIR env var / packaged path when running from a zip).
"""

from __future__ import annotations

import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> None:
    dist = REPO / "dist"
    dist.mkdir(exist_ok=True)
    out = dist / "tempeh_spark.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in sorted((REPO / "tempeh_spark").glob("*.py")):
            zf.write(p, f"tempeh_spark/{p.name}")
    print(f"wrote {out} ({out.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
