"""Zip the package for spark-submit --py-files."""

from __future__ import annotations

import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
PKG = "news_information_retrieval_system_spark"


def main() -> None:
    dist = REPO / "dist"
    dist.mkdir(exist_ok=True)
    out = dist / "nirs_spark.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted((REPO / PKG).rglob("*.py")):
            z.write(p, p.relative_to(REPO))
    print(out)


if __name__ == "__main__":
    main()
