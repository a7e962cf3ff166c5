"""Build snips_nlu_spark.zip for spark-submit --py-files."""

from __future__ import annotations

import zipfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def main() -> None:
    out = ROOT / "snips_nlu_spark.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted((ROOT / "snips_nlu_spark").rglob("*.py")):
            zf.write(py, py.relative_to(ROOT))
    print(out)


if __name__ == "__main__":
    main()
