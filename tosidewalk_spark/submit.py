"""Packaging for cluster submission: build the --py-files archive.

The north rule runs the engine via ``spark-submit --py-files`` on a
multi-executor cluster [BASELINE.json:14]; this helper produces the
self-contained zip every executor's python worker imports from:

    python -m tosidewalk_spark.submit /tmp/engine.zip
    spark-submit --py-files /tmp/engine.zip \\
        -m tosidewalk_spark.plans.pipeline --sf-dir ... --out ...
"""

from __future__ import annotations

import pathlib
import sys
import zipfile


def build_pyfiles_zip(out_path: str) -> str:
    """Zip the package (source only, deterministic order + timestamps) so
    the same archive bytes come out of every build host."""
    root = pathlib.Path(__file__).resolve().parents[1]
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted((root / "tosidewalk_spark").rglob("*.py")):
            info = zipfile.ZipInfo(str(p.relative_to(root)))  # fixed epoch ts
            z.writestr(info, p.read_bytes(), zipfile.ZIP_DEFLATED)
    return out_path


if __name__ == "__main__":
    print(build_pyfiles_zip(sys.argv[1] if len(sys.argv) > 1 else "engine.zip"))
