"""Package the engine for cluster submission: `spark-submit --py-files`.

Builds a reproducible engine.zip (sorted entries, zeroed timestamps) so the
same source tree always produces a byte-identical artifact — the engine's
determinism rule (SURVEY.md §2.11) applied to its own deployment unit.

Usage:
    python tools/make_pyfiles.py [out.zip]          # default: dist/engine.zip
    spark-submit --py-files dist/engine.zip -m engine.runner CLIPS TRANSCRIPTS
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str) -> str:
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    entries = []
    pkg_dir = os.path.join(REPO, "engine")
    for root, _dirs, files in os.walk(pkg_dir):
        for f in sorted(files):
            if f.endswith(".py"):
                full = os.path.join(root, f)
                rel = os.path.relpath(full, REPO)
                entries.append((rel, full))
    entries.sort()
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for rel, full in entries:
            with open(full, "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(rel, date_time=(1980, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            z.writestr(info, data)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist", "engine.zip")
    print(build(out))
