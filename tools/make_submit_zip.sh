#!/bin/sh
# Package the engine for spark-submit --py-files (north_rule ship vehicle).
# Usage: tools/make_submit_zip.sh [out.zip]; then:
#   spark-submit --master <cluster> --py-files engine.zip your_job.py
set -e
cd "$(dirname "$0")/.."
OUT="${1:-engine.zip}"
rm -f "$OUT"
zip -qr "$OUT" engine -x 'engine/__pycache__/*'
echo "wrote $OUT"
