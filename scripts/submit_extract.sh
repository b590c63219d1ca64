#!/usr/bin/env bash
# North-rule deployment shape: spark-submit --py-files on a cluster.
# Usage: scripts/submit_extract.sh <in_path> <out_path> [extra spark-submit args...]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
IN="$1"; OUT="$2"; shift 2
ZIP="$(python "$REPO/scripts/package.py")"
exec spark-submit \
  --py-files "$ZIP" \
  "$@" \
  "$REPO/scripts/extract_job.py" "$IN" "$OUT"
