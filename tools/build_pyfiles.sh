#!/bin/bash
# Package sumi_agent_spark for spark-submit --py-files deployment.
# Usage: tools/build_pyfiles.sh [out.zip]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="${1:-/tmp/sumi_agent_spark.zip}"
rm -f "$OUT"
cd "$REPO"
zip -qr "$OUT" sumi_agent_spark -x '*/__pycache__/*'
echo "$OUT"
