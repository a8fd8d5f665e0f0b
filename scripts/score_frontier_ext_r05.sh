#!/usr/bin/env bash
# Score the round-5 frontier-extension legs (UniPC step sweep 8/12/24 at the
# 32-Heun winner scale; UniPC-16 guidance bracket 1.75/2.25/2.5), merge the
# FADs into logs/soak_r04/fad_raw.json, append the frontier-extension section
# to QUALITY.md (the earlier legs' sample dirs died with /tmp, so the report
# is appended, not regenerated), and refresh summary.json.
set -euo pipefail
ROOT=$(cd "$(dirname "$0")/.." && pwd)
cd "$ROOT"
export WORK=${WORK:-/tmp/soak_r04}
export DATA=${DATA:-/tmp/sc09_soak_r03}
python scripts/score_frontier_ext_r05.py
python scripts/soak_summary.py --work "$WORK" \
  --out logs/soak_r04/summary.json --fad-json logs/soak_r04/fad_raw.json
echo "SCORE_FRONTIER_EXT_DONE"
