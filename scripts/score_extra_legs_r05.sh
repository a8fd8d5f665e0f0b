#!/usr/bin/env bash
# Score the round-5 extra legs (seed-B bf16 control + per-step int8), merge
# their FADs into logs/soak_r04/fad_raw.json, regenerate QUALITY.md with the
# stratified anchors + seed-control gate context, and commit.
set -euo pipefail
ROOT=$(cd "$(dirname "$0")/.." && pwd)
cd "$ROOT"
WORK=${WORK:-/tmp/soak_r04}
DATA=${DATA:-/tmp/sc09_soak_r03}
OUT=$ROOT/logs/soak_r04
CS=$(cat "$WORK/best_cond_scale.txt")

FAD() { python scripts/compute_fad.py --embedder vggish \
          --embedder-ckpt "$WORK/embedder" --platform cpu --json \
          --real "$1" --fake "$2" \
        | python -c '
import sys, json
for line in reversed(sys.stdin.read().splitlines()):
    if line.startswith("{"):
        print(json.loads(line)["fad"]); break'; }

A="$WORK/eval_heun32_cfg$CS/test_samples"
B="$WORK/eval_heun32_cfg${CS}_seedB/test_samples"
I="$WORK/eval_heun32_int8ps/test_samples"
for d in "$A" "$B" "$I"; do
  n=$(ls "$d" 2>/dev/null | wc -l)
  [ "$n" -ge 2048 ] || { echo "leg $d incomplete ($n)"; exit 1; }
done

seedb_real=$(FAD "$DATA/train" "$B")
int8ps_real=$(FAD "$DATA/train" "$I")
control=$(FAD "$A" "$B")
direct_ps=$(FAD "$A" "$I")
echo "seedB-vs-real=$seedb_real int8ps-vs-real=$int8ps_real" \
     "control(seedB-vs-A)=$control direct(int8ps-vs-A)=$direct_ps"

python - "$OUT/fad_raw.json" <<EOF
import json, sys
p = sys.argv[1]
d = json.loads(open(p).read())
d["eval_heun32_cfg${CS}_seedB"] = $seedb_real
d["eval_heun32_int8ps"] = $int8ps_real
d["direct_bf16_seedB_vs_A"] = $control
d["direct_int8ps_vs_bf16_heun32"] = $direct_ps
open(p, "w").write(json.dumps(d, indent=2) + "\n")
print("merged", p)
EOF

cp "$WORK/fad_anchors.json" "$OUT/fad_anchors.json" 2>/dev/null || true
python scripts/soak_quality_report.py --work "$WORK" --data "$DATA" \
  --platform cpu --fad-json "$OUT/fad_raw.json" --out "$OUT/QUALITY.md"
python scripts/soak_summary.py --work "$WORK" --out "$OUT/summary.json" \
  --fad-json "$OUT/fad_raw.json"

git add "$OUT/fad_raw.json" "$OUT/QUALITY.md" "$OUT/summary.json" \
        "$OUT/fad_anchors.json" 2>/dev/null || true
git commit -m "soak_r04: per-step-int8 re-adjudication + seed-control FADs, anchored quality report" \
  || echo "nothing to commit"
echo "SCORE_EXTRA_DONE"
