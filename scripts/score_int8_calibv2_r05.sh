#!/usr/bin/env bash
# Score the v2-calibrated int8 legs, re-adjudicate the serving gate, and
# refresh the judge-facing quality artifacts.
#
# The v1 values stay in fad_raw.json under *_calibv1 keys (they document the
# CFG-null-branch calibration bug this round fixed); the canonical keys the
# bench gate reads (direct_int8ps_vs_bf16_heun32, eval_heun32_int8ps, ...)
# are overwritten with the v2 measurements — bench.py serves int8 only if
# the per-step direct FAD passes the pre-registered 1.5x seed-control bar.
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
G="$WORK/eval_heun32_int8/test_samples"
P="$WORK/eval_heun32_int8ps/test_samples"
for d in "$A" "$G" "$P"; do
  n=$(ls "$d" 2>/dev/null | wc -l)
  [ "$n" -ge 2048 ] || { echo "leg $d incomplete ($n)"; exit 1; }
done
for leg in eval_heun32_int8 eval_heun32_int8ps; do
  calib=$(python -c "import json;print(json.load(open('$WORK/$leg/leg_meta.json')).get('calib'))")
  [ "$calib" = v2 ] || { echo "$leg is not calib=v2"; exit 1; }
done

int8_real=$(FAD "$DATA/train" "$G")
int8ps_real=$(FAD "$DATA/train" "$P")
direct_g=$(FAD "$A" "$G")
direct_ps=$(FAD "$A" "$P")
echo "v2: int8-vs-real=$int8_real int8ps-vs-real=$int8ps_real" \
     "direct(int8-vs-A)=$direct_g direct(int8ps-vs-A)=$direct_ps"

python - "$OUT/fad_raw.json" <<EOF
import json, sys
p = sys.argv[1]
d = json.loads(open(p).read())
for k in ("eval_heun32_int8", "direct_int8_vs_bf16_heun32",
          "eval_heun32_int8ps", "direct_int8ps_vs_bf16_heun32"):
    if k in d and f"{k}_calibv1" not in d:
        d[f"{k}_calibv1"] = d[k]
d["eval_heun32_int8"] = $int8_real
d["eval_heun32_int8ps"] = $int8ps_real
d["direct_int8_vs_bf16_heun32"] = $direct_g
d["direct_int8ps_vs_bf16_heun32"] = $direct_ps
open(p, "w").write(json.dumps(d, indent=2) + "\n")
print("merged", p)
EOF

python scripts/soak_quality_report.py --work "$WORK" --data "$DATA" \
  --platform cpu --fad-json "$OUT/fad_raw.json" --out "$OUT/QUALITY.md"
python scripts/soak_summary.py --work "$WORK" --out "$OUT/summary.json" \
  --fad-json "$OUT/fad_raw.json"

git add -f "$OUT/fad_raw.json" "$OUT/QUALITY.md" "$OUT/summary.json"
git commit -m "soak_r04: re-adjudicate the int8 serving gate under v2 calibration" \
  || echo "nothing to commit"
echo "SCORE_INT8V2_DONE"
