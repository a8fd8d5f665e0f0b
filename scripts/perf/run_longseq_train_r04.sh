#!/usr/bin/env bash
# Round-4 long-sequence flash-attention workload run (verdict item 6).
#
# Trains the shipped 16384-token patch-1 DiT (experiment/sc09/dit_longseq_sc09)
# for >= 60 real optimizer steps on the TPU with the Pallas flash fwd+bwd
# kernels auto-dispatched, then repeats a short leg with ADT_FLASH_ATTENTION=0
# (XLA O(N^2) attention) for the A/B, and runs the in-model probe for peak
# device memory under both paths. Results land in logs/longseq_r04/.
set -uo pipefail
ROOT=$(cd "$(dirname "$0")/../.." && pwd)
cd "$ROOT"
DATA=${DATA:-/tmp/sc09_soak_r03}
OUT=$ROOT/logs/longseq_r04
WORK=${WORK:-/tmp/longseq_r04}
STEPS=${STEPS:-60}
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-$ROOT/.jax_cache}
mkdir -p "$OUT" "$WORK"
exec > >(tee -a "$OUT/run.log") 2>&1

echo "=== [$(date -u +%F' '%T)] longseq r04: flash training leg ($STEPS steps) ==="
timeout 5400 python train.py experiment=sc09/dit_longseq_sc09 \
  data.data_dir="$DATA" paths.output_dir="$WORK/flash" \
  +trainer.max_steps=$STEPS +trainer.log_every_n_steps=10 \
  trainer.max_epochs=1 trainer.min_epochs=1 \
  trainer.check_val_every_n_epoch=10 tags='[longseq,flash]'
rc_flash=$?
echo "flash leg rc=$rc_flash"

echo "=== [$(date -u +%F' '%T)] longseq r04: XLA-attention A/B leg ==="
ADT_FLASH_ATTENTION=0 timeout 5400 python train.py \
  experiment=sc09/dit_longseq_sc09 \
  data.data_dir="$DATA" paths.output_dir="$WORK/xla" \
  +trainer.max_steps=$STEPS +trainer.log_every_n_steps=10 \
  trainer.max_epochs=1 trainer.min_epochs=1 \
  trainer.check_val_every_n_epoch=10 tags='[longseq,xla]'
rc_xla=$?
echo "xla leg rc=$rc_xla (an OOM here IS the flash kernels' justification)"

echo "=== [$(date -u +%F' '%T)] longseq r04: peak-memory probe ==="
timeout 3600 python scripts/perf/probe_longseq_flash.py --batch 4 \
  | tee "$OUT/probe.json" || echo "probe failed"

python - "$WORK" "$OUT" "$rc_flash" "$rc_xla" <<'EOF'
import json, sys
from pathlib import Path

work, out, rc_flash, rc_xla = Path(sys.argv[1]), Path(sys.argv[2]), *sys.argv[3:5]

def throughput(leg):
    csv = work / leg / "csv" / "metrics.csv"
    if not csv.is_file():
        return None
    header, *rows = csv.read_text().strip().splitlines()
    cols = header.split(",")
    si, ti = cols.index("step"), cols.index("time")
    pts = []
    for r in rows:
        v = r.split(",")
        if v[si] and v[ti]:
            pts.append((int(float(v[si])), float(v[ti])))
    if len(pts) < 2:
        return None
    # skip the first interval (contains compile)
    (s0, t0), (s1, t1) = pts[min(1, len(pts) - 2)], pts[-1]
    steps = s1 - s0
    return {"steps_logged": pts[-1][0], "steps_per_sec": steps / max(t1 - t0, 1e-9),
            "items_per_sec": 4 * steps / max(t1 - t0, 1e-9)}

res = {"rc_flash": int(rc_flash), "rc_xla": int(rc_xla),
       "flash": throughput("flash"), "xla": throughput("xla")}
(out / "summary.json").write_text(json.dumps(res, indent=2))
print(json.dumps(res, indent=2))
EOF
echo "LONGSEQ_R04_DONE"
