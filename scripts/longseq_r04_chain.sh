#!/usr/bin/env bash
# Chained after the round-4 soak supervisor: once the soak (training +
# quality pipeline) is finished and the TPU is free, run the long-sequence
# flash-attention workload (round-3 verdict item 6) and commit its artifacts.
set -u
ROOT=$(cd "$(dirname "$0")/.." && pwd)
cd "$ROOT"
SUP_PID=${1:?supervisor pid}
LOOP_PID=${2:-}
say() { echo "[longseq-chain $(date -u +%F' '%T)] $*"; }

say "waiting for supervisor pid=$SUP_PID (and train loop ${LOOP_PID:-n/a})"
while kill -0 "$SUP_PID" 2>/dev/null; do sleep 60; done
[ -n "$LOOP_PID" ] && while kill -0 "$LOOP_PID" 2>/dev/null; do sleep 60; done
say "soak finished; launching long-sequence flash run"

bash scripts/perf/run_longseq_train_r04.sh
rc=$?
say "longseq run rc=$rc"
git add -f logs/longseq_r04 2>/dev/null
git commit -m "Long-sequence (16k-token) DiT training on TPU: flash fwd+bwd vs XLA attention A/B + peak-memory probe" \
  >/dev/null 2>&1 && say "committed longseq artifacts" || say "nothing to commit"
