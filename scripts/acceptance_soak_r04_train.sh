#!/usr/bin/env bash
# Round-4 soak, training half: rebuilds the converged flagship the round-3
# verdict asked for (250+ epochs on the 4x corpus). The machine hosting the
# round-3 soak was recycled between rounds (its /tmp training state is gone),
# so this script regenerates data + embedder and trains from scratch, with
# the same mid-run SIGKILL + auto-restarting crash-resume lifecycle as
# scripts/acceptance_soak_r03.sh phases 0-3.
#
# Outputs land where scripts/acceptance_soak_r04.sh (phases 4-7, the quality
# pipeline) expects them: TRAIN_WORK=/tmp/soak_r03, DATA=/tmp/sc09_soak_r03.
# Logs go to logs/soak_r04/train.log (r03 artifacts stay untouched).
set -uo pipefail
ROOT=$(cd "$(dirname "$0")/.." && pwd)
cd "$ROOT"
DATA=${DATA:-/tmp/sc09_soak_r03}
WORK=${WORK:-/tmp/soak_r03}
OUT=$ROOT/logs/soak_r04
PER_CLASS=${PER_CLASS:-1024}
TOTAL_EPOCHS=${TOTAL_EPOCHS:-250}
KILL_GRACE=${KILL_GRACE:-300}
SNAPSHOT_ITEMS=${SNAPSHOT_ITEMS:-100000}
mkdir -p "$OUT" "$WORK"
exec > >(tee -a "$OUT/train.log") 2>&1

PHASES=${PHASES:-0,1,2,3}
run_phase() { [[ ",$PHASES," == *",$1,"* ]]; }
banner() { echo; echo "=== [$(date -u +%F' '%T)] PHASE $1 ==="; }

TRAIN_ARGS=(experiment=sc09/diffunet_complex_sc09_phema
  data.data_dir="$DATA" paths.output_dir="$WORK/train"
  trainer.max_epochs=$TOTAL_EPOCHS trainer.min_epochs=$TOTAL_EPOCHS
  trainer.check_val_every_n_epoch=25
  trainer.ckpt_last_every_n_epochs=10
  model.num_ema_snapshot_item=$SNAPSHOT_ITEMS)

if run_phase 0; then
  banner "0: synthetic SC09 corpus ($PER_CLASS per class)"
  if [ -d "$DATA/train" ] && [ "$(ls "$DATA/train" | wc -l)" -ge 9000 ]; then
    echo "corpus already present; skipping"
  else
    python scripts/make_synthetic_sc09.py "$DATA" --per-class "$PER_CLASS"
  fi
fi

if run_phase 1; then
  banner "1: train the VGGish FAD embedder as an SC09 classifier"
  if [ -d "$WORK/embedder" ]; then
    echo "embedder already present; skipping"
  else
    python scripts/train_embedder.py --data-dir "$DATA" --out "$WORK/embedder" \
      --epochs 12
  fi
fi

if run_phase 2; then
  banner "2: flagship conditional training — SIGKILLed mid-run once stepping"
  python train.py "${TRAIN_ARGS[@]}" & TPID=$!
  # Kill only after a resumable 'last' checkpoint EXISTS.
  for _ in $(seq 1 400); do
    rows=$(wc -l < "$WORK/train/csv/metrics.csv" 2>/dev/null || echo 0)
    [ "${rows:-0}" -gt 10 ] && [ -d "$WORK/train/checkpoints/last" ] && break
    kill -0 "$TPID" 2>/dev/null || break
    sleep 15
  done
  if kill -0 "$TPID" 2>/dev/null; then
    sleep "${KILL_GRACE:-120}"
    kill -9 "$TPID" 2>/dev/null || true
    echo "train SIGKILLed mid-run as planned"
  else
    echo "train exited on its own before the kill (rc captured by wait)"
  fi
  wait "$TPID" 2>/dev/null || true
  echo "checkpoints after kill:"; ls "$WORK/train/checkpoints" || true
fi

if run_phase 3; then
  banner "3: crash-resume from checkpoints/last to epoch $TOTAL_EPOCHS"
  # Progress-aware auto-restart: the dev-tunnel TPU worker crashes
  # sporadically; retry only while each attempt advances the step counter.
  for attempt in $(seq 1 40); do
    # resume priority: last -> last.old (atomic-swap backup) -> newest
    # epoch_*; NEVER silently start fresh — that would discard the run.
    RESUME=()
    for cand in "$WORK/train/checkpoints/last" \
                "$WORK/train/checkpoints/last.old" \
                $(ls -d "$WORK"/train/checkpoints/epoch_* 2>/dev/null | sort -t_ -k2 -rn); do
      [ -d "$cand" ] && { RESUME=(ckpt_path="$cand"); break; }
    done
    if [ ${#RESUME[@]} -eq 0 ] && [ -f "$WORK/train/csv/metrics.csv" ]; then
      echo "FATAL: training progressed but no resumable checkpoint found"; exit 1
    fi
    before=$(tail -1 "$WORK/train/csv/metrics.csv" 2>/dev/null | cut -d, -f1)
    before=${before:-0}
    python train.py "${TRAIN_ARGS[@]}" ${RESUME[@]+"${RESUME[@]}"}
    rc=$?
    after=$(tail -1 "$WORK/train/csv/metrics.csv" 2>/dev/null | cut -d, -f1)
    after=${after:-0}
    echo "train attempt $attempt rc=$rc steps $before -> $after"
    [ "$rc" -eq 0 ] && break
    if [ "$after" -le "$before" ]; then
      echo "train made no progress; aborting the resume loop"; break
    fi
    sleep 20
  done
  echo "ema snapshots:"; ls "$WORK/train/ema_snapshots" || true
  echo "SOAK_R04_TRAIN_COMPLETE"
fi
