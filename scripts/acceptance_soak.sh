#!/usr/bin/env bash
# Acceptance soak: one scripted lifecycle run at flagship scale on the dev chip.
#
# Proves the full reference lifecycle (reference src/train.py:87-98 +
# scripts/reconstruct_phema.py:197-231) end to end on TPU:
#   synth data -> train FAD embedder -> train flagship (killed mid-run) ->
#   crash-resume from `last` -> post-hoc EMA reconstruction -> eval.py
#   2048-sample generation across a sampler/steps grid -> learned-embedder FAD.
#
# Artifacts land in logs/soak_r02/ (log, metrics.csv, FAD table); heavy
# run state stays under $WORK. Re-run phases selectively with PHASES=2,3,...
set -uo pipefail
ROOT=$(cd "$(dirname "$0")/.." && pwd)
cd "$ROOT"
DATA=${DATA:-/tmp/sc09_soak}
WORK=${WORK:-/tmp/soak_r02}
OUT=$ROOT/logs/soak_r02
TOTAL_EPOCHS=${TOTAL_EPOCHS:-150}
KILL_AFTER=${KILL_AFTER:-1200}
KILL_GRACE=${KILL_GRACE:-420}
mkdir -p "$OUT" "$WORK"
exec > >(tee -a "$OUT/soak.log") 2>&1

PHASES=${PHASES:-0,1,2,3,4,5,6,7}
run_phase() { [[ ",$PHASES," == *",$1,"* ]]; }
banner() { echo; echo "=== [$(date -u +%F' '%T)] PHASE $1 ==="; }

SNAPSHOT_ITEMS=${SNAPSHOT_ITEMS:-40000}
TRAIN_ARGS=(experiment=sc09/diffunet_complex_sc09_phema
  data.data_dir="$DATA" paths.output_dir="$WORK/train"
  trainer.max_epochs=$TOTAL_EPOCHS trainer.min_epochs=$TOTAL_EPOCHS
  trainer.check_val_every_n_epoch=10
  trainer.ckpt_last_every_n_epochs=10
  model.num_ema_snapshot_item=$SNAPSHOT_ITEMS)

if run_phase 0; then
  banner "0: synthetic SC09 corpus (no real audio in the image)"
  python scripts/make_synthetic_sc09.py "$DATA" --per-class 256
fi

if run_phase 1; then
  banner "1: train the VGGish FAD embedder as an SC09 classifier"
  python scripts/train_embedder.py --data-dir "$DATA" --out "$WORK/embedder" \
    --epochs 12
fi

if run_phase 2; then
  banner "2: flagship conditional training — SIGKILLed mid-run once it is stepping"
  python train.py "${TRAIN_ARGS[@]}" & TPID=$!
  # wait for real progress (epoch rows in metrics.csv — compile through the
  # dev tunnel can take 15+ min and must not consume the kill window), then
  # let a checkpoint land and kill -9 mid-training
  for _ in $(seq 1 200); do
    rows=$(wc -l < "$WORK/train/csv/metrics.csv" 2>/dev/null || echo 0)
    [ "${rows:-0}" -gt 10 ] && break
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
  RESUME=()
  [ -d "$WORK/train/checkpoints/last" ] \
    && RESUME=(ckpt_path="$WORK/train/checkpoints/last") \
    || echo "WARNING: no 'last' checkpoint found; starting fresh"
  python train.py "${TRAIN_ARGS[@]}" ${RESUME[@]+"${RESUME[@]}"}
  echo "ema snapshots:"; ls "$WORK/train/ema_snapshots" || true
fi

if run_phase 4; then
  banner "4: post-hoc EMA reconstruction"
  python scripts/reconstruct_phema.py --indir "$WORK/train/ema_snapshots" \
    --outstd 0.10 --outdir "$WORK/phema"
fi

if run_phase 5; then
  banner "5: eval.py 2048-sample generation grid (batch 128)"
  RECON=$(ls -d "$WORK"/phema/recon_phema-* | head -1)
  echo "using phema reconstruction: $RECON"
  for steps in 16 50; do
    python eval.py experiment=sc09/diffunet_complex_sc09_phema \
      data.data_dir="$DATA" ckpt_path="$WORK/train/checkpoints/last" \
      model.ema_ckpt_path="$RECON" data.batch_size=128 \
      model.sampler.num_steps=$steps model.noise_scheduler.num_steps=$steps \
      paths.output_dir="$WORK/eval_adpm2_$steps"
    python eval.py experiment=sc09_inference/diffunet_complex_sc09_phema_eval_dpm \
      data.data_dir="$DATA" ckpt_path="$WORK/train/checkpoints/last" \
      model.ema_ckpt_path="$RECON" sampler_steps=$steps \
      paths.output_dir="$WORK/eval_dpm_$steps"
  done
  # W8A8 static-scale serving path: same workload, quality checked by FAD
  ADT_INT8=1 python eval.py \
    experiment=sc09_inference/diffunet_complex_sc09_phema_eval_dpm \
    data.data_dir="$DATA" ckpt_path="$WORK/train/checkpoints/last" \
    model.ema_ckpt_path="$RECON" sampler_steps=50 \
    paths.output_dir="$WORK/eval_dpm_50_int8"
fi

if run_phase 6; then
  banner "6: learned-embedder FAD (vggish classifier embedding space)"
  FAD() { python scripts/compute_fad.py --embedder vggish \
            --embedder-ckpt "$WORK/embedder" --json "$@"; }
  { echo "{\"control_real_vs_real\": $(FAD --real "$DATA/train" --fake "$DATA/valid")},"
    for d in "$WORK"/eval_*; do
      name=$(basename "$d")
      echo "{\"$name\": $(FAD --real "$DATA/train" --fake "$d/test_samples")},"
    done; } | tee "$OUT/fad_raw.txt"
fi

if run_phase 7; then
  banner "7: collect artifacts"
  cp "$WORK/train/csv/metrics.csv" "$OUT/train_metrics.csv" || true
  cp "$WORK/train/config.json" "$OUT/train_config.json" || true
  python scripts/soak_summary.py --work "$WORK" --out "$OUT/summary.json" || true
  echo "soak complete; artifacts in $OUT"
fi
