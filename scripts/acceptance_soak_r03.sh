#!/usr/bin/env bash
# Round-3 acceptance soak: converged-quality run at flagship scale.
#
# Same lifecycle as scripts/acceptance_soak.sh (synth data -> FAD embedder ->
# flagship phema training with a mid-run SIGKILL + crash-resume -> post-hoc
# EMA reconstruction -> 2048-sample eval grid -> learned-embedder FAD), with
# the round-3 deltas the round-2 verdict asked for:
#   * a 4x larger synthetic corpus (PER_CLASS=1024) and a multi-hour epoch
#     budget, so FAD is measured on a CONVERGED checkpoint;
#   * the 32-step-Heun headline leg (EDMSampler, BASELINE.md workload) in the
#     eval grid — previously the quality gate and the perf number were
#     measured on different workloads;
#   * the int8 serving gate re-run on the converged checkpoint AT 32 Heun
#     steps, including a direct int8-vs-bf16 sample-set FAD with a stated
#     accept threshold (<= 2x the real-vs-real floor).
# Artifacts land in logs/soak_r03/. Re-run phases selectively with PHASES=...
set -uo pipefail
ROOT=$(cd "$(dirname "$0")/.." && pwd)
cd "$ROOT"
DATA=${DATA:-/tmp/sc09_soak_r03}
WORK=${WORK:-/tmp/soak_r03}
OUT=$ROOT/logs/soak_r03
PER_CLASS=${PER_CLASS:-1024}
TOTAL_EPOCHS=${TOTAL_EPOCHS:-300}
KILL_GRACE=${KILL_GRACE:-420}
SNAPSHOT_ITEMS=${SNAPSHOT_ITEMS:-100000}
mkdir -p "$OUT" "$WORK"
exec > >(tee -a "$OUT/soak.log") 2>&1

PHASES=${PHASES:-0,1,2,3,4,5,6,7}
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
  python scripts/make_synthetic_sc09.py "$DATA" --per-class "$PER_CLASS"
fi

if run_phase 1; then
  banner "1: train the VGGish FAD embedder as an SC09 classifier"
  python scripts/train_embedder.py --data-dir "$DATA" --out "$WORK/embedder" \
    --epochs 12
fi

if run_phase 2; then
  banner "2: flagship conditional training — SIGKILLed mid-run once stepping"
  python train.py "${TRAIN_ARGS[@]}" & TPID=$!
  # Kill only after a resumable 'last' checkpoint EXISTS (it is written
  # every ckpt_last_every_n_epochs); killing on csv progress alone can land
  # before the first checkpoint and silently turn phase 3 into a fresh
  # start (observed in the first round-3 soak run).
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
  # Auto-restarting resume loop: the dev-tunnel TPU worker itself can crash
  # mid-run ("TPU worker process crashed or restarted", observed at epoch 60
  # of the first round-3 soak — the soak then silently evaluated a 1/4-trained
  # checkpoint). Progress-aware: retries only while each attempt advances the
  # step counter, so a deterministic failure still aborts.
  for attempt in $(seq 1 40); do
    RESUME=()
    [ -d "$WORK/train/checkpoints/last" ] \
      && RESUME=(ckpt_path="$WORK/train/checkpoints/last") \
      || echo "WARNING: no 'last' checkpoint found; starting fresh"
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
fi

if run_phase 4; then
  banner "4: post-hoc EMA reconstruction"
  python scripts/reconstruct_phema.py --indir "$WORK/train/ema_snapshots" \
    --outstd 0.10 --outdir "$WORK/phema"
fi

if run_phase 5; then
  banner "5: eval.py 2048-sample generation grid (batch 128)"
  # newest reconstruction (highest step) — lexicographic head -1 would pick
  # an older recon left over from a previous phase-4 run
  RECON=$(ls -d "$WORK"/phema/recon_phema-* | sort -t_ -k2 -n | tail -1)
  echo "using phema reconstruction: $RECON"
  COMMON=(data.data_dir="$DATA" ckpt_path="$WORK/train/checkpoints/last"
    model.ema_ckpt_path="$RECON")
  # retry each leg once: the dev-tunnel TPU worker can crash mid-generation
  # (observed twice on 2026-08-18); a silent missing leg poisons the grid
  run_eval() {
    for _try in 1 2; do
      "$@" && return 0
      echo "eval leg failed (attempt $_try): $*"; sleep 20
    done
    return 1
  }
  # the headline 32-step-Heun leg (BASELINE.md workload), bf16 and int8,
  # at the reference's cond_scale 1.0 …
  run_eval python eval.py experiment=sc09_inference/diffunet_complex_sc09_phema_eval_heun \
    "${COMMON[@]}" paths.output_dir="$WORK/eval_heun_32"
  # … and at guidance 2.0 (diagnostic grid: CFG 2.0 nearly halves FAD on
  # this leg; reported alongside, not replacing, the reference workload)
  run_eval python eval.py experiment=sc09_inference/diffunet_complex_sc09_phema_eval_heun \
    "${COMMON[@]}" model.sampler.cond_scale=2.0 \
    paths.output_dir="$WORK/eval_heun_32_cfg2"
  run_eval env ADT_INT8=1 python eval.py \
    experiment=sc09_inference/diffunet_complex_sc09_phema_eval_heun \
    "${COMMON[@]}" paths.output_dir="$WORK/eval_heun_32_int8"
  # the round-2 grid: ADPM2 + DPM at 16/50 steps
  for steps in 16 50; do
    run_eval python eval.py experiment=sc09/diffunet_complex_sc09_phema \
      "${COMMON[@]}" data.batch_size=128 \
      model.sampler.num_steps=$steps model.noise_scheduler.num_steps=$steps \
      paths.output_dir="$WORK/eval_adpm2_$steps"
    run_eval python eval.py experiment=sc09_inference/diffunet_complex_sc09_phema_eval_dpm \
      "${COMMON[@]}" sampler_steps=$steps \
      paths.output_dir="$WORK/eval_dpm_$steps"
  done
fi

if run_phase 6; then
  banner "6: learned-embedder FAD (vggish classifier embedding space)"
  FAD() { python scripts/compute_fad.py --embedder vggish \
            --embedder-ckpt "$WORK/embedder" --json "$@"; }
  { echo "{\"control_real_vs_real\": $(FAD --real "$DATA/train" --fake "$DATA/valid")},"
    for d in "$WORK"/eval_*; do
      name=$(basename "$d")
      echo "{\"$name\": $(FAD --real "$DATA/train" --fake "$d/test_samples")},"
    done
    # direct int8-vs-bf16 gate at the headline workload: accept if
    # <= 2x the real-vs-real floor
    echo "{\"direct_int8_vs_bf16_heun32\": $(FAD \
      --real "$WORK/eval_heun_32/test_samples" \
      --fake "$WORK/eval_heun_32_int8/test_samples")},"
  } | tee "$OUT/fad_raw.txt"
fi

if run_phase 7; then
  banner "7: collect artifacts"
  cp "$WORK/train/csv/metrics.csv" "$OUT/train_metrics.csv" || true
  cp "$WORK/train/config.json" "$OUT/train_config.json" || true
  python scripts/soak_summary.py --work "$WORK" --out "$OUT/summary.json" || true
  # the judge-facing quality table (FAD + x-floor + cond accuracy per leg,
  # plus the int8 gate verdict) — produced by the pipeline itself so a
  # session restart can't leave the soak without its report
  python scripts/soak_quality_report.py --work "$WORK" --data "$DATA" \
    --platform cpu --out "$OUT/QUALITY.md" || true
  echo "soak complete; artifacts in $OUT"
fi
