#!/usr/bin/env bash
# Detached supervisor for the round-4 quality grid (eval half).
#
# The machine hosting the training half was recycled after the 250-epoch run
# completed; the converged checkpoint, embedder and phema reconstructions
# were secured in-repo (logs/soak_r04/state) by soak_r04_supervisor.sh.
# This script reassembles the /tmp working tree from that committed state,
# runs the one-process TPU grid (scripts/eval_grid_r04.py), overlaps the
# CPU-only FAD of each finished leg with the TPU generation of the next,
# publishes the FAD-winning cond_scale for the grid's winner-dependent legs,
# and finishes with acceptance_soak_r04.sh phases 6-7 (fail-loud fad_raw.json
# + QUALITY.md + TREND.md), committing each judge-facing artifact as it
# lands.  A hang watchdog kills and relaunches the (idempotent) grid runner
# if the dev-tunnel TPU worker wedges silently.
#
# Usage: setsid nohup bash scripts/soak_r04_eval_supervisor.sh \
#          >> logs/soak_r04/eval_supervisor.log 2>&1 &
set -u
ROOT=$(cd "$(dirname "$0")/.." && pwd)
cd "$ROOT"
WORK=${WORK:-/tmp/soak_r04}
TRAIN_WORK=${TRAIN_WORK:-/tmp/soak_r03}
DATA=${DATA:-/tmp/sc09_soak_r03}
OUT=$ROOT/logs/soak_r04
STATE=$OUT/state
SAMPLES=${SAMPLES:-2048}
TREND_SAMPLES=512
HANG_SECS=${HANG_SECS:-1800}
export JAX_COMPILATION_CACHE_DIR=$ROOT/.jax_cache

say() { echo "[eval-sup $(date -u +%F' '%T)] $*"; }
commit() {
  local msg=$1; shift
  git add -f "$@" 2>/dev/null
  git commit -m "$msg" >/dev/null 2>&1 && say "committed: $msg" \
    || say "nothing to commit for: $msg"
}

# ---- reassemble the /tmp working tree from committed state ------------------
mkdir -p "$WORK" "$TRAIN_WORK/train/checkpoints" "$TRAIN_WORK/train/csv"
[ -e "$TRAIN_WORK/train/checkpoints/last" ] \
  || ln -s "$STATE/last" "$TRAIN_WORK/train/checkpoints/last"
[ -e "$TRAIN_WORK/embedder" ] || ln -s "$STATE/embedder" "$TRAIN_WORK/embedder"
[ -f "$TRAIN_WORK/train/csv/metrics.csv" ] \
  || cp "$OUT/train_metrics.csv" "$TRAIN_WORK/train/csv/metrics.csv"
[ -e "$WORK/train" ] || ln -s "$TRAIN_WORK/train" "$WORK/train"
[ -e "$WORK/embedder" ] || ln -s "$TRAIN_WORK/embedder" "$WORK/embedder"
if [ ! -d "$WORK/phema" ]; then
  mkdir -p "$WORK/phema"
  for d in "$STATE"/phema/recon_*; do
    ln -sfn "$d" "$WORK/phema/$(basename "$d")"
  done
fi
[ -d "$DATA/train" ] && [ "$(ls "$DATA/train" | wc -l)" -ge 10000 ] \
  || { say "regenerating synthetic corpus"; \
       python scripts/make_synthetic_sc09.py "$DATA" --per-class 1024; }

# ---- FAD-trend points from the surviving full checkpoints (CPU) -------------
if [ ! -d "$WORK/trendpts" ]; then
  for ck in last_epoch180_insurance last; do
    JAX_PLATFORMS=cpu python scripts/extract_ema_params.py \
      --ckpt "$STATE/$ck" --outdir "$WORK/trendpts" \
      || say "WARN: ema extraction failed for $ck"
  done
fi

# ---- grid runner (TPU) with hang watchdog -----------------------------------
GRID_PID=
launch_grid() {
  setsid nohup env WORK="$WORK" DATA="$DATA" SAMPLES=$SAMPLES \
    CKPT="$TRAIN_WORK/train/checkpoints/last" \
    python scripts/eval_grid_r04.py >> "$OUT/grid.log" 2>&1 &
  GRID_PID=$!
  say "grid runner launched pid=$GRID_PID"
}
launch_grid

# ---- serialized CPU FAD jobs, overlapped with TPU generation ----------------
FAD_LOCK=$WORK/.fad_lock
fad_cmd() { python scripts/compute_fad.py --embedder vggish \
              --embedder-ckpt "$WORK/embedder" --platform cpu --json \
              --real "$1" --fake "$2" \
            | python -c '
import sys, json
for line in reversed(sys.stdin.read().splitlines()):
    if line.startswith("{"):
        print(json.loads(line)["fad"]); break'; }

leg_scale() {  # recorded generation cond_scale of a leg ("" if none)
  python -c '
import json, sys
try: print(json.load(open(sys.argv[1]))["cond_scale"])
except Exception: pass' "$WORK/$1/leg_meta.json" 2>/dev/null
}

fad_bg() {  # fad_bg <leg>
  local leg=$1
  [ -s "$WORK/fad_leg_$leg.txt" ] && return 0
  [ -e "$WORK/.fad_req_$leg" ] && return 0
  : > "$WORK/.fad_req_$leg"
  (
    flock 9
    [ -s "$WORK/fad_leg_$leg.txt" ] && exit 0
    # snapshot the leg's identity: if the grid rmtree's + regenerates it at
    # the FAD-winning scale while we score, the result must be discarded
    # (the request marker is cleared so the next sweep rescores fresh)
    pre_scale=$(leg_scale "$leg")
    pre_n=$(ls "$WORK/$leg/test_samples" 2>/dev/null | wc -l)
    f=$(fad_cmd "$DATA/train" "$WORK/$leg/test_samples")
    post_scale=$(leg_scale "$leg")
    post_n=$(ls "$WORK/$leg/test_samples" 2>/dev/null | wc -l)
    if [ "$pre_scale" != "$post_scale" ] || [ "$pre_n" != "$post_n" ]; then
      echo "[fad_bg] $leg changed during scoring" \
           "(scale $pre_scale->$post_scale, n $pre_n->$post_n); discarding"
      rm -f "$WORK/.fad_req_$leg"
      exit 0
    fi
    [ -n "$f" ] && { echo "$f" > "$WORK/.fad_leg_$leg.tmp" \
                     && mv "$WORK/.fad_leg_$leg.tmp" "$WORK/fad_leg_$leg.txt"; }
    echo "[fad_bg] $leg -> ${f:-FAILED}"
    [ -n "$f" ] || rm -f "$WORK/.fad_req_$leg"   # allow a retry next sweep
  ) 9>>"$FAD_LOCK" &
}

if [ ! -s "$WORK/fad_floor.txt" ] && [ ! -e "$WORK/.fad_req_floor" ]; then
  : > "$WORK/.fad_req_floor"
  ( flock 9; f=$(fad_cmd "$DATA/train" "$DATA/valid"); \
    [ -n "$f" ] && echo "$f" > "$WORK/fad_floor.txt"; \
    echo "[fad_bg] floor -> ${f:-FAILED}" ) 9>>"$FAD_LOCK" &
fi

SWEEP=(1.0 1.5 2.0 3.0 4.0)
leg_needed() { case "$1" in eval_heun32_trend*) echo $TREND_SAMPLES;; \
                            *) echo $SAMPLES;; esac; }

WDMARK=$WORK/.watchdog_mark
touch "$WDMARK"
SWEEP_COMMITTED=

while true; do
  # kick FAD for every completed leg
  for d in "$WORK"/eval_*/test_samples; do
    [ -d "$d" ] || continue
    leg=$(basename "$(dirname "$d")")
    need=$(leg_needed "$leg")
    n=$(ls "$d" 2>/dev/null | wc -l)
    [ "$n" -ge "$need" ] && fad_bg "$leg"
  done

  # publish the winning cond_scale once all sweep FADs are in
  if [ ! -s "$WORK/best_cond_scale.txt" ]; then
    all=1
    for cs in "${SWEEP[@]}"; do
      [ -s "$WORK/fad_leg_eval_heun32_cfg$cs.txt" ] || { all=; break; }
    done
    if [ -n "$all" ]; then
      : > "$WORK/cfg_sweep.txt"
      for cs in "${SWEEP[@]}"; do
        echo "$cs $(cat "$WORK/fad_leg_eval_heun32_cfg$cs.txt")" \
          >> "$WORK/cfg_sweep.txt"
      done
      sort -k2 -g "$WORK/cfg_sweep.txt" | head -1 | cut -d' ' -f1 \
        > "$WORK/best_cond_scale.txt"
      say "guidance sweep done: $(cat "$WORK/cfg_sweep.txt" | tr '\n' ' ')"
      say "winning cond_scale: $(cat "$WORK/best_cond_scale.txt")"
      cp "$WORK/cfg_sweep.txt" "$OUT/cfg_sweep.txt"
      commit "soak_r04: 32-Heun guidance sweep FADs on the converged model" \
        "$OUT/cfg_sweep.txt"
    fi
  fi

  # done?
  if [ -f "$WORK/GRID_COMPLETE" ]; then
    pending=
    for d in "$WORK"/eval_*/test_samples; do
      leg=$(basename "$(dirname "$d")")
      [ -s "$WORK/fad_leg_$leg.txt" ] || pending="$pending $leg"
    done
    [ -z "$pending" ] && { say "grid + FADs complete"; break; }
  fi

  # watchdog: grid running but nothing under $WORK progressed in HANG_SECS
  # (the grid touches .grid_heartbeat during wav-less phases: compiles,
  # wait_best_cs, FAD waits — those must not count as hangs)
  if kill -0 "$GRID_PID" 2>/dev/null; then
    newest=$(find "$WORK" \( -name '*.wav' -o -name '.grid_heartbeat' \) \
               -newer "$WDMARK" -print -quit 2>/dev/null)
    if [ -n "$newest" ] || [ -f "$WORK/GRID_COMPLETE" ]; then
      touch "$WDMARK"
    else
      age=$(( $(date +%s) - $(stat -c %Y "$WDMARK") ))
      if [ "$age" -gt "$HANG_SECS" ]; then
        say "watchdog: no new wavs in ${age}s; killing grid pid=$GRID_PID"
        kill -9 "$GRID_PID" 2>/dev/null
        sleep 30
        launch_grid
        touch "$WDMARK"
      fi
    fi
  else
    if [ ! -f "$WORK/GRID_COMPLETE" ]; then
      say "grid runner exited without GRID_COMPLETE; relaunching"
      sleep 30
      launch_grid
      touch "$WDMARK"
    fi
  fi
  sleep 60
done
wait  # drain the FAD job queue

# ---- fail-loud reporting (acceptance phases 6-7) ----------------------------
say "running acceptance phases 6-7"
PHASES=6 WORK="$WORK" TRAIN_WORK="$TRAIN_WORK" DATA="$DATA" SAMPLES=$SAMPLES \
  bash scripts/acceptance_soak_r04.sh
say "phase 6 rc=$?"
commit "soak_r04: FAD grid on the converged model (guidance sweep, int8 gate, NFE frontier)" \
  "$OUT/fad_raw.json" "$OUT/soak.log" "$OUT/cfg_sweep.txt"

PHASES=7 WORK="$WORK" TRAIN_WORK="$TRAIN_WORK" DATA="$DATA" SAMPLES=$SAMPLES \
  bash scripts/acceptance_soak_r04.sh
say "phase 7 rc=$?"
commit "soak_r04: judge-facing quality artifacts (QUALITY.md, TREND.md, summary)" \
  "$OUT/QUALITY.md" "$OUT/TREND.md" "$OUT/summary.json" \
  "$OUT/train_metrics.csv" "$OUT/fad_raw.json" "$OUT/soak.log" "$OUT/grid.log"

say "eval supervisor done"
