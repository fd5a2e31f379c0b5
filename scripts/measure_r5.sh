#!/bin/bash
# Round-5 measurement campaign — STRICTLY SEQUENTIAL (one TPU chip + one
# CPU core; concurrent compiles contend 2-4x, CLAUDE.md) and DEADLINE
# GUARDED: every stage re-checks /tmp/r5_deadline (epoch seconds) and the
# /tmp/r5_stop sentinel so nothing is still training when the round's
# driver captures bench/dryrun (VERDICT r4 items 1c + 3).
#
# Stages (priority order — later stages are the first to be skipped):
#   A  train cain exact anchor ckpt            (250 ep)
#   B  train cain_serving native zero-fuse ckpt (250 ep)
#   C  migration fine-tune redo at a REAL outer_lr 1e-5 (25 ep)
#   D  serving_quality n=64 main table (exact/serving/native/migrated)
#   E  pareto: bw1/bw2/bw4/bw1x5 fps+PSNR vs anchor; RZZZZ/ZZZZR fps
#   F  pick best bw point >= 1002 fps, train it natively (250 ep),
#      quality row, write checkpoint/serving_best_point.json
#   G  seed replicates (exact, native, best-bw @ seed 777) + quality rows
#   H  other backbones: voxelflow / rrin / superslomo (SuperNoPrcp)
#   I  warp_quality rows (voxelflow, rrin, superslomo incl. R=16)
#
# Every stage is resumable: finished checkpoints are detected and skipped.
set -u
cd /root/repo
LOG=/tmp/measure_r5.log
echo $$ > /tmp/measure_r5.pid
log() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

guard() {
  if [ -f /tmp/r5_stop ]; then log "STOP sentinel — exiting before: $1"; exit 0; fi
  local now dl
  now=$(date +%s); dl=$(cat /tmp/r5_deadline 2>/dev/null || echo 9999999999)
  if [ "$now" -gt "$dl" ]; then log "deadline passed — exiting before: $1"; exit 0; fi
  log "stage: $1"
}

have_ckpt() { [ -f "checkpoint/$1/checkpoint.pkl" ]; }

train() {  # train <preset> <epochs> [extra args...] -> logs to /tmp/train_<preset>_r5.log
  local preset=$1 epochs=$2; shift 2
  python scripts/train_synth_ckpt.py "$preset" "$epochs" "$@" \
    > "/tmp/train_${preset}_r5.log" 2>&1
  local rc=$?
  log "train $preset $epochs rc=$rc $(tail -1 "/tmp/train_${preset}_r5.log")"
  return $rc
}

# ---------- A: exact anchor ----------
guard "A exact anchor"
if ! have_ckpt serving_ckpt; then train cain 250; fi

# ---------- B: native zero-fuse ----------
guard "B native serving ckpt"
if ! have_ckpt cain_serving_native_ckpt; then train cain_serving 250; fi

# ---------- C: migration fine-tune redo (the r4d invalid-LR redo) ----------
guard "C migration ft @1e-5"
if ! have_ckpt cain_serving_ft_ckpt; then
  train cain_serving_ft 25 --init_from checkpoint/serving_ckpt --outer_lr 1e-5
fi

# ---------- D: main quality table ----------
guard "D serving_quality n=64"
if [ ! -f /tmp/serving_quality_r5.log ]; then
  python scripts/serving_quality.py 64 > /tmp/serving_quality_r5.log 2>&1
  log "serving_quality rc=$?"
fi
ANCHOR=$(grep -m1 "exact (pad128 reflect)" /tmp/serving_quality_r5.log \
  | sed 's/.*PSNR *\([0-9.]*\).*/\1/')
log "anchor PSNR = ${ANCHOR:-MISSING}"

# ---------- E: bw pareto (both axes) + RZZZZ/ZZZZR fps cells ----------
guard "E bw pareto"
if [ ! -f /tmp/pareto_bw_r5.log ] && [ -n "${ANCHOR:-}" ]; then
  python scripts/serving_pareto.py 64 --only bw1,bw2,bw4,bw1x5 \
    --anchor "$ANCHOR" > /tmp/pareto_bw_r5.log 2>&1
  log "pareto bw rc=$?"
fi
if [ ! -f /tmp/pareto_rz_fps_r5.log ]; then
  python scripts/serving_pareto.py --fps_only --only RZZZZ,ZZZZR \
    > /tmp/pareto_rz_fps_r5.log 2>&1
  log "pareto RZZZZ/ZZZZR fps rc=$?"
fi

# ---------- F: pick + native-train the best bw point ----------
guard "F best-bw native train"
SEL=$(python scripts/pick_bw_point.py /tmp/pareto_bw_r5.log 2>>"$LOG")
log "selected point: ${SEL:-NONE}"
if [ -n "${SEL:-}" ]; then
  BW=${SEL#cain_serving_}
  if ! have_ckpt "cain_serving_${BW}_ckpt"; then
    train "$SEL" 250
  fi
  guard "F best-bw quality row"
  if [ -n "${ANCHOR:-}" ]; then
    python scripts/serving_quality.py 64 --ckpts_only --anchor "$ANCHOR" \
      > /tmp/serving_quality_bw_r5.log 2>&1
    log "bw quality rc=$?"
  fi
  python scripts/write_best_point.py "$BW" /tmp/pareto_bw_r5.log \
    /tmp/serving_quality_bw_r5.log >> "$LOG" 2>&1
  log "best_point.json written rc=$?"
fi

# ---------- G: seed replicates (error bars, VERDICT r4 item 5) ----------
guard "G seed replicates"
if ! have_ckpt serving_ckpt_s777; then train cain 250 --seed 777; fi
guard "G native replicate"
if ! have_ckpt cain_serving_native_ckpt_s777; then
  train cain_serving 250 --seed 777
fi
if [ -n "${SEL:-}" ]; then
  guard "G best-bw replicate"
  if ! have_ckpt "cain_serving_${BW}_ckpt_s777"; then
    train "$SEL" 250 --seed 777
  fi
fi
guard "G replicate quality rows"
python scripts/serving_quality.py 64 --ckpts_only --anchor "${ANCHOR:-0}" \
  > /tmp/serving_quality_seeds_r5.log 2>&1
log "replicate quality rc=$?"

# ---------- H: other backbones ----------
guard "H voxelflow ckpt"
if ! have_ckpt voxelflow_synth_ckpt; then train voxelflow 250; fi
guard "H rrin ckpt"
if ! have_ckpt rrin_synth_ckpt; then train rrin 150; fi
guard "H superslomo ckpt (SuperNoPrcp)"
if ! have_ckpt superslomo_synth_ckpt; then train superslomo 150; fi

# ---------- I: warp quality rows ----------
guard "I warp_quality"
for m in voxelflow rrin; do
  [ -f "/tmp/warp_quality_${m}_r5.log" ] || \
    python scripts/warp_quality.py "$m" 64 > "/tmp/warp_quality_${m}_r5.log" 2>&1
  log "warp_quality $m rc=$?"
  guard "I warp_quality next"
done
[ -f /tmp/warp_quality_superslomo_r5.log ] || \
  python scripts/warp_quality.py superslomo 64 \
    > /tmp/warp_quality_superslomo_r5.log 2>&1
log "warp_quality superslomo rc=$?"
guard "I superslomo R=16"
[ -f /tmp/warp_quality_superslomo_r16_r5.log ] || \
  python scripts/warp_quality.py superslomo 64 --range 16 \
    > /tmp/warp_quality_superslomo_r16_r5.log 2>&1
log "warp_quality superslomo R=16 rc=$?"

log "campaign complete"
